"""Compaction + vacuum maintenance operators (operators/maintenance.py).

The reference's Postgres server keeps storage compact on its own; the
engine's parquet-manifest warehouse does it through these explicit ops, so
the tests assert the three things that matter at scale: content is
bit-identical across maintenance, the declared physical layout survives
compaction, and live files are never touched by vacuum.
"""

import os
import tempfile
import time

import pandas as pd
import pytest

from xcube_geodb_spark.client import GeoDBSparkClient
from xcube_geodb_spark.operators.maintenance import (
    optimize_collection,
    vacuum_collection,
)


@pytest.fixture()
def client(spark):
    return GeoDBSparkClient(
        spark, warehouse=tempfile.mkdtemp(prefix="geodb_maint_"), user="m"
    )


def _pdf(lo: int, hi: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "k": range(lo, hi),
            "name": [f"row{i}" for i in range(lo, hi)],
            "geometry": [f"POINT ({i} {i})" for i in range(lo, hi)],
        }
    )


@pytest.fixture()
def fragmented(client):
    client.create_collection("frag", {"k": "int", "name": "text"})
    for b in range(5):  # five small commits -> >= 5 small files
        client.insert_into_collection("frag", _pdf(b * 10, b * 10 + 10))
    return client


def _content(client):
    df = client.catalog.load_df("frag", "m").select("k", "name")
    return sorted((r.k, r.name) for r in df.collect())


class TestOptimize:
    def test_compacts_small_files_preserving_content(self, fragmented):
        before = _content(fragmented)
        n_before = len(fragmented.catalog.meta("frag", "m").files)
        assert n_before >= 5
        stats = fragmented.optimize_collection("frag")
        assert stats["compacted"] == n_before
        assert stats["files_after"] < n_before
        assert _content(fragmented) == before

    def test_dry_run_changes_nothing(self, fragmented):
        v = fragmented.catalog.meta("frag", "m").version
        stats = fragmented.optimize_collection("frag", dry_run=True)
        assert stats["compacted"] >= 5
        assert fragmented.catalog.meta("frag", "m").version == v

    def test_idempotent_when_compact(self, fragmented):
        fragmented.optimize_collection("frag")
        again = fragmented.optimize_collection("frag")
        assert again["compacted"] == 0

    def test_single_small_file_is_noop(self, client):
        client.create_collection("one", {"k": "int"})
        client.insert_into_collection("one", pd.DataFrame({"k": [1, 2]}))
        assert client.optimize_collection("one")["compacted"] == 0

    def test_preserves_envelope_columns_for_layout(self, fragmented):
        # compaction re-runs _apply_clustering: the persisted __xmin/__ymin
        # envelope (the z-order / pruning substrate) must survive the rewrite
        fragmented.optimize_collection("frag")
        m = fragmented.catalog.meta("frag", "m")
        import pyarrow.parquet as pq

        cdir = fragmented.catalog._coll_dir("frag", "m")
        for f in m.files:
            cols = pq.ParquetFile(os.path.join(cdir, f)).schema_arrow.names
            assert "__xmin" in cols and "__ymax" in cols

    def test_respects_custom_threshold(self, fragmented):
        # threshold below every file's row count -> nothing qualifies
        assert (
            fragmented.optimize_collection("frag", small_file_rows=1)[
                "compacted"
            ]
            == 0
        )


class TestVacuum:
    def _orphan(self, client, age_seconds=7200.0) -> str:
        cdir = client.catalog._coll_dir("frag", "m")
        d = os.path.join(cdir, "data", "deadbeefcafe")
        os.makedirs(d, exist_ok=True)
        p = os.path.join(d, "part-00000-orphan.parquet")
        with open(p, "wb") as fh:
            fh.write(b"PAR1 not a real footer")
        old = time.time() - age_seconds
        os.utime(p, (old, old))
        return os.path.relpath(p, cdir)

    def test_removes_old_orphans_keeps_live(self, fragmented):
        before = _content(fragmented)
        rel = self._orphan(fragmented)
        stats = fragmented.vacuum_collection("frag")
        assert rel in stats["removed"]
        assert _content(fragmented) == before
        # live manifest files all still on disk
        cdir = fragmented.catalog._coll_dir("frag", "m")
        for f in fragmented.catalog.meta("frag", "m").files:
            assert os.path.exists(os.path.join(cdir, f))

    def test_retention_window_protects_recent(self, fragmented):
        rel = self._orphan(fragmented, age_seconds=0.0)
        stats = fragmented.vacuum_collection("frag")
        assert rel not in stats["removed"]
        assert stats["retained_recent"] >= 1
        cdir = fragmented.catalog._coll_dir("frag", "m")
        assert os.path.exists(os.path.join(cdir, rel))

    def test_dry_run_reports_without_deleting(self, fragmented):
        rel = self._orphan(fragmented)
        stats = fragmented.vacuum_collection("frag", dry_run=True)
        assert rel in stats["removed"]
        cdir = fragmented.catalog._coll_dir("frag", "m")
        assert os.path.exists(os.path.join(cdir, rel))

    def test_removes_emptied_commit_dirs(self, fragmented):
        rel = self._orphan(fragmented)
        fragmented.vacuum_collection("frag")
        cdir = fragmented.catalog._coll_dir("frag", "m")
        assert not os.path.exists(os.path.dirname(os.path.join(cdir, rel)))

    def test_direct_api(self, fragmented):
        # operators are usable without the client facade
        stats = vacuum_collection(
            fragmented.catalog, "frag", "m", older_than_seconds=0.0
        )
        assert stats["removed"] == [] or all(
            "_SUCCESS" in r or r.endswith(".crc") or "orphan" in r
            for r in stats["removed"]
        )
        opt = optimize_collection(fragmented.catalog, "frag", "m", dry_run=True)
        assert opt["files_before"] >= 1
