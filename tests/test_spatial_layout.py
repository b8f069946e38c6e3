"""Physical layout: Z-order clustering + bounded files must give parquet
footer extents that actually prune spatial scans."""

import os

import pytest
from pyspark.sql import functions as F

from xcube_geodb_spark.catalog import GeoDBCatalog
from xcube_geodb_spark.operators import dml, spatial
from xcube_geodb_spark.operators.stats import footer_min_max


@pytest.fixture(scope="module")
def clustered(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh"))
    cat = GeoDBCatalog(spark, wh, user="layout")
    cat.create_database("layout")
    cat.create_collection("pts", {"v": "int"}, database="layout")
    m = cat.meta("pts", "layout")
    m.d["max_file_rows"] = 500  # force multiple files from one commit
    from xcube_geodb_spark.catalog import _atomic_write_json

    _atomic_write_json(m.path, m.d)

    from xcube_geodb_spark.suite.geo import _points

    src = (
        _points(spark, "/root/testdata/sf0.01")
        .select("geometry", F.col("c_acctbal").cast("int").alias("v"))
    )
    dml.insert_into_collection(cat, "pts", src, database="layout")
    return cat, wh


def test_zorder_files_have_localized_extents(clustered):
    cat, wh = clustered
    m = cat.meta("pts", "layout")
    assert len(m.files) >= 3, "maxRecordsPerFile must split the commit"
    spans = []
    for f in m.files:
        mm = footer_min_max([os.path.join(wh, "layout", "pts", f)], ["__xmin", "__xmax"])
        spans.append(mm["__xmin"][0:1] + (mm["__xmax"][1],))
    # Z-order clustering: average per-file x-extent must be far below the
    # global extent (files are spatially localized, so bbox scans skip most)
    widths = [hi - lo for lo, hi in spans]
    global_width = max(hi for _, hi in spans) - min(lo for lo, _ in spans)
    assert sum(widths) / len(widths) < 0.75 * global_width


def test_bbox_scan_correct_on_clustered_layout(clustered):
    cat, _ = clustered
    out = spatial.get_collection_by_bbox(
        cat, "pts", (-90.005, -44.005, 30.005, 44.005), "contains",
        database="layout",
    )
    n = out.count()
    # matches the oracle-verified count for this box/synthesis at sf0.01
    assert n == spatial.count_collection_by_bbox(
        cat, "pts", (-90.005, -44.005, 30.005, 44.005), "contains",
        database="layout",
    )
    assert n > 0


class TestKnn:
    """get_knn: exact two-pass envelope-bounded k nearest neighbors."""

    @pytest.fixture()
    def knn_client(self, spark, tmp_path):
        import pandas as pd

        from xcube_geodb_spark.client import GeoDBSparkClient

        c = GeoDBSparkClient(spark, warehouse=str(tmp_path / "wh"), user="knn")
        # 10x10 grid of points at integer coords + one square polygon
        rows = [
            {"geometry": f"POINT ({x} {y})", "tag": f"p{x}_{y}"}
            for x in range(10)
            for y in range(10)
        ]
        rows.append(
            {"geometry": "POLYGON ((20 20, 22 20, 22 22, 20 22, 20 20))",
             "tag": "sq"}
        )
        c.create_collection("g", {"tag": "text"})
        c.insert_into_collection("g", pd.DataFrame(rows))
        return c

    def test_knn_exact_against_brute_force(self, knn_client):
        from xcube_geodb_spark.operators.spatial import get_knn

        got = get_knn(
            knn_client.catalog, "g", (3.2, 3.9), k=5, database="knn"
        ).collect()
        assert len(got) == 5
        # brute force over the grid
        import math

        brute = sorted(
            (math.hypot(x - 3.2, y - 3.9), f"p{x}_{y}")
            for x in range(10)
            for y in range(10)
        )[:5]
        assert [r.tag for r in got] == [t for _, t in brute]
        for r, (d, _) in zip(got, brute):
            assert abs(r.dist - d) < 1e-9

    def test_knn_point_inside_polygon_distance_zero(self, knn_client):
        from xcube_geodb_spark.operators.spatial import get_knn

        got = get_knn(
            knn_client.catalog, "g", (21.0, 21.0), k=1, database="knn"
        ).collect()
        assert got[0].tag == "sq" and got[0].dist == 0.0

    def test_knn_k_larger_than_collection(self, knn_client):
        from xcube_geodb_spark.operators.spatial import get_knn

        got = get_knn(
            knn_client.catalog, "g", (0.0, 0.0), k=500, database="knn"
        ).collect()
        assert len(got) == 101

    def test_knn_empty_collection(self, knn_client):
        from xcube_geodb_spark.operators.spatial import get_knn

        knn_client.create_collection("empty", {"tag": "text"})
        got = get_knn(
            knn_client.catalog, "empty", (0.0, 0.0), k=3, database="knn"
        )
        assert got.count() == 0
        assert "dist" in got.columns

    def test_knn_client_facade(self, knn_client):
        pdf = knn_client.get_collection_knn("g", (0.1, 0.1), k=3)
        assert list(pdf["tag"])[0] == "p0_0"
        assert len(pdf) == 3
