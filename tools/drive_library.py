#!/usr/bin/env python
"""Fast library drive: exercise the public API surfaces end-to-end in one
fresh process against /root/testdata/sf0.001 (the verify recipe's first
leg — ~40 s including JVM startup). Asserts behavior, not just absence
of exceptions; exits non-zero on any failure.

Usage: python tools/drive_library.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from xcube_geodb_spark.session import get_spark

    spark = get_spark(
        app_name="drive_library", master="local[4]", shuffle_partitions=8
    )

    # --- client facade over a fresh warehouse ------------------------------
    from xcube_geodb_spark.client import GeoDBSparkClient

    c = GeoDBSparkClient(
        spark, warehouse=tempfile.mkdtemp(prefix="geodb_drive_"), user="drive"
    )
    c.create_collection("pts", {"v": "float"})
    c.insert_into_collection(
        "pts",
        pd.DataFrame(
            {"geometry": [f"POINT ({i} {i})" for i in range(10)],
             "v": [float(i) for i in range(10)]}
        ),
    )
    got = c.get_collection("pts", query="v=gt.6.5")
    assert len(got) == 3, got
    box = c.get_collection_by_bbox("pts", (2.5, 2.5, 6.5, 6.5), "contains")
    assert sorted(box["v"]) == [3.0, 4.0, 5.0, 6.0], box
    agg = c.get_collection_pg("pts", select="COUNT(*) AS n")
    assert int(agg["n"][0]) == 10
    print("client facade ok")

    # --- grammar parser + raw frames over testdata -------------------------
    from xcube_geodb_spark.filters import apply_postgrest_query

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    sel = apply_postgrest_query(
        orders, "o_orderstatus=eq.F&select=o_orderkey,o_totalprice&limit=5"
    )
    rows = sel.collect()
    assert len(rows) == 5 and set(sel.columns) == {"o_orderkey", "o_totalprice"}
    print("grammar ok")

    # --- LLM-pipeline functions over documents/embeddings ------------------
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    from xcube_geodb_spark.functions.dedup import exact_duplicates
    from xcube_geodb_spark.functions.retrieval import bm25_topk
    from xcube_geodb_spark.functions.sampling import train_val_test_split
    from xcube_geodb_spark.functions.text import with_profile

    assert with_profile(docs.select("doc_id", "text")).count() == docs.count()
    top = bm25_topk(docs.select("doc_id", "text"), ["spark", "hash"], k=5)
    assert top.count() == 5
    exact_duplicates(docs.select("doc_id", "text")).count()  # 0 dups is fine
    split = train_val_test_split(docs.select("doc_id"), "doc_id", 0.1, 0.1)
    assert set(r["split"] for r in split.select("split").distinct().collect()) \
        <= {"train", "val", "test"}
    print("llm functions ok")

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    from xcube_geodb_spark.functions.similarity import cosine_topk

    q = emb.filter("vec_id = 0").collect()[0]["embedding"]
    knn = cosine_topk(emb, list(q), k=3).collect()
    assert knn[0]["vec_id"] == 0 and knn[0]["cos_sim"] == 1.0
    print("similarity ok")

    # --- corpus dedup: line-level + incremental ----------------------------
    from xcube_geodb_spark.functions.dedup import dedup_against, line_dedup

    lined = spark.createDataFrame(
        [(1, "a b\ncommon"), (2, "c d\ncommon"), (3, "e f")],
        "doc_id long, text string",
    )
    ld = {r["doc_id"]: r["text"] for r in line_dedup(lined).collect()}
    assert ld == {1: "a b", 2: "c d", 3: "e f"}, ld
    kept = dedup_against(
        docs.select("doc_id", "text").filter("doc_id % 2 = 1"),
        docs.select("doc_id", "text").filter("doc_id % 2 = 0"),
    )
    assert kept.count() > 0  # synthetic docs are distinct: all survive
    print("corpus dedup ok")

    # --- deterministic quantiles ------------------------------------------
    from xcube_geodb_spark.operators.stats import quantiles_column

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    qs = quantiles_column(
        li, "l_extendedprice", qs=(0.5,), bins=64, bounds=(0.0, 110000.0)
    ).collect()
    assert len(qs) == 1 and 0.0 < qs[0]["est"] < 110000.0
    print("quantiles ok")

    # --- geometry SQL surface ---------------------------------------------
    from xcube_geodb_spark.geometry.sqlfuncs import register_spatial_sql_functions

    register_spatial_sql_functions(spark)
    (r,) = spark.sql(
        "SELECT st_area(st_makeenvelope(0, 0, 2, 3)) AS a, "
        "st_distance(st_makepoint(0, 0), st_makepoint(3, 4)) AS d, "
        "st_astext(st_convexhull(st_geomfromtext("
        "'MULTIPOINT (0 0, 2 0, 1 2, 1 1)'))) AS hull, "
        "st_npoints(st_geomfromtext('LINESTRING (0 0, 1 1, 2 2)')) AS np"
    ).collect()
    assert r["a"] == 6.0 and r["d"] == 5.0
    assert r["hull"] == "POLYGON ((0 0, 2 0, 1 2, 0 0))" and r["np"] == 3
    print("geometry sql ok")

    spark.stop()
    print("library drive complete")


if __name__ == "__main__":
    main()
