#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is consumed with a noop write (full computation, no driver
transfer) so timings reflect engine work, not collect() serialization.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

HEADLINE = [
    "pg_groupby_q1",                # agg scan (TPC-H Q1 shape)
    "scan_filter_eq_gt",            # PostgREST-grammar filtered scan
    "scan_filter_nested",           # nested boolean grammar
    "join_revenue_by_nation",       # broadcast join + agg
    "join_q5_asia",                 # multi-join + agg
    "window_top_order_per_customer",# window function
    "events_tumbling_hour",         # time-window agg
    "events_sessionization",        # stateful sessionization (batch form)
    "geo_bbox_intersects_squares",  # spatial: envelope prefilter + kernel
    "geo_bbox_contains_points",     # spatial: point-in-box
    "geo_extent_squares",           # spatial extent aggregate
    "dedup_exact",                  # exact dedup (hash agg)
    "dedup_minhash_pairs",          # MinHash LSH candidate join
    "sim_cosine_topk",              # brute-force ANN baseline
    "text_quality",                 # text scoring projection
    "dml_delete_update_roundtrip",  # warehouse DML round-trip
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    from xcube_geodb_spark.session import get_spark
    from xcube_geodb_spark.suite import QUERIES

    spark = get_spark(app_name="xcube_geodb_spark_bench")
    # warm the JVM/codegen paths outside the timed region
    spark.range(1000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt

    print(
        json.dumps(
            {
                "metric": "geodb_spark_suite_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
