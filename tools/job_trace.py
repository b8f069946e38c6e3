#!/usr/bin/env python
"""Per-Spark-job wall-clock trace for one composed operator.

Runs the op once (after a JVM warmup), then dumps every Spark job the op
submitted — submission gap, duration, description — from the local UI's
REST API, so the fixed per-op job count and each job's cost are measured,
not guessed (guide §1/§7.1). Driver-side gaps between jobs show up as
`gap` (time since the previous job finished).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    which = sys.argv[1] if len(sys.argv) > 1 else "warehouse_ingest"
    from xcube_geodb_spark.session import get_spark

    spark = get_spark(
        app_name="job_trace", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.range(1000).selectExpr("sum(id)").collect()

    import shutil
    import tempfile

    import xcube_geodb_spark.catalog as cat_mod
    from xcube_geodb_spark.client import GeoDBSparkClient
    from xcube_geodb_spark.functions import similarity
    from xcube_geodb_spark.operators import dml
    from xcube_geodb_spark.suite.geo import _squares
    from xcube_geodb_spark.suite.util import load
    from xcube_geodb_spark.suite import QUERIES

    def warehouse_ingest():
        src = _squares(spark, sf_dir).select("geometry", "c_acctbal", "h")
        wh = tempfile.mkdtemp(prefix="trace_wh_")
        try:
            catalog = cat_mod.GeoDBCatalog(spark, wh, user="bench")
            catalog.create_database("bench")
            catalog.create_collection(
                "squares", {"c_acctbal": "float", "h": "float"}, crs=4326,
                database="bench",
            )
            dml.insert_into_collection(catalog, "squares", src, database="bench")
        finally:
            shutil.rmtree(wh, ignore_errors=True)

    def ann_index_build():
        emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
        wh = tempfile.mkdtemp(prefix="trace_ann_")
        try:
            c = GeoDBSparkClient(spark, warehouse=wh, user="bench")
            c.create_collection("emb", {"vec_id": "int", "embedding": "float[]"})
            c.create_index("emb", "embedding", kind="lsh", options={"dim": 64})
            c.insert_into_collection("emb", emb)
        finally:
            shutil.rmtree(wh, ignore_errors=True)

    def ann_ivfpq_build():
        emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
        wh = tempfile.mkdtemp(prefix="trace_ivfpq_")
        try:
            c = GeoDBSparkClient(spark, warehouse=wh, user="bench")
            seeds = similarity.seed_vectors(emb, 8)
            cents = similarity.seed_centroids(emb, n_centroids=8, seeds=seeds)
            books = similarity.pq_codebooks(
                emb, n_subspaces=8, n_centroids=8, seeds=seeds
            )
            c.create_collection("emb", {"vec_id": "int", "embedding": "float[]"})
            c.create_index(
                "emb", "embedding", kind="ivfpq",
                options={"centroids": cents, "codebooks": books},
            )
            c.insert_into_collection("emb", emb)
        finally:
            shutil.rmtree(wh, ignore_errors=True)

    def ann_index_topk():
        QUERIES["ann_index_topk"](spark, sf_dir).write.mode(
            "overwrite"
        ).format("noop").save()

    def dml_roundtrip():
        QUERIES["dml_delete_update_roundtrip"](spark, sf_dir).write.mode(
            "overwrite"
        ).format("noop").save()

    ops = {
        "warehouse_ingest": warehouse_ingest,
        "ann_index_build": ann_index_build,
        "ann_ivfpq_build": ann_ivfpq_build,
        "ann_index_topk": ann_index_topk,
        "dml_delete_update_roundtrip": dml_roundtrip,
    }
    fn = ops[which]
    # warmup rep so codegen/JIT is out of the trace
    if os.environ.get("TRACE_COLD") != "1":
        fn()
        spark.catalog.clearCache()

    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    def jobs():
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/jobs?status=succeeded"
        ) as r:
            return json.loads(r.read())

    before_ids = {j["jobId"] for j in jobs()}
    t0 = time.perf_counter()
    fn()
    wall = time.perf_counter() - t0
    time.sleep(0.3)
    new = sorted(
        (j for j in jobs() if j["jobId"] not in before_ids),
        key=lambda j: j["jobId"],
    )
    from datetime import datetime

    def ts(s):
        return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

    print(f"\n=== {which}: wall {wall:.3f}s, {len(new)} jobs ===")
    prev_end = None
    job_total = 0.0
    for j in new:
        sub, comp = ts(j["submissionTime"]), ts(j["completionTime"])
        dur = comp - sub
        job_total += dur
        gap = (sub - prev_end) if prev_end is not None else 0.0
        prev_end = comp
        desc = (j.get("description") or j.get("name") or "")[:100]
        print(
            f"  job {j['jobId']:>4}  dur {dur:6.3f}s  gap {gap:6.3f}s  "
            f"tasks {j['numTasks']:>3}  {desc}"
        )
    print(
        f"  jobs total {job_total:.3f}s; driver/other "
        f"{wall - job_total:.3f}s"
    )
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/stages?status=complete"
    ) as r:
        stages = json.loads(r.read())
    new_stage_ids = {s for j in new for s in j.get("stageIds", [])}
    for s in sorted(stages, key=lambda s: s["stageId"]):
        if s["stageId"] not in new_stage_ids:
            continue
        dur = ts(s["completionTime"]) - ts(s["firstTaskLaunchedTime"])
        print(
            f"  stage {s['stageId']:>4}  dur {dur:6.3f}s  "
            f"tasks {s['numCompleteTasks']:>3}  exec {s['executorRunTime']/1000:6.2f}s  "
            f"{s['name'][:90]}"
        )


if __name__ == "__main__":
    main()
