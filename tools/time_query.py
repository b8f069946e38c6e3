#!/usr/bin/env python
"""Time individual suite queries with the bench methodology (one warm rep +
best-of-N noop-sink reps, caches cleared between reps).

Usage: python tools/time_query.py [-n REPS] query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "-n":
        reps = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from xcube_geodb_spark.session import get_spark
    from xcube_geodb_spark.suite import QUERIES

    spark = get_spark(app_name="time_query")
    spark.range(1000).selectExpr("sum(id)").collect()
    out = {}
    for name in args:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(name)
        spark.catalog.clearCache()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        times = []
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            times.append(round(time.perf_counter() - t0, 3))
        out[name] = {"best": min(times), "reps": times}
        print(name, out[name], flush=True)
    print(json.dumps({"loadavg": list(os.getloadavg()), "results": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
