#!/usr/bin/env python
"""Quickstart: the reference's notebook workflow on the Spark engine.

Mirrors the flow of the reference's own notebooks
(``docs/source/notebooks/geodb_manage_collections.ipynb`` /
``geodb_explore_collections.ipynb`` / ``geodb_eurocrops_demo.ipynb``):
create a collection, insert features, query with the PostgREST grammar,
by bbox, and through the raw-SQL path, manage properties/indexes/grants,
then the engine's supersets (time travel, ranked search, dedup).

Run: python examples/quickstart.py   (uses a temp warehouse; no cluster)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

from xcube_geodb_spark.client import GeoDBSparkClient
from xcube_geodb_spark.session import get_spark


def main() -> None:
    spark = get_spark(app_name="geodb_quickstart", master="local[4]",
                      shuffle_partitions=8)
    geodb = GeoDBSparkClient(
        spark, warehouse=tempfile.mkdtemp(prefix="geodb_qs_"), user="demo"
    )
    print("whoami:", geodb.whoami)

    # -- create + insert (geodb_manage_collections.ipynb) -------------------
    geodb.create_collection(
        "land_use", {"raba_pid": "float", "raba_id": "float", "d_od": "date"},
        crs=4326,
    )
    geodb.insert_into_collection(
        "land_use",
        pd.DataFrame(
            {
                "geometry": [
                    "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
                    "POLYGON ((10 10, 14 10, 14 14, 10 14, 10 10))",
                    "POINT (1 1)",
                    "POINT (50 50)",
                ],
                "raba_pid": [5900001.0, 5900002.0, 5900003.0, 5900004.0],
                "raba_id": [1410.0, 1300.0, 1410.0, 7000.0],
                "d_od": ["2019-02-01", "2019-03-01", "2019-02-01", "2019-04-01"],
            }
        ),
    )

    # -- PostgREST grammar (geodb_explore_collections.ipynb) ----------------
    hits = geodb.get_collection("land_use", query="raba_id=eq.1410")
    print("grammar eq filter rows:", len(hits))

    nested = geodb.get_collection(
        "land_use",
        query="and=(or(raba_id.eq.1410,raba_id.eq.1300),raba_pid.gt.5900001)",
    )
    print("nested and/or rows:", len(nested))

    # -- bbox query (geodb_eurocrops_demo.ipynb) ----------------------------
    in_box = geodb.get_collection_by_bbox(
        "land_use", (-1.0, -1.0, 5.0, 5.0), comparison_mode="contains"
    )
    print("bbox contains rows:", len(in_box), "| extent:",
          geodb.get_collection_bbox("land_use"))

    # -- raw-SQL path -------------------------------------------------------
    agg = geodb.get_collection_pg(
        "land_use", select="raba_id, COUNT(*) AS ct", group="raba_id",
        order="raba_id",
    )
    print("pg aggregate:\n", agg)

    # -- properties / indexes / sharing (manage/index/share notebooks) ------
    geodb.add_property("land_use", "quality", "float")
    geodb.create_index("land_use", "raba_id")
    geodb.grant_access_to_collection("land_use", "colleague")
    print("grants:\n", geodb.list_my_grants())

    # -- engine supersets ---------------------------------------------------
    geodb.update_collection("land_use", {"raba_id": 9999.0}, "raba_id=eq.7000")
    versions = [v["version"] for v in geodb.get_collection_versions("land_use")]
    print("versions after update:", versions)
    before = geodb.get_collection_at_version("land_use", versions[-2])
    print("time travel: pre-update raba_ids:", sorted(before["raba_id"]))

    geodb.create_collection("notes", {"body": "string"})
    geodb.insert_into_collection(
        "notes",
        pd.DataFrame({"body": [
            "spark spatial engine", "hash join plans", "spark hash deep dive",
        ]}),
    )
    print("ranked search:\n",
          geodb.search_collection("notes", "spark hash", "body", k=2))

    spark.stop()
    print("quickstart complete")


if __name__ == "__main__":
    main()
