"""Physical-plan quality gates: the plans we designed for must be the plans
Catalyst actually produces (pushdown, pruning, broadcast, codegen)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from xcube_geodb_spark.client import GeoDBSparkClient
from xcube_geodb_spark.operators import scan, spatial
from xcube_geodb_spark.plans.inspect import (
    broadcast_join_count,
    executed_plan,
    has_pushed_filter,
    wholestage_codegen_spans,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def client(spark, tmp_path_factory):
    c = GeoDBSparkClient(
        spark, warehouse=str(tmp_path_factory.mktemp("wh")), user="planner"
    )
    c.create_collection("pts", {"v": "int"})
    pdf = pd.DataFrame(
        {
            "geometry": [f"POINT ({i % 100} {i % 50})" for i in range(1000)],
            "v": list(range(1000)),
        }
    )
    c.insert_into_collection("pts", pdf)
    return c


class TestPlanShape:
    def test_grammar_filter_pushes_to_scan(self, spark):
        df = spark.read.parquet(f"{SF}/orders.parquet")
        from xcube_geodb_spark.filters import apply_postgrest_query

        out = apply_postgrest_query(df, "o_totalprice=gt.150000")
        assert has_pushed_filter(out, "o_totalprice")

    def test_grammar_select_prunes_columns(self, spark):
        df = spark.read.parquet(f"{SF}/lineitem.parquet")
        from xcube_geodb_spark.filters import apply_postgrest_query

        out = apply_postgrest_query(df, "select=l_orderkey,l_quantity")
        plan = executed_plan(out)
        assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan

    def test_bbox_scan_pushes_envelope_prefilter(self, client):
        df = spatial.get_collection_by_bbox(
            client.catalog, "pts", (10.0, 10.0, 20.0, 20.0), "intersects",
            database="planner",
        )
        # the envelope range predicate must reach the parquet scan so footer
        # stats prune files/row-groups before the geometry kernel runs
        assert has_pushed_filter(df, "__xmin")
        assert has_pushed_filter(df, "__ymax")

    def test_q1_pushes_date_filter_and_codegens(self, spark):
        from xcube_geodb_spark.suite.core import pg_groupby_q1

        df = pg_groupby_q1(spark, SF)
        assert has_pushed_filter(df, "l_shipdate")
        df.collect()  # AQE prints codegen markers only in the final plan
        assert wholestage_codegen_spans(df) >= 2  # scan+partial agg, final agg

    def test_dim_joins_broadcast(self, spark):
        from xcube_geodb_spark.suite.core import join_q5_asia

        df = join_q5_asia(spark, SF)
        assert broadcast_join_count(df) >= 2  # dims broadcast, no dim shuffles

    def test_count_uses_footers_not_a_job(self, client, spark):
        # counting must not launch a Spark job: assert no new job is recorded
        sc = spark.sparkContext
        tracker = sc.statusTracker()
        before = tracker.getJobIdsForGroup(None)
        n = scan.count_collection(client.catalog, "pts", "planner")
        after = tracker.getJobIdsForGroup(None)
        assert n == 1000
        assert len(after) == len(before), "footer count must be jobless"

    def test_topk_is_take_ordered(self, spark):
        from xcube_geodb_spark.suite.core import pg_topk_orders

        plan = executed_plan(pg_topk_orders(spark, SF))
        assert "TakeOrderedAndProject" in plan  # not a global sort
