"""As-of and range join operators."""

import pytest
from pyspark.sql import functions as F

from xcube_geodb_spark.functions.temporal import asof_join, range_join_events


@pytest.fixture(scope="module")
def quotes(spark):
    rows = [
        ("A", "2024-01-01 10:00:00", 100.0),
        ("A", "2024-01-01 10:05:00", 101.0),
        ("A", "2024-01-01 10:10:00", 102.0),
        ("B", "2024-01-01 10:02:00", 50.0),
    ]
    return (
        spark.createDataFrame(rows, "sym string, ts string, px double")
        .withColumn("ts", F.to_timestamp("ts"))
    )


@pytest.fixture(scope="module")
def trades(spark):
    rows = [
        (1, "A", "2024-01-01 10:03:00"),
        (2, "A", "2024-01-01 10:05:00"),  # tie with a quote
        (3, "A", "2024-01-01 09:00:00"),  # before any quote
        (4, "B", "2024-01-01 11:00:00"),
        (5, "C", "2024-01-01 10:00:00"),  # key with no quotes
    ]
    return (
        spark.createDataFrame(rows, "trade_id long, sym string, ts string")
        .withColumn("ts", F.to_timestamp("ts"))
    )


class TestAsofJoin:
    def test_inclusive(self, trades, quotes):
        out = {
            r["trade_id"]: r["px_asof"]
            for r in asof_join(
                trades, quotes, on=["sym"], left_ts="ts", right_ts="ts",
                value_cols=["px"],
            ).collect()
        }
        assert out[1] == 100.0  # latest quote at/before 10:03
        assert out[2] == 101.0  # tie: same-time quote visible (inclusive)
        assert out[3] is None  # no earlier quote
        assert out[4] == 50.0
        assert out[5] is None  # key never quoted

    def test_strict(self, trades, quotes):
        out = {
            r["trade_id"]: r["px_asof"]
            for r in asof_join(
                trades, quotes, on=["sym"], left_ts="ts", right_ts="ts",
                value_cols=["px"], strict=True,
            ).collect()
        }
        assert out[2] == 100.0  # tie: same-time quote invisible (strict)

    def test_preserves_left_rowcount(self, trades, quotes):
        assert (
            asof_join(
                trades, quotes, on=["sym"], left_ts="ts", right_ts="ts"
            ).count()
            == trades.count()
        )


class TestRangeJoin:
    def test_interval_containment(self, spark, trades):
        intervals = spark.createDataFrame(
            [
                ("A", "2024-01-01 10:00:00", "2024-01-01 10:04:00", "w1"),
                ("B", "2024-01-01 10:00:00", "2024-01-01 12:00:00", "w2"),
            ],
            "sym string, start string, end string, wname string",
        ).select(
            "sym",
            F.to_timestamp("start").alias("start"),
            F.to_timestamp("end").alias("end"),
            "wname",
        )
        out = range_join_events(
            trades.select("trade_id", F.col("sym").alias("t_sym"), "ts"),
            intervals.withColumnRenamed("sym", "t_sym"),
            on=["t_sym"],
            left_ts="ts",
            right_start="start",
            right_end="end",
        )
        got = {(r["trade_id"], r["wname"]) for r in out.collect()}
        assert got == {(1, "w1"), (4, "w2")}
