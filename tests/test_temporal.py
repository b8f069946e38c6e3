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

    def test_forward(self, trades, quotes):
        out = {
            r["trade_id"]: r["px_asof"]
            for r in asof_join(
                trades, quotes, on=["sym"], left_ts="ts", right_ts="ts",
                value_cols=["px"], direction="forward",
            ).collect()
        }
        assert out[1] == 101.0  # next quote at/after 10:03 is 10:05
        assert out[2] == 101.0  # tie visible (inclusive forward)
        assert out[3] == 100.0  # first quote of the morning
        assert out[4] is None  # nothing after 11:00 for B
        assert out[5] is None

    def test_forward_strict_skips_tie(self, trades, quotes):
        out = {
            r["trade_id"]: r["px_asof"]
            for r in asof_join(
                trades, quotes, on=["sym"], left_ts="ts", right_ts="ts",
                value_cols=["px"], direction="forward", strict=True,
            ).collect()
        }
        assert out[2] == 102.0  # 10:05 tie invisible; next is 10:10

    def test_nearest_picks_closer_side_ties_backward(self, trades, quotes):
        out = {
            r["trade_id"]: r["px_asof"]
            for r in asof_join(
                trades, quotes, on=["sym"], left_ts="ts", right_ts="ts",
                value_cols=["px"], direction="nearest",
            ).collect()
        }
        assert out[1] == 101.0  # 10:03: 2 min to 10:05 beats 3 min to 10:00
        assert out[2] == 101.0  # exact hit
        assert out[3] == 100.0  # only a forward match exists
        assert out[4] == 50.0  # only a backward match exists
        assert out[5] is None

    def test_nearest_tie_resolves_backward(self, spark, quotes):
        mid = spark.createDataFrame(
            [(9, "A", "2024-01-01 10:02:30")],
            "trade_id long, sym string, ts string",
        ).withColumn("ts", F.to_timestamp("ts"))
        (row,) = asof_join(
            mid, quotes, on=["sym"], left_ts="ts", right_ts="ts",
            value_cols=["px"], direction="nearest",
        ).collect()
        assert row["px_asof"] == 100.0  # equidistant: backward wins

    def test_rejects_unknown_direction(self, trades, quotes):
        with pytest.raises(ValueError):
            asof_join(
                trades, quotes, on=["sym"], left_ts="ts", right_ts="ts",
                direction="sideways",
            )

    def test_preserves_left_rowcount(self, trades, quotes):
        assert (
            asof_join(
                trades, quotes, on=["sym"], left_ts="ts", right_ts="ts"
            ).count()
            == trades.count()
        )


class TestAsofCollision:
    def test_empty_suffix_collision_raises(self, trades, quotes):
        # suffix='' on same-schema frames would silently produce two
        # columns named 'px'; must raise instead
        with pytest.raises(ValueError, match="collide"):
            asof_join(
                quotes, quotes, on=["sym"], left_ts="ts", right_ts="ts",
                value_cols=["px"], suffix="",
            )

    def test_nonconflicting_empty_suffix_ok(self, trades, quotes):
        out = asof_join(
            trades, quotes, on=["sym"], left_ts="ts", right_ts="ts",
            value_cols=["px"], suffix="",
        )
        assert out.columns.count("px") == 1


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


class TestFunnel:
    def _ev(self, spark, rows):
        df = spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, event_type string"
        )
        return df.withColumn("ts", F.to_timestamp("ts"))

    def test_basic_levels(self, spark):
        from xcube_geodb_spark.functions.temporal import funnel_levels

        rows = [
            # u1: full chain within window
            (1, "2024-01-01 00:00:00", 1, "view"),
            (2, "2024-01-01 01:00:00", 1, "click"),
            (3, "2024-01-01 02:00:00", 1, "purchase"),
            # u2: purchase BEFORE click -> only level 2
            (4, "2024-01-01 00:00:00", 2, "view"),
            (5, "2024-01-01 02:00:00", 2, "purchase"),
            (6, "2024-01-01 03:00:00", 2, "click"),
            # u3: only view
            (7, "2024-01-01 00:00:00", 3, "view"),
            # u4: click/purchase but never view -> excluded
            (8, "2024-01-01 00:00:00", 4, "click"),
            (9, "2024-01-01 01:00:00", 4, "purchase"),
        ]
        out = {
            r["user_id"]: r["funnel_level"]
            for r in funnel_levels(
                self._ev(spark, rows), ["view", "click", "purchase"], 86400.0
            ).collect()
        }
        assert out == {1: 3, 2: 2, 3: 1}

    def test_window_bound_excludes_slow_chains(self, spark):
        from xcube_geodb_spark.functions.temporal import funnel_levels

        rows = [
            (1, "2024-01-01 00:00:00", 1, "view"),
            (2, "2024-01-01 01:00:00", 1, "click"),
            (3, "2024-01-03 00:00:00", 1, "purchase"),  # > 24h after view
        ]
        out = funnel_levels(
            self._ev(spark, rows), ["view", "click", "purchase"], 86400.0
        ).collect()
        assert out[0]["funnel_level"] == 2

    def test_latest_chain_start_wins(self, spark):
        # the restart case: the chain from the FIRST view misses the
        # window, the chain from the second view completes — a fold that
        # kept the earliest start would understate the level
        from xcube_geodb_spark.functions.temporal import funnel_levels

        rows = [
            (1, "2024-01-01 00:00:00", 1, "view"),
            (2, "2024-01-01 09:00:00", 1, "click"),
            (3, "2024-01-01 05:00:00", 1, "view"),
            (4, "2024-01-01 14:00:00", 1, "purchase"),  # 14h > 10h from v1,
        ]                                               # 9h <= 10h from v2
        out = funnel_levels(
            self._ev(spark, rows), ["view", "click", "purchase"],
            within=10 * 3600.0,
        ).collect()
        assert out[0]["funnel_level"] == 3

    def test_funnel_counts_cumulative(self, spark):
        from xcube_geodb_spark.functions.temporal import funnel_counts

        rows = [
            (1, "2024-01-01 00:00:00", 1, "view"),
            (2, "2024-01-01 01:00:00", 1, "click"),
            (3, "2024-01-01 02:00:00", 1, "purchase"),
            (4, "2024-01-01 00:00:00", 2, "view"),
            (5, "2024-01-01 01:00:00", 2, "click"),
            (6, "2024-01-01 00:00:00", 3, "view"),
        ]
        got = {
            r["step"]: r["n_users"]
            for r in funnel_counts(
                self._ev(spark, rows), ["view", "click", "purchase"], 86400.0
            ).collect()
        }
        assert got == {1: 3, 2: 2, 3: 1}

    def test_needs_two_steps(self, spark):
        import pytest as _pytest

        from xcube_geodb_spark.functions.temporal import funnel_levels

        with _pytest.raises(ValueError):
            funnel_levels(self._ev(spark, []), ["view"])


class TestCohortRetention:
    def test_handcrafted_matrix(self, spark):
        from xcube_geodb_spark.functions.temporal import cohort_retention

        rows = [
            # u1 first in week 0, active weeks 0 and 2
            (1, "2024-01-01 10:00:00", 1, "view"),
            (2, "2024-01-16 10:00:00", 1, "view"),
            # u2 first in week 0, active week 0 only (two events, one week)
            (3, "2024-01-02 10:00:00", 2, "view"),
            (4, "2024-01-03 10:00:00", 2, "click"),
            # u3 first in week 2
            (5, "2024-01-16 10:00:00", 3, "view"),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, event_type string"
        ).withColumn("ts", F.to_timestamp("ts"))
        out = {
            (r["cohort_period"], r["period_offset"]): r["n_users"]
            for r in cohort_retention(df, period_days=7).collect()
        }
        cohorts = sorted({c for c, _ in out})
        c0, c2 = cohorts[0], cohorts[1]
        assert c2 - c0 == 2
        assert out == {(c0, 0): 2, (c0, 2): 1, (c2, 0): 1}

    def test_offsets_nonnegative_and_cohort_complete(self, spark):
        from xcube_geodb_spark.functions.temporal import cohort_retention
        from xcube_geodb_spark.suite.util import load

        ev = load(spark, "/root/testdata/sf0.001", "events")
        rows = cohort_retention(ev, period_days=7).collect()
        assert all(r["period_offset"] >= 0 for r in rows)
        # offset-0 cell of each cohort counts every member
        total_users = ev.select("user_id").distinct().count()
        base = sum(r["n_users"] for r in rows if r["period_offset"] == 0)
        assert base == total_users


class TestGapfill:
    def _ev(self, spark):
        rows = [
            (1, "2024-01-01 00:10:00", 1, "click", 2.0),
            (2, "2024-01-01 00:50:00", 1, "click", 3.0),
            # hour 1 and 2 empty for click
            (3, "2024-01-01 03:30:00", 1, "click", 7.0),
            (4, "2024-01-01 01:00:00", 2, "view", 1.0),
        ]
        return spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string, value double",
        ).withColumn("ts", F.to_timestamp("ts"))

    def test_zero_fill_synthesizes_empty_buckets(self, spark):
        from xcube_geodb_spark.functions.temporal import time_bucket_gapfill

        out = {
            (r["event_type"], r["bucket_start"]): (r["n_events"], r["agg_value"])
            for r in time_bucket_gapfill(
                self._ev(spark), 3600, ["event_type"], fill="zero"
            ).collect()
        }
        base = 1704067200  # 2024-01-01 00:00:00 UTC
        # grid covers hours 0..3 for BOTH types
        assert len(out) == 8
        assert out[("click", base)] == (2, 5.0)
        assert out[("click", base + 3600)] == (0, 0.0)
        assert out[("click", base + 2 * 3600)] == (0, 0.0)
        assert out[("click", base + 3 * 3600)] == (1, 7.0)
        assert out[("view", base + 3600)] == (1, 1.0)
        assert out[("view", base)] == (0, 0.0)

    def test_locf_carries_last_value(self, spark):
        from xcube_geodb_spark.functions.temporal import time_bucket_gapfill

        out = {
            (r["event_type"], r["bucket_start"]): r["agg_value"]
            for r in time_bucket_gapfill(
                self._ev(spark), 3600, ["event_type"], fill="locf"
            ).collect()
        }
        base = 1704067200
        assert out[("click", base + 3600)] == 5.0      # carried forward
        assert out[("click", base + 2 * 3600)] == 5.0
        assert out[("click", base + 3 * 3600)] == 7.0  # new observation
        assert out[("view", base)] is None             # nothing to carry yet

    def test_bad_fill(self, spark):
        import pytest as _pytest

        from xcube_geodb_spark.functions.temporal import time_bucket_gapfill

        with _pytest.raises(ValueError):
            time_bucket_gapfill(self._ev(spark), 3600, ["event_type"], fill="x")


class TestAttributionJoin:
    def _events(self, spark):
        rows = [
            (1, "2024-01-01 10:00:00", 1, "click"),
            (2, "2024-01-01 10:10:00", 1, "purchase"),   # 10 min after c1
            (3, "2024-01-01 10:45:00", 1, "purchase"),   # 45 min: outside
            (4, "2024-01-01 10:05:00", 2, "click"),
            (5, "2024-01-01 10:20:00", 3, "purchase"),   # other user only
            (6, "2024-01-01 09:59:00", 1, "purchase"),   # before the click
            (7, "2024-01-01 10:08:00", 1, "click"),      # also catches e2
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, event_type string"
        )
        return df.withColumn("ts", F.to_timestamp("ts"))

    def test_pairs_within_lag_only(self, spark):
        from xcube_geodb_spark.functions.temporal import attribution_join

        ev = self._events(spark)
        out = attribution_join(
            ev.filter(F.col("event_type") == "click"),
            ev.filter(F.col("event_type") == "purchase"),
            max_lag="30 minutes",
        )
        got = {(r["click_id"], r["conversion_id"]): r["lag_us"]
               for r in out.collect()}
        assert got == {(1, 2): 600_000_000, (7, 2): 120_000_000}

    def test_streaming_matches_batch_twin(self, spark, tmp_path):
        from xcube_geodb_spark.functions.temporal import attribution_join
        from xcube_geodb_spark.streaming import stream_attribution_join
        from xcube_geodb_spark.streaming.windows import streaming_events_source

        ev = self._events(spark).withColumn("value", F.lit(0.0)).withColumn(
            "props", F.lit("{}"))
        src = str(tmp_path / "attr_src")
        ev.write.parquet(src)
        clicks = streaming_events_source(spark, src).filter(
            F.col("event_type") == "click")
        purchases = streaming_events_source(spark, src).filter(
            F.col("event_type") == "purchase")
        out = stream_attribution_join(clicks, purchases, max_lag="30 minutes")
        assert out.isStreaming
        q = (out.writeStream.format("memory").queryName("attr_test")
             .outputMode("append").start())
        try:
            q.processAllAvailable()
            rows = spark.sql(
                "SELECT click_id, conversion_id, lag_us FROM attr_test"
            ).collect()
        finally:
            q.stop()
        batch = attribution_join(
            ev.filter(F.col("event_type") == "click"),
            ev.filter(F.col("event_type") == "purchase"),
            max_lag="30 minutes",
        ).select("click_id", "conversion_id", "lag_us").collect()
        assert {tuple(r) for r in rows} == {tuple(r) for r in batch}


class TestRollingZscore:
    def test_flat_baseline_spike_detected(self, spark):
        from xcube_geodb_spark.functions.temporal import rolling_zscore

        # 8 buckets of 10 events, one bucket of 11 (tiny variance source),
        # then a 100-event spike
        rows = []
        eid = 0
        for b in range(10):
            n = 100 if b == 9 else (11 if b == 4 else 10)
            for _ in range(n):
                rows.append((eid, f"2024-01-0{b // 4 + 1} {(b * 6) % 24:02d}:30:00", 1, "click"))
                eid += 1
        df = spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, event_type string"
        ).withColumn("ts", F.to_timestamp("ts"))
        out = rolling_zscore(df, bucket_seconds=21600, group_cols=["event_type"],
                             window_buckets=8)
        by_bucket = sorted(
            (r["bucket_start"], r["n_events"], r["z"]) for r in out.collect()
        )
        zs = [z for _, _, z in by_bucket]
        # first 8 buckets: no full baseline -> NULL
        assert all(z is None for z in zs[:8])
        # bucket 8 (n=10 vs baseline mean ~10.125): small |z|
        assert abs(zs[8]) < 1.0
        # bucket 9 (n=100): extreme positive z
        assert zs[9] > 10

    def test_zero_variance_baseline_gives_null(self, spark):
        from xcube_geodb_spark.functions.temporal import rolling_zscore

        rows = [
            (i * 100 + j, f"2024-01-01 {i:02d}:00:00", 1, "view")
            for i in range(10) for j in range(5)
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, event_type string"
        ).withColumn("ts", F.to_timestamp("ts"))
        out = rolling_zscore(df, bucket_seconds=3600, group_cols=["event_type"],
                             window_buckets=8)
        assert all(r["z"] is None for r in out.collect())

    def test_groups_are_independent(self, spark):
        from xcube_geodb_spark.functions.temporal import rolling_zscore

        rows = []
        for i in range(12):
            for j in range(5 if i % 2 else 7):
                rows.append((i * 10 + j, f"2024-01-01 {i:02d}:00:00", 1, "a"))
            rows.append((1000 + i, f"2024-01-01 {i:02d}:00:00", 1, "b"))
        df = spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, event_type string"
        ).withColumn("ts", F.to_timestamp("ts"))
        out = rolling_zscore(df, bucket_seconds=3600, group_cols=["event_type"],
                             window_buckets=4)
        b_rows = [r for r in out.collect() if r["event_type"] == "b"]
        assert all(r["z"] is None for r in b_rows)  # constant series
