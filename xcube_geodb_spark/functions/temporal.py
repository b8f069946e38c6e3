"""Temporal join operators Spark lacks natively: as-of join, range join.

**As-of join** (for each left row, the latest right row at-or-before its
timestamp) is implemented as a UNION + single window pass, not a range
join: both sides are tagged, unioned, hash-partitioned by key and sorted by
(time, side), and ``last(value, ignorenulls)`` carries the most recent
right-side values forward onto left rows. One shuffle on the key, no
broadcast of either side, no O(n*m) interval explosion — the standard
scalable formulation (the same shape Flink/kdb use for as-of semantics).

DuckDB's native ``ASOF JOIN`` serves as the oracle in the driver gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    strict: bool = False,
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach ``value_cols`` from one matching right row
    within the same ``on`` key. ``direction`` (pandas ``merge_asof``
    parity): ``backward`` (default) takes the greatest ``right_ts`` <=
    ``left_ts`` (< when ``strict``); ``forward`` the smallest ``right_ts``
    >= ``left_ts`` (>); ``nearest`` whichever of the two is closer in
    time, ties resolved backward. Left rows with no match get NULLs
    (left-join semantics).

    Physical shape for every direction: union + per-key sorted window
    carry — one shuffle on the key, state one row per value column, no
    interval explosion; ``nearest`` runs the two window passes over the
    SAME union (same exchange) and picks per row."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction: {direction!r}")
    value_cols = value_cols or [
        c for c in right.columns if c not in set(on) | {right_ts}
    ]
    out_cols = [f"{c}{suffix}" for c in value_cols]
    collided = sorted(set(out_cols) & set(left.columns))
    if collided:
        raise ValueError(
            "asof_join output column(s) collide with left columns: "
            f"{collided}; pass a non-empty suffix or rename the left columns"
        )

    l_tagged = left.withColumn("__t", F.col(left_ts)).withColumn(
        "__side", F.lit(1 if not strict else 0)
    )
    for c in out_cols + ["__rt"]:
        l_tagged = l_tagged.withColumn(c, F.lit(None))
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("__t"),
        F.lit(0 if not strict else 1).alias("__side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
        F.col(right_ts).alias("__rt"),
    )
    for c in left.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None))
    # inclusive: right sorts before left at equal time (right row visible);
    # strict: left sorts before right (same-time right rows invisible).
    # The same __side tags serve both directions: under a DESCENDING time
    # order the inclusive right row still has to precede its equal-time
    # left row for the carry to see it.
    unioned = l_tagged.unionByName(r_tagged.select(*l_tagged.columns))

    def _carry(frame, order_desc: bool, tag: str):
        w = (
            Window.partitionBy(*on)
            .orderBy(
                F.col("__t").desc() if order_desc else F.col("__t").asc(),
                F.col("__side").asc(),
            )
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        for c in out_cols + ["__rt"]:
            frame = frame.withColumn(
                f"{c}{tag}", F.last(c, ignorenulls=True).over(w)
            )
        return frame

    is_left = F.col("__side") == (1 if not strict else 0)
    if direction == "backward":
        carried = _carry(unioned, False, "__b")
        picked = [F.col(f"{c}__b").alias(c) for c in out_cols]
    elif direction == "forward":
        carried = _carry(unioned, True, "__f")
        picked = [F.col(f"{c}__f").alias(c) for c in out_cols]
    else:
        carried = _carry(_carry(unioned, False, "__b"), True, "__f")
        t = F.col("__t").cast("double")
        brt = F.col("__rt__b").cast("double")
        frt = F.col("__rt__f").cast("double")
        choose_f = F.col("__rt__f").isNotNull() & (
            F.col("__rt__b").isNull() | ((frt - t) < (t - brt))
        )
        picked = [
            F.when(choose_f, F.col(f"{c}__f"))
            .otherwise(F.col(f"{c}__b"))
            .alias(c)
            for c in out_cols
        ]
    keep = [c for c in left.columns]
    return carried.filter(is_left).select(*keep, *picked)


def range_join_events(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_start: str,
    right_end: str,
) -> DataFrame:
    """Interval containment join (left.ts in [right.start, right.end]) keyed
    by ``on``: an equi-join on the key plus a post-filter, so Catalyst plans
    a hash join rather than a cartesian range explosion. For keys with very
    long interval lists, bucketize time as an additional equi-key."""
    cond = [left[k] == right[k] for k in on] + [
        left[left_ts] >= right[right_start],
        left[left_ts] <= right[right_end],
    ]
    c = cond[0]
    for x in cond[1:]:
        c = c & x
    return left.join(right, c, "inner")


def funnel_levels(
    events: DataFrame,
    steps: list[str],
    within: float = 86400.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Windowed funnel (the ClickHouse ``windowFunnel`` / product-analytics
    idiom): per user, the deepest step ``L`` such that an ordered chain of
    events matching ``steps[0..L-1]`` exists with strictly increasing
    timestamps and ``t_L - t_1 <= within`` seconds. Returns
    (user_col, funnel_level) for users reaching at least step 1.

    Plan: filter to the step types (column/row pruning at the scan), ONE
    hash shuffle on the user key, then a per-user sorted-array fold in
    JVM higher-order functions — no UDF, no self-joins. The fold keeps,
    for each prefix depth, the LATEST chain-start time that reaches it
    (feasibility-optimal: a later start leaves more window for the
    remaining steps), so one linear pass decides the exists-a-chain
    semantics the relational triple-join oracle defines. Assumes one
    user's step events fit an array — the same bounded-entity-history
    assumption sessionization makes; hot users beyond that belong in the
    streaming stateful path.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    k = len(steps)
    evs = events.filter(F.col(type_col).isin(list(steps))).select(
        F.col(user_col),
        # NTZ first to TIMESTAMP (identity under the UTC session TZ),
        # then to fractional epoch seconds - microseconds preserved
        F.col(ts_col).cast("timestamp").cast("double").alias("__t"),
        F.col(type_col).alias("__tp"),
    )
    collected = evs.groupBy(user_col).agg(
        F.array_sort(F.collect_list(F.struct("__t", "__tp"))).alias("__evs")
    )

    neg_inf = float("-inf")
    zero = F.struct(
        *[F.lit(neg_inf).alias(f"s{j}") for j in range(1, k)],
        F.lit(0).alias("lvl"),
    )

    def _step(acc, ev):
        # s{j}: latest chain start reaching step j (1-based, j < k)
        t, tp = ev["__t"], ev["__tp"]
        fields = []
        for j in range(1, k):
            sj = acc[f"s{j}"]
            if j == 1:
                new = F.when(tp == steps[0], F.greatest(sj, t)).otherwise(sj)
            else:
                prev = acc[f"s{j - 1}"]
                ok = (tp == steps[j - 1]) & (t - prev <= F.lit(within)) & (
                    prev > F.lit(neg_inf)
                )
                new = F.when(ok, F.greatest(sj, prev)).otherwise(sj)
            fields.append(new.alias(f"s{j}"))
        reach = acc["lvl"]
        reach = F.when(tp == steps[0], F.greatest(reach, F.lit(1))).otherwise(reach)
        for j in range(2, k + 1):
            prev = acc[f"s{j - 1}"]
            ok = (tp == steps[j - 1]) & (t - prev <= F.lit(within)) & (
                prev > F.lit(neg_inf)
            )
            reach = F.when(ok, F.greatest(reach, F.lit(j))).otherwise(reach)
        fields.append(reach.alias("lvl"))
        return F.struct(*fields)

    out = collected.select(
        F.col(user_col),
        F.aggregate("__evs", zero, _step)["lvl"].alias("funnel_level"),
    )
    return out.filter(F.col("funnel_level") >= 1)


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    within: float = 86400.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """The funnel chart: for each step depth, how many users reached it
    (cumulative — a user at level 3 counts toward steps 1, 2 and 3)."""
    lv = funnel_levels(events, steps, within, user_col, ts_col, type_col)
    k = len(steps)
    return (
        lv.select(
            F.explode(
                F.sequence(F.lit(1), F.col("funnel_level"))
            ).alias("step")
        )
        .groupBy("step")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention (the product-analytics retention matrix): users
    cohorted by the period of their FIRST event; cell (cohort, offset) =
    distinct users of that cohort active ``offset`` periods later.

    Pure column algebra over epoch-day buckets (timezone-free integer
    division — no calendar functions whose week conventions differ
    between engines). Shuffle plan: one distinct on (user, period), one
    min-aggregate on user, a user-keyed join (both sides hash-partitioned
    by user — AQE co-locates), and the final tiny (cohort, offset)
    aggregate. Nothing events-sized is ever collected or broadcast.
    """
    day = F.datediff(
        F.col(ts_col).cast("timestamp").cast("date"), F.lit("1970-01-01").cast("date")
    )
    bucket = F.floor(day / F.lit(period_days)).cast("long")
    ev = events.select(F.col(user_col).alias("__u"), bucket.alias("__p"))
    active = ev.distinct()
    first = active.groupBy("__u").agg(F.min("__p").alias("__cohort"))
    return (
        active.join(first, "__u")
        .groupBy(
            F.col("__cohort").alias("cohort_period"),
            (F.col("__p") - F.col("__cohort")).alias("period_offset"),
        )
        .agg(F.countDistinct("__u").alias("n_users"))
    )


def time_bucket_gapfill(
    events: DataFrame,
    bucket_seconds: int,
    group_cols: list[str],
    value_col: str = "value",
    ts_col: str = "ts",
    fill: str = "zero",
) -> DataFrame:
    """TimescaleDB's ``time_bucket_gapfill``: per group, a CONTINUOUS
    bucket series over the data's global time range, with empty buckets
    synthesized — ``fill="zero"`` (counts 0 / sum NULL->0) or
    ``fill="locf"`` (last observation carried forward).

    Returns (group_cols..., bucket_start epoch seconds, n_events, agg_value).

    Plan: one aggregation of the real data by (group, bucket); the global
    bucket range is a 2-value driver fetch; the dense grid is
    groups x sequence-explode (JVM, proportional to OUTPUT size, not input);
    a left join pins observations onto the grid and a window carries
    values forward for locf. Grid size = groups x buckets — the chart/
    export shape, inherently small relative to the events that fed it.
    """
    if fill not in ("zero", "locf"):
        raise ValueError(f"fill must be 'zero' or 'locf', got {fill!r}")
    b = (
        F.floor(
            F.col(ts_col).cast("timestamp").cast("double") / F.lit(bucket_seconds)
        ).cast("long")
        * bucket_seconds
    )
    agg = (
        events.select(*group_cols, b.alias("bucket_start"), F.col(value_col))
        .groupBy(*group_cols, "bucket_start")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 4).alias("agg_value"),
        )
    )
    lo, hi = agg.agg(F.min("bucket_start"), F.max("bucket_start")).collect()[0]
    if lo is None:
        return agg
    grid = (
        events.select(*group_cols)
        .distinct()
        .withColumn(
            "bucket_start",
            F.explode(
                F.sequence(
                    F.lit(int(lo)).cast("long"),
                    F.lit(int(hi)).cast("long"),
                    F.lit(int(bucket_seconds)).cast("long"),
                )
            ),
        )
    )
    out = grid.join(agg, [*group_cols, "bucket_start"], "left")
    if fill == "zero":
        return out.select(
            *group_cols,
            "bucket_start",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("agg_value", F.lit(0.0)).alias("agg_value"),
        )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return out.select(
        *group_cols,
        "bucket_start",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.last("agg_value", ignorenulls=True).over(w).alias("agg_value"),
    )


def attribution_join(
    clicks: DataFrame,
    conversions: DataFrame,
    key: str = "user_id",
    left_id: str = "event_id",
    right_id: str = "event_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_lag: str = "30 minutes",
) -> DataFrame:
    """Interval attribution join: every (click, conversion) pair for the
    same key where the conversion lands in ``[click_ts, click_ts +
    max_lag]`` — the ad-attribution / cause-effect pairing. Returns
    ``(click_id, conversion_id, key, click_ts, conversion_ts, lag_us)``.

    An equi-join on the key carries the interval predicate as a join-level
    filter, so Spark plans one hash shuffle per side (no O(n*m) interval
    explosion, no broadcast of either fact table). The identical builder
    works on streaming inputs: with watermarks on both sides the time-range
    condition is exactly what Spark's stream-stream join requires to bound
    state (see streaming/windows.stream_attribution_join).
    """
    c = clicks.select(
        F.col(left_id).alias("click_id"),
        F.col(key).alias(key),
        F.col(left_ts).alias("click_ts"),
    )
    v = conversions.select(
        F.col(right_id).alias("conversion_id"),
        F.col(key).alias(f"__r_{key}"),
        F.col(right_ts).alias("conversion_ts"),
    )
    cond = (
        (c[key] == v[f"__r_{key}"])
        & (v["conversion_ts"] >= c["click_ts"])
        & (v["conversion_ts"] <= c["click_ts"] + F.expr(f"INTERVAL {max_lag}"))
    )
    return (
        c.join(v, cond)
        .drop(f"__r_{key}")
        .withColumn(
            "lag_us",
            F.unix_micros(F.col("conversion_ts").cast("timestamp"))
            - F.unix_micros(F.col("click_ts").cast("timestamp")),
        )
    )


def rolling_zscore(
    events: DataFrame,
    bucket_seconds: int = 3600,
    group_cols: list[str] | None = None,
    window_buckets: int = 24,
    ts_col: str = "ts",
) -> DataFrame:
    """Volume anomaly detection: per (group, time bucket) event counts
    scored against the trailing ``window_buckets`` observed buckets —
    z = (n - mean) / std over a ROWS frame ending one bucket earlier
    (the scored bucket never contaminates its own baseline). ``z`` is
    NULL until a full baseline window exists or when the baseline has
    zero variance.

    Scale + determinism notes: one hash aggregate to buckets (map-side
    combined — the shuffle carries buckets, not events), then a
    group-partitioned window whose state is ``window_buckets`` rows.
    Mean and variance are computed from sum / sum-of-squares of integer
    counts, which are EXACT in doubles — no float-association drift —
    so any SQL engine replays z bit-for-bit (the driver oracle does).
    """
    groups = [F.col(c) for c in (group_cols or [])]
    bucket = (
        F.floor(F.unix_timestamp(F.col(ts_col).cast("timestamp")) / bucket_seconds)
        .cast("long") * bucket_seconds
    ).alias("bucket_start")
    agg = events.select(*groups, bucket).groupBy(
        *(groups + [F.col("bucket_start")])
    ).agg(F.count(F.lit(1)).alias("n_events"))

    w = (
        Window.partitionBy(*groups)
        .orderBy(F.col("bucket_start"))
        .rowsBetween(-window_buckets, -1)
    )
    s1 = F.sum("n_events").over(w)
    s2 = F.sum(F.col("n_events") * F.col("n_events")).over(w)
    cnt = F.count("n_events").over(w)
    mean = s1 / cnt
    var = (s2 - (s1 * s1) / cnt) / (cnt - 1)
    z = F.when(
        (cnt >= window_buckets) & (var > 0),
        F.round((F.col("n_events") - mean) / F.sqrt(var), 6),
    )
    return agg.withColumn("z", z)
