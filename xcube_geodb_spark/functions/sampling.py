"""Deterministic sampling / splitting / packing for training-data pipelines.

Random sampling (``df.sample``) is irreproducible across engines, Spark
versions, and partition layouts — useless for a 100 TB corpus where the
train/val/test membership of every document must be auditable years later.
These operators use content hashing instead (the same md5-as-uniform trick
the dedup family uses), so membership is a pure function of the row: any
engine can replay the split, adding data never reshuffles old assignments,
and the driver gate hash-matches every operator against a DuckDB oracle.

All pure Column algebra — zero Python on the data path, no shuffle for
split/sample (a narrow projection+filter), one bounded window shuffle for
packing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hash_bucket",
    "hash_sample",
    "train_val_test_split",
    "stratified_sample",
    "pack_by_token_budget",
    "chunk_by_tokens",
    "cap_per_group",
    "cap_tokens_per_group",
    "deterministic_shuffle",
    "hash_sample_weighted",
    "mix_corpora",
]

_BUCKETS = 10_000


def hash_bucket(key: Column, seed: str = "") -> Column:
    """Uniform bucket in [0, 10000) from the md5 of ``seed || key``.

    Stable under data growth and engine choice (DuckDB replay:
    ``md5(seed || key)``-prefix arithmetic, same as the dedup hashes).
    Different ``seed`` strings give independent assignments — re-splitting
    with a new seed is a new independent draw, not a shifted one.
    """
    h = F.md5(F.concat(F.lit(seed), key.cast("string")))
    # first 8 hex chars -> 32-bit uniform int -> bucket
    return F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(_BUCKETS))


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, seed: str = ""
) -> DataFrame:
    """Deterministic ``fraction`` sample: keeps rows whose hash bucket
    falls below ``fraction * 10000`` (resolution 0.01%). A row's membership
    never changes as the table grows — incremental pipelines resample
    nothing."""
    cut = int(round(fraction * _BUCKETS))
    return df.filter(hash_bucket(F.col(key_col), seed) < cut)


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict,
    default_fraction: float = 0.0,
    seed: str = "",
) -> DataFrame:
    """Deterministic per-stratum sampling: each stratum keeps its own
    hash-bucket cutoff (e.g. ``{"en": 0.1, "de": 1.0}`` for
    language-balanced corpus construction). The cutoff lookup is a
    codegen'd CASE chain — no join, no shuffle, one scan; membership is
    per-row auditable and stable under growth like :func:`hash_sample`.
    Strata absent from ``fractions`` fall back to ``default_fraction``.
    """
    cut = F.lit(int(round(default_fraction * _BUCKETS)))
    for value, frac in sorted(fractions.items()):
        cut = F.when(
            F.col(strata_col) == F.lit(value),
            F.lit(int(round(frac * _BUCKETS))),
        ).otherwise(cut)
    return df.filter(hash_bucket(F.col(key_col), seed) < cut)


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    val_fraction: float = 0.01,
    test_fraction: float = 0.01,
    seed: str = "",
) -> DataFrame:
    """Adds a ``split`` column (train/val/test) from contiguous hash-bucket
    ranges: [0, val) -> val, [val, val+test) -> test, rest -> train.
    Disjoint and exhaustive by construction; auditable per row."""
    b = hash_bucket(F.col(key_col), seed)
    val_cut = int(round(val_fraction * _BUCKETS))
    test_cut = val_cut + int(round(test_fraction * _BUCKETS))
    return df.withColumn(
        "split",
        F.when(b < val_cut, F.lit("val"))
        .when(b < test_cut, F.lit("test"))
        .otherwise(F.lit("train")),
    )


def chunk_by_tokens(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the standard
    long-document preparation for a fixed-context trainer. Fan-out is pure
    Column algebra (split -> sequence -> explode -> slice -> join): no
    Python on the data path, no shuffle, output rows are
    ``(id, chunk_idx, chunk_text)``.

    Chunk ``i`` covers tokens ``[i*stride, i*stride + chunk_size)`` with
    ``stride = chunk_size - overlap``; the last chunk may be short, and a
    document shorter than one chunk yields exactly one chunk. Whitespace
    tokenization preserves the original bytes, so ``array_join`` re-joins
    chunks faithfully and any SQL engine replays them (DuckDB:
    ``list_slice`` over ``string_split``)."""
    if overlap >= chunk_size:
        raise ValueError("overlap must be smaller than chunk_size")
    stride = chunk_size - overlap
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    # number of windows starting at 0, stride, 2*stride, ... covering n
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("long"), F.lit(1)
    )
    staged = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias(
            "chunk_idx"
        ),
    )
    chunk = F.array_join(
        F.slice(F.col("__toks"), F.col("chunk_idx") * stride + 1, chunk_size),
        " ",
    )
    return staged.select(
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        chunk.alias("chunk_text"),
    )


def _deterministic_range_pid(
    df: DataFrame, order_col: str, n_buckets: int | None = None
) -> tuple[DataFrame, int]:
    """Add ``__pid``: a range-bucket id in order-column order that is a
    PURE FUNCTION of the row. ``repartitionByRange`` cannot serve here:
    its range bounds come from a sample seeded by the execution's RDD id,
    so two jobs over the same frame draw DIFFERENT bounds — any plan that
    collects per-partition summaries in one job and uses them in another
    mis-assigns rows near every boundary (this bug shipped in r5's
    deterministic_shuffle; caught by the permutation test). Boundaries
    here are quantiles of a fixed-seed sample, baked into the plan as
    literals, so every job agrees on every row's bucket by construction.

    Returns (frame + __pid, bucket count). Two tiny driver-side jobs
    (count + boundary-sample collect of ~40 keys/bucket); null order keys
    bucket to 0, matching Spark's nulls-first ascending sort."""
    spark = df.sparkSession
    k = max(n_buckets or spark.sparkContext.defaultParallelism, 1)
    n = df.count()
    if n == 0:
        return df.withColumn("__pid", F.lit(0)), 1
    frac = min(1.0, (40.0 * k) / n)
    keys = sorted(
        r[0]
        for r in df.select(order_col).sample(False, frac, seed=7).collect()
        if r[0] is not None
    )
    bounds = (
        [keys[int(i * len(keys) / k)] for i in range(1, k)] if keys else []
    )
    if not bounds:
        return df.withColumn("__pid", F.lit(0)), 1
    arr = F.array(*[F.lit(b) for b in bounds])
    # bucket = number of boundaries strictly below the key: equal keys
    # always share a bucket (RANGE-frame peers never split)
    pid = F.size(F.filter(arr, lambda b: b < F.col(order_col)))
    return df.withColumn("__pid", pid), len(bounds) + 1


def pack_by_token_budget(
    df: DataFrame,
    token_col: str,
    order_col: str,
    budget: int,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Assign documents to packed training sequences: walk rows in
    ``order_col`` order, cumulative-sum ``token_col``, and cut a new pack
    every time the running total crosses ``budget`` — pack id =
    ``floor((cumsum - tokens) / budget)`` (each pack holds consecutive
    docs whose PRECEDING total fits the budget; a document longer than the
    budget gets a pack of its own rather than being dropped).

    Deterministic given the ordering column, and SQL-replayable (the
    DuckDB oracle is the plain window cumsum — both paths below compute
    the identical value). With ``partition_cols`` the cumsum windows per
    group (e.g. per language): one hash shuffle, window state bounded by
    the group. WITHOUT them, a naive global window would serialize the
    corpus into a single task, so the global path runs the same two-phase
    plan as :func:`deterministic_shuffle` instead: range-partition on the
    order column, per-partition partial sums to the driver (one tiny row
    per partition), then local RANGE-frame cumsums plus broadcast prefix
    offsets — every phase parallel, driver state O(partitions). Tie
    semantics are preserved exactly (the default RANGE frame gives equal
    order keys a shared cumsum; the range partitioner never splits equal
    keys across partitions, so local windows see whole peer groups).
    Returns the input plus ``pack_id`` (long).
    """
    if partition_cols:
        w = Window.partitionBy(*[F.col(c) for c in partition_cols]).orderBy(
            F.col(order_col)
        )
        cum = F.sum(F.col(token_col)).over(w)
        return df.withColumn(
            "pack_id",
            F.floor((cum - F.col(token_col)) / F.lit(budget)).cast("long"),
        )
    staged, _k = _deterministic_range_pid(df, order_col)
    # per-bucket token sums -> prefix offsets: one tiny driver row per
    # bucket; safe as a separate job because __pid is a pure function of
    # the row (see _deterministic_range_pid)
    sums = {
        r["__pid"]: r["s"]
        for r in staged.groupBy("__pid")
        .agg(F.sum(F.col(token_col)).alias("s"))
        .collect()
    }
    offsets, acc = [], 0
    for pid in sorted(sums):
        offsets.append((pid, acc))
        acc += sums[pid] or 0
    off_df = F.broadcast(
        df.sparkSession.createDataFrame(
            offsets or [(0, 0)], "__pid int, __off long"
        )
    )
    local = Window.partitionBy("__pid").orderBy(F.col(order_col))
    cum = F.sum(F.col(token_col)).over(local) + F.col("__off")
    return (
        staged.join(off_df, "__pid")
        .withColumn(
            "pack_id",
            F.floor((cum - F.col(token_col)) / F.lit(budget)).cast("long"),
        )
        .drop("__pid", "__off")
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    max_rows: int,
    seed: str = "",
) -> DataFrame:
    """Keep at most ``max_rows`` rows per group — the per-domain cap of
    web-corpus curation (a handful of giant domains must not dominate the
    training mix). Which rows survive is decided by the md5 hash order of
    ``seed || key``, so the kept subset is a uniform, auditable,
    engine-replayable draw rather than whatever row order the scan
    produced, and re-running with more data keeps a stable preference
    order per group.

    Physically one hash shuffle on ``group_col`` + a per-group
    row_number; groups far above the cap are exactly the skewed keys the
    cap exists to shrink, and rank state per task is one counter, so the
    window does not accumulate memory. Returns the input rows that made
    the cut (original columns only).
    """
    if max_rows < 1:
        raise ValueError("max_rows must be >= 1")
    h = F.md5(F.concat(F.lit(seed), F.col(key_col).cast("string")))
    w = Window.partitionBy(F.col(group_col)).orderBy(h, F.col(key_col))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= max_rows)
        .drop("__rk")
    )


def cap_tokens_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    token_col: str,
    max_tokens: int,
    seed: str = "",
) -> DataFrame:
    """Keep rows per group until the group's TOKEN budget fills — the
    "at most N tokens per domain" step of training-mix curation
    (row-count caps over-sample domains with short documents;
    :func:`cap_per_group` is the row-count sibling). Rows fill the
    budget in md5(``seed || key``) order, so the kept subset is a
    uniform, auditable, engine-replayable draw; a row survives iff the
    tokens BEFORE it fit the budget (greedy fill, same convention as
    :func:`pack_by_token_budget`: the boundary row may overshoot, and a
    group's first row always survives — a single document larger than
    the whole budget is kept, not silently dropped).

    Physically one hash shuffle on ``group_col`` + a per-group ROWS-frame
    cumsum; window state per task is one running sum. ``key_col`` MUST
    identify rows uniquely within a group (it is the document id): the
    explicit ROWS frame means even pathological duplicate keys fill the
    budget one row at a time instead of becoming RANGE-frame peers that
    share a cumsum and could all overshoot together — but duplicate keys
    hash identically, their relative order inside the frame is
    execution-dependent, and if they carry different token counts the
    kept SET is too; the replayability guarantee above holds only for
    unique keys.
    Returns the input rows that made the cut (original columns only).
    """
    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")
    h = F.md5(F.concat(F.lit(seed), F.col(key_col).cast("string")))
    w = (
        Window.partitionBy(F.col(group_col))
        .orderBy(h, F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col)).over(w)
    return (
        df.withColumn("__cum", cum)
        .filter(F.col("__cum") - F.col(token_col) < max_tokens)
        .drop("__cum")
    )


def deterministic_shuffle(
    df: DataFrame, key_col: str, seed: str = "", num_partitions: int | None = None
) -> DataFrame:
    """Global reproducible shuffle: adds ``shuffle_pos`` (0-based long),
    the row's position in md5(``seed || key``) order. Training pipelines
    need corpus order randomized but *replayable* — the position of every
    document must be derivable years later from the seed alone.

    An unpartitioned ``row_number`` window would serialize the corpus into
    one task, so positions are assigned in two parallel phases instead:
    hash-range bucketing on the hash via :func:`_deterministic_range_pid`
    (uniform by construction, so buckets are balanced regardless of input
    skew; the bucket id is a pure function of the row, NOT
    ``repartitionByRange``, whose per-execution sampled bounds would
    desynchronize the count job from the rank job), then per-bucket local
    ranks plus broadcast prefix-sum offsets — the classic zipWithIndex
    plan expressed in DataFrame algebra. Only the bucket row counts touch
    the driver. A different ``seed`` yields an independent permutation.
    """
    h = F.md5(F.concat(F.lit(seed), F.col(key_col).cast("string")))
    staged, _k = _deterministic_range_pid(
        df.withColumn("__h", h), "__h", num_partitions
    )
    counts = {
        r["__pid"]: r["n"]
        for r in staged.groupBy("__pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    off_df = F.broadcast(
        df.sparkSession.createDataFrame(
            offsets or [(0, 0)], "__pid int, __off long"
        )
    )
    local = Window.partitionBy("__pid").orderBy(F.col("__h"), F.col(key_col))
    return (
        staged.withColumn("__rk", F.row_number().over(local))
        .join(off_df, "__pid")
        .withColumn(
            "shuffle_pos", (F.col("__off") + F.col("__rk") - F.lit(1)).cast("long")
        )
        .drop("__h", "__pid", "__rk", "__off")
    )


def hash_sample_weighted(
    df: DataFrame, key_col: str, weight_col: str, seed: str = ""
) -> DataFrame:
    """Per-row weighted deterministic sampling: row kept iff its hash
    bucket falls below ``weight * 10000``, where ``weight_col`` holds a
    per-row keep probability in [0, 1] (weights outside clamp). The
    quality-weighted downsampling step of corpus curation — high-quality
    documents keep with probability ~1, low-quality ones proportionally —
    with the same growth-stable, engine-replayable membership as
    :func:`hash_sample` (which is the constant-weight special case)."""
    cut = F.least(
        F.greatest(F.round(F.col(weight_col) * _BUCKETS, 0), F.lit(0.0)),
        F.lit(float(_BUCKETS)),
    )
    return df.filter(hash_bucket(F.col(key_col), seed) < cut)


def _global_cumsum_rows(
    df: DataFrame, order_cols: list[str], token_col: str
) -> DataFrame:
    """Adds ``__cum``: the global ROWS-frame running sum of ``token_col``
    in ``order_cols`` order, computed without a single-partition window —
    the same two-phase plan as :func:`deterministic_shuffle`: pure-
    function hash-range bucketing on the leading order column, per-bucket
    partial sums to the driver (one tiny row per bucket), then local
    windows plus broadcast prefix offsets. Equal leading-column values
    never split across buckets, so bucket-local ROWS cumsums + offsets
    equal the global cumsum exactly (ties within a bucket order by the
    remaining columns)."""
    staged, _k = _deterministic_range_pid(df, order_cols[0])
    sums = {
        r["__pid"]: r["s"]
        for r in staged.groupBy("__pid")
        .agg(F.sum(F.col(token_col)).alias("s"))
        .collect()
    }
    offsets, acc = [], 0
    for pid in sorted(sums):
        offsets.append((pid, acc))
        acc += sums[pid] or 0
    off_df = F.broadcast(
        df.sparkSession.createDataFrame(
            offsets or [(0, 0)], "__pid int, __off long"
        )
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col)).over(w) + F.col("__off")
    return (
        staged.join(off_df, "__pid")
        .withColumn("__cum", cum)
        .drop("__pid", "__off")
    )


def mix_corpora(
    sources: dict[str, DataFrame],
    weights: dict[str, float],
    total_tokens: int,
    key_col: str,
    token_col: str,
    seed: str = "",
    source_col: str = "mix_source",
) -> DataFrame:
    """Compose a TRAINING MIXTURE from multiple corpora: source ``i``
    contributes documents in ``md5(seed || name || key)`` order until its
    share ``floor(weight_i / sum(weights) * total_tokens)`` of the token
    budget fills — the "50% web, 30% books, 20% code" step of training-
    data curation, with the same greedy boundary convention as
    :func:`cap_tokens_per_group` (a row survives iff the tokens BEFORE it
    fit its source's budget, so each source's first document always
    survives and the boundary document may overshoot).

    Per source the running total is the two-phase parallel cumsum
    (:func:`_global_cumsum_rows` — no single-partition window), so every
    source scans and fills in parallel; the union is by column NAME and
    carries ``source_col``. ``key_col`` must be unique within each
    source (hash-order ties are execution-dependent otherwise, as in
    :func:`cap_tokens_per_group`). Deterministic given the seed —
    auditable and SQL-replayable years later."""
    if set(sources) != set(weights):
        raise ValueError("sources and weights must have identical keys")
    if not sources:
        raise ValueError("at least one source required")
    if any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be positive")
    if total_tokens < 1:
        raise ValueError("total_tokens must be >= 1")
    sum_w = float(sum(weights.values()))
    budgets = {
        name: int(total_tokens * weights[name] / sum_w) for name in sources
    }
    starved = sorted(n for n, b in budgets.items() if b < 1)
    if starved:
        # a floored budget of 0 would silently drop the whole source,
        # breaking the first-document-survives guarantee — fail loudly
        raise ValueError(
            f"total_tokens={total_tokens} gives source(s) {starved} a "
            "zero token budget; raise total_tokens or drop the source"
        )
    parts = []
    for name in sorted(sources):
        df = sources[name]
        budget = budgets[name]
        h = F.md5(
            F.concat(
                F.lit(seed), F.lit(name), F.col(key_col).cast("string")
            )
        )
        staged = _global_cumsum_rows(
            df.withColumn("__mixh", h), ["__mixh", key_col], token_col
        )
        parts.append(
            staged.filter(
                F.col("__cum") - F.col(token_col) < F.lit(budget)
            )
            .drop("__mixh", "__cum")
            .withColumn(source_col, F.lit(name))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
