"""Similarity search over an embedding column (``array<float>``).

Two paths, as a 100 TB design requires:

- **brute-force cosine top-k** — the correctness baseline. One projection
  (per-row dot products, JVM codegen via higher-order functions) + a top-k
  sort. No shuffle except the final k-row ordering, which Spark executes
  as a TakeOrderedAndProject (per-partition heaps, driver merge of k rows).
- **sign-LSH bucketed** — the scale path: docs hash to 2^b buckets by the
  sign pattern of their leading components; a query probes only its own
  bucket (optionally neighboring buckets), turning a full scan into a
  1/2^b partition-pruned scan when the bucket is a partition/sort key.

All arithmetic is double-precision with left-to-right accumulation so a
DuckDB oracle matches bit-for-bit (rounded to 6 decimals in outputs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    df: DataFrame,
    query_vector: list[float],
    k: int = 20,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector."""
    q = F.array(*[F.lit(float(v)) for v in query_vector])
    emb = _to_double(F.col(vec_col))
    scored = df.select(
        F.col(id_col), F.round(cosine(emb, q), 6).alias("cos_sim")
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc()).limit(k)


def sign_lsh_bucket(vec_col: str = "embedding", n_bits: int = 8) -> Column:
    """Bucket id: '0'/'1' sign pattern of the first ``n_bits`` components
    (axis-aligned hyperplanes — deterministic, oracle-friendly; swap in a
    seeded random rotation for production skew resistance)."""
    return F.concat(
        *[
            F.when(F.element_at(F.col(vec_col), i + 1) >= 0, F.lit("1")).otherwise(
                F.lit("0")
            )
            for i in range(n_bits)
        ]
    )


def lsh_topk(
    df: DataFrame,
    query_vector: list[float],
    k: int = 20,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_bits: int = 8,
) -> DataFrame:
    """ANN: restrict the cosine scan to the query's sign-LSH bucket.
    At scale the bucket is a partition key, so this prunes ~(1 - 2^-b) of
    the data before any arithmetic runs."""
    qbits = "".join("1" if float(v) >= 0 else "0" for v in query_vector[:n_bits])
    bucketed = df.filter(sign_lsh_bucket(vec_col, n_bits) == qbits)
    return cosine_topk(bucketed, query_vector, k, vec_col, id_col)


def pairwise_cosine_above(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_bits: int = 8,
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine >= threshold, evaluated only
    within sign-LSH buckets (bounded join fan-out; the full O(n²) pairwise
    comparison never materializes)."""
    with_bucket = df.select(
        F.col(id_col),
        _to_double(F.col(vec_col)).alias("__v"),
        sign_lsh_bucket(vec_col, n_bits).alias("__bucket"),
    )
    a = with_bucket.alias("a")
    b = with_bucket.alias("b")
    return (
        a.join(b, "__bucket")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(cosine(F.col("a.__v"), F.col("b.__v")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
