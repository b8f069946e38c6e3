"""Train/test contamination detection: n-gram overlap between a training
corpus and a benchmark (eval) set, and the matching decontamination filter.

The standard LLM-pipeline decontamination step: a training document is
contaminated when it shares at least one length-``n`` token n-gram with
any benchmark document (published pipelines use n around 8-13; the
mechanism is identical). This engine expresses it Spark-first:

- both sides shingle with the same codegen'd n-gram plan the dedup
  family uses (`dedup.shingle_table`: split + array transform, no UDF);
- the benchmark side — always orders of magnitude smaller than the
  corpus — is **broadcast**, so the corpus n-gram stream joins against an
  in-memory hash set with NO shuffle of corpus data;
- only matched rows (a tiny fraction) reach the per-document aggregation,
  whose shuffle is bounded by the contamination volume, not corpus size.

At 100 TB the corpus is read once, streamed through a map-side hash
probe, and nothing corpus-sized is ever shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xcube_geodb_spark.functions.dedup import shingle_table


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Per contaminated corpus document: (id, n_hits, n_bench_docs).

    ``n_hits`` counts DISTINCT shared n-grams, ``n_bench_docs`` the
    distinct benchmark documents implicated. Documents shorter than ``n``
    tokens fall back to whole-text comparison (mirroring
    ``shingle_table``), so short exact leaks are still caught.
    """
    c = shingle_table(corpus, text_col, id_col, n).select(
        F.col(id_col), F.explode("sh").alias("gram")
    )
    b = shingle_table(benchmark, text_col, id_col, n).select(
        F.col(id_col).alias("__bench_id"), F.explode("sh").alias("gram")
    )
    return (
        c.join(F.broadcast(b), "gram")
        .groupBy(id_col)
        .agg(
            F.countDistinct("gram").alias("n_hits"),
            F.countDistinct("__bench_id").alias("n_bench_docs"),
        )
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """The corpus minus documents with >= ``min_hits`` shared n-grams —
    a broadcast anti-join on the contaminated id set, so the corpus again
    streams through without shuffling."""
    bad = (
        contamination_report(corpus, benchmark, text_col, id_col, n)
        .filter(F.col("n_hits") >= F.lit(min_hits))
        .select(id_col)
    )
    return corpus.join(F.broadcast(bad), id_col, "left_anti")
