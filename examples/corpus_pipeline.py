#!/usr/bin/env python
"""Training-corpus preparation walkthrough: the LLM-pipeline operators
end to end on the synthetic documents table.

Stages (each one a first-class, oracle-gated engine operator):
dedup (exact -> near -> line-level -> span detection) -> benchmark
decontamination -> quality profile + percentile fences -> stratified
sampling -> deterministic split -> token-budget packing -> BM25 search
(direct scan AND the at-rest inverted index, verified identical).

Run: python examples/corpus_pipeline.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from xcube_geodb_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="corpus_pipeline", master="local[4]",
                      shuffle_partitions=8)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n0 = docs.count()
    print(f"corpus: {n0} docs")

    # -- dedup: exact fingerprints, then LSH near-dup pipeline --------------
    from xcube_geodb_spark.functions.dedup import (
        dedup_pipeline,
        duplicate_spans,
        line_dedup,
    )

    kept = dedup_pipeline(docs.select("doc_id", "text"), jaccard_threshold=0.5)
    print("after near-dedup:", kept.count())

    # line-level boilerplate removal (docs here have no newlines; in a real
    # crawl this strips repeated headers/footers) and shared-passage audit
    lines = line_dedup(kept.withColumn("text", F.col("text")))
    spans = duplicate_spans(kept, n=20, stride=10)
    print("docs after line dedup:", lines.count(),
          "| flagged span occurrences:", spans.count())

    # -- benchmark decontamination ------------------------------------------
    from xcube_geodb_spark.functions.contamination import decontaminate

    bench = docs.orderBy("doc_id").limit(5).select(
        F.col("doc_id").alias("bench_id"), F.col("text").alias("bench_text")
    )
    clean = decontaminate(
        kept, bench.select(F.col("bench_id").alias("doc_id"),
                           F.col("bench_text").alias("text"))
    )
    print("after decontamination:", clean.count())

    # -- quality scoring + percentile fences --------------------------------
    from xcube_geodb_spark.functions.text import with_profile
    from xcube_geodb_spark.operators.stats import quantiles_column

    profiled = with_profile(clean.select("doc_id", "text"))
    qs = quantiles_column(profiled, "quality", qs=(0.1, 0.9), bins=256,
                          bounds=(0.0, 1.0)).collect()
    lo = min(r["est"] for r in qs)
    filtered = profiled.filter(F.col("quality") >= lo).select("doc_id", "text")
    print(f"quality fence p10={lo:.4f}; kept {filtered.count()}")

    # -- deterministic split + packing --------------------------------------
    from xcube_geodb_spark.functions.sampling import (
        pack_by_token_budget,
        train_val_test_split,
    )

    split = train_val_test_split(filtered, "doc_id", 0.1, 0.1)
    print("split sizes:",
          {r["split"]: r["n"] for r in
           split.groupBy("split").agg(F.count("*").alias("n")).collect()})
    meta = docs.select("doc_id", "lang", "n_chars")
    train = (
        split.filter(F.col("split") == "train")
        .join(meta, "doc_id")
        .withColumn("toks", F.ceil(F.col("n_chars") / 4).cast("long"))
    )
    packed = pack_by_token_budget(train, "toks", "doc_id", budget=2048,
                                  partition_cols=["lang"])
    print("train packs:",
          packed.agg(F.countDistinct("pack_id")).collect()[0][0])

    # -- ranked retrieval over the finished corpus --------------------------
    from xcube_geodb_spark.functions.retrieval import bm25_topk

    hits = bm25_topk(filtered, ["spark", "window", "merge"], k=3).collect()
    print("bm25 top-3:", [int(r["doc_id"]) for r in hits])

    # the same query over the AT-REST inverted index (what a 100 TB corpus
    # would serve from): postings rows + corpus scalars, bit-identical
    from xcube_geodb_spark.functions.retrieval import (
        bm25_topk_from_index,
        corpus_totals,
        inverted_index,
    )

    n, dl = corpus_totals(filtered)
    idx_hits = bm25_topk_from_index(
        inverted_index(filtered), n, dl, ["spark", "window", "merge"], k=3
    ).collect()
    assert [int(r["doc_id"]) for r in idx_hits] == [
        int(r["doc_id"]) for r in hits
    ]
    print("bm25 via inverted index: identical top-3")
    spark.stop()
    print("corpus pipeline complete")


if __name__ == "__main__":
    main()
