"""Large-scale data-pipeline operators (engine extensions beyond the
reference's surface — SURVEY.md §2.11, BASELINE.json north star).

All hot paths are built from JVM-side ``pyspark.sql.functions`` expressions
(whole-stage codegen, no Python in the loop) and are deliberately designed
to be reproducible in ANSI SQL so a DuckDB oracle can verify them:
hashing uses ``md5`` (identical across engines), arithmetic is IEEE-double
with fixed evaluation order.

- :mod:`.text`       — tokenization, quality scoring, language id,
                       fingerprinting
- :mod:`.dedup`      — exact, MinHash+LSH, SimHash, n-gram Jaccard
- :mod:`.similarity` — brute-force cosine top-k, sign-LSH bucketed ANN
- :mod:`.multimodal` — opaque binary columns + Arrow-batched decode stubs
"""
