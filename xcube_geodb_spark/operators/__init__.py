"""Engine operators re-expressing the reference's query surface on Spark.

- :mod:`.scan`    — ``get_collection`` (PostgREST grammar), ``head_collection``,
                    ``get_collection_pg`` (raw-SQL passthrough)
- :mod:`.spatial` — ``get_collection_by_bbox``, ``count_collection_by_bbox``,
                    extent (exact + footer-estimate), geometry types
- :mod:`.dml`     — insert/upsert/delete/update with trigger parity
- :mod:`.ids`     — dense sequential id assignment without a global shuffle
- :mod:`.stats`   — parquet-footer statistics (row counts, min/max) for the
                    reference's "estimated" fast paths
- :mod:`.pruning` — footer-stat file pruning shared by DML and probes
- :mod:`.ann`     — ANN probes over the bucket-clustered at-rest layout
- :mod:`.maintenance` — small-file compaction + orphan/snapshot vacuum
- :mod:`.changes` — change data feed between time-travel snapshots
"""
