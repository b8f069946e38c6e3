"""DML round-trip queries: the engine's insert/upsert/delete/update verified
end-to-end through the warehouse table format, with the final table state
expressed as plain SQL over the source parquet for the oracle.

Timestamps (created_at/modified_at) are nondeterministic and excluded from
the returned columns.
"""

from __future__ import annotations

import tempfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from xcube_geodb_spark.client import GeoDBSparkClient
from xcube_geodb_spark.suite.util import load


def _nation_pdf(spark: SparkSession, sf_dir: str) -> pd.DataFrame:
    pdf = (
        load(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .toPandas()
        .sort_values("n_nationkey")
        .reset_index(drop=True)
    )
    pdf["geometry"] = [f"POINT ({k} {k})" for k in pdf["n_nationkey"]]
    return pdf


def _fresh_client(spark: SparkSession) -> GeoDBSparkClient:
    return GeoDBSparkClient(
        spark, warehouse=tempfile.mkdtemp(prefix="geodb_dml_"), user="driver"
    )


def dml_delete_update_roundtrip(spark, sf_dir) -> DataFrame:
    """create -> insert -> delete (grammar filter) -> update (SET+filter) ->
    scan; exercises the full mutable-table path on immutable parquet."""
    c = _fresh_client(spark)
    c.create_collection(
        "nat", {"n_nationkey": "int", "n_name": "text", "n_regionkey": "int"}
    )
    c.insert_into_collection("nat", _nation_pdf(spark, sf_dir))
    c.delete_from_collection("nat", "n_regionkey=eq.2")
    c.update_collection("nat", {"n_name": "REDACTED"}, "n_regionkey=eq.1")
    return c.catalog.load_df("nat", "driver").select(
        "n_nationkey", "n_name", "n_regionkey"
    )


def dml_upsert_roundtrip(spark, sf_dir) -> DataFrame:
    """insert then upsert-by-id (merge-duplicates parity) + one new row."""
    c = _fresh_client(spark)
    c.create_collection(
        "nat", {"n_nationkey": "int", "n_name": "text", "n_regionkey": "int"}
    )
    base = _nation_pdf(spark, sf_dir)
    c.insert_into_collection("nat", base)
    # ids are dense 1..N in insertion order -> id = n_nationkey + 1
    up = base[base["n_nationkey"] < 5].copy()
    up["id"] = up["n_nationkey"] + 1
    up["n_name"] = up["n_name"] + "_X"
    new_row = pd.DataFrame(
        {
            "id": [None],
            "n_nationkey": [999],
            "n_name": ["NEWLAND"],
            "n_regionkey": [9],
            "geometry": ["POINT (999 999)"],
        }
    )
    c.insert_into_collection(
        "nat", pd.concat([up, new_row], ignore_index=True), upsert=True
    )
    return c.catalog.load_df("nat", "driver").select("n_nationkey", "n_name")


def dml_compact_roundtrip(spark, sf_dir) -> DataFrame:
    """Fragmented ingest (one commit per region -> many small files) ->
    optimize (small-file compaction, re-clustered) -> vacuum -> scan.
    Content must be bit-identical across maintenance; the oracle is the
    plain source table."""
    c = _fresh_client(spark)
    c.create_collection(
        "natc", {"n_nationkey": "int", "n_name": "text", "n_regionkey": "int"}
    )
    base = _nation_pdf(spark, sf_dir)
    for rk in sorted(base["n_regionkey"].unique()):
        c.insert_into_collection("natc", base[base["n_regionkey"] == rk])
    n_before = len(c.catalog.meta("natc", "driver").files)
    stats = c.optimize_collection("natc")
    assert stats["files_after"] < n_before, "compaction did not reduce files"
    c.vacuum_collection("natc", older_than_seconds=0.0)
    return c.catalog.load_df("natc", "driver").select(
        "n_nationkey", "n_name", "n_regionkey"
    )


def dml_time_travel_roundtrip(spark, sf_dir) -> DataFrame:
    """insert (v1) -> destructive delete (v2) -> verify time-travel read of
    v1 -> metadata-only restore to v1 -> scan. The oracle is the full
    source table: both the historical read and the restored state must be
    bit-identical to pre-delete."""
    c = _fresh_client(spark)
    c.create_collection(
        "natt", {"n_nationkey": "int", "n_name": "text", "n_regionkey": "int"}
    )
    c.insert_into_collection("natt", _nation_pdf(spark, sf_dir))  # v1
    c.delete_from_collection("natt", "n_regionkey=eq.2")  # v2
    at_v1 = c.catalog.load_df("natt", "driver", version=1)
    assert c.catalog.load_df("natt", "driver").count() < at_v1.count()
    c.restore_collection("natt", 1)  # v3, metadata-only
    return c.catalog.load_df("natt", "driver").select(
        "n_nationkey", "n_name", "n_regionkey"
    )


def dml_changes_feed(spark, sf_dir) -> DataFrame:
    """Change data feed across DML history: insert (v1) -> delete region 2
    (v2) -> redact region-1 names (v3); the diff v1->v3 must contain
    exactly the deleted rows (pre-image) and updated rows (post-image) —
    rows rewritten by DML with unchanged payloads must NOT appear."""
    from xcube_geodb_spark.operators.changes import collection_changes

    c = _fresh_client(spark)
    c.create_collection(
        "natf", {"n_nationkey": "int", "n_name": "text", "n_regionkey": "int"}
    )
    c.insert_into_collection("natf", _nation_pdf(spark, sf_dir))  # v1
    c.delete_from_collection("natf", "n_regionkey=eq.2")  # v2
    c.update_collection("natf", {"n_name": "REDACTED"}, "n_regionkey=eq.1")  # v3
    return collection_changes(c.catalog, "natf", "driver", 1, 3).select(
        "n_nationkey", "n_name", "_change_type"
    )


def stream_cdc_feed(spark, sf_dir) -> DataFrame:
    """Streaming CDC end-to-end: the same DML history as dml_changes_feed,
    consumed through readStream on the geodb_versions source — every commit
    surfaces as its own per-version diff tagged _commit_version
    (streaming/cdc.py). The oracle replays the three commits in SQL."""
    import tempfile as _tf

    from xcube_geodb_spark.streaming.cdc import stream_collection_changes

    c = _fresh_client(spark)
    c.create_collection(
        "nats", {"n_nationkey": "int", "n_name": "text", "n_regionkey": "int"}
    )
    c.insert_into_collection("nats", _nation_pdf(spark, sf_dir))  # v1
    c.delete_from_collection("nats", "n_regionkey=eq.2")  # v2
    c.update_collection("nats", {"n_name": "REDACTED"}, "n_regionkey=eq.1")  # v3

    out = _tf.mkdtemp(prefix="geodb_cdc_out_")

    def _feed(df: DataFrame, batch_id: int) -> None:
        df.select(
            "n_nationkey", "n_name", "_change_type", "_commit_version"
        ).write.mode("append").parquet(out)

    q = stream_collection_changes(
        c.catalog,
        "nats",
        "driver",
        _feed,
        checkpoint_dir=_tf.mkdtemp(prefix="geodb_cdc_ck_"),
        trigger={"availableNow": True},
    )
    q.awaitTermination(300)
    return spark.read.parquet(out)


def dml_profile_stats(spark, sf_dir) -> DataFrame:
    """ANALYZE-style per-column profile (operators/stats.profile_collection)
    through the table format: ingest nation with a nullable derived column,
    profile with exact=True (one aggregation pass), and return the stats
    table; the oracle recomputes every statistic in SQL. The zero-IO
    manifest path is covered by test_dml_pruning (joblessness can't be
    hash-checked)."""
    from pyspark.sql import functions as F

    from xcube_geodb_spark.operators.stats import profile_collection

    c = _fresh_client(spark)
    c.create_collection(
        "natp", {"n_nationkey": "int", "n_name": "text", "score": "float"}
    )
    from xcube_geodb_spark.suite.geo import _point_wkb

    nat = load(spark, sf_dir, "nation").select(
        "n_nationkey",
        "n_name",
        F.when(
            F.col("n_nationkey") % 3 != 0, F.col("n_nationkey").cast("double")
        ).alias("score"),
        _point_wkb(
            F.col("n_nationkey").cast("double"),
            F.col("n_nationkey").cast("double"),
        ).alias("geometry"),
    )
    c.insert_into_collection("natp", nat)
    prof = profile_collection(
        c.catalog, "natp", "driver", exact=True,
        columns=["n_nationkey", "score"],
    )
    prof = prof.rename(columns={"column": "col_name"})
    prof["vmin"] = prof["vmin"].astype(float)
    prof["vmax"] = prof["vmax"].astype(float)
    schema = (
        "col_name string, row_count long, n_nulls long, "
        "vmin double, vmax double, n_distinct long"
    )
    return spark.createDataFrame(prof, schema=schema)


DML_QUERIES = {
    "dml_delete_update_roundtrip": dml_delete_update_roundtrip,
    "dml_upsert_roundtrip": dml_upsert_roundtrip,
    "dml_compact_roundtrip": dml_compact_roundtrip,
    "dml_time_travel_roundtrip": dml_time_travel_roundtrip,
    "dml_changes_feed": dml_changes_feed,
    "stream_cdc_feed": stream_cdc_feed,
    "dml_profile_stats": dml_profile_stats,
}

# the engine maps the reference's "int" property type to bigint
# (catalog.pg_type_to_spark); casts keep oracle dtypes aligned
DML_ORACLES = {
    "dml_delete_update_roundtrip": """
        SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
               CASE WHEN n_regionkey = 1 THEN 'REDACTED' ELSE n_name END AS n_name,
               CAST(n_regionkey AS BIGINT) AS n_regionkey
        FROM nation WHERE n_regionkey <> 2
    """,
    "dml_upsert_roundtrip": """
        SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
               CASE WHEN n_nationkey < 5 THEN n_name || '_X' ELSE n_name END AS n_name
        FROM nation
        UNION ALL
        SELECT 999, 'NEWLAND'
    """,
    "dml_compact_roundtrip": """
        SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
               CAST(n_regionkey AS BIGINT) AS n_regionkey
        FROM nation
    """,
    "dml_time_travel_roundtrip": """
        SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
               CAST(n_regionkey AS BIGINT) AS n_regionkey
        FROM nation
    """,
    "dml_changes_feed": """
        SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
               'REDACTED' AS n_name, 'update' AS _change_type
        FROM nation WHERE n_regionkey = 1
        UNION ALL
        SELECT CAST(n_nationkey AS BIGINT), n_name, 'delete'
        FROM nation WHERE n_regionkey = 2
    """,
    "dml_profile_stats": """
        SELECT 'n_nationkey' AS col_name,
               count(*) AS row_count,
               CAST(sum(CASE WHEN n_nationkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_nulls,
               CAST(min(n_nationkey) AS DOUBLE) AS vmin,
               CAST(max(n_nationkey) AS DOUBLE) AS vmax,
               CAST(count(DISTINCT n_nationkey) AS BIGINT) AS n_distinct
        FROM nation
        UNION ALL
        SELECT 'score',
               count(*),
               CAST(sum(CASE WHEN n_nationkey % 3 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT),
               CAST(min(CASE WHEN n_nationkey % 3 <> 0 THEN n_nationkey END)
                    AS DOUBLE),
               CAST(max(CASE WHEN n_nationkey % 3 <> 0 THEN n_nationkey END)
                    AS DOUBLE),
               CAST(count(DISTINCT CASE WHEN n_nationkey % 3 <> 0
                                        THEN n_nationkey END) AS BIGINT)
        FROM nation
    """,
    # per-version diffs: v1 inserts everything, v2 deletes region 2
    # (pre-image), v3 redacts region 1 (post-image)
    "stream_cdc_feed": """
        SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
               'insert' AS _change_type, CAST(1 AS INT) AS _commit_version
        FROM nation
        UNION ALL
        SELECT CAST(n_nationkey AS BIGINT), n_name, 'delete', CAST(2 AS INT)
        FROM nation WHERE n_regionkey = 2
        UNION ALL
        SELECT CAST(n_nationkey AS BIGINT), 'REDACTED', 'update', CAST(3 AS INT)
        FROM nation WHERE n_regionkey = 1
    """,
}
