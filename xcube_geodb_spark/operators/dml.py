"""DML operators: insert / upsert / delete / update.

Reference semantics being reproduced:

- ``insert_into_collection`` (``xcube_geodb/core/geodb.py:1427-1533``):
  lower-cases column names (:1502), drops the ``id`` column unless upserting
  (:1499-1500), attaches ``SRID=...;WKT`` geometries (:1401-1425), raises on
  CRS mismatch (:1466-1469). Upsert = merge on the ``id`` PK
  (``Prefer: resolution=merge-duplicates``, :1506).
- ``delete_from_collection`` (:1325-1354): PostgREST-grammar filter.
- ``update_collection`` (:1356-1398): SET values WHERE filter; ``id`` is
  removed from the SET map; the ``modified_at`` trigger
  (``geodb.sql:281-288``) stamps updated rows.

Physical model: collections are manifests of immutable parquet files
(catalog.py). Inserts only add files. Delete/update/upsert must rewrite —
but only the files whose parquet-footer ``id``/envelope stats can contain
affected rows; untouched files stay in the manifest verbatim. At 100 TB
that's the difference between rewriting a partition and rewriting the table.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xcube_geodb_spark.catalog import (
    SYSTEM_COLUMNS,
    CollectionMeta,
    GeoDBCatalog,
)
from xcube_geodb_spark.errors import GeoDBError
from xcube_geodb_spark.filters import parse_postgrest_query
from xcube_geodb_spark.geometry.crs import check_crs
from xcube_geodb_spark.geometry.geom import (
    Geometry,
    from_geojson,
    parse_wkb,
    parse_wkb_hex,
    parse_wkt,
    to_wkb,
)
from xcube_geodb_spark.geometry.udfs import with_envelope_columns
from xcube_geodb_spark.operators.ids import assign_sequential_ids_counted


# ---------------------------------------------------------------------------
# ingest normalization
# ---------------------------------------------------------------------------


def _normalize_geometry_value(v) -> bytes | None:
    if v is None:
        return None
    if isinstance(v, Geometry):
        return to_wkb(v, srid=0)
    if isinstance(v, (bytes, bytearray, memoryview)):
        return to_wkb(parse_wkb(bytes(v)), srid=0)
    if isinstance(v, str):
        s = v.strip()
        if s[:2].upper() in ("01", "00") and all(
            c in "0123456789abcdefABCDEF" for c in s
        ):
            return to_wkb(parse_wkb_hex(s), srid=0)
        return to_wkb(parse_wkt(s), srid=0)
    if isinstance(v, dict):
        return to_wkb(from_geojson(v), srid=0)
    raise GeoDBError(f"Cannot interpret geometry value of type {type(v).__name__}")


def prepare_values_df(
    catalog: GeoDBCatalog,
    meta: CollectionMeta,
    values,
    crs: int | None = None,
    include_system: bool = False,
) -> DataFrame:
    """Normalize user input (pandas or Spark DataFrame) to the collection
    schema: lower-cased columns, WKB geometry, typed property columns."""
    if crs is not None and check_crs(crs) != meta.srid:
        # geodb.py:1466-1469: CRS mismatch is an error
        raise GeoDBError(
            f"crs {crs} is not compatible with collection's crs {meta.srid}"
        )
    schema = meta.spark_schema(include_system=include_system)
    if isinstance(values, pd.DataFrame):
        pdf = values.copy()
        pdf.columns = [c.lower() for c in pdf.columns]
        if "geometry" in pdf.columns and len(pdf):
            pdf["geometry"] = pdf["geometry"].map(_normalize_geometry_value)
        keep = [f.name for f in schema.fields if f.name in pdf.columns]
        import pyspark.sql.types as T

        fields = [
            T.StructField(f.name, f.dataType, True)
            for f in schema.fields
            if f.name in keep
        ]
        for f in fields:
            if isinstance(f.dataType, (T.DateType, T.TimestampType)):
                pdf[f.name] = pd.to_datetime(pdf[f.name])
        df = catalog.spark.createDataFrame(pdf[keep], T.StructType(fields))
    elif isinstance(values, DataFrame):
        df = values
        for c in df.columns:
            if c != c.lower():
                df = df.withColumnRenamed(c, c.lower())
    else:
        raise GeoDBError(
            f"Cannot insert values of type {type(values).__name__}; "
            "expected a pandas or Spark DataFrame"
        )
    # conform property columns to declared types
    for f in schema.fields:
        if f.name in df.columns and f.name != "geometry":
            df = df.withColumn(f.name, F.col(f.name).cast(f.dataType))
    return df


# ---------------------------------------------------------------------------
# insert / upsert
# ---------------------------------------------------------------------------


def _enforce_constraints(m, df: DataFrame, what: str) -> None:
    """CHECK-constraint enforcement (Postgres semantics: NULL passes).
    One combined aggregation over the batch; zero cost when the
    collection declares no constraints."""
    cons = m.d.get("constraints", {})
    if not cons:
        return
    checks = [
        F.sum(
            (~F.coalesce(F.expr(e).cast("boolean"), F.lit(True))).cast("int")
        ).alias(n)
        for n, e in cons.items()
    ]
    row = df.agg(*checks).collect()[0]
    viol = {n: row[n] for n in cons if row[n]}
    if viol:
        detail = ", ".join(
            f"{n} ({cons[n]}): {c} row(s)" for n, c in viol.items()
        )
        raise GeoDBError(f"CHECK constraint violation on {what}: {detail}")


def _single_task_append(spark, m, n_rows: int) -> bool:
    """True when a counted append batch should write through ONE sorted
    task (catalog._cluster_by ``local_batch``) instead of the
    range-partitioned path: the rows fit one output file many times over
    AND the materialized batch (its id-assignment cache) is provably
    small. The byte check sums EVERY cached RDD — an upper bound on our
    batch, conservative in the safe direction (a fat concurrent cache
    just keeps the distributed path). Both knobs live in collection
    options (``small_append_rows`` / ``small_append_bytes``) so a
    deployment with huge rows can lower them; the defaults describe a
    batch any single write task handles comfortably at any cluster
    size."""
    if not n_rows or n_rows > int(m.d.get("small_append_rows", 100_000)):
        return False
    try:
        infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
        cached_bytes = sum(i.memSize() + i.diskSize() for i in infos)
    except Exception:
        return False
    return cached_bytes <= int(
        m.d.get("small_append_bytes", 256 * 1024 * 1024)
    )


def _with_envelopes(df: DataFrame, had_geom: bool) -> DataFrame:
    """Envelope system columns for a batch about to be written. When the
    incoming batch carried no geometry column (the collection's geometry
    is NULL for every new row), the envelopes are NULL by definition —
    emit them as literals instead of round-tripping every row through the
    Arrow envelope kernel (identical output: the kernel maps NULL WKB to
    all-NULL envelopes)."""
    if had_geom:
        return with_envelope_columns(df)
    out = df
    for c in ("__xmin", "__ymin", "__xmax", "__ymax"):
        out = out.withColumn(c, F.lit(None).cast("double"))
    return out


def insert_into_collection(
    catalog: GeoDBCatalog,
    collection: str,
    values,
    upsert: bool = False,
    crs: int | None = None,
    database: str = "public",
    merge_meta: dict | None = None,
    retries: int = 0,
    expected_version: int | None = None,
) -> int:
    """Returns the number of rows written. ``merge_meta`` one-level-merges
    into dict-valued collection metadata keys in the same atomic commit
    (streaming-sink epochs; see catalog.commit_version).

    ``expected_version`` pins the commit's base snapshot to a version the
    CALLER read (instead of this function's own fresh meta read). Pass it
    whenever the written rows or ``merge_meta`` were DERIVED from an
    earlier snapshot read — e.g. extend_bm25_collection computes absolute
    corpus totals from its stats read; without the pin, a commit landing
    between that read and this one would pass the version check and the
    stale-based totals would silently overwrite the other writer's delta.
    A pinned version that is no longer current raises the
    concurrent-modification error (do not combine with ``retries``: the
    retry would re-insert against the same stale pin and fail again —
    re-derive and re-call instead).

    ``retries``: plain appends COMMUTE with any concurrent commit, so on a
    version conflict (another writer won the race) the insert can simply
    redo itself against the fresh snapshot — ids re-assigned past the new
    max_id, files rewritten, up to ``retries`` extra attempts with
    jittered backoff. Upserts do NOT auto-retry (a merge decision taken
    against a stale snapshot must be re-validated by the caller)."""
    if retries and expected_version is not None:
        raise ValueError(
            "retries and expected_version are mutually exclusive: a retry "
            "against a stale pin can never succeed — re-derive the pinned "
            "state and call again"
        )
    if retries and not upsert:
        import random
        import time as _time

        last: Exception | None = None
        for attempt in range(retries + 1):
            try:
                return insert_into_collection(
                    catalog, collection, values, upsert, crs, database,
                    merge_meta, retries=0,
                )
            except GeoDBError as e:
                if "Concurrent modification" not in str(e):
                    raise
                last = e
                if attempt < retries:
                    _time.sleep(random.uniform(0.02, 0.1) * (attempt + 1))
        raise last
    m = catalog.meta_for_write(collection, database)
    base_version = m.version if expected_version is None else expected_version
    if isinstance(values, pd.DataFrame) and not upsert:
        # fast path: the rows are already driver-side — assign ids AND
        # envelopes in pandas, skipping every Python-worker round-trip
        # (id-assignment jobs + the envelope UDF)
        from xcube_geodb_spark.geometry.geom import envelope as _envelope

        pdf = values.copy()
        pdf.columns = [c.lower() for c in pdf.columns]
        pdf = pdf.drop(columns=["id"], errors="ignore")  # geodb.py:1499-1500
        pdf["id"] = range(m.max_id + 1, m.max_id + 1 + len(pdf))
        if "geometry" in pdf.columns:
            pdf["geometry"] = pdf["geometry"].map(_normalize_geometry_value)
            envs = pdf["geometry"].map(
                lambda b: _envelope(parse_wkb(b)) if b is not None else (None,) * 4
            )
            for i, c in enumerate(("__xmin", "__ymin", "__xmax", "__ymax")):
                pdf[c] = envs.map(lambda e, i=i: e[i])
        df = prepare_values_df(catalog, m, pdf, crs, include_system=True)
        schema = m.spark_schema(include_system=True)
        for f in schema.fields:
            if f.name not in df.columns:
                df = df.withColumn(f.name, F.lit(None).cast(f.dataType))
        to_write = df.withColumn("created_at", F.current_timestamp()).select(
            *[f.name for f in schema.fields]
        )
        _enforce_constraints(m, to_write, "insert")
        catalog.commit_version(
            collection,
            database,
            to_write,
            keep_files=None,
            max_id=m.max_id + len(pdf),
            expected_version=base_version,
            merge_meta=merge_meta,
            # the batch is driver-side pandas: clustering sorts in place
            # instead of paying a range-sampling job (catalog._cluster_by)
            local_batch=True,
        )
        return len(pdf)

    df = prepare_values_df(catalog, m, values, crs)
    # incoming batches without a geometry column get NULL geometry for
    # every row — their envelope columns are NULL by definition, so the
    # Arrow envelope kernel round-trip is skipped entirely (vector/posting
    # collections never pay the Python boundary at ingest)
    had_geom = "geometry" in df.columns
    now = F.current_timestamp()

    if not upsert and "id" in df.columns:
        df = df.drop("id")  # geodb.py:1499-1500

    has_ids = "id" in df.columns
    if has_ids:
        new_with_id = df.filter(F.col("id").isNotNull())
        new_without_id = df.filter(F.col("id").isNull()).drop("id")
    else:
        new_with_id = None
        new_without_id = df

    bounds = None
    n_with_id = 0
    start = m.max_id + 1
    if upsert and new_with_id is not None:
        bounds = new_with_id.agg(
            F.min("id").alias("lo"),
            F.max("id").alias("hi"),
            F.count(F.lit(1)).alias("cnt"),
        ).collect()[0]
        n_with_id = int(bounds["cnt"] or 0)
        if bounds["hi"] is not None:
            # explicit ids in the same batch may themselves be >= max_id+1;
            # start the generated sequence past them so one commit can't
            # mint duplicate primary keys
            start = max(start, int(bounds["hi"]) + 1)
    schema = m.spark_schema(include_system=False)

    def _conform(d: DataFrame) -> DataFrame:
        for f in schema.fields:
            if f.name not in d.columns:
                d = d.withColumn(f.name, F.lit(None).cast(f.dataType))
        return d.select(*[f.name for f in schema.fields])

    if upsert and new_with_id is not None:
        # generated ids for the no-id rows of the merge batch; the count
        # comes from the same per-partition job (no separate count() pass)
        assigned, n_no_id, id_cache = assign_sequential_ids_counted(
            new_without_id, start=start
        )
        if not n_no_id:
            assigned = None
        # prune: only files whose id range can contain replaced ids rewrite
        if bounds["lo"] is not None:
            from xcube_geodb_spark.operators.pruning import (
                split_files_by_constraints,
            )

            touched, untouched = split_files_by_constraints(
                catalog.manifest_paths(collection, database),
                ["id"],
                [("id", "gte", int(bounds["lo"])), ("id", "lte", int(bounds["hi"]))],
                meta=m,
            )
        else:
            touched, untouched = list(m.files), []
        old = catalog.load_files(collection, database, touched)
        key_ids = new_with_id.select("id").distinct()
        # preserve created_at of replaced rows; stamp modified_at (trigger
        # parity, geodb.sql:281-288)
        old_created = old.select("id", F.col("created_at").alias("__old_created"))
        incoming = (
            _conform(new_with_id)
            .join(F.broadcast(old_created), "id", "left")
            .withColumn("created_at", F.coalesce(F.col("__old_created"), now))
            .withColumn(
                "modified_at",
                F.when(F.col("__old_created").isNotNull(), now).otherwise(
                    F.lit(None).cast("timestamp")
                ),
            )
            .drop("__old_created")
            .select(*[f.name for f in schema.fields])
        )
        fresh = [incoming]
        if assigned is not None:
            fresh.append(
                _conform(assigned)
                .withColumn("created_at", now)
                .select(*[f.name for f in schema.fields])
            )
        merged = fresh[0]
        for p in fresh[1:]:
            merged = merged.unionByName(p)
        _enforce_constraints(m, merged, "upsert")
        # survivors keep their persisted envelopes; only fresh rows compute
        survivors = old.join(F.broadcast(key_ids), "id", "left_anti")
        merged = survivors.unionByName(_with_envelopes(merged, had_geom))
        # the new high-water mark is known arithmetically: survivors carry
        # ids <= m.max_id, explicit ids top out at bounds.hi, generated
        # ids at start + n_no_id - 1 — no extra pass over the merge
        max_new = m.max_id
        if bounds["hi"] is not None:
            max_new = max(max_new, int(bounds["hi"]))
        if n_no_id:
            max_new = max(max_new, start + n_no_id - 1)
        try:
            catalog.commit_version(
                collection,
                database,
                merged,
                keep_files=untouched,
                max_id=max_new,
                expected_version=base_version,
                merge_meta=merge_meta,
                # the merge re-runs joins + the envelope kernel if the
                # clustering sampler recomputes it — cache it instead
                cluster_persist=True,
            )
        finally:
            if id_cache is not None:
                id_cache.unpersist()
        return n_with_id + n_no_id

    # plain append: existing files untouched. Build the complete row —
    # conform, created_at, envelope columns — BEFORE id assignment, so the
    # id assigner's cache pins the partition layout AND feeds both the
    # clustering sampler and the write: the batch (including any Arrow
    # envelope kernel work) is computed exactly once.
    #
    # r13 measured-and-rejected variant: assigning ids over the RAW batch,
    # spread_small-ing the cached single partition, computing envelopes/
    # ANN-encode post-spread and funnelling into the single sorted writer
    # via repartition(1) — warehouse_ingest 2.11 -> 6.25 s, ann_ivfpq_build
    # 2.48 -> 2.97 s (profile_composed best-of-3 A/B): 64 Arrow-UDF tasks
    # on a ~15k-row batch pay per-task Python/AQE dispatch far exceeding
    # the serial kernel cost, and the extra exchange shows up whole.
    pre = _with_envelopes(
        _conform(new_without_id.withColumn("created_at", now)), had_geom
    )
    to_write, n_no_id, id_cache = assign_sequential_ids_counted(
        pre, start=start
    )
    to_write = to_write.select(
        *[f.name for f in schema.fields], *SYSTEM_COLUMNS
    )
    _enforce_constraints(m, to_write, "insert")
    try:
        catalog.commit_version(
            collection,
            database,
            to_write,
            keep_files=None,  # keep all existing
            max_id=m.max_id + n_no_id,
            expected_version=base_version,
            merge_meta=merge_meta,
            # the id pass counted the batch: a provably-small append (a
            # streaming micro-batch, an ANN/bench fixture load) writes
            # through one sorted task — identical file content (AQE
            # coalesces such a range shuffle to one partition anyway),
            # one fewer full pass (no range-sampling job)
            local_batch=_single_task_append(catalog.spark, m, n_no_id),
        )
    finally:
        if id_cache is not None:
            id_cache.unpersist()
    return n_no_id


# ---------------------------------------------------------------------------
# delete / update — rewrite only files that can contain affected rows
# ---------------------------------------------------------------------------


def _small_rewrite(m, touched: list[str]) -> bool:
    """True when the manifest's per-file row stats PROVE the rewrite is at
    most one output file's worth of rows (``max_file_rows``). Such a
    commit goes through the single-sorted-partition write path
    (catalog._cluster_by ``local_batch``): same rows, same within-file
    ordering, but no range-sampling job — halving the Spark jobs of the
    common surgical delete/update. Scale-adaptive by construction: a
    rewrite spanning more rows (or any file without row stats) keeps the
    distributed range-clustered write."""
    limit = int(m.d.get("max_file_rows", 2_000_000))
    stats = m.file_stats()
    total = 0
    for f in touched:
        r = (stats.get(f) or {}).get("::rows")
        if not r:
            return False
        total += int(r[0])
        if total > limit:
            return False
    return True


def _touched_untouched(
    catalog: GeoDBCatalog,
    collection: str,
    database: str,
    query: str,
    meta=None,
) -> tuple[list[str], list[str]]:
    """Partition manifest files into (maybe-touched, untouched) from the
    manifest's commit-time file stats (footer fallback for older commits)
    vs the filter's conjunctive interval constraints. Conservative:
    anything unprovable counts as touched. ``meta`` reuses the caller's
    already-rolled-forward snapshot (one metadata read per DML op)."""
    from xcube_geodb_spark.operators.pruning import (
        bloom_columns_needed,
        conjunctive_constraints,
        fts_term_groups,
        split_files_by_constraints,
    )

    constraints = conjunctive_constraints(query)
    m = meta if meta is not None else catalog.meta_for_write(
        collection, database
    )
    fts_idx = {
        i["property"]: i.get("dictionary", "english")
        for i in m.d.get("indexes", [])
        if i.get("type") == "fts"
    }
    # a delete/update keyed on an fts filter (e.g. purge boilerplate docs)
    # rewrites only files whose token blooms admit the terms
    fts_groups = fts_term_groups(query, fts_idx)
    paths = catalog.manifest_paths(collection, database, meta=m)
    cols = sorted({c for c, _op, _v in constraints})
    bloom_idx = {
        i["property"]
        for i in m.d.get("indexes", [])
        if i.get("type") == "bloom"
    }
    return split_files_by_constraints(
        paths, cols, constraints, meta=m,
        fts_groups=fts_groups,
        blooms_map=(
            m.file_blooms()
            if bloom_columns_needed(constraints, fts_groups, bloom_idx)
            else None
        ),
    )


def delete_from_collection(
    catalog: GeoDBCatalog,
    collection: str,
    query: str,
    database: str = "public",
) -> None:
    """Delete rows matching a PostgREST filter (``geodb.py:1325-1354``).
    Only files whose footer stats admit matching rows are rewritten."""
    m = catalog.meta_for_write(collection, database)
    sch = {f.name: f.dataType for f in m.spark_schema(include_system=True).fields}
    pq = parse_postgrest_query(query, schema=sch)
    if pq.predicate is None:
        raise GeoDBError("delete requires a filter query")
    touched, untouched = _touched_untouched(
        catalog, collection, database, query, meta=m
    )
    if not touched:
        return  # no file can contain matching rows: delete is a no-op
    df = catalog.load_files(collection, database, touched)
    keep = df.filter(~F.coalesce(pq.predicate, F.lit(False)))
    catalog.commit_version(
        collection,
        database,
        keep,
        keep_files=untouched,
        expected_version=m.version,
        rebase_on_disjoint=True,
        local_batch=_small_rewrite(m, touched),
    )


def delete_ids(
    catalog: GeoDBCatalog,
    collection: str,
    ids_df: DataFrame,
    database: str = "public",
    id_col: str = "id",
) -> None:
    """Delete an arbitrary (DataFrame-sized) id set — the frame-based
    counterpart of ``delete_from_collection`` for id sets too large for a
    filter string (a 100 TB dedup emits millions of victims).

    Files are pruned by the id set's [min, max] against manifest stats
    (one tiny agg on the id frame); survivors anti-join the victim set,
    broadcast when small enough for Spark to choose it."""
    m = catalog.meta_for_write(collection, database)
    ids = ids_df.select(F.col(id_col).cast("long").alias("id")).distinct()
    bounds = ids.agg(F.min("id").alias("lo"), F.max("id").alias("hi")).collect()[0]
    if bounds["lo"] is None:
        return  # empty victim set
    from xcube_geodb_spark.operators.pruning import split_files_by_constraints

    touched, untouched = split_files_by_constraints(
        catalog.manifest_paths(collection, database, meta=m),
        ["id"],
        [("id", "gte", int(bounds["lo"])), ("id", "lte", int(bounds["hi"]))],
        meta=m,
    )
    if not touched:
        return
    df = catalog.load_files(collection, database, touched)
    keep = df.join(ids, "id", "left_anti")
    catalog.commit_version(
        collection,
        database,
        keep,
        keep_files=untouched,
        expected_version=m.version,
        rebase_on_disjoint=True,
        local_batch=_small_rewrite(m, touched),
    )


def update_collection(
    catalog: GeoDBCatalog,
    collection: str,
    values: dict,
    query: str,
    database: str = "public",
) -> None:
    """UPDATE ... SET values WHERE filter (``geodb.py:1356-1398``);
    ``id`` removed from SET; ``modified_at`` stamped on changed rows.
    Only files whose footer stats admit matching rows are rewritten."""
    m = catalog.meta_for_write(collection, database)
    sch = {f.name: f.dataType for f in m.spark_schema(include_system=True).fields}
    pq = parse_postgrest_query(query, schema=sch)
    if pq.predicate is None:
        raise GeoDBError("update requires a filter query")
    values = {k.lower(): v for k, v in values.items() if k.lower() != "id"}
    schema = {f.name: f.dataType for f in m.spark_schema().fields}
    for k in values:
        if k not in schema:
            raise GeoDBError(f"Unknown property in update: {k!r}")
    touched, untouched = _touched_untouched(
        catalog, collection, database, query, meta=m
    )
    if not touched:
        return  # no file can contain matching rows: update is a no-op
    df = catalog.load_files(collection, database, touched)
    pred = F.coalesce(pq.predicate, F.lit(False))
    for k, v in values.items():
        if k == "geometry":
            v = _normalize_geometry_value(v)
        df = df.withColumn(
            k, F.when(pred, F.lit(v).cast(schema[k])).otherwise(F.col(k))
        )
    df = df.withColumn(
        "modified_at", F.when(pred, F.current_timestamp()).otherwise(F.col("modified_at"))
    )
    if "geometry" in values:
        df = with_envelope_columns(df.drop(*SYSTEM_COLUMNS))
    _enforce_constraints(m, df, "update")
    catalog.commit_version(
        collection, database, df, keep_files=untouched,
        expected_version=m.version, rebase_on_disjoint=True,
        local_batch=_small_rewrite(m, touched),
    )
