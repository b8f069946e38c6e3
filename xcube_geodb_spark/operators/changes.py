"""Change data feed: row-level diff between two collection snapshots.

With snapshot time travel in place (catalog history manifests), any two
versions can be diffed into the insert/update/delete row set a downstream
incremental consumer needs — the engine-native answer to "what changed
since I last read?", which the reference cannot offer (Postgres overwrites
in place; its event log records only operation strings,
``xcube_geodb/sql/geodb.sql:123-140``).

Scale shape: data files are immutable, so a file present in BOTH
manifests contributes identical rows to both snapshots — every row of it
is unchanged by construction and can never appear in the feed (DML keeps
ids unique per snapshot, so a shared-file row cannot also live in a
rewritten file). The diff therefore reads ONLY the symmetric difference
of the two manifests' file lists: an adjacent-version diff after a
single-file update scans two files, not the table. What remains is one
shuffle per side keyed on ``id``, a full-outer join, and pure Column
algebra for classification. No driver-side row handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xcube_geodb_spark.catalog import SYSTEM_COLUMNS, GeoDBCatalog
from xcube_geodb_spark.errors import GeoDBError

__all__ = ["collection_changes", "diff_file_sets"]


def diff_file_sets(
    from_files: list[str], to_files: list[str]
) -> tuple[list[str], list[str]]:
    """(from-only, to-only) manifest files — the only inputs a snapshot
    diff needs (shared files are immutable, hence unchanged rows)."""
    f, t = set(from_files), set(to_files)
    return sorted(f - t), sorted(t - f)


def collection_changes(
    catalog: GeoDBCatalog,
    collection: str,
    database: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Rows inserted / deleted / updated between two snapshots.

    Returns the TO-side image for inserts and updates and the FROM-side
    image for deletes, plus a ``_change_type`` column
    (``insert`` | ``update`` | ``delete``). Rows are matched by ``id``;
    a row counts as updated when any user property or the geometry
    differs (``created_at``/``modified_at`` are bookkeeping, not data —
    an update is visible through its payload, and unchanged rows
    rewritten by a file-level DML pass must NOT appear in the feed).
    """
    m = catalog.meta(collection, database)
    to_v = m.version if to_version is None else to_version
    if from_version > to_v:
        raise GeoDBError(
            f"from_version {from_version} is newer than to_version {to_v}"
        )
    m_from = catalog.meta_at_version(collection, database, from_version)
    m_to = catalog.meta_at_version(collection, database, to_v)
    from_only, to_only = diff_file_sets(m_from.files, m_to.files)
    # each side reads ONLY its exclusive files, under its own snapshot
    # schema (schema evolution between the versions is handled per side)
    old = catalog.load_files(collection, database, from_only, meta=m_from)
    new = catalog.load_files(collection, database, to_only, meta=m_to)
    skip = set(SYSTEM_COLUMNS) | {"id", "created_at", "modified_at"}
    data_cols = [c for c in new.columns if c not in skip and c in old.columns]
    out_cols = [c for c in new.columns if c not in SYSTEM_COLUMNS]

    o = old.alias("o")
    n = new.alias("n")
    joined = o.join(n, F.col("o.id") == F.col("n.id"), "full_outer")
    differs = F.lit(False)
    for c in data_cols:
        differs = differs | ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    change = (
        F.when(F.col("o.id").isNull(), F.lit("insert"))
        .when(F.col("n.id").isNull(), F.lit("delete"))
        .when(differs, F.lit("update"))
    )
    # unchanged rows (change IS NULL) drop out of the feed. Side selection
    # is BY CHANGE TYPE, not coalesce: an update that sets a column to
    # NULL must surface the NULL, not the pre-image value. A property
    # added between the versions has no FROM-side column — substitute a
    # typed NULL so deletes still project the TO-side schema.
    new_types = dict(new.dtypes)
    old_cols = set(old.columns)
    is_delete = F.col("n.id").isNull()
    picked = [
        F.when(
            is_delete,
            F.col(f"o.{c}") if c in old_cols else F.lit(None).cast(new_types[c]),
        )
        .otherwise(F.col(f"n.{c}"))
        .alias(c)
        for c in out_cols
    ]
    return (
        joined.select(*picked, change.alias("_change_type"))
        .filter(F.col("_change_type").isNotNull())
    )
