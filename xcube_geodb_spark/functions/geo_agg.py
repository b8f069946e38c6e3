"""Geometry aggregation: the PostGIS ``ST_Collect`` idiom.

The reference admits ``ST_Collect``/``ST_Union`` through its raw-SQL
passthrough (``/root/reference/xcube_geodb/sql/geodb.sql:1123-1177``
interpolates any PostGIS aggregate into ``SELECT``). Two shapes here:

- :func:`collect_points_wkt` — per-group MULTIPOINT as WKT **text built
  from pure column algebra** (decimal-formatted coordinates, ordered
  members): stays entirely inside whole-stage codegen, one shuffle on the
  group key, and is exactly replayable by any SQL engine's ordered
  ``string_agg`` — which is what the driver gate does.
- :func:`collect_geometries` — per-group GEOMETRYCOLLECTION (or MULTI*)
  WKB through the geometry kernel, for arbitrary member geometries: a
  ``collect_list`` of WKB per group plus one small Arrow-batched UDF that
  concatenates parsed members. Group payloads are the scale knob — like
  PostGIS, collecting a giant group materializes it; cap group sizes
  upstream (``sampling.cap_per_group``) when groups are unbounded.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "collect_points_wkt", "collect_geometries", "collect_members", "dissolve",
]


def collect_members(members: list):
    """PostGIS ``ST_Collect`` promotion rule over parsed members:
    homogeneous point/line/polygon members collect into the matching
    MULTI* type, mixed members into a GEOMETRYCOLLECTION. Shared by
    :func:`collect_geometries` and the SQL shim's ``st_collect_agg``."""
    from xcube_geodb_spark.geometry.geom import Geometry

    _MULTI = {"Point": "MultiPoint", "LineString": "MultiLineString",
              "Polygon": "MultiPolygon"}
    if not members:
        return None
    kinds = {m.kind for m in members}
    kind = _MULTI.get(next(iter(kinds)), "GeometryCollection") \
        if len(kinds) == 1 else "GeometryCollection"
    return Geometry(kind, members)


def collect_points_wkt(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    order_col: str,
    precision: int = 6,
) -> DataFrame:
    """Per-group ``MULTIPOINT (x y, x y, ...)`` WKT with members in
    ``order_col`` order and coordinates fixed to ``precision`` decimals
    (decimal-cast, so the text is engine-independent). Adds ``wkt``."""
    pt = F.concat_ws(
        " ",
        F.col(x_col).cast(f"decimal(24,{precision})").cast("string"),
        F.col(y_col).cast(f"decimal(24,{precision})").cast("string"),
    )
    arr = F.sort_array(
        F.collect_list(F.struct(F.col(order_col).alias("o"), pt.alias("p")))
    )
    wkt = F.concat(
        F.lit("MULTIPOINT ("),
        F.array_join(F.transform(arr, lambda s: s["p"]), ", "),
        F.lit(")"),
    )
    return df.groupBy(*group_cols).agg(wkt.alias("wkt"))


def collect_geometries(
    df: DataFrame,
    group_cols: list[str],
    geom_col: str = "geometry",
    order_col: str | None = None,
) -> DataFrame:
    """Per-group geometry collection over WKB members (``ST_Collect``):
    returns group cols + ``geometry`` WKB. Homogeneous point/line/polygon
    members collect into the matching MULTI* type, mixed members into a
    GEOMETRYCOLLECTION — PostGIS's exact promotion rule."""
    from pyspark.sql import types as T

    from xcube_geodb_spark.geometry.geom import parse_wkb, to_wkb

    @F.pandas_udf(T.BinaryType())
    def _collect(wkbs: pd.Series) -> pd.Series:
        out = []
        for arr in wkbs:
            g = collect_members([parse_wkb(b) for b in arr if b is not None])
            out.append(to_wkb(g) if g is not None else None)
        return pd.Series(out)

    if order_col is not None:
        packed = F.sort_array(
            F.collect_list(F.struct(F.col(order_col).alias("o"),
                                    F.col(geom_col).alias("g")))
        )
        geoms = F.transform(packed, lambda s: s["g"])
    else:
        geoms = F.collect_list(F.col(geom_col))
    return df.groupBy(*group_cols).agg(_collect(geoms).alias("geometry"))


def dissolve(
    df: DataFrame,
    group_cols: list[str],
    geom_col: str = "geometry",
    max_group_size: int = 100_000,
    two_level: bool | str = "auto",
    auto_threshold: int = 2000,
) -> DataFrame:
    """Per-group aggregate boolean union — PostGIS ``ST_Union(geometry)``
    dissolve over polygonal WKB members.  Returns group cols +
    ``geometry`` (unioned WKB, NULL for all-NULL groups) + ``n_members``.

    Physical shape: one shuffle keyed by the group columns; each group's
    members fold through the planar overlay kernel — envelope-disjoint
    members concatenate without a boolean pass, only overlapping
    clusters merge (balanced O(log n) fold —
    geometry/overlay.union_all), in an Arrow-batched pandas UDF.

    Like PostGIS' ``ST_Union`` aggregate, a group materializes on one
    task.  For UNBOUNDED groups pass ``two_level=True``: members are
    first range-partitioned on (group, envelope xmin) so each partition
    holds a spatially CONTIGUOUS run of its group — a connected
    coverage's run pre-unions into ONE short-boundary polygon instead of
    a bag of scattered singletons that would re-flatten downstream —
    then a ``mapInPandas`` pass pre-unions each run IN PLACE (no second
    full-data exchange; union is associative so Arrow batch splits are
    harmless) and only the per-partition partials shuffle to the final
    group task, whose fold merges k run polygons at their seams (the
    overlay kernel prunes non-seam work by envelope).  The per-task
    member count drops from group size to partition count, and the only
    full-data shuffle is the range one.  Otherwise ``max_group_size``
    fail-fasts instead of silently stalling a straggler task at
    100 TB.

    ``two_level="auto"`` (the DEFAULT since r11 — the naive spelling was
    the documented scale anti-pattern, 42x super-linear on a skewed
    fixture at x10) probes the max group size with a cheap column-pruned
    ``groupBy(...).count()`` pre-aggregate (reads ONLY the group
    columns, map-side combined — one extra lightweight job at plan
    time) and flips to the two-level tree when any group exceeds
    ``auto_threshold`` members (~seconds of single-task union work).
    Pass ``two_level=True``/``False`` explicitly to skip the probe —
    e.g. inside iterative pipelines where the caller already knows the
    group-size regime."""
    from pyspark.sql import types as T

    from xcube_geodb_spark.geometry.geom import envelope, parse_wkb, to_wkb
    from xcube_geodb_spark.geometry.overlay import union_all

    @F.pandas_udf(T.BinaryType())
    def _dissolve(wkbs: pd.Series) -> pd.Series:
        out = []
        for arr in wkbs:
            members = [parse_wkb(b) for b in arr if b is not None]
            if len(members) > max_group_size:
                raise ValueError(
                    f"dissolve group exceeds max_group_size="
                    f"{max_group_size}; pre-aggregate or raise the cap"
                )
            merged = union_all(members)
            out.append(to_wkb(merged) if merged is not None else None)
        return pd.Series(out)

    # the union compute runs in a projection AFTER the aggregate, so its
    # parallelism equals the aggregate's reducer count — and AQE's
    # byte-based partition coalescing sees only the tiny WKB lists, not
    # the per-group union cost, collapsing heavy dissolves onto a few
    # tasks. An explicit-numPartitions repartition on the group keys is
    # never coalesced by AQE and already satisfies the aggregate's
    # required distribution (no second shuffle).
    n_shuffle = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )

    if two_level == "auto":
        # the probe reads only the group columns (column-pruned scan,
        # map-side combine, scalar collect) — O(bytes of group cols),
        # never the geometry
        if group_cols:
            row = (
                df.groupBy(*group_cols).count()
                .agg(F.max("count").alias("mx")).first()
            )
            mx = row["mx"] if row is not None else None
        else:
            mx = df.count()
        two_level = bool(mx is not None and mx > int(auto_threshold))

    if two_level:

        @F.pandas_udf(T.DoubleType())
        def _env_xmin(wkbs: pd.Series) -> pd.Series:
            return pd.Series(
                [
                    float(envelope(parse_wkb(b))[0]) if b is not None else None
                    for b in wkbs
                ]
            )

        ranged = df.repartitionByRange(
            n_shuffle, *group_cols, _env_xmin(F.col(geom_col))
        ).select(*group_cols, geom_col)
        out_schema = T.StructType(
            [ranged.schema[c] for c in group_cols]
            + [
                T.StructField("__partial", T.BinaryType()),
                T.StructField("__n", T.LongType()),
            ]
        )

        def _partial_batches(batches):
            # true map-side pre-union: each Arrow batch of the ranged
            # partition unions its groups' contiguous runs locally and
            # emits one partial row per group — only partials reach the
            # final shuffle (union is associative, so batch splits
            # within a partition are harmless)
            for pdf in batches:
                if pdf.empty:
                    continue
                for _, sub in pdf.groupby(
                    group_cols, dropna=False, sort=False
                ):
                    members = [
                        parse_wkb(b) for b in sub[geom_col] if b is not None
                    ]
                    merged = union_all(members)
                    row = sub.iloc[[0]][group_cols].copy()
                    row["__partial"] = pd.Series(
                        [to_wkb(merged) if merged is not None else None],
                        index=row.index,
                        dtype=object,
                    )
                    row["__n"] = int(sub[geom_col].notna().sum())
                    yield row

        partial = ranged.mapInPandas(_partial_batches, schema=out_schema)
        if group_cols:
            partial = partial.repartition(n_shuffle, *group_cols)
        return partial.groupBy(*group_cols).agg(
            _dissolve(F.collect_list(F.col("__partial"))).alias("geometry"),
            F.sum("__n").alias("n_members"),
        )

    if group_cols:
        df = df.repartition(n_shuffle, *group_cols)
    geoms = F.collect_list(F.col(geom_col))
    return df.groupBy(*group_cols).agg(
        _dissolve(geoms).alias("geometry"),
        F.count(F.col(geom_col)).alias("n_members"),
    )


def cluster_within_members(members, distance_within: float):
    """``ST_ClusterWithin`` kernel: single-linkage union-find over the
    collected members — i and j link when their exact kernel distance is
    <= ``distance_within`` (0 = ST_ClusterIntersecting: touching or
    overlapping). An envelope prefilter (expanded by the threshold)
    skips provably-far pairs, so the quadratic term only pays for
    envelope survivors. Returns one GeometryCollection-shaped list per
    cluster, ordered by each cluster's smallest member index (input
    order), members in input order — deterministic given the collected
    array's order."""
    import numpy as np

    from xcube_geodb_spark.geometry.geom import Geometry, distance, envelope

    n = len(members)
    if n == 0:
        return []
    envs = np.asarray([envelope(g) for g in members], dtype=np.float64)
    d = float(distance_within)
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    # vectorized envelope prefilter: one broadcast pass yields the
    # candidate pair list, so the exact kernel distance only runs on
    # envelope survivors (a Python i x j loop over envelopes would make
    # large collects quadratic before any pruning could help)
    x0, y0, x1, y1 = envs[:, 0], envs[:, 1], envs[:, 2], envs[:, 3]
    near = (
        (x0[:, None] <= x1[None, :] + d)
        & (x1[:, None] >= x0[None, :] - d)
        & (y0[:, None] <= y1[None, :] + d)
        & (y1[:, None] >= y0[None, :] - d)
    )
    ii, jj = np.nonzero(np.triu(near, k=1))
    for i, j in zip(ii.tolist(), jj.tolist()):
        if find(i) == find(j):
            continue
        if distance(members[i], members[j]) <= d:
            parent[find(j)] = find(i)
    clusters: dict[int, list] = {}
    for i in range(n):
        clusters.setdefault(find(i), []).append(members[i])
    out = []
    # clusters is populated by ascending member index, so dict insertion
    # order == order of each cluster's SMALLEST member index (the
    # documented contract); sorting by root would deviate when chained
    # merges leave a non-minimal root (e.g. pairs (1,6),(5,6) -> root 5)
    for root in clusters:
        ms = clusters[root]
        out.append(
            ms[0]
            if len(ms) == 1
            else Geometry("GeometryCollection", ms)
        )
    return out
