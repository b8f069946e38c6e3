"""Prepared-geometry (st_prepare struct column) contract tests.

The contract: every registered st_* function accepts a prepared struct
anywhere it accepts WKB, and produces BIT-IDENTICAL results — vectorized
batch kernels reproduce the scalar kernels' float summation order
(geom._seq_sum / _ring_centroid_terms document it), and everything else
routes through the cache-seeded bridge that feeds the unchanged scalar
kernel."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from xcube_geodb_spark.errors import GeoDBError
from xcube_geodb_spark.geometry import prepared as P
from xcube_geodb_spark.geometry.geom import (
    Geometry,
    area,
    centroid,
    envelope,
    length,
    parse_wkb,
    perimeter,
    to_wkb,
    to_wkt,
)
from xcube_geodb_spark.geometry.sqlfuncs import register_spatial_sql_functions
from xcube_geodb_spark.plans.inspect import executed_plan

SF = "/root/testdata/sf0.001"


def _mixed_geoms():
    """Point / line / polygon-with-hole / multipolygon / multipoint /
    multilinestring — every prepared-supported kind, irregular vertex
    counts so pairwise-summation order differences would surface."""
    rng = np.random.default_rng(11)
    t = np.sort(rng.uniform(0, 2 * np.pi, 200))
    shell = np.column_stack((10 * np.cos(t) + 3, 8 * np.sin(t) - 2))
    shell = np.vstack([shell, shell[:1]])
    hole_t = np.sort(rng.uniform(0, 2 * np.pi, 40))
    hole = np.column_stack((2 * np.cos(hole_t) + 3, 2 * np.sin(hole_t) - 2))
    hole = np.vstack([hole, hole[:1]])
    line = Geometry(
        "LineString",
        np.column_stack((np.linspace(-5, 25, 33), rng.normal(0, 3, 33))),
    )
    poly = Geometry("Polygon", [shell, hole])
    sq = Geometry(
        "Polygon",
        [np.array([[60.0, 0.0], [70.0, 0.0], [70.0, 10.0], [60.0, 10.0],
                   [60.0, 0.0]])],
    )
    return [
        Geometry("Point", np.array([1.5, -7.25])),
        line,
        poly,
        sq,
        Geometry("MultiPolygon", [poly, sq]),
        Geometry("MultiPoint", [Geometry("Point", np.array([i * 1.1, -i]))
                                for i in range(5)]),
        Geometry("MultiLineString", [line, Geometry(
            "LineString", np.array([[0.0, 0.0], [3.0, 4.0]])
        )]),
    ]


@pytest.fixture(scope="module")
def geom_df(spark):
    register_spatial_sql_functions(spark)
    rows = [(i, bytearray(to_wkb(g))) for i, g in enumerate(_mixed_geoms())]
    rows.append((len(rows), None))  # null geometry row
    df = spark.createDataFrame(rows, "id int, geometry binary")
    df.createOrReplaceTempView("prep_mixed")
    return df


_SINGLE_ARG_CALLS = [
    "st_area({g})",
    "st_perimeter({g})",
    "st_length({g})",
    "st_xmin({g})", "st_ymin({g})", "st_xmax({g})", "st_ymax({g})",
    "st_astext({g})",
    "st_astext(st_centroid({g}))",
    "st_npoints({g})",
    "st_geometrytype({g})",
    "st_isvalid({g})",
    "st_astext(st_envelope({g}))",
    "st_astext(st_convexhull({g}))",
    "st_astext(st_reverse({g}))",
    "st_astext(st_flipcoordinates({g}))",
    "st_asgeojson({g})",
    "st_srid({g})",
    "st_numgeometries({g})",
]

_BOX = "'POLYGON((-4 -6,65 -6,65 6,-4 6,-4 -6))'"
_TWO_ARG_CALLS = [
    f"st_intersects({_BOX}, {{g}})",
    f"st_within({_BOX}, {{g}})",
    f"st_disjoint({_BOX}, {{g}})",
    f"st_contains({_BOX}, {{g}})",
    f"st_touches({_BOX}, {{g}})",
    "st_astext(st_intersection({g}, st_makeenvelope(-4.0,-6.0,65.0,6.0)))",
    "st_astext(st_intersection({g}, "
    "st_geomfromtext('POLYGON((0 -8,9 -8,9 5,0 5,0 -8))')))",
    "st_astext(st_buffer({g}, 0.5))",
    "st_astext(st_simplify({g}, 0.2))",
    "round(st_distance({g}, st_makepoint(1.0, 2.0)), 9)",
]


class TestPreparedEquality:
    @pytest.mark.slow
    def test_every_function_bit_identical(self, spark, geom_df):
        """Every st_* consumer produces byte-identical rows on WKB input
        and on st_prepare input — across all kinds, holes, multis, and
        NULLs."""
        for call in _SINGLE_ARG_CALLS + _TWO_ARG_CALLS:
            raw_sql = "SELECT id, {} AS v FROM prep_mixed ORDER BY id".format(
                call.format(g="geometry")
            )
            prep_sql = (
                "SELECT id, {} AS v FROM (SELECT id, st_prepare(geometry)"
                " AS g FROM prep_mixed) ORDER BY id"
            ).format(call.format(g="g"))
            raw = [tuple(r) for r in spark.sql(raw_sql).collect()]
            prep = [tuple(r) for r in spark.sql(prep_sql).collect()]
            assert raw == prep, call

    def test_clip_triage_cases(self, spark, geom_df):
        """v_clip_rect_wkb's three branches (contained pass-through /
        disjoint NULL / straddler clip) each equal the scalar path —
        boxes chosen so every fixture geometry hits a different branch."""
        for box in (
            "st_makeenvelope(-100.0,-100.0,100.0,100.0)",  # all contained
            "st_makeenvelope(200.0,200.0,300.0,300.0)",    # all disjoint
            "st_makeenvelope(2.0,-3.0,62.0,4.0)",          # straddlers
        ):
            raw = [
                tuple(r) for r in spark.sql(
                    f"SELECT id, st_astext(st_intersection(geometry, {box}))"
                    " AS v FROM prep_mixed ORDER BY id"
                ).collect()
            ]
            prep = [
                tuple(r) for r in spark.sql(
                    f"SELECT id, st_astext(st_intersection(g, {box})) AS v "
                    "FROM (SELECT id, st_prepare(geometry) AS g "
                    "FROM prep_mixed) ORDER BY id"
                ).collect()
            ]
            assert raw == prep, box

    def test_varying_box_column_falls_back_correctly(self, spark, geom_df):
        """A per-row-varying predicate box defeats the constant fast path
        — the bridge must still produce the exact scalar results."""
        sql = (
            "SELECT id, st_intersects(concat('POLYGON((', CAST(id AS STRING),"
            " ' -6,65 -6,65 6,-4 6,', CAST(id AS STRING), ' -6))'), {g})"
            " AS v FROM {src} ORDER BY id"
        )
        raw = [tuple(r) for r in spark.sql(
            sql.format(g="geometry", src="prep_mixed")
        ).collect()]
        prep = [tuple(r) for r in spark.sql(sql.format(
            g="g",
            src="(SELECT id, st_prepare(geometry) AS g FROM prep_mixed)",
        )).collect()]
        assert raw == prep


class TestPreparedModule:
    def test_roundtrip_and_measures_bit_identical(self):
        geoms = _mixed_geoms()
        pdf = P.prepare_series(pd.Series([to_wkb(g) for g in geoms]))
        back = P.prep_to_geoms(pdf)
        for a, b in zip(geoms, back):
            assert to_wkt(a) == to_wkt(b)
        va, vp, vl = P.v_area(pdf), P.v_perimeter(pdf), P.v_length(pdf)
        for i, g in enumerate(geoms):
            assert va[i] == area(g)
            assert vp[i] == perimeter(g)
            assert vl[i] == length(g)
            assert P.v_envelope_bound(pdf, 0)[i] == envelope(g)[0]
        cw = P.v_centroid_wkb(pdf)
        for i, g in enumerate(geoms):
            got = parse_wkb(bytes(cw[i]))
            assert (float(got.parts[0]), float(got.parts[1])) == centroid(g)

    def test_uniform_fast_path_matches_row_path(self):
        """The single-frombuffer uniform decode must equal the per-row
        parse exactly; a single null (or odd-sized buffer) silently
        switches to the row path."""
        sq = [
            Geometry("Polygon", [np.array(
                [[i, 0.0], [i + 2.0, 0.0], [i + 2.0, 2.0], [i, 2.0],
                 [i, 0.0]]
            )])
            for i in map(float, range(50))
        ]
        bufs = [to_wkb(g) for g in sq]
        fast = P.prepare_series(pd.Series(bufs))
        slow = P.prepare_series(pd.Series(bufs + [None])).iloc[:-1]
        for i in range(len(sq)):
            assert list(fast["xs"][i]) == list(slow["xs"][i])
            assert list(fast["ys"][i]) == list(slow["ys"][i])
            assert list(fast["pn"][i]) == list(slow["pn"][i])
            assert int(fast["kind"][i]) == int(slow["kind"][i])
        # and both agree with the scalar kernels
        va = P.v_area(fast)
        for i, g in enumerate(sq):
            assert va[i] == area(g) == 4.0

    def test_trailing_null_rows_do_not_truncate_last_envelope(self):
        """Regression: a NULL geometry as the FINAL batch row used to
        clamp its reduceat start index in-bounds, splitting — and
        truncating — the last valid row's envelope segment. st_xmax of
        the LINESTRING below returned 1.0 instead of 9.0, and every
        envelope consumer (box predicates, rect-clip triage) inherited
        the corruption."""
        line = Geometry(
            "LineString",
            np.array([[0.0, 0.0], [1.0, 1.0], [9.0, 9.0]]),
        )
        for tail in ([None], [None, None]):
            pdf = P.prepare_series(pd.Series([to_wkb(line)] + tail))
            xmin, ymin, xmax, ymax = P._Flat(pdf).envelopes()
            assert (xmin[0], ymin[0], xmax[0], ymax[0]) == envelope(line)
            assert xmax[0] == 9.0
            assert all(np.isnan(xmax[1:]))
            # box predicate: the box only touches the truncated tail
            pred = P.v_box_predicate(
                "intersects", (5.0, 5.0, 20.0, 20.0), pdf
            )
            assert pred[0] is True or pred[0] == True  # noqa: E712
            assert not pred[len(tail)]
            # rect-clip triage: envelope-inside row must pass through
            clip = P.v_clip_rect_wkb(pdf, (-1.0, -1.0, 20.0, 20.0))
            assert clip[0] is not None
            assert to_wkt(parse_wkb(bytes(clip[0]))) == to_wkt(line)
            assert clip[len(tail)] is None
        # interior NULL rows: valid rows on both sides stay exact
        sq = Geometry(
            "Polygon",
            [np.array([[60.0, 0.0], [70.0, 0.0], [70.0, 10.0],
                       [60.0, 10.0], [60.0, 0.0]])],
        )
        pdf = P.prepare_series(
            pd.Series([to_wkb(line), None, to_wkb(sq), None])
        )
        xmin, ymin, xmax, ymax = P._Flat(pdf).envelopes()
        assert (xmin[0], ymin[0], xmax[0], ymax[0]) == envelope(line)
        assert (xmin[2], ymin[2], xmax[2], ymax[2]) == envelope(sq)
        assert np.isnan(xmax[1]) and np.isnan(xmax[3])

    def test_geometrycollection_rejected(self):
        gc = Geometry(
            "GeometryCollection",
            [Geometry("Point", np.array([1.0, 2.0]))],
        )
        with pytest.raises(GeoDBError, match="GeometryCollection"):
            P.geom_to_row(gc)


class TestPreparedPlan:
    def test_chain_is_arrow_batched_no_pickle(self, spark, geom_df):
        df = spark.sql(
            "SELECT st_area(st_intersection(g, "
            "st_makeenvelope(-4.0,-6.0,65.0,6.0))) AS a "
            "FROM (SELECT st_prepare(geometry) AS g FROM prep_mixed) "
            f"WHERE st_intersects({_BOX}, g)"
        )
        plan = executed_plan(df)
        assert "ArrowEvalPython" in plan
        assert "BatchEvalPython" not in plan

    def test_prepared_faster_than_raw_on_chain(self, spark):
        """The point of st_prepare: the chained expression over 15k
        squares must not be SLOWER than the raw-WKB chain (it measures
        ~1.5x faster; gate at parity to stay noise-proof)."""
        import time

        from xcube_geodb_spark.suite.geo import _squares

        _squares(spark, "/root/testdata/sf0.01").createOrReplaceTempView(
            "prep_perf_sq"
        )
        raw_sql = (
            "SELECT sum(st_area(st_intersection(geometry, "
            "st_makeenvelope(-90.0,-45.0,90.0,45.0)))) AS a "
            "FROM prep_perf_sq"
        )
        prep_sql = (
            "SELECT sum(st_area(st_intersection(g, "
            "st_makeenvelope(-90.0,-45.0,90.0,45.0)))) AS a "
            "FROM (SELECT st_prepare(geometry) AS g FROM prep_perf_sq)"
        )
        out = {}
        for name, sql in (("raw", raw_sql), ("prep", prep_sql)):
            spark.sql(sql).collect()
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                r = spark.sql(sql).collect()
                best = min(best, time.perf_counter() - t0)
            out[name] = (best, r[0]["a"])
        assert out["prep"][1] == out["raw"][1]  # identical aggregate
        assert out["prep"][0] <= out["raw"][0] * 1.5  # noise-proof bound


class TestUniformDecodeTraps:
    def test_3d_uniform_batch_rejects_fast_path(self):
        """A uniform batch of Z-coordinate linestrings has byte lengths
        that LOOK 2-D-divisible (n*24 % 16 == 0 for even n); the fast
        decoder must validate the DECLARED point count and fall back to
        the row path instead of misdecoding."""
        import struct

        def wkb3d_line(pts):
            out = bytearray(b"\x01" + struct.pack("<I", 1002))  # ISO Z
            out += struct.pack("<I", len(pts))
            for p in pts:
                out += struct.pack("<3d", *p)
            return bytes(out)

        bufs = [
            wkb3d_line([(float(i), 1.0, 9.0), (i + 1.0, 2.0, 9.0)])
            for i in range(4)
        ]
        pdf = P.prepare_series(pd.Series(bufs))
        for i, b in enumerate(bufs):
            want = to_wkt(parse_wkb(b))  # parser drops Z
            got = to_wkt(P.prep_to_geoms(pdf.iloc[[i]])[0])
            assert want == got
