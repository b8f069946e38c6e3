"""r12 optimization pins: the vectorized single-ring-polygon envelope
fast path must be bit-identical to the per-row parse_wkb slow path, and
the small-rewrite heuristic must only fire when manifest row stats prove
the bound."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from xcube_geodb_spark.geometry.geom import envelope, parse_wkb, parse_wkt, to_wkb


def _wkb(wkt: str) -> bytes:
    return to_wkb(parse_wkt(wkt))


WKTS = [
    "POINT (3.5 -7.25)",
    "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",  # square, 5 pts
    "POLYGON ((-1.5 2, 3 2.75, 2 9, -4 6.125, -1.5 2))",
    # 7-point ring (different byte length than the squares)
    "POLYGON ((0 0, 1 -2, 3 -1, 4 1, 2 3, -1 2, 0 0))",
    # polygon with a hole -> must take the general path
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 3 2, 3 3, 2 3, 2 2))",
    "LINESTRING (0 1, 5 -3, 2 2)",
    "MULTIPOINT ((1 1), (-2 5))",
    "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 2 2))",
]


def test_envelope_udf_fastpath_matches_slow_path():
    from xcube_geodb_spark.geometry.udfs import envelope_udf

    wkbs = [_wkb(w) for w in WKTS] + [None]
    # big-endian-ish corruption guard: flip the byte-order byte of one
    # square so the header check must reject it into the general path
    # (parse_wkb raises or handles it the same either way -> compare
    # only well-formed LE values here)
    fn = envelope_udf.func
    got = fn(pd.Series(wkbs, dtype=object))
    for i, b in enumerate(wkbs):
        if b is None:
            assert all(v is None or (isinstance(v, float) and math.isnan(v))
                       for v in got.iloc[i])
            continue
        exp = envelope(parse_wkb(b))
        assert tuple(got.iloc[i]) == pytest.approx(exp, abs=0.0), WKTS[i]


def test_envelope_udf_fastpath_mixed_lengths_order():
    """Rows of several distinct ring lengths interleaved: the per-length
    grouping must scatter results back to the right rows."""
    from xcube_geodb_spark.geometry.udfs import envelope_udf

    wkts = []
    for k in range(1, 21):
        if k % 3 == 0:
            wkts.append(f"POINT ({k} {-k})")
        elif k % 3 == 1:
            wkts.append(
                f"POLYGON (({k} 0, {k + 2} 0, {k + 2} 3, {k} 3, {k} 0))"
            )
        else:  # 6-point ring
            wkts.append(
                f"POLYGON (({k} 0, {k + 1} -1, {k + 3} 0, {k + 3} 2, "
                f"{k} 2, {k} 0))"
            )
    wkbs = [_wkb(w) for w in wkts]
    got = envelope_udf.func(pd.Series(wkbs, dtype=object))
    for i, b in enumerate(wkbs):
        assert tuple(got.iloc[i]) == envelope(parse_wkb(b)), wkts[i]


class _StubMeta:
    def __init__(self, stats, max_file_rows=100):
        self._stats = stats
        self.d = {"max_file_rows": max_file_rows}

    def file_stats(self):
        return self._stats


def test_small_rewrite_bounds():
    from xcube_geodb_spark.operators.dml import _small_rewrite

    m = _StubMeta(
        {
            "a": {"::rows": [40, 40]},
            "b": {"::rows": [50, 50]},
            "c": {"::rows": [80, 80]},
            "d": {},  # no row stats
        }
    )
    assert _small_rewrite(m, ["a", "b"])  # 90 <= 100
    assert not _small_rewrite(m, ["a", "c"])  # 120 > 100
    assert not _small_rewrite(m, ["a", "d"])  # unprovable -> distributed
    assert not _small_rewrite(m, ["a", "missing"])  # unknown file
    assert _small_rewrite(m, [])  # nothing touched


class _StubRDDInfo:
    def __init__(self, mem, disk):
        self._mem, self._disk = mem, disk

    def memSize(self):
        return self._mem

    def diskSize(self):
        return self._disk


class _StubSpark:
    """Mimics spark.sparkContext._jsc.sc().getRDDStorageInfo()."""

    def __init__(self, infos, raise_=False):
        self._infos, self._raise = infos, raise_
        outer = self

        class _SC:
            class _JSC:
                def sc(self_inner):
                    class _S:
                        def getRDDStorageInfo(self__):
                            if outer._raise:
                                raise RuntimeError("no storage info")
                            return outer._infos

                    return _S()

            _jsc = _JSC()

        self.sparkContext = _SC()


def test_single_task_append_bounds():
    from xcube_geodb_spark.operators.dml import _single_task_append

    m = _StubMeta({})
    small = _StubSpark([_StubRDDInfo(1 << 20, 0)])
    big = _StubSpark([_StubRDDInfo(200 << 20, 100 << 20)])
    broken = _StubSpark([], raise_=True)

    assert _single_task_append(small, m, 500)
    assert not _single_task_append(small, m, 0)  # empty batch
    assert not _single_task_append(small, m, 200_000)  # too many rows
    assert not _single_task_append(big, m, 500)  # cache bound exceeded
    assert not _single_task_append(broken, m, 500)  # unprovable -> distributed
    # knobs from collection options win over defaults
    m.d["small_append_rows"] = 100
    assert not _single_task_append(small, m, 500)
