#!/usr/bin/env python
"""Bench regression guardrail: compare two bench JSON lines
(e.g. BENCH_r01.json vs a fresh ``python bench.py`` output) and flag
per-query slowdowns beyond a threshold.

Usage: python tools/bench_compare.py OLD.json NEW.json [threshold]

Exits 1 when any shared query slowed down more than ``threshold``x
(default 1.5) AND by more than 0.5 s absolute (sub-second noise on a busy
machine is not a regression signal).
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    """Accept either bench.py's raw JSON line or the driver's BENCH_r*.json
    wrapper (bench stdout embedded in a ``tail`` string)."""
    with open(path) as f:
        text = f.read()
    try:
        doc = json.loads(text)
    except json.JSONDecodeError:
        doc = json.loads(text.strip().splitlines()[-1])
    if "queries" in doc:
        return doc
    for line in reversed(doc.get("tail", "").splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                inner = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "queries" in inner:
                return inner
    raise SystemExit(f"no bench line with 'queries' found in {path}")


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old, new = load(sys.argv[1]), load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    regressions = []
    for name, t_new in new.get("queries", {}).items():
        t_old = old.get("queries", {}).get(name)
        if t_old is None or t_old <= 0:
            continue
        if t_new > t_old * threshold and t_new - t_old > 0.5:
            regressions.append((name, t_old, t_new, t_new / t_old))
    print(
        f"total: {old.get('value')}s -> {new.get('value')}s "
        f"({len(new.get('queries', {}))} queries, threshold {threshold}x)"
    )
    for name, t_old, t_new, ratio in sorted(
        regressions, key=lambda r: -r[3]
    ):
        print(f"REGRESSION {name}: {t_old}s -> {t_new}s ({ratio:.2f}x)")
    if not regressions:
        print("no per-query regressions")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
