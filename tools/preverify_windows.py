#!/usr/bin/env python
"""Driver-rotation insurance: pre-verify upcoming driver windows.

The external driver records CORRECTNESS rows for the FIRST ~50 queries in
registry iteration order each round. This tool reproduces that selection on
the CURRENT tree — the live window plus any number of SIMULATED future
windows (assume each prior window lands clean, recompute the rotation) —
and runs every selected query against its DuckDB oracle at sf0.01 with the
same compare the local mirror suite uses.

Usage: python tools/preverify_windows.py [n_windows] [--sf=sf0.01] [--cap=50]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_taxi_lakehouse_spark import registry
from nyc_taxi_lakehouse_spark.registry import all_queries
from nyc_taxi_lakehouse_spark.session import get_spark
from tests.oracle import compare, duck_connection


def window_plan(n_windows: int, cap: int) -> list[list[str]]:
    """The next `n_windows` driver windows, assuming each lands clean."""
    orig = registry._driver_verified_rounds
    simulated: dict[str, tuple[int, bool]] = {}

    def patched(root=None):
        v = orig(root)
        v.update(simulated)
        return v

    registry._driver_verified_rounds = patched
    try:
        windows: list[list[str]] = []
        base_round = max(
            (rnd for rnd, _ in orig().values()), default=0
        )
        for i in range(n_windows):
            w = list(all_queries())[:cap]
            windows.append(w)
            for name in w:
                simulated[name] = (base_round + 1 + i, True)
        return windows
    finally:
        registry._driver_verified_rounds = orig


def main() -> int:
    n_windows = 1
    sf = "sf0.01"
    cap = 50
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf = a.split("=", 1)[1]
        elif a.startswith("--cap="):
            cap = int(a.split("=", 1)[1])
        else:
            n_windows = int(a)

    windows = window_plan(n_windows, cap)
    specs = all_queries()
    spark = get_spark()
    sf_dir = f"/root/testdata/{sf}"
    con = duck_connection(sf_dir)
    rc = 0
    seen: set[str] = set()
    for i, window in enumerate(windows, start=1):
        ok = rows_only = fail = 0
        for name in window:
            if name in seen:  # re-admissions across simulated windows
                continue
            seen.add(name)
            spec = specs[name]
            t0 = time.time()
            try:
                df = spec.fn(spark, sf_dir)
                if spec.oracle is None:
                    n = df.count()
                    rows_only += 1
                    print(f"[w{i}] {name}: rows-only, {n} rows, "
                          f"{time.time() - t0:.2f}s")
                    continue
                compare(df, con.execute(spec.oracle).fetchdf(), name)
                ok += 1
            except Exception as e:  # mismatch or crash — both are failures
                fail += 1
                rc = 1
                print(f"[w{i}] {name}: FAIL {str(e)[:500]}")
        print(f"== window {i}: {ok} hash-exact, {rows_only} rows-only, "
              f"{fail} FAILED ==")
    con.close()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
