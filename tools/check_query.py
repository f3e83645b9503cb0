#!/usr/bin/env python
"""Dev helper: run one registered query vs its DuckDB oracle at given SFs.

Usage: python tools/check_query.py q_name [q_name2 ...] [--sf sf0.001,sf0.01]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))) )

from nyc_taxi_lakehouse_spark.plans.ckpt import release_run_checkpoints
from nyc_taxi_lakehouse_spark.registry import all_queries
from nyc_taxi_lakehouse_spark.session import get_spark
from tests.oracle import compare, duck_connection


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    sfs = ["sf0.001", "sf0.01"]
    for a in sys.argv[1:]:
        if a.startswith("--sf"):
            sfs = a.split("=", 1)[1].split(",")
    specs = all_queries()
    spark = get_spark()
    rc = 0
    for sf in sfs:
        sf_dir = f"/root/testdata/{sf}"
        con = duck_connection(sf_dir)
        for name in names:
            spec = specs[name]
            t0 = time.time()
            df = spec.fn(spark, sf_dir)
            if spec.oracle is None:
                n = df.count()
                release_run_checkpoints()
                print(f"[{sf}] {name}: rows-only, {n} rows, {time.time()-t0:.2f}s")
                continue
            expected = con.execute(spec.oracle).fetchdf()
            try:
                compare(df, expected, name)
                print(f"[{sf}] {name}: OK ({len(expected)} rows, {time.time()-t0:.2f}s)")
            except AssertionError as e:
                rc = 1
                print(f"[{sf}] {name}: MISMATCH\n{str(e)[:2000]}")
        con.close()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
