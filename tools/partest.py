#!/usr/bin/env python
"""Parallel full-suite test runner (VERDICT r07 #3).

``pytest tests/`` is Spark-bound and takes hours serially; pytest-xdist is
not available in this environment. This runner shards the test FILES across
N concurrent pytest subprocesses, each with its own SparkSession on a slice
of the host's cores (SPARK_GRAFT_CPUS is divided among workers), so the
full suite finishes in one sitting.

File-level sharding is the isolation boundary on purpose: every test uses
pytest tmp_path for filesystem state, the in-memory catalog is per-JVM, and
the only named shared object (test_catalog's ``taxi_test`` database) lives
inside a single file — so no two workers ever touch the same mutable state.
Spark UI port collisions are avoided by disabling the UI.

Scheduling is greedy longest-first using measured per-file durations from
the previous run (cached in tools/.partest_durations.json, refreshed every
run); the first run falls back to file size as the proxy.

Usage:
    python tools/partest.py                # all of tests/, 8 workers
    python tools/partest.py -j 4           # 4 workers
    python tools/partest.py tests/test_lake.py tests/test_mor.py

Exit code is non-zero if any shard fails; each shard's tail is printed.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DUR_CACHE = os.path.join(REPO, "tools", ".partest_durations.json")


def shard(files: list[str], n: int, weights: dict[str, float]) -> list[list[str]]:
    """Greedy longest-first bin packing into n shards."""
    order = sorted(files, key=lambda f: -weights.get(os.path.basename(f), 0.0))
    bins: list[tuple[float, list[str]]] = [(0.0, []) for _ in range(n)]
    for f in order:
        w = weights.get(os.path.basename(f), 0.0)
        i = min(range(n), key=lambda k: bins[k][0])
        bins[i] = (bins[i][0] + w, bins[i][1] + [f])
    return [b[1] for b in bins if b[1]]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="*", help="test files (default: tests/*.py)")
    ap.add_argument("-j", "--jobs", type=int, default=8)
    ap.add_argument("--cpus-total", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    files = args.files or sorted(
        f for f in glob.glob(os.path.join(REPO, "tests", "test_*.py"))
    )
    try:
        cached = json.load(open(DUR_CACHE))
    except (OSError, json.JSONDecodeError):
        cached = {}
    weights = {
        os.path.basename(f): cached.get(
            os.path.basename(f), os.path.getsize(f) / 1000.0
        )
        for f in files
    }
    shards = shard(files, args.jobs, weights)
    per_worker_cpus = max(2, args.cpus_total // max(1, len(shards)))

    env_base = dict(os.environ)
    env_base["SPARK_GRAFT_CPUS"] = str(per_worker_cpus)
    # The full matrix ALWAYS runs here (r12): the default serial run
    # deterministically samples the registry-wide sweeps to fit the
    # driver's budget (tests/conftest.py), and this runner is the
    # committed full-coverage record.
    env_base["SPARK_GRAFT_FULL_TESTS"] = "1"
    # Each worker JVM gets a smaller driver heap than the single-process
    # default so j workers fit the host comfortably.
    env_base.setdefault("SPARK_DRIVER_MEMORY", "6g")
    # No UI: avoids 4040..port-retry churn across concurrent JVMs.
    env_base["SPARK_SUBMIT_OPTS"] = (
        env_base.get("SPARK_SUBMIT_OPTS", "") + " -Dspark.ui.enabled=false"
    ).strip()

    t0 = time.time()
    import tempfile

    logdir = tempfile.mkdtemp(prefix="partest_")
    procs = []
    for i, s in enumerate(shards):
        logf = open(os.path.join(logdir, f"shard{i}.log"), "w")
        procs.append(
            (
                i,
                s,
                subprocess.Popen(
                    [sys.executable, "-m", "pytest", "-q", "--tb=line",
                     "--durations=0", "--durations-min=0.01", "-p",
                     "no:cacheprovider", *s],
                    cwd=REPO, env=env_base, stdout=logf, stderr=subprocess.STDOUT,
                ),
                logf,
            )
        )
    rc = 0
    durations: dict[str, float] = dict(cached)
    for i, s, p, logf in procs:
        p.wait()
        logf.close()
        lines = open(os.path.join(logdir, f"shard{i}.log")).read().splitlines()
        summary = lines[-1].strip() if lines else "(no output)"
        print(f"shard {i} ({len(s)} files): rc={p.returncode}  {summary}")
        if p.returncode not in (0, 5):  # 5 = no tests collected (empty shard)
            rc = 1
            print("\n".join(lines[-15:]))
        # Refresh the duration cache from pytest's --durations report
        # ("  1.23s call     tests/test_x.py::test_y"): accurate per-FILE
        # sums, so the greedy packer converges instead of oscillating on
        # shard averages.
        per_file: dict[str, float] = {}
        for ln in lines:
            parts = ln.split()
            if len(parts) >= 3 and parts[0].endswith("s") and "::" in parts[2]:
                try:
                    secs = float(parts[0][:-1])
                except ValueError:
                    continue
                fname = os.path.basename(parts[2].split("::", 1)[0])
                per_file[fname] = per_file.get(fname, 0.0) + secs
        durations.update(per_file)
    json.dump(durations, open(DUR_CACHE, "w"), indent=0, sort_keys=True)
    print(f"TOTAL wall: {time.time() - t0:.0f}s across {len(shards)} shards"
          f" ({per_worker_cpus} cores each); logs {logdir}/shard*.log")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
