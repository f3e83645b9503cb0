#!/usr/bin/env python
"""Compare two bench JSON lines (bench.py output): per-query deltas, flagged
regressions (>30% AND >0.3s absolute — the local-mode floor makes pure
percentages noisy), and totals. Usage:

    python tools/bench_compare.py OLD.json NEW.json [--threshold 0.3]
"""
import json
import sys


def load(path: str) -> dict:
    """Accept either bench.py's one-line JSON or the driver's BENCH_r{N}.json
    wrapper (whole-file JSON whose "tail" text embeds the bench line)."""
    text = open(path).read()
    try:
        d = json.loads(text)
        if "queries" in d:
            return d
        tail = d.get("tail", "")
    except json.JSONDecodeError:
        tail = text
    for line in tail.splitlines():
        line = line.strip()
        if line.startswith("{") and '"queries"' in line:
            d = json.loads(line)
            if "queries" in d:
                return d
    raise SystemExit(f"no bench JSON line in {path}")


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thr = 0.3
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            thr = float(a.split("=", 1)[1])
    old, new = load(args[0]), load(args[1])
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    print(f"common queries: {len(common)}  added: {len(set(nq) - set(oq))}  "
          f"removed: {len(set(oq) - set(nq))}")
    print(f"old total {old['value']:.1f}s  new total {new['value']:.1f}s")
    regressions = []
    for name in common:
        a, b = oq[name], nq[name]
        if b - a > max(thr * a, 0.3):
            regressions.append((name, a, b))
    if regressions:
        print(f"\nREGRESSIONS (> {thr:.0%} and > 0.3s):")
        for name, a, b in sorted(regressions, key=lambda r: r[1] - r[2]):
            print(f"  {name}: {a:.2f}s -> {b:.2f}s (+{(b - a) / a:.0%})")
    else:
        print("\nno regressions above threshold")
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
