#!/usr/bin/env python
"""Derive a 10x scale decade (sf1-equivalent) from sf0.1 into a scratch dir
(VERDICT r07 #5: TESTDATA.md forbids touching /root/testdata, not creating
new data). Used by tools/scaling_report.py --decade to extend the per-query
wall-ratio table one decade past the committed sf0.01→sf0.1 audit.

Replication semantics (what "10x the data" means per table, chosen so the
workload SHAPE scales honestly instead of degenerating):

- lineitem + orders: 10 replicas with orderkey offset k·OFF (join integrity
  between the two preserved exactly; per-order line counts unchanged).
  Dimension keys (custkey, partkey, suppkey) are NOT remapped — 10x facts
  per dimension row, the usual fact-grows-faster-than-dims posture.
- documents: 10 replicas with doc_id offset; replica k>0 applies a Caesar
  substitution cipher (rotate [a-z] by 7k mod 26 — distinct nonzero
  rotations for k=1..9 since gcd(7,26)=1). This makes replicas disjoint
  in BOTH token space and char-n-gram space while preserving every token
  length, token count, and the within-replica dup/near-dup structure
  exactly — so near-dup candidate counts scale exactly 10x. (First
  attempt appended 'r<k>' per token: token-disjoint but NOT
  char-gram-disjoint — the char-5-gram minhash banding then produced 54x
  candidates and q_dedup_chargram 11600x output pairs across replicas,
  measuring the perturbation instead of the engine. A suffix on the
  whole text is even worse: 0.98-Jaccard clones, 45x pair blowup.)
- embeddings: 10 replicas, vec_id offset, values identical (ANN/k-center
  cost is probes x corpus / k x corpus — value clones don't change it).
- all other tables: copied unchanged.

Deterministic end to end; DuckDB does the generation so no Spark session
is warmed before a measurement run.
"""

from __future__ import annotations

import argparse
import os
import shutil

import duckdb

SRC = "/root/testdata/sf0.1"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sf1_decade")
    ap.add_argument("--replicas", type=int, default=10)
    args = ap.parse_args()
    # The Caesar rotations 7k mod 26 are distinct only for k < 26; replica
    # 26 would rotate by 0 — byte-identical to replica 0, silently
    # reintroducing the cross-replica clone artifact this tool exists to
    # avoid. Grow via a second cipher parameter before raising this.
    # An explicit raise, not `assert`: the cap must survive `python -O`.
    if args.replicas > 26:
        raise SystemExit("replicas > 26 reuse Caesar rotations")
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    r = args.replicas

    off = con.execute(
        f"SELECT MAX(o_orderkey) + 1 FROM read_parquet('{SRC}/orders.parquet')"
    ).fetchone()[0]
    doc_off = con.execute(
        f"SELECT MAX(doc_id) + 1 FROM read_parquet('{SRC}/documents.parquet')"
    ).fetchone()[0]
    vec_off = con.execute(
        f"SELECT MAX(vec_id) + 1 FROM read_parquet('{SRC}/embeddings.parquet')"
    ).fetchone()[0]

    con.execute(f"""
COPY (
  SELECT l_orderkey + k.k * {off} AS l_orderkey,
         * EXCLUDE (l_orderkey)
  FROM read_parquet('{SRC}/lineitem.parquet'), range({r}) k(k)
) TO '{args.out}/lineitem.parquet' (FORMAT PARQUET, CODEC ZSTD)
""")
    con.execute(f"""
COPY (
  SELECT o_orderkey + k.k * {off} AS o_orderkey,
         * EXCLUDE (o_orderkey)
  FROM read_parquet('{SRC}/orders.parquet'), range({r}) k(k)
) TO '{args.out}/orders.parquet' (FORMAT PARQUET, CODEC ZSTD)
""")
    alpha = "abcdefghijklmnopqrstuvwxyz"
    rot_cases = " ".join(
        f"WHEN k.k = {k} THEN translate(text, '{alpha}', "
        f"'{alpha[(7 * k) % 26:] + alpha[:(7 * k) % 26]}')"
        for k in range(1, r)
    )
    # Replica lang is suffixed (en -> en3): replicas are disjoint SHARDS,
    # and lang is the blocking/df-cap key — a 10x corpus of 10 shards
    # should present 10 blocking groups, not one group with diluted
    # global document frequencies.
    con.execute(f"""
COPY (
  SELECT doc_id + k.k * {doc_off} AS doc_id,
         CASE WHEN k.k = 0 THEN text {rot_cases} END AS text,
         CASE WHEN k.k = 0 THEN lang ELSE lang || k.k END AS lang,
         source, n_chars
  FROM read_parquet('{SRC}/documents.parquet'), range({r}) k(k)
) TO '{args.out}/documents.parquet' (FORMAT PARQUET, CODEC ZSTD)
""")
    con.execute(f"""
COPY (
  SELECT vec_id + k.k * {vec_off} AS vec_id,
         * EXCLUDE (vec_id)
  FROM read_parquet('{SRC}/embeddings.parquet'), range({r}) k(k)
) TO '{args.out}/embeddings.parquet' (FORMAT PARQUET, CODEC ZSTD)
""")
    for t in TABLES:
        dst = f"{args.out}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copyfile(f"{SRC}/{t}.parquet", dst)
    for t in TABLES:
        n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{args.out}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n}")


if __name__ == "__main__":
    main()
