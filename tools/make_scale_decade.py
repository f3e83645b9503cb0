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

--skew (VERDICT r8 #1) derives the PLANTED-SKEW variant of the same decade:
identical row counts and replica structure, Zipfian key mass instead of
uniform shards —

- documents: replicas 0-4 are ALL labelled with the single hottest base
  lang — one blocking group holds 50% of the corpus (five Caesar-disjoint
  shards of the full multi-lang base). Two deliberate consequences, both
  part of what "skewed corpus" means: (a) the per-lang df-cap faces a
  block whose frequent shingles are diluted ~5x by rotation heterogeneity
  — the r8 global-cap hazard class recurring WITHIN one language, which a
  real heterogeneous corpus produces; (b) formerly lang-blocked pairs
  inside each rotation become visible, so near-dup outputs legitimately
  differ from the uniform decade (skew changes blocking outcomes; the
  oracle moves with it). Replicas 5-9 get lang||k as in the uniform
  decade.
- lineitem: ~30% of line rows across every replica remap l_suppkey to the
  minimum suppkey (deterministic mix of (l_orderkey, l_linenumber)) — one
  hot supplier dominates the customer–supplier trade graph and every
  suppkey-keyed join/shuffle partition, the canonical AQE-skew-join
  scenario. Remaining rows keep their uniform suppkey (a one-hot Zipf
  head with a uniform tail).
- Token-frequency Zipf inside the TEXT was considered and rejected:
  rewriting token streams changes the true dup/near-dup structure, so the
  measurement would capture the perturbation, not the engine (the exact
  failure mode the Caesar design exists to avoid — see the r8 note above).

--level2 (VERDICT r10 #1) COMPOSES a second decade on top of an existing
one (``--src=/tmp/sf1_decade --out=/tmp/sf10_decade``), producing the
100x-of-bench-SF (sf10-equivalent) dataset the two-decade scaling curves
are measured on. A second round of Caesar rotations cannot work: rotations
compose additively, so 10x10 shards would collapse onto the 19 distinct
rotation sums and ~5 shards per rotation class would carry byte-identical
document clones — the quadratic cross-replica pair artifact the rotation
design exists to avoid. Level 2 therefore ciphers with AFFINE alphabet
permutations x -> a*x (mod 26) instead, one distinct unit multiplier per
replica: composed with any level-1 rotation x -> x+7k the combined map is
x -> a*x + 7k*a, and (a, k) -> (a, 7ka) is injective across all 100
shards (a determines the multiplier; for fixed a, k determines the
shift), so every shard of every base document carries a DISTINCT letter
permutation — token- and char-gram-disjoint shards, near-dup pair space
scaling linearly through both decades. Replica 0 keeps multiplier 1 (the
identity — the level-1 data embeds unchanged). The same id-offset and
lang-suffix discipline applies; --hotgraph / --hotsource re-plant their
masses at the composed scale (the plantings read only generic properties
of --src), while --skew is refused: its "hottest base lang" heuristic is
meaningless over a source whose langs are already decade shards.

--src lets tests derive the same structures from a smaller SF.

Deterministic end to end; DuckDB does the generation so no Spark session
is warmed before a measurement run.
"""

from __future__ import annotations

import argparse
import os
import shutil

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Hot-supplier mass for --skew: 3 of 10 residue classes of the mixed HIGH
# bits remap to the minimum suppkey -> ~30% of all line rows on one key.
# The residue must be taken from the multiply's HIGH bits: _MIX % 10 == 1,
# so (key * _MIX) % 10 == key % 10 — a raw low-bit residue would silently
# ride on the source keys' own mod-10 structure (r9 review finding; a
# stride-10 or even-only --src would plant 0%-50% instead of 30%).
# Shared by --skew (hot supplier) and --hotgraph (hot customer): both
# axes plant the same 3-of-10 (~30%) residue mass on one key.
_HOT_KEY_PCT = 3
_HOT_SUPP_PCT = _HOT_KEY_PCT  # historical alias used in the r9 docs
_HOT_SRC_PCT = 5  # --hotsource: 5 of 10 residue classes -> ~50% of documents
_MIX = 2654435761  # Knuth's multiplicative-hash constant, odd -> bijective mix

# Level-2 cipher multipliers: the units of Z/26 (odd, not 13) — 12 distinct
# affine maps x -> a*x, each a letter permutation. Index 0 is the identity
# so replica 0 embeds the source decade unchanged.
_AFFINE_UNITS = [1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25]


def _affine_alphabet(a: int) -> str:
    alpha = "abcdefghijklmnopqrstuvwxyz"
    return "".join(alpha[(a * i) % 26] for i in range(26))


def _mix_residue(expr: str, pct: int) -> str:
    """Planted-hot predicate: TRUE for ~pct/10 of rows, selected by the
    HIGH bits of a masked multiplicative mix of expr. The two invariants
    with a bug track record live HERE and nowhere else: the 31-bit mask
    BEFORE the multiply (an unmasked key >= ~4.3e8 overflowed DuckDB's
    signed BIGINT — r10 ADVICE), and the >> 16 high-bit residue (_MIX %
    10 == 1, so a raw low-bit residue rides the source keys' own mod-10
    structure and plants 0%-50% instead of the target — r9 review)."""
    return f"(((({expr}) & 2147483647) * {_MIX}) >> 16) % 10 < {pct}"


def _make_longdoc(args) -> None:
    """The long-document scale axis (PLANS.md round-9 bonus, promoted to a
    flag per VERDICT r9 #6): same corpus CARDINALITY, F x the text bytes
    per document. Each text becomes the space-joined concatenation of its
    own F Caesar rotations (7k mod 26, k=0..F-1; k=0 is the original) —
    distinct nonzero rotations keep the segments token- AND
    char-gram-disjoint, so shingle/token set sizes scale ~F x the way
    genuinely long documents do. n_chars is recomputed from the new text.
    """
    if args.longdoc > 26:
        raise SystemExit("longdoc factor > 26 reuses Caesar rotations")
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    alpha = "abcdefghijklmnopqrstuvwxyz"
    parts = ", ".join(
        "text" if k == 0 else (
            f"translate(text, '{alpha}', "
            f"'{alpha[(7 * k) % 26:] + alpha[:(7 * k) % 26]}')"
        )
        for k in range(args.longdoc)
    )
    con.execute(f"""
COPY (
  SELECT doc_id,
         concat_ws(' ', {parts}) AS text,
         lang, source,
         CAST(length(concat_ws(' ', {parts})) AS INT) AS n_chars
  FROM read_parquet('{args.src}/documents.parquet')
) TO '{args.out}/documents.parquet' (FORMAT PARQUET, CODEC ZSTD)
""")
    for t in TABLES:
        dst = f"{args.out}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copyfile(f"{args.src}/{t}.parquet", dst)
    stats = con.execute(
        f"SELECT COUNT(*), AVG(n_chars) FROM "
        f"read_parquet('{args.out}/documents.parquet')"
    ).fetchone()
    print(f"documents: {stats[0]} rows, avg {stats[1]:.0f} chars "
          f"(x{args.longdoc} rotations)")


def _make_events(args) -> None:
    """The EVENTS scale axis (VERDICT r10 #2): events is the one table no
    decade replicates, so watermark state, session-window GC and
    stream-stream join state had never been measured past sf0.1. R
    replicas, each shifted FORWARD in event time by k·(span + 1h): the
    stream gets R× longer (same users, R× the activity history), so under
    chunked ordered delivery the watermark advances across replicas and
    per-window state stays flat — the property the streaming decade
    exists to measure. A same-timestamp replication (the other tables'
    scheme) would instead multiply every window's cardinality by R, which
    measures state bloat, not stream length. event_id offsets keep ids
    unique; all other tables are copied unchanged."""
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    r = args.events
    id_off, lo_us, hi_us = con.execute(
        f"""SELECT MAX(event_id) + 1,
                   epoch_ns(MIN(ts)) // 1000, epoch_ns(MAX(ts)) // 1000
            FROM read_parquet('{args.src}/events.parquet')"""
    ).fetchone()
    shift_us = hi_us - lo_us + 3_600_000_000  # span + 1h inter-replica gap
    con.execute(f"""
COPY (
  SELECT e.event_id + k.k * {id_off} AS event_id,
         e.ts + to_microseconds(CAST(k.k * {shift_us} AS BIGINT)) AS ts,
         e.* EXCLUDE (event_id, ts)
  FROM read_parquet('{args.src}/events.parquet') e, range({r}) k(k)
) TO '{args.out}/events.parquet' (FORMAT PARQUET, CODEC ZSTD)
""")
    for t in TABLES:
        dst = f"{args.out}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copyfile(f"{args.src}/{t}.parquet", dst)
    n, span_h = con.execute(
        f"SELECT COUNT(*), (epoch_ns(MAX(ts)) - epoch_ns(MIN(ts))) / 3.6e12 "
        f"FROM read_parquet('{args.out}/events.parquet')"
    ).fetchone()
    print(f"events: {n} rows over {span_h:.1f} h of event time (x{r} shifted replicas)")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sf1_decade")
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--skew", action="store_true",
        help="plant Zipfian key mass (hot lang block, hot supplier) "
        "instead of uniform shards",
    )
    ap.add_argument(
        "--longdoc", type=int, nargs="?", const=8, default=0, metavar="F",
        help="derive the LONG-DOCUMENT axis instead of a decade: fixed "
        "row counts, each document's text replaced by F Caesar-rotated "
        "copies of itself concatenated (default F=8; the r9 measurement "
        "axis — rotations keep the repeated segments content-disjoint, so "
        "distinct shingle/token sets grow ~F x like real long documents, "
        "instead of collapsing to the original set as verbatim repetition "
        "would). All other tables copied unchanged. Suggested "
        "--out=/tmp/longdoc.",
    )
    ap.add_argument(
        "--hotgraph", type=int, nargs="?", const=300, default=0, metavar="M",
        help="derive the GRAPH-SKEW decade (VERDICT r9 #4): the uniform "
        "decade plus (a) an M-document template farm appended to "
        "documents — one Jaccard>=0.8 clique component with C(M,2) edges "
        "(~10x the whole base decade's near-dup edge set at the default "
        "M=300), the adversarial-growth case the r9 supplier skew could "
        "not produce (it SHRANK the pair graph); and (b) ~30%% of orders "
        "remapped to the MIN customer — a hub vertex spanning every "
        "supplier and a hot group key in the trade-graph pair "
        "extraction. Suggested --out=/tmp/sf1_hotgraph.",
    )
    ap.add_argument(
        "--events", type=int, nargs="?", const=10, default=0, metavar="R",
        help="derive the EVENTS/streaming axis instead of a decade: the "
        "events table replicated R times with event time SHIFTED forward "
        "by replica (span + 1h each) — an R x LONGER stream with the same "
        "user population, so watermarks advance realistically across "
        "replicas and per-window state stays bounded. All other tables "
        "copied unchanged. Suggested --out=/tmp/sf1_events.",
    )
    ap.add_argument(
        "--level2", action="store_true",
        help="compose a SECOND decade from an existing one (--src should "
        "be a level-1 decade dir): affine alphabet permutations instead "
        "of Caesar rotations, so all replicas-of-replicas stay letter-"
        "permutation-distinct (see module docstring). Combinable with "
        "--hotgraph/--hotsource to re-plant those masses at the composed "
        "scale; --skew is refused at level 2.",
    )
    ap.add_argument(
        "--hotsource", action="store_true",
        help="Plant a hot SOURCE: ~50%% of ALL documents (chosen by the "
        "same masked multiplicative doc-id residue as the other plantings, "
        "so the hot set is pseudo-random across replicas) are remapped to "
        "the base corpus's largest source. Attacks every per-source "
        "operator — domain-cap windows, per-source running sums, mixture "
        "aggregations — with one group holding half the corpus. Suggested "
        "--out=/tmp/sf1_hotsource.",
    )
    args = ap.parse_args()
    if sum(bool(x) for x in
           (args.longdoc, args.skew, args.hotgraph, args.hotsource,
            args.events)) > 1:
        raise SystemExit("--longdoc / --skew / --hotgraph / --hotsource / "
                         "--events are separate axes; pick one")
    if args.level2 and (args.skew or args.longdoc or args.events):
        raise SystemExit("--level2 composes a decade; it combines with "
                         "--hotgraph/--hotsource only (--skew's hottest-"
                         "base-lang heuristic is meaningless over decade-"
                         "sharded langs)")
    if args.longdoc:
        _make_longdoc(args)
        return
    if args.events:
        _make_events(args)
        return
    # The Caesar rotations 7k mod 26 are distinct only for k < 26; replica
    # 26 would rotate by 0 — byte-identical to replica 0, silently
    # reintroducing the cross-replica clone artifact this tool exists to
    # avoid. Level 2 is that second cipher parameter — but WITHIN level 2
    # the multiplier pool is the 12 units of Z/26.
    # An explicit raise, not `assert`: the cap must survive `python -O`.
    if args.level2:
        if args.replicas > len(_AFFINE_UNITS):
            raise SystemExit(
                f"--level2 replicas > {len(_AFFINE_UNITS)} exceed the "
                "distinct affine multipliers of Z/26"
            )
    elif args.replicas > 26:
        raise SystemExit("replicas > 26 reuse Caesar rotations")
    SRC = args.src
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

    if args.skew:
        hot_supp = con.execute(
            f"SELECT MIN(l_suppkey) FROM read_parquet('{SRC}/lineitem.parquet')"
        ).fetchone()[0]
        suppkey_expr = (
            f"CASE WHEN {_mix_residue('l_orderkey * 8 + l_linenumber', _HOT_SUPP_PCT)}"
            f" THEN {hot_supp} ELSE l_suppkey END"
        )
        lineitem_sel = (
            f"SELECT l_orderkey + k.k * {off} AS l_orderkey,\n"
            f"       {suppkey_expr} AS l_suppkey,\n"
            "       * EXCLUDE (l_orderkey, l_suppkey)"
        )
    else:
        lineitem_sel = (
            f"SELECT l_orderkey + k.k * {off} AS l_orderkey,\n"
            "       * EXCLUDE (l_orderkey)"
        )
    con.execute(f"""
COPY (
  {lineitem_sel}
  FROM read_parquet('{SRC}/lineitem.parquet'), range({r}) k(k)
) TO '{args.out}/lineitem.parquet' (FORMAT PARQUET, CODEC ZSTD)
""")
    if args.hotgraph:
        # ~30% of ALL orders (every replica) remap to the MIN customer: a
        # hub vertex spanning every supplier in the trade graph, and one
        # group key holding ~30% of the pair-extraction rows — the hot-key
        # shuffle case on the CUSTOMER side, which the r9 supplier skew
        # left unmeasured. Same masked high-bit multiplicative residue as
        # the supplier planting (low bits would ride source-key structure).
        hot_cust = con.execute(
            f"SELECT MIN(o_custkey) FROM read_parquet('{SRC}/orders.parquet')"
        ).fetchone()[0]
        orders_sel = (
            f"SELECT o_orderkey + k.k * {off} AS o_orderkey,\n"
            f"       CASE WHEN {_mix_residue('o_orderkey', _HOT_KEY_PCT)}"
            f" THEN {hot_cust} ELSE o_custkey END"
            " AS o_custkey,\n"
            "       * EXCLUDE (o_orderkey, o_custkey)"
        )
    else:
        orders_sel = (
            f"SELECT o_orderkey + k.k * {off} AS o_orderkey,\n"
            "       * EXCLUDE (o_orderkey)"
        )
    con.execute(f"""
COPY (
  {orders_sel}
  FROM read_parquet('{SRC}/orders.parquet'), range({r}) k(k)
) TO '{args.out}/orders.parquet' (FORMAT PARQUET, CODEC ZSTD)
""")
    alpha = "abcdefghijklmnopqrstuvwxyz"
    if args.level2:
        rot_cases = " ".join(
            f"WHEN k.k = {k} THEN translate(text, '{alpha}', "
            f"'{_affine_alphabet(_AFFINE_UNITS[k])}')"
            for k in range(1, r)
        )
    else:
        rot_cases = " ".join(
            f"WHEN k.k = {k} THEN translate(text, '{alpha}', "
            f"'{alpha[(7 * k) % 26:] + alpha[:(7 * k) % 26]}')"
            for k in range(1, r)
        )
    # Uniform: replica lang is suffixed (en -> en3) — replicas are disjoint
    # SHARDS, and lang is the blocking/df-cap key, so a 10x corpus of 10
    # shards presents 10 blocking groups, not one group with diluted global
    # document frequencies. Skew: the first half of the replicas are all
    # labelled with the hottest base lang — ONE blocking group holds ~50%
    # of the corpus (see the module docstring for the two consequences).
    if args.skew:
        hot_cut = (r + 1) // 2
        hot_lang = con.execute(
            f"SELECT lang FROM read_parquet('{SRC}/documents.parquet') "
            "GROUP BY lang ORDER BY COUNT(*) DESC, lang LIMIT 1"
        ).fetchone()[0]
        lang_expr = (
            f"CASE WHEN k.k < {hot_cut} THEN '{hot_lang}' "
            "ELSE lang || k.k END"
        )
    else:
        lang_expr = "CASE WHEN k.k = 0 THEN lang ELSE lang || k.k END"
    if args.hotgraph:
        # Template farm: M near-identical documents (the longest base text
        # + one unique trailing token each) in their OWN (lang, source)
        # blocking bucket. Pairwise token-Jaccard is T/(T+2) for T shared
        # distinct tokens (>=0.8 for any T>=8; the longest doc has
        # hundreds), so the farm is ONE Jaccard>=0.8 clique: C(M,2) edges
        # in a single component — adversarial edge GROWTH, where the r9
        # planted-supplier skew shrank the graph. Farm ids sit above every
        # replica id (r*doc_off) and far below the 9e8 adversarial edge-row
        # block.
        m = args.hotgraph
        farm_union = f"""
  UNION ALL
  SELECT CAST({r * doc_off} + f.f AS BIGINT) AS doc_id,
         b.text || ' farmtok' || f.f AS text,
         'farm0' AS lang,
         b.source AS source,
         CAST(length(b.text || ' farmtok' || f.f) AS INT) AS n_chars
  FROM (SELECT text, source FROM read_parquet('{SRC}/documents.parquet')
        ORDER BY n_chars DESC, doc_id LIMIT 1) b, range({m}) f(f)"""
    else:
        farm_union = ""
    if args.hotsource:
        # ~50% of the decade's documents collapse into the largest base
        # source; the remaining sources keep their uniform halves. The
        # residue is over the FINAL (replica-offset) doc id, so the hot
        # set is pseudo-random within every replica rather than whole
        # replicas flipping. Lang keeps the uniform per-replica suffix —
        # this axis isolates SOURCE heat from the r9 lang-block heat.
        hot_src = con.execute(
            f"SELECT source FROM read_parquet('{SRC}/documents.parquet') "
            "GROUP BY source ORDER BY COUNT(*) DESC, source LIMIT 1"
        ).fetchone()[0]
        source_expr = (
            f"CASE WHEN {_mix_residue(f'doc_id + k.k * {doc_off}', _HOT_SRC_PCT)}"
            f" THEN '{hot_src}' ELSE source END"
        )
    else:
        source_expr = "source"
    con.execute(f"""
COPY (
  SELECT doc_id + k.k * {doc_off} AS doc_id,
         CASE WHEN k.k = 0 THEN text {rot_cases} END AS text,
         {lang_expr} AS lang,
         {source_expr} AS source, n_chars
  FROM read_parquet('{SRC}/documents.parquet'), range({r}) k(k){farm_union}
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
