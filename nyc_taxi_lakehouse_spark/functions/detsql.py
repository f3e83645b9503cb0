"""Cross-engine-deterministic SQL building blocks.

The correctness gate hash-compares Spark results against a DuckDB oracle.
Floating-point SUM/AVG are order-dependent and shuffle order differs between
engines — so every continuous aggregate in this engine is computed through
exact DECIMAL sums (deterministic, associative) and only cast to DOUBLE at the
very end. The final double is then identical across engines because both
perform the same single decimal→double conversion and (for AVG) the same
single IEEE-754 division.

Most SQL here is valid in BOTH Spark SQL and DuckDB; the few divergent
functions (epoch extraction, list aggregation, …) go through the ``Dialect``
objects so one template renders both engines' SQL.
"""

from __future__ import annotations


def dsum(expr: str, scale: int = 2) -> str:
    """Order-independent SUM of a money-like expression.

    The summand must have true decimal precision ≤ ``scale`` (testdata money
    columns are exact 2-decimal values). Casting each row's value to
    DECIMAL(28,scale) then snaps the double to its true value identically in
    both engines — Spark converts double→decimal via Java shortest-repr
    strings while DuckDB rounds the exact binary expansion, and the two only
    agree when the rounding grid is far coarser than the double's ulp. The
    decimal sum is exact/associative; the final cast back to DOUBLE is a
    single correctly-rounded conversion.
    """
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(28,{scale}))) AS DOUBLE)"


def davg(expr: str, count_expr: str = "COUNT(*)", scale: int = 2) -> str:
    """Order-independent AVG: exact decimal sum, then one double division."""
    return f"({dsum(expr, scale)} / {count_expr})"


def dec2(expr: str) -> str:
    """Snap an exact-2-decimal double column to DECIMAL(12,2)."""
    return f"CAST({expr} AS DECIMAL(12,2))"


def disc_price(price: str, disc: str) -> str:
    """price * (1 - disc) in exact decimal arithmetic (both engines).

    Intermediate types pinned so neither engine's decimal-precision promotion
    rules overflow or round: (12,2)*(4,2) → ≤(17,4), cast to (18,4).
    """
    return (
        f"CAST({dec2(price)} * CAST(1 - {dec2(disc)} AS DECIMAL(4,2)) AS DECIMAL(18,4))"
    )


def charge(price: str, disc: str, tax: str) -> str:
    """price * (1 - disc) * (1 + tax), exact decimal: (18,4)*(4,2) → (24,6)."""
    return (
        f"CAST({disc_price(price, disc)} * CAST(1 + {dec2(tax)} AS DECIMAL(4,2))"
        f" AS DECIMAL(24,6))"
    )


def dround(expr: str, n: int = 2) -> str:
    """Cross-engine-deterministic ROUND of a double expression.

    ROUND on raw doubles diverges at .xx5 boundaries: a true rational like
    95.025 stores as 95.02499999999999; Spark rounds the binary value (→
    95.02) while DuckDB rounds the shortest decimal repr (→ 95.03). Fix:
    snap to DECIMAL(28,6) first — the 1e-6 grid is far coarser than the
    double's ulp, so both engines land on the same decimal — then round in
    decimal arithmetic, where both use half-away-from-zero.
    """
    return f"CAST(round(CAST(({expr}) AS DECIMAL(28,6)), {n}) AS DOUBLE)"


def dsum_dec(expr: str) -> str:
    """SUM of an already-exact decimal expression, emitted as DOUBLE."""
    return f"CAST(SUM({expr}) AS DOUBLE)"


def dxsum(x: str, y: str, p1: int = 12, s1: int = 2, p2: int = 12, s2: int = 2) -> str:
    """Order-independent SUM of a product of two exact-decimal columns.

    Each operand snaps to its true decimal value; the product is exact
    decimal (p1+p2+1 ≤ 38 digits — both engines compute it exactly), the sum
    is exact/associative, and the single final cast to DOUBLE is correctly
    rounded identically in both engines. This is the moment-sum building
    block for STDDEV/CORR (reference A5/A6, ml_feature_engineering.py:508,
    529-538): every second moment is Σxy over exact decimals, so the
    aggregates are deterministic under any shuffle order.
    """
    return (
        f"CAST(SUM(CAST({x} AS DECIMAL({p1},{s1}))"
        f" * CAST({y} AS DECIMAL({p2},{s2}))) AS DOUBLE)"
    )


def dxsum2(x: str, y: str, p1: int = 12, s1: int = 2, p2: int = 12, s2: int = 2) -> str:
    """dxsum for LARGE product sums: round the exact decimal sum to scale 2
    before the double cast.

    The final decimal→double cast is only engine-identical while the
    decimal's UNSCALED value stays below 2^53 (both engines then compute
    exact-int → ÷10^scale, a single correctly-rounded step; verified by a
    300-case probe on both). A scale-4 product sum crosses 2^53 around
    9×10^11 in value units, where Java BigDecimal.doubleValue() and DuckDB's
    int128 path double-round DIFFERENTLY (observed 1-ulp divergence on
    Σprice²). Rounding to scale 2 first keeps the cast exact up to ~9×10^13
    in value units — the ±0.005 absolute perturbation on a ≥1e9 moment is
    orders of magnitude below the final statistic's own ulp. For sums beyond
    that, round coarser (scale 0 buys two more decades)."""
    return (
        f"CAST(ROUND(SUM(CAST({x} AS DECIMAL({p1},{s1}))"
        f" * CAST({y} AS DECIMAL({p2},{s2}))), 2) AS DOUBLE)"
    )


def dstddev(n: str, sx: str, sxx: str) -> str:
    """Sample standard deviation from exact moment sums (already DOUBLE).

    sqrt((n·Σx² − (Σx)²) / (n·(n−1))) — the numerically direct form is safe
    here because Σx/Σx² are exact decimal sums cast once to double, and both
    engines evaluate this identical IEEE-754 expression tree; matches
    STDDEV_SAMP (Spark STDDEV / DuckDB stddev default).
    """
    nd = f"CAST({n} AS DOUBLE)"
    return f"SQRT(({nd} * {sxx} - {sx} * {sx}) / ({nd} * ({nd} - 1)))"


def dcorr(n: str, sx: str, sy: str, sxy: str, sxx: str, syy: str) -> str:
    """Pearson correlation from exact moment sums (already DOUBLE):
    (n·Σxy − ΣxΣy) / (sqrt(n·Σx² − (Σx)²) · sqrt(n·Σy² − (Σy)²)).
    Identical expression tree in both engines → identical double."""
    nd = f"CAST({n} AS DOUBLE)"
    return (
        f"(({nd} * {sxy} - {sx} * {sy})"
        f" / (SQRT({nd} * {sxx} - {sx} * {sx})"
        f" * SQRT({nd} * {syy} - {sy} * {sy})))"
    )


def dregr_slope(n: str, sx: str, sy: str, sxy: str, sxx: str) -> str:
    """OLS slope of y on x from exact moment sums (already DOUBLE):
    (n·Σxy − ΣxΣy) / (n·Σx² − (Σx)²) — REGR_SLOPE semantics, but
    deterministic: both engines evaluate this identical IEEE-754 expression
    tree over identically-rounded decimal-sum inputs."""
    nd = f"CAST({n} AS DOUBLE)"
    return (
        f"(({nd} * {sxy} - {sx} * {sy}) / ({nd} * {sxx} - {sx} * {sx}))"
    )


def dregr_intercept(n: str, sx: str, sy: str, sxy: str, sxx: str) -> str:
    """OLS intercept from exact moment sums: (Σy − slope·Σx) / n, with the
    slope inlined so the whole tree is shared verbatim across engines."""
    nd = f"CAST({n} AS DOUBLE)"
    return (
        f"(({sy} - {dregr_slope(n, sx, sy, sxy, sxx)} * {sx}) / {nd})"
    )


class Dialect:
    """SQL fragments that differ between Spark SQL and DuckDB."""

    name = "spark"

    def epoch(self, ts: str) -> str:
        """Epoch seconds (BIGINT) of a timestamp. Session tz must be UTC."""
        return f"unix_timestamp({ts})"

    def epoch_hour(self, ts: str) -> str:
        """Hour-truncated timestamp as epoch seconds (BIGINT).

        Emitting raw timestamps is unsafe: the events table is
        nanosecond-precision and Spark truncates to microseconds while DuckDB
        keeps TIMESTAMP_NS. An epoch BIGINT is identical in both engines.
        """
        return self.epoch(f"date_trunc('hour', {ts})")

    def epoch_bucket(self, ts: str, seconds: int) -> str:
        """Tumbling-window start as epoch seconds — portable equivalent of
        Spark's window(ts, '<n> seconds').start / DuckDB's time_bucket."""
        return f"(CAST(floor({self.epoch(ts)} / {seconds}) AS BIGINT) * {seconds})"

    def dow(self, ts: str) -> str:
        """Day of week, 1=Sunday..7=Saturday (Spark dayofweek convention;
        reference uses IN (1,7) for weekends, comprehensive_analytics.py:366)."""
        return f"dayofweek({ts})"

    def sorted_set_csv(self, col: str) -> str:
        """collect_set → sorted comma-joined string (deterministic encoding of
        reference A7, weather_to_iceberg.py:115)."""
        return f"concat_ws(',', sort_array(collect_set({col})))"

    def json_int(self, col: str, key: str) -> str:
        """Extract an int field from a JSON string column."""
        return f"CAST(get_json_object({col}, '$.{key}') AS BIGINT)"

    def split_tokens(self, col: str) -> str:
        """Whitespace tokenization → array of words."""
        return f"split({col}, ' +')"

    def regex_strip(self, col: str, pattern: str) -> str:
        """Remove ALL matches of pattern (DuckDB needs the 'g' flag —
        its regexp_replace is first-match-only by default)."""
        return f"regexp_replace({col}, '{pattern}', '')"

    def token_count(self, col: str) -> str:
        return f"CAST(size({self.split_tokens(col)}) AS INT)"

    def token_filter_count(self, col: str, values: str) -> str:
        """Count of tokens in a fixed vocabulary (stopword counting)."""
        return f"CAST(size(filter({self.split_tokens(col)}, x -> x IN ({values}))) AS INT)"

    def distinct_token_rows(self, table: str, extra_cols: str = "") -> str:
        """SELECT fragment exploding each row's distinct tokens to rows."""
        cols = f"{extra_cols}, " if extra_cols else ""
        return (
            f"SELECT doc_id, {cols}explode(array_distinct({self.split_tokens('text')}))"
            f" AS token FROM {table}"
        )

    def all_token_rows(self, table: str) -> str:
        """SELECT fragment exploding ALL token occurrences (duplicates kept
        — the tf side of retrieval scoring)."""
        return (
            f"SELECT doc_id, explode({self.split_tokens('text')})"
            f" AS token FROM {table}"
        )

    def to_str(self, expr: str) -> str:
        """Cast to the engine's string type (STRING vs VARCHAR)."""
        return f"CAST({expr} AS STRING)"

    def all_token_rows_src(self, table: str) -> str:
        """SELECT fragment exploding ALL token occurrences, carrying the
        provenance columns (lang, source) alongside doc_id."""
        return (
            f"SELECT doc_id, lang, source, explode({self.split_tokens('text')})"
            f" AS token FROM {table}"
        )

    def epoch_us(self, ts: str) -> str:
        """Epoch microseconds as BIGINT (the safe cross-engine encoding for
        the ns-precision events timestamps)."""
        return f"unix_micros({ts})"

    def xor(self, a: str, b: str) -> str:
        return f"({a} ^ {b})"

    def idiv(self, a: str, b: str) -> str:
        """Integer (floor) division on integers."""
        return f"({a} DIV {b})"

    def positional_token_rows(self, table: str) -> str:
        """SELECT fragment exploding tokens WITH their 1-based position."""
        return (
            f"SELECT doc_id, p.i + 1 AS i, p.token FROM {table} "
            f"LATERAL VIEW posexplode({self.split_tokens('text')}) p AS i, token"
        )

    def md5_int32(self, expr: str) -> str:
        """First 32 bits of md5 as a BIGINT — a cross-engine integer token
        hash (both engines agree: hex digits of the same md5)."""
        return f"CAST(conv(substring(md5({expr}), 1, 8), 16, 10) AS BIGINT)"

    def regex_tokens(self, col: str, pat: str) -> str:
        """All matches of pat as an array (whole-match group)."""
        return f"regexp_extract_all({col}, '{pat}', 0)"

    def arr_len(self, expr: str) -> str:
        return f"CAST(size({expr}) AS INT)"


class DuckDialect(Dialect):
    name = "duckdb"

    def epoch(self, ts: str) -> str:
        return f"CAST(floor(epoch({ts})) AS BIGINT)"

    def dow(self, ts: str) -> str:
        # DuckDB dayofweek: 0=Sunday..6=Saturday → shift to Spark's 1..7.
        return f"(dayofweek({ts}) + 1)"

    def sorted_set_csv(self, col: str) -> str:
        return f"string_agg(DISTINCT {col}, ',' ORDER BY {col})"

    def json_int(self, col: str, key: str) -> str:
        return f"CAST(json_extract_string({col}, '$.{key}') AS BIGINT)"

    def split_tokens(self, col: str) -> str:
        return f"string_split_regex({col}, ' +')"

    def regex_strip(self, col: str, pattern: str) -> str:
        return f"regexp_replace({col}, '{pattern}', '', 'g')"

    def token_count(self, col: str) -> str:
        return f"CAST(len({self.split_tokens(col)}) AS INT)"

    def token_filter_count(self, col: str, values: str) -> str:
        return (
            f"CAST(len(list_filter({self.split_tokens(col)}, x -> x IN ({values}))) AS INT)"
        )

    def distinct_token_rows(self, table: str, extra_cols: str = "") -> str:
        cols = f"{extra_cols}, " if extra_cols else ""
        return (
            f"SELECT doc_id, {cols}unnest(list_distinct({self.split_tokens('text')}))"
            f" AS token FROM {table}"
        )

    def all_token_rows(self, table: str) -> str:
        return (
            f"SELECT doc_id, unnest({self.split_tokens('text')})"
            f" AS token FROM {table}"
        )

    def to_str(self, expr: str) -> str:
        return f"CAST({expr} AS VARCHAR)"

    def all_token_rows_src(self, table: str) -> str:
        return (
            f"SELECT doc_id, lang, source, unnest({self.split_tokens('text')})"
            f" AS token FROM {table}"
        )

    def epoch_us(self, ts: str) -> str:
        return f"(epoch_ns({ts}) // 1000)"

    def xor(self, a: str, b: str) -> str:
        return f"xor({a}, {b})"

    def idiv(self, a: str, b: str) -> str:
        return f"({a} // {b})"

    def positional_token_rows(self, table: str) -> str:
        # Indexed list_transform lambda: i is 1-based in DuckDB.
        return (
            f"SELECT doc_id, u.i, u.tok AS token FROM ("
            f"SELECT doc_id, unnest(list_transform({self.split_tokens('text')},"
            f" (x, i) -> {{'tok': x, 'i': i}})) AS u FROM {table}) s"
        )

    def md5_int32(self, expr: str) -> str:
        return f"CAST(('0x' || substring(md5({expr}), 1, 8)) AS BIGINT)"

    def regex_tokens(self, col: str, pat: str) -> str:
        return f"regexp_extract_all({col}, '{pat}')"

    def arr_len(self, expr: str) -> str:
        return f"CAST(len({expr}) AS INT)"


SPARK = Dialect()
DUCK = DuckDialect()


def rank2_ctes(d: Dialect, vals: str, out: str, buckets: int = 64) -> str:
    """CTE chain computing DOUBLED midranks (rank2 = 2·avg_rank, always an
    integer) over a per-value aggregate ``vals(v BIGINT, c BIGINT, ...)``
    — as a parallel two-pass offset sweep, NOT a global single-partition
    window.

    Pass 1: monotone integer bucketing (v−vmin)·B ÷ (vmax−vmin+1) and
    per-bucket totals; the bucket-offset prefix runs over ≤B rows. Pass 2:
    the within-bucket prefix windows PARTITION BY bucket — parallel. The
    only single-partition pieces left are the 1-row bounds and the ≤B-row
    offset table. rank2 = 2·(#smaller) + (#equal) + 1; carry columns from
    ``vals`` survive (k.*). Skewed value distributions only unbalance the
    buckets, never break correctness.
    """
    div = d.idiv(f"(x.v - b.vmin) * {buckets}", "(b.vmax - b.vmin + 1)")
    return f"""
{out}_bounds AS (SELECT MIN(v) AS vmin, MAX(v) AS vmax FROM {vals}),
{out}_bk AS (
  SELECT x.*, CAST({div} AS BIGINT) AS bkt
  FROM {vals} x CROSS JOIN {out}_bounds b
),
{out}_off AS (
  SELECT bkt, CAST(SUM(tc) OVER (ORDER BY bkt) - tc AS BIGINT) AS off
  FROM (SELECT bkt, SUM(c) AS tc FROM {out}_bk GROUP BY bkt) g
),
{out} AS (
  SELECT k.*,
         CAST(2 * (o.off + SUM(k.c) OVER (PARTITION BY k.bkt ORDER BY k.v) - k.c)
              + k.c + 1 AS BIGINT) AS rank2
  FROM {out}_bk k JOIN {out}_off o ON k.bkt = o.bkt
)"""
