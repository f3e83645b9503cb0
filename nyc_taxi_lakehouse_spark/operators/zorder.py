"""Z-order (Morton-curve) data clustering + layout-effectiveness audit.

The lakehouse layout problem: a table sorted by ONE column gives great
file-level min/max skipping for predicates on that column and none for any
other. Interleaving the bits of two (or more) dimensions into a single
Morton code and range-partitioning files by that code gives *good* skipping
on every participating dimension at once — the layout strategy behind
Delta's OPTIMIZE ZORDER BY and Iceberg's sort-order z-ordering. The
reference delegates all file layout to Iceberg's table maintenance
(reference: setup_scripts/iceberg_bootstrap.sql table properties,
airflow_dags/maintenance_dag.py rewrite_data_files); here both the
production clustering path (``zorder_column`` + VersionedLakeTable.cluster)
and an oracle-checked audit of WHY it works (``q_zorder_layout``) are
first-class.

Exactness: the Morton interleave is pure integer arithmetic (floor-div,
mod, multiply by power-of-two literals) so the audit query is bit-identical
across Spark and DuckDB — no engine bit-op dialect differences enter the
gate.

Scale shape: the audit models files as NTILE buckets of the z-sort (a
global window — whitelisted, it IS the thing being audited, over one table
at audit scale); the production path in versioned.VersionedLakeTable.cluster
uses repartitionByRange(z) + sortWithinPartitions(z), which samples range
boundaries and never materializes a global sort on one machine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.detsql import DUCK, SPARK, Dialect
from ..registry import sql_query

__all__ = ["morton_sql", "zorder_column", "N_FILES"]

#: audit constants: 12-bit normalized dims, 64 model files, and a fixed
#: box predicate (custkey middle eighth x one 366-day window) — all in
#: normalized units so the same literals work at every SF.
_BITS = 12
_SCALE = (1 << _BITS) - 1  # 4095
N_FILES = 64
_X_LO, _X_HI = 512, 1023  # one eighth of the custkey span
_Y_LO, _Y_HI = 800, 1165  # ~366 days of the ~2406-day date span


def morton_sql(d: Dialect, x: str, y: str, bits: int = _BITS) -> str:
    """Portable SQL for the Morton interleave of two non-negative ints in
    [0, 2^bits): bit i of x lands at position 2i, bit i of y at 2i+1.
    Arithmetic-only (DIV/%/*) so Spark and DuckDB agree bit-for-bit."""
    terms = []
    for i in range(bits):
        terms.append(f"({d.idiv(x, str(1 << i))} % 2) * {4 ** i}")
        terms.append(f"({d.idiv(y, str(1 << i))} % 2) * {2 * 4 ** i}")
    return "(" + " + ".join(terms) + ")"


def zorder_column(cols: list[Column], bits: int = _BITS) -> Column:
    """Production-path Morton code over 2+ pre-normalized integer columns
    (each in [0, 2^bits)), built with JVM-side shiftleft/bitwise-or so the
    whole expression stays inside whole-stage codegen. Round-robin bit
    interleave: bit i of column j lands at position i*len(cols)+j."""
    n = len(cols)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def minmax_scale(c: Column, mn: Column, mx: Column, bits: int = _BITS) -> Column:
    """Integer min-max normalization onto [0, 2^bits): the rank-free
    normalization used before interleaving (Delta uses range-ids from a
    sample; min-max is deterministic and good enough unless a dimension is
    pathologically skewed, which the audit query would surface)."""
    span = F.greatest(mx.cast("long") - mn.cast("long"), F.lit(1).cast("long"))
    scaled = (c.cast("long") - mn.cast("long")) * _scale_lit(bits)
    return F.floor(scaled / span).cast("long")


def _scale_lit(bits: int) -> Column:
    return F.lit((1 << bits) - 1).cast("long")


def _zorder_layout_sql(d: Dialect) -> str:
    if d.name == "spark":
        daynum = "CAST(datediff(o_orderdate, DATE '1992-01-01') AS BIGINT)"
    else:
        daynum = (
            "CAST(date_diff('day', DATE '1992-01-01', "
            "CAST(o_orderdate AS DATE)) AS BIGINT)"
        )
    x_pred = f"x BETWEEN {_X_LO} AND {_X_HI}"
    y_pred = f"y BETWEEN {_Y_LO} AND {_Y_HI}"
    x_over = f"mnx <= {_X_HI} AND mxx >= {_X_LO}"
    y_over = f"mny <= {_Y_HI} AND mxy >= {_Y_LO}"
    return f"""
WITH mm AS (
  SELECT CAST(MIN(o_custkey) AS BIGINT) AS cmn,
         CAST(MAX(o_custkey) AS BIGINT) AS cmx,
         MIN({daynum}) AS dmn,
         MAX({daynum}) AS dmx
  FROM orders
),
base AS (
  SELECT o.o_orderkey AS k,
         {d.idiv(f'(CAST(o.o_custkey AS BIGINT) - mm.cmn) * {_SCALE}',
                 'GREATEST(mm.cmx - mm.cmn, 1)')} AS x,
         {d.idiv(f'({daynum} - mm.dmn) * {_SCALE}',
                 'GREATEST(mm.dmx - mm.dmn, 1)')} AS y
  FROM orders o CROSS JOIN mm
),
zb AS (SELECT k, x, y, {morton_sql(d, 'x', 'y')} AS zv FROM base),
lay AS (
  SELECT 'zorder' AS layout,
         NTILE({N_FILES}) OVER (ORDER BY zv, k) AS f, x, y FROM zb
  UNION ALL
  SELECT 'by_custkey', NTILE({N_FILES}) OVER (ORDER BY x, k), x, y FROM zb
  UNION ALL
  SELECT 'by_date', NTILE({N_FILES}) OVER (ORDER BY y, k), x, y FROM zb
),
files AS (
  SELECT layout, f,
         MIN(x) AS mnx, MAX(x) AS mxx, MIN(y) AS mny, MAX(y) AS mxy,
         CAST(COUNT(*) AS BIGINT) AS nrows,
         CAST(SUM(CASE WHEN {x_pred} THEN 1 ELSE 0 END) AS BIGINT) AS hit_x,
         CAST(SUM(CASE WHEN {y_pred} THEN 1 ELSE 0 END) AS BIGINT) AS hit_y,
         CAST(SUM(CASE WHEN {x_pred} AND {y_pred} THEN 1 ELSE 0 END)
              AS BIGINT) AS hit_box
  FROM lay GROUP BY layout, f
)
SELECT layout,
       CAST(COUNT(*) AS INT) AS n_files,
       CAST(SUM(CASE WHEN {x_over} THEN 1 ELSE 0 END) AS INT) AS files_x,
       CAST(SUM(CASE WHEN {x_over} THEN nrows ELSE 0 END) AS BIGINT)
         AS rows_scanned_x,
       CAST(SUM(hit_x) AS BIGINT) AS rows_match_x,
       CAST(SUM(CASE WHEN {y_over} THEN 1 ELSE 0 END) AS INT) AS files_y,
       CAST(SUM(CASE WHEN {y_over} THEN nrows ELSE 0 END) AS BIGINT)
         AS rows_scanned_y,
       CAST(SUM(hit_y) AS BIGINT) AS rows_match_y,
       CAST(SUM(CASE WHEN {x_over} AND {y_over} THEN 1 ELSE 0 END) AS INT)
         AS files_box,
       CAST(SUM(CASE WHEN {x_over} AND {y_over} THEN nrows ELSE 0 END)
            AS BIGINT) AS rows_scanned_box,
       CAST(SUM(hit_box) AS BIGINT) AS rows_match_box
FROM files
GROUP BY layout
"""


sql_query(
    "q_zorder_layout",
    spark_sql=_zorder_layout_sql(SPARK),
    duck_sql=_zorder_layout_sql(DUCK),
    tables=["orders"],
    doc="Z-ORDER layout audit: min-max-normalize (o_custkey, orderdate-day) "
    "onto 12-bit ints, Morton-interleave them (pure integer arithmetic — "
    "bit-identical across engines), model 64 files as NTILE buckets under "
    "three layouts (z-order, sort-by-custkey, sort-by-date), and report "
    "file-level min/max skipping for a custkey-range predicate, a date-"
    "range predicate, and their box conjunction. The single-dimension "
    "layouts win their own dimension and scan ~every file on the other; "
    "z-order prunes meaningfully on BOTH — the measured justification for "
    "VersionedLakeTable.cluster's OPTIMIZE-ZORDER commit (which uses "
    "repartitionByRange on the same code — no global sort — at scale). "
    "Match counts are layout-invariant by construction, a built-in sanity "
    "row. Reference delegates layout maintenance to Iceberg "
    "(airflow_dags/maintenance_dag.py rewrite_data_files); here it is "
    "implemented and audited natively.",
)
