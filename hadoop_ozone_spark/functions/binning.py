"""X5 — power-of-two file-size binning (A1's bin function).

Reference: ``ReconUtils.getFileSizeUpperBound`` / ``getBinIndex``
(recon/.../ReconUtils.java:303-331) and the 41-bin constant
(ReconConstants.java:61-67): first bin upper bound is 1 KB (2^10), bins
double up to 2^50, anything larger lands in the ``Long.MAX_VALUE``
overflow bin. The reference computes ``nextClosestPowerIndexOfTwo`` via
bit count, so an EXACT power of two lands in the NEXT bin (1024 → 2048)
and ``fileSize >= 2^50`` (inclusive) overflows to ``Long.MAX_VALUE`` —
hence the strict ``size < upper_bound`` comparisons below.

Implemented as a generated CASE ladder over integer literals — no
``log2`` floats — so Spark and the DuckDB oracle agree bit-for-bit on
every boundary (1024 exactly, 1025, 2^50, 2^50+1, 0-byte keys).
The ladder compiles to a binary-search-free chain inside whole-stage
codegen; at 100 TB it is a pure map-side expression, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MIN_EXP = 10  # 1 KB
MAX_EXP = 50  # 1 PB
LONG_MAX = 9223372036854775807
UPPER_BOUNDS = [2**e for e in range(MIN_EXP, MAX_EXP + 1)]  # 41 bins
NUM_BINS = len(UPPER_BOUNDS) + 1  # + overflow


def file_size_upper_bound(size: Column) -> Column:
    """Smallest power-of-two bin upper bound STRICTLY greater than size
    (floor 2^10; size >= 2^50 → Long.MAX_VALUE) — Spark Column
    expression, matching ReconUtils.getFileSizeUpperBound exactly
    (1024 → 2048; 2^50 → Long.MAX_VALUE)."""
    expr = F.lit(LONG_MAX)
    for ub in reversed(UPPER_BOUNDS):
        expr = F.when(size < F.lit(ub), F.lit(ub)).otherwise(expr)
    return expr


def file_size_upper_bound_sql(col: str) -> str:
    """Same ladder as ANSI SQL (for the DuckDB oracle)."""
    whens = "\n    ".join(
        f"WHEN {col} < {ub} THEN CAST({ub} AS BIGINT)" for ub in UPPER_BOUNDS
    )
    return f"CASE\n    {whens}\n    ELSE CAST({LONG_MAX} AS BIGINT) END"


def file_size_upper_bound_py(size: int) -> int:
    """Python reference implementation (unit-test oracle)."""
    for ub in UPPER_BOUNDS:
        if size < ub:
            return ub
    return LONG_MAX
