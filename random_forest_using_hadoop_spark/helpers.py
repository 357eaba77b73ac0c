"""Cross-engine determinism helpers.

The driver hash-matches query values against a DuckDB oracle
(order-insensitive, columns sorted by name). Double-precision SUM/AVG
over ≥10⁴ rows differs between engines by ~1e-2 absolute (different
accumulation order), which no post-hoc rounding reliably masks. Policy:

- ``dsum``/``davg``: aggregate through DECIMAL(18,6) — exact in both
  engines, order-insensitive — then cast the final scalar to DOUBLE
  (exact decimal→double is deterministic). Matching SQL builders
  ``o_dsum``/``o_davg`` emit the DuckDB side.
- ``r6``: round(x, 6) for scalar (non-aggregated) float expressions,
  where both engines compute the same IEEE double and rounding only
  guards display-level noise.

Scale note: decimal aggregation is marginally slower than double but
stays inside whole-stage codegen; TPC-H itself specifies decimals.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def dsum(col: Column | str) -> Column:
    """Order-insensitive cross-engine-exact sum of a double column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Exact-decimal mean: sum(decimal)/count, evaluated in double at the end."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)


def o_dsum(expr: str) -> str:
    """DuckDB SQL mirroring :func:`dsum`."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,6))) AS DOUBLE)"


def o_davg(expr: str) -> str:
    """DuckDB SQL mirroring :func:`davg`."""
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,6))) AS DOUBLE) / COUNT(({expr}))"
    )


def r6(col: Column) -> Column:
    return F.round(col, 6)
