"""Determinism helpers shared by operators (SURVEY.md §7.5).

Float aggregates are the top oracle-mismatch risk: parallel summation reorders
additions, and Spark's ROUND (HALF_UP on the shortest decimal repr) is not the
same function as DuckDB's ROUND (on the binary value). Conventions:

- **Money/score sums**: cast each row to DECIMAL early (exact — the fixtures
  carry <= 2dp values, FIXTURES.md), SUM in decimal (exact, order-free),
  **rescale to a small output scale, then** cast to DOUBLE. The rescale is
  load-bearing: DuckDB's decimal->double cast double-rounds when the scaled
  int128 exceeds 2^53 (observed 1-ulp drift vs Spark at scale 8 on sf0.01
  sums ~5e8), while at scale <= 4 the scaled integer is exact in a double and
  both engines' casts are single correctly-rounded ops -> bit-identical
  float64 on both sides.
- **avg/stddev/ratios**: ROUND(x, n). Drift is ~1e-9 relative post-division,
  so boundary collisions are negligible.
- **Per-row arithmetic**: leave raw — IEEE754 ops on identical inputs are
  bit-identical across engines; rounding per-row only adds divergence risk.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(
    col: Column | str, alias: str, scale: int = 2, out_scale: int = 2
) -> Column:
    """Order-independent exact sum of a double column (see module doc).

    ``scale`` = per-row accumulation scale (captures full input precision);
    ``out_scale`` = final scale before the double cast (keep the scaled
    integer under 2^53: |sum| * 10^out_scale < 9e15).
    """
    s = F.sum(_c(col).cast(f"decimal(28,{scale})"))
    # ROUND (not a decimal cast): DuckDB's decimal downscale-cast truncates
    # while Spark's rounds; both engines' ROUND-on-decimal is exact
    # half-away-from-zero integer arithmetic.
    return F.round(s, out_scale).cast("double").alias(alias)


def dsum_sql(expr: str, alias: str, scale: int = 2, out_scale: int = 2) -> str:
    """DuckDB-side twin of :func:`dsum`."""
    return (
        f"CAST(ROUND(SUM(CAST({expr} AS DECIMAL(28,{scale}))), {out_scale}) "
        f"AS DOUBLE) AS {alias}"
    )


def ravg(col: Column | str, alias: str, ndigits: int = 2) -> Column:
    return F.round(F.avg(_c(col)), ndigits).alias(alias)


def disc_price() -> Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def charge() -> Column:
    return disc_price() * (1 + F.col("l_tax"))
