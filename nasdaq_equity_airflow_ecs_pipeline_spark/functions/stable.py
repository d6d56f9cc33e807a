"""Order-stable, cross-engine-exact aggregate builders.

Floating-point SUM/AVG/STDDEV depend on accumulation order, which differs
between Spark's partial/final aggregation tree and any single-threaded
oracle — and between two Spark runs with different partitioning. At 100 TB
(thousands of partial aggregates) the drift is material for money columns.

Technique: route the commutative part through DECIMAL (exact, order-free),
do the final non-exact arithmetic in one deterministic double-precision
expression. ``sum(cast(x as decimal))`` is bit-identical no matter how the
data is partitioned, so results are reproducible cluster-to-laptop and
hash-comparable against a DuckDB oracle.

Cross-engine subtlety: Spark converts double→decimal through the double's
SHORTEST decimal string (Java ``BigDecimal.valueOf``), DuckDB through the
exact binary expansion. The two round differently for doubles whose
shortest representation ties at the target scale. Therefore only *raw
column values* (which in practice carry few decimal places: money = 2dp)
may be cast double→decimal; every derived quantity stays in decimal
arithmetic (exact) or in double (deterministic IEEE, never re-cast to
decimal).

stddev uses the sum-of-squares identity on exact decimal sums:
    var = (Sxx - Sx^2/n) / (n-1)
with the square computed in decimal — (16,4)^2 -> decimal(33,8), exact.
Magnitude contract: |x| < 1e10 and n < 1e5 per group keeps every
intermediate inside decimal(38,8); inputs here are prices/percentages.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Raw-value cast: 8 decimal places, |x| < 1e19. Raw feeds carry <= 6dp, so
# the shortest-repr conversion is exact and engine-independent.
_ROW_DEC = "decimal(27,8)"
# stddev path: tighter so the decimal square stays exact (33,8) <= 38.
_SD_DEC = "decimal(16,4)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _dec2dbl(c: Column) -> Column:
    """decimal -> double through a string hop. Direct decimal->double casts
    are not correctly rounded the same way in Spark (BigDecimal.doubleValue)
    and DuckDB (int128 * 10^-s, two roundings); string parsing is correctly
    rounded in both, so the hop makes the conversion engine-identical."""
    return c.cast("string").cast("double")


def dsum(col: Column | str) -> Column:
    """Order-independent sum of a raw double column, returned as double."""
    return _dec2dbl(F.sum(_c(col).cast(_ROW_DEC)))


def davg(col: Column | str) -> Column:
    """Order-independent mean: exact decimal sum / count, one double divide."""
    c = _c(col)
    return _dec2dbl(F.sum(c.cast(_ROW_DEC))) / F.count(c)


def dstddev(col: Column | str) -> Column:
    """Order-independent sample stddev of a raw double column (see module
    docstring for the magnitude contract)."""
    c = _c(col)
    cd = c.cast(_SD_DEC)
    n = F.count(c).cast("double")
    sx = _dec2dbl(F.sum(cd))
    sxx = _dec2dbl(F.sum(cd * cd))
    var = (sxx - sx * sx / n) / (n - F.lit(1.0))
    # clamp tiny negative residue from the final double arithmetic
    return F.when(n > 1, F.sqrt(F.greatest(var, F.lit(0.0)))).otherwise(F.lit(None))


def dround(c: Column, scale: int = 6) -> Column:
    return F.round(c, scale)


def dcorr(x: Column | str, y: Column | str) -> Column:
    """Order-independent Pearson correlation: all five sums exact decimal,
    one deterministic double-precision finish. ``F.corr`` accumulates
    doubles in partition order and drifts across partitionings; this
    doesn't. Magnitude contract as dstddev (|x|,|y| < 1e10 at 4dp)."""
    # Pairwise-complete exclusion (F.corr semantics): a row where either
    # side is null contributes to NONE of the five sums nor the count —
    # otherwise n counts rows the sums skipped and the statistic biases.
    both = _c(x).isNotNull() & _c(y).isNotNull()
    cx = F.when(both, _c(x)).cast(_SD_DEC)
    cy = F.when(both, _c(y)).cast(_SD_DEC)
    n = F.count(F.when(both, F.lit(1))).cast("double")
    sx, sy = _dec2dbl(F.sum(cx)), _dec2dbl(F.sum(cy))
    sxx, syy = _dec2dbl(F.sum(cx * cx)), _dec2dbl(F.sum(cy * cy))
    sxy = _dec2dbl(F.sum(cx * cy))
    num = n * sxy - sx * sy
    den = F.sqrt(F.greatest(n * sxx - sx * sx, F.lit(0.0))) * F.sqrt(
        F.greatest(n * syy - sy * sy, F.lit(0.0))
    )
    return F.when(den > 0, num / den).otherwise(F.lit(None))


# DuckDB-side SQL templates producing bit-identical results.
def sql_dec2dbl(expr: str) -> str:
    return f"CAST(CAST(({expr}) AS VARCHAR) AS DOUBLE)"


def sql_dsum(expr: str) -> str:
    return sql_dec2dbl(f"SUM(CAST(({expr}) AS DECIMAL(27,8)))")


def sql_davg(expr: str) -> str:
    return f"{sql_dec2dbl(f'SUM(CAST(({expr}) AS DECIMAL(27,8)))')} / COUNT({expr})"


def sql_dcorr(x: str, y: str) -> str:
    """DuckDB twin of dcorr (DECIMAL(19,4) forces int128 storage).
    Mirrors the pairwise-complete null exclusion."""
    both = f"(({x}) IS NOT NULL AND ({y}) IS NOT NULL)"
    cx = f"CAST(CASE WHEN {both} THEN ({x}) END AS DECIMAL(19,4))"
    cy = f"CAST(CASE WHEN {both} THEN ({y}) END AS DECIMAL(19,4))"
    n = f"CAST(COUNT(CASE WHEN {both} THEN 1 END) AS DOUBLE)"
    sx, sy = sql_dec2dbl(f"SUM({cx})"), sql_dec2dbl(f"SUM({cy})")
    sxx, syy = sql_dec2dbl(f"SUM({cx} * {cx})"), sql_dec2dbl(f"SUM({cy} * {cy})")
    sxy = sql_dec2dbl(f"SUM({cx} * {cy})")
    num = f"({n}) * ({sxy}) - ({sx}) * ({sy})"
    den = (
        f"SQRT(GREATEST(({n}) * ({sxx}) - ({sx}) * ({sx}), 0.0))"
        f" * SQRT(GREATEST(({n}) * ({syy}) - ({sy}) * ({sy}), 0.0))"
    )
    return f"CASE WHEN ({den}) > 0 THEN ({num}) / ({den}) ELSE NULL END"


def sql_dstddev(expr: str) -> str:
    # DECIMAL(19,4): same numeric values as Spark's (16,4) but forces
    # DuckDB's int128 storage so the square cannot overflow int64
    cd = f"CAST(({expr}) AS DECIMAL(19,4))"
    n = f"CAST(COUNT({expr}) AS DOUBLE)"
    sx = sql_dec2dbl(f"SUM({cd})")
    sxx = sql_dec2dbl(f"SUM({cd} * {cd})")
    var = f"(({sxx}) - ({sx}) * ({sx}) / ({n})) / (({n}) - 1.0)"
    return f"CASE WHEN COUNT({expr}) > 1 THEN SQRT(GREATEST({var}, 0.0)) ELSE NULL END"
