"""Approximate aggregates for 100 TB cardinalities.

Exact COUNT(DISTINCT) over a high-cardinality key is a full dedup
shuffle; exact percentiles need a global sort. The approximate forms are
single-pass, mergeable sketches (HyperLogLog++ / KLL-style quantile
summaries) that partial-aggregate map-side like any algebraic function —
constant memory per group, one narrow shuffle of sketch bytes.

These wrap Spark built-ins (JVM-side, codegen-friendly) with the error
contracts spelled out; tests pin observed error against exact results.
Approximate results are intentionally NOT in the DuckDB oracle gate —
two engines' sketches differ by design.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def approx_distinct(col: Column | str, rsd: float = 0.05) -> Column:
    """HyperLogLog++ distinct count; relative standard deviation ``rsd``
    (default 5%; smaller rsd = bigger sketch, ~1.04/sqrt(m))."""
    return F.approx_count_distinct(col, rsd=rsd)


def approx_quantiles(col: Column | str, probs: list[float], accuracy: int = 10_000) -> Column:
    """Approximate quantiles; rank error <= 1/accuracy of the row count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.percentile_approx(
        c, F.array(*[F.lit(float(p)) for p in probs]), F.lit(accuracy)
    )


def approx_median(col: Column | str, accuracy: int = 10_000) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.percentile_approx(c, F.lit(0.5), F.lit(accuracy))
