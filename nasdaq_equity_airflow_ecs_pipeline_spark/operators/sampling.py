"""Deterministic sampling for training-mix construction.

``df.sample()`` / ``sampleBy()`` draw from an RNG whose stream depends on
partitioning — rerun the job with different parallelism and you get a
different corpus. A training pipeline needs the OPPOSITE: membership
decided by a pure function of the row key, so the sample is stable across
reruns, engines, and cluster sizes, and composable (the same doc lands in
the same mix slice everywhere). This is the hash-threshold trick the
train/test split query uses (queries/llm_ops.py SQL_TRAIN_TEST_SPLIT),
generalized to per-stratum rates.

Scale shape: a narrow filter — no shuffle, no RNG state, pushes down to
the scan when the key is a column. Skew-free by construction (md5 is
uniform on any key distribution).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .lsh import MERSENNE_P, base_hash31

# basis points: rates quantized to 1/10_000 so the threshold compare is
# integer-exact in every engine (no float boundary rows)
_BPS = 10_000


def hash_bucket(key: Column, buckets: int = _BPS) -> Column:
    """Uniform deterministic bucket in [0, buckets) from any key column."""
    return base_hash31(key.cast("string")) % buckets


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str,
    key_col: str,
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row iff hash_bucket(key) < rate(stratum) * 10000.

    ``rates`` maps stratum value -> keep fraction (e.g. upsample rare
    languages, downsample web crawl). Unlisted strata use
    ``default_rate``. Exactly reproducible: membership is a pure function
    of (key, stratum rate), independent of partitioning and engine."""
    threshold = F.lit(int(round(default_rate * _BPS)))
    for value, rate in sorted(rates.items()):
        threshold = (
            F.when(F.col(strata_col) == value, F.lit(int(round(rate * _BPS))))
            .otherwise(threshold)
        )
    return df.filter(hash_bucket(F.col(key_col)) < threshold)


def sql_stratified_sample(
    table: str,
    rates: dict[str, float],
    strata_col: str,
    key_col: str,
    default_rate: float = 0.0,
) -> str:
    """DuckDB WHERE-clause twin of :func:`stratified_sample` (same md5
    arithmetic, same basis-point thresholds) — the oracle generator."""
    cases = " ".join(
        f"WHEN {strata_col} = '{v}' THEN {int(round(r * _BPS))}"
        for v, r in sorted(rates.items())
    )
    return (
        f"SELECT * FROM {table} WHERE "
        f"('0x' || substr(md5(CAST({key_col} AS VARCHAR)), 1, 15))::BIGINT "
        f"% {MERSENNE_P} % {_BPS} "
        f"< (CASE {cases} ELSE {int(round(default_rate * _BPS))} END)"
    )
