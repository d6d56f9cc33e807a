"""Bloom-filter semi-join reduction, built from relational primitives.

Scale pattern: reducing a huge probe side against a dimension whose raw
rows are too big to broadcast, but whose *key set summarized as a Bloom
filter* easily fits. Spark's own runtime bloom join
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) does this inside
AQE when statistics allow; this operator is the explicit, plannable form
(Spark 4.1 does not expose ``bloom_filter_agg``/``might_contain`` as
public SQL functions), and it works for any key expression.

Construction is pure DataFrame ops — no driver-side filter object:

1. build side: k hash positions per key (``xxhash64(key, seed)``, one
   ``explode`` over a k-element array), ``% m`` bits.
2. bitmap: positions fold into 64-bit words with one hash aggregate
   (``bit_or(1 << pos%64)`` grouped by ``pos/64``), then a single-row
   ``map<word_idx, bits>`` — ≤ m/64 entries, a few KiB for a million
   keys at 10 bits/key.
3. probe side: broadcast the one-row map (a broadcast-nested-loop of a
   single row = free), test all k positions with ``element_at`` +
   bitwise AND. Rows failing any probe are discarded *before* the
   shuffle of the exact join.

Membership tests can false-positive (never false-negative), so
``bloom_semi_join`` always finishes with an exact ``left_semi`` join on
the survivors — the Bloom stage only cuts the probe side's shuffle
volume; correctness never depends on it. With defaults (10 bits/key,
k=7) the false-positive rate is <1%, so the exact join shuffles ~1% of
non-matching rows instead of all of them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS_PER_KEY = 10
NUM_HASHES = 7


_metric_seq = 0


def _next_metric_name() -> str:
    """Unique per-process observation name (Spark requires distinct
    CollectMetrics names within a query)."""
    global _metric_seq
    _metric_seq += 1
    return f"bloom_prune_{_metric_seq}"


def _one_shl(n: Column) -> Column:
    """``1L << n`` with a *column* shift amount (F.shiftleft only takes a
    Python-int shift; the SQL function accepts expressions)."""
    return F.call_function("shiftleft", F.lit(1).cast("long"), n)


def bloom_bitmap(keys: DataFrame, key: str, num_bits: int, k: int = NUM_HASHES) -> DataFrame:
    """One-row DataFrame ``(bitmap: map<int,bigint>, m: int, k: int)``
    summarizing the distinct values of ``keys[key]``."""
    m = int(num_bits)
    pos = (
        keys.select(
            F.explode(
                F.array(*[
                    F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(m))
                    for i in range(k)
                ])
            ).alias("pos")
        )
        .select(
            (F.col("pos") / 64).cast("int").alias("w"),
            _one_shl((F.col("pos") % 64).cast("int")).alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("bits"))
    )
    return pos.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("bitmap"),
        F.lit(m).alias("m"),
        F.lit(k).alias("k"),
    )


def _member(key_col: Column, m: int, k: int) -> Column:
    """All-k-positions-set test against the broadcast ``bitmap`` column."""
    checks = F.lit(True)
    for i in range(k):
        pos = F.pmod(F.xxhash64(key_col, F.lit(i)), F.lit(m))
        word = F.element_at(F.col("bitmap"), (pos / 64).cast("int"))
        bit = _one_shl((pos % 64).cast("int"))
        c = F.coalesce(word, F.lit(0)).bitwiseAND(bit) != 0
        checks = checks & c
    return checks


_INTEGRAL = {"ByteType", "ShortType", "IntegerType", "LongType"}
_NUMERIC = _INTEGRAL | {"FloatType", "DoubleType", "DecimalType"}


def _hash_cast_type(probe: DataFrame, probe_key: str, build: DataFrame, build_key: str) -> str | None:
    """Common type both keys must be cast to before ``xxhash64``, or None
    if they already agree. xxhash64 is type-sensitive: hashing the same
    value as int vs long yields different bits, which would make every
    Bloom probe a false NEGATIVE (empty result) — violating the exact-
    result contract. Integral pairs widen to long; mixed numerics widen
    to double (value-identity, so DECIMAL 31.00 and LONG 31 hash alike —
    a huge long collapsing onto a neighbor in double is only ever a false
    POSITIVE, which the exact join absorbs); anything else hashes its
    canonical string form. Same-type columns never pay a cast.

    Equality is FULL dataType equality, not class name: DECIMAL(10,2) vs
    DECIMAL(12,4) hash different unscaled longs for the same value, so a
    class-name compare would skip the cast and every probe would false-
    negative (silently empty result) — mismatched decimals widen to
    double like any other mixed-numeric pair."""
    pdt = probe.schema[probe_key].dataType
    bdt = build.schema[build_key].dataType
    if pdt == bdt:
        return None
    pt = type(pdt).__name__
    bt = type(bdt).__name__
    if pt in _INTEGRAL and bt in _INTEGRAL:
        return "long"
    if pt in _NUMERIC and bt in _NUMERIC:
        return "double"
    return "string"


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str | None = None,
    bits_per_key: int = BITS_PER_KEY,
    expected_keys: int | None = None,
) -> DataFrame:
    """``probe ⋉ build`` (left-semi) with a Bloom pre-filter on the probe
    side. Exact result (the Bloom stage is a pure optimization).

    ``expected_keys``: sizing hint for the filter; defaults to a safe
    constant locally — at cluster scale pass the dimension's key-count
    estimate (catalog stats) so m = keys × bits_per_key.
    """
    bk = build_key or probe_key
    m = (expected_keys or 1_000_000) * bits_per_key
    cast_to = _hash_cast_type(probe, probe_key, build, bk)
    build_hash_key = F.col(bk).cast(cast_to) if cast_to else F.col(bk)
    probe_hash_key = F.col(probe_key).cast(cast_to) if cast_to else F.col(probe_key)
    bmp = bloom_bitmap(build.select(build_hash_key.alias("__bk")), "__bk", m)
    pruned = (
        probe.join(F.broadcast(bmp))
        .filter(_member(probe_hash_key, m, NUM_HASHES))
        .drop("bitmap", "m", "k")
        # Optimizer barrier: Catalyst's semi-join pushdown rules reorder
        # the exact LeftSemi join BELOW the bloom test (they push through
        # Project/Repartition/joins alike — verified empirically), which
        # runs the expensive shuffle join first and turns the bloom stage
        # into dead weight. CollectMetrics (observe) is not transparent
        # to those rewrites, so it pins the prune before the semi join's
        # exchange — and it doubles as live telemetry: the survivor count
        # per prune is exactly the number a 100 TB operator should watch
        # to validate its bits_per_key sizing.
        .observe(_next_metric_name(), F.count(F.lit(1)).alias("bloom_survivors"))
    )
    return pruned.join(
        build.select(F.col(bk).alias(probe_key)).distinct(),
        on=probe_key,
        how="left_semi",
    )
