"""Skew neutralization: salted joins and skew-safe distinct aggregation.

Hot-entity skew is structural in this workload: scholar mentions are
Zipf-distributed (the reference graph has 1,074 scholar nodes with a
handful of top narrators on most edges — README.md:35,87), so any
shuffle keyed by canonical entity puts one partition under a hot key.
Two standard remedies, both deterministic:

* :func:`salted_join` — replicate the small side S times with a salt
  column and spread the big side's hot keys across S partitions.  Used
  when the dimension is too big to broadcast but small enough to
  replicate (the middle regime; broadcast handles the small end, AQE
  skew-join splitting the rest).
* :func:`count_distinct_skew_safe` — the groupBy(hot_key).countDistinct
  rewrite: dedupe on (key, value) first (that shuffle keys on BOTH
  columns, so hot keys spread over the value's cardinality), then count
  per key with map-side partial aggregation.

Plus ``spark.sql.adaptive.skewJoin.enabled`` in the session defaults for
runtime splitting of whatever remains.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 8


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    *,
    n_salts: int = DEFAULT_SALTS,
    how: str = "left",
) -> DataFrame:
    """Equi-join ``big`` ⋈ ``small`` on ``keys`` with salted keys.

    ``small`` is replicated ``n_salts`` times (explode of a literal salt
    array); ``big`` rows get a salt from a hash of the whole row's
    monotonically varying partition/offset, so one hot key's rows spread
    over ``n_salts`` reduce partitions.  Results are identical to the
    plain join (verified in tests/test_skew.py) — the salt is an
    equi-key extension, not a semantic change.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        # replicating the small side would duplicate its unmatched rows
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    if n_salts <= 1:
        return big.join(small, list(keys), how)
    salt_values = F.array(*[F.lit(i) for i in range(n_salts)])
    small_rep = small.withColumn("__salt", F.explode(salt_values))
    big_salted = big.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)).cast("int"),
    )
    out = big_salted.join(small_rep, [*keys, "__salt"], how)
    return out.drop("__salt")


def count_distinct_skew_safe(
    df: DataFrame, key: str, value: str, *, count_alias: str = "n"
) -> DataFrame:
    """``groupBy(key).agg(countDistinct(value))`` without a hot-key
    bottleneck: the (key, value) dedupe shuffle is keyed on both columns
    (hot keys spread over value cardinality); the per-key count then
    benefits from map-side partial aggregation over already-deduped rows."""
    return (
        df.select(key, value)
        # countDistinct ignores NULL values; drop them before distinct()
        # so the rewrite is a drop-in equivalent for any caller
        .where(F.col(value).isNotNull())
        .distinct()
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias(count_alias))
    )
