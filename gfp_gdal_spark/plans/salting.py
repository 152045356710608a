"""Skew handling: explicit hot-key salting [north_rule].

Spatial data is pathologically skewed (one city hex cell can hold 1%
of a planet-scale table — the FIXTURES.md skew fixture pins 1/97 of
all images to one cell). Two remedies, composable:

1. AQE skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`,
   on by default in session.get_spark) — runtime, no code change.
2. Explicit salting (this module) — deterministic, plan-visible, and
   the only option for aggregation skew with expensive per-group state.

Salting contract: results are EXACTLY those of the unsalted plan
(salt ⊕ unsalt identity, property-tested in tests/test_salting.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_count", "salt_join_skewed"]


def salted_count(df: DataFrame, keys: list[str], n_salt: int = 16, salt_src: str | None = None) -> DataFrame:
    """Two-stage count per key group: groupBy(keys + salt) partial ->
    groupBy(keys) sum. The salt is deterministic (hash of ``salt_src``
    or of all keys+row content via xxhash64) so re-runs are stable."""
    salt = F.pmod(F.xxhash64(*(F.col(c) for c in ([salt_src] if salt_src else df.columns))), F.lit(n_salt))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial_n"))
    )
    return partial.groupBy(*keys).agg(F.sum("_partial_n").cast("long").alias("n"))


def salt_join_skewed(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salt: int = 8,
    hot_keys: list | None = None,
    salt_src: str | None = None,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with the hot keys salted.

    big rows get salt = hash(row)%n for hot keys (0 otherwise); small
    rows are replicated n_salt ways ONLY for hot keys (explode), so the
    build side grows by |hot ∩ small| * n_salt rows, not |small| * n_salt.
    If hot_keys is None every key is salted (uniform replication).
    Output columns/rows are identical to the plain join.
    """
    salt = F.pmod(
        F.xxhash64(*( [F.col(salt_src)] if salt_src else [F.col(c) for c in big.columns] )),
        F.lit(n_salt),
    )
    if hot_keys is not None:
        is_hot = F.col(key).isin(list(hot_keys))
        big_s = big.withColumn("_salt", F.when(is_hot, salt).otherwise(F.lit(0)))
        small_s = small.withColumn(
            "_salt",
            F.explode(
                F.when(is_hot, F.sequence(F.lit(0), F.lit(n_salt - 1))).otherwise(F.array(F.lit(0)))
            ),
        )
    else:
        big_s = big.withColumn("_salt", salt)
        small_s = small.withColumn(
            "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
        )
    return big_s.join(small_s, [key, "_salt"]).drop("_salt")
