"""Deterministic corpus sampling / splitting — the training-data
pipeline staples (reproducible train/eval splits, per-class balancing,
session construction). Everything here is a pure Column-expression
plan (no UDFs, no rand()): determinism comes from key arithmetic, so
re-runs, resumed jobs, and the DuckDB oracles all agree bit-for-bit.

The mixing function is Knuth's multiplicative hash
``(key * 2654435761) mod 2^32`` — deliberately chosen over xxhash64
because every engine (Spark, DuckDB, numpy) evaluates it identically,
so split/sample assignments are portable across the whole toolchain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hash_split", "sample_per_group", "sessionize"]

_KNUTH = 2654435761
_MOD = 4294967296


def _mix(col: Column) -> Column:
    """Deterministic uniform-ish u32 from an integer key column.

    The key is pre-reduced mod 2^31 BEFORE the multiply so the product
    stays below 2^63 for any long id (otherwise ids past ~3.5e9 — real
    at 10^12-row scale — overflow: Spark would wrap silently with ANSI
    off while DuckDB errors, silently breaking the portability
    contract). pmod keeps negative ids in range too; ids differing by
    exactly 2^31 share an assignment, which is harmless for
    split/sample purposes (it is a hash, not an identity)."""
    return F.pmod(F.pmod(col.cast("long"), F.lit(2_147_483_648)) * F.lit(_KNUTH), F.lit(_MOD))


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    salt: int = 0,
) -> DataFrame:
    """Reproducible dataset split: adds a ``split`` column assigning
    each row to a named fraction by hashing its id — no shuffle, no
    rand(), stable under any partitioning/resume (the property that
    matters at 10^12 rows: a re-run or a late-arriving partition gets
    the SAME assignment). Fractions must sum to <= 1.0; any remainder
    becomes split = NULL (explicit holdout).
    """
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1.0")
    u = _mix(F.col(id_col) + F.lit(salt)).cast("double") / F.lit(float(_MOD))
    expr = F.lit(None).cast("string")
    acc = 0.0
    # build the CASE from the LAST bucket backward so earlier buckets win
    bounds = []
    for name, frac in fractions.items():
        bounds.append((name, acc, acc + frac))
        acc += frac
    for name, lo, hi in reversed(bounds):
        expr = F.when((u >= lo) & (u < hi), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def sample_per_group(
    df: DataFrame,
    by: str,
    n: int,
    id_col: str,
    salt: int = 0,
) -> DataFrame:
    """Deterministic n-per-group sample (class balancing / per-domain
    caps): rank rows inside each ``by`` group by the mixed id and keep
    the first ``n``. One shuffle (the window partition); groups smaller
    than n pass through whole. The mixed-id order is a reproducible
    stand-in for a random order — unlike rand(), identical across
    re-runs and engines.

    Hot groups: a single group with 10^9 rows makes one window
    partition; cap such groups upstream (e.g. pre-filter by a cheap
    predicate) or split ``by`` into (by, mix(id) % k) and take the
    per-shard minimum ranks — the same bucketing trade as
    asof_join(bucket_width).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(by).orderBy(
        _mix(F.col(id_col) + F.lit(salt)).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n)
        .drop("_rn")
    )


def sessionize(
    events: DataFrame,
    by: str,
    ts: str,
    gap: float,
    tiebreak: str | None = None,
) -> DataFrame:
    """Gap-based sessionization: within each ``by`` key, order events
    by ``ts`` and start a new session whenever the gap to the previous
    event exceeds ``gap`` (same units as ts). Adds ``session_idx``
    (0-based per key). One shuffle + one window — the standard
    clickstream/session construction.

    Hot keys: sessions are chains, so they cannot be split by a
    stateless bucket the way asof carry-in can; for a single key with
    10^9 events partition the input by coarse time range FIRST and
    stitch boundary sessions (two-pass), or sessionize in
    Structured Streaming with applyInPandasWithState.
    """
    from pyspark.sql import Window

    order = [F.col(ts).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(by).orderBy(*order)
    prev = F.lag(F.col(ts)).over(w)
    new_sess = F.when(
        prev.isNull() | ((F.col(ts) - prev) > gap), F.lit(1)
    ).otherwise(F.lit(0))
    wsum = w.rowsBetween(Window.unboundedPreceding, 0)
    return events.withColumn("session_idx", F.sum(new_sess).over(wsum) - 1)
