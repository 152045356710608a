"""Temporal / interval joins — operators Spark's built-in join syntax
lacks, re-expressed as compositions of DataFrame primitives (the same
turn-a-theta-join-into-something-shuffleable rewrite as the spatial
joins; no UDFs anywhere).

- asof_join: for every left row, the latest right row with
  right.on <= left.on within the same `by` key — ONE shuffle on
  (by), a sort within partitions, and a last-value carry-forward
  window. Never builds the left x right product.
- range_join: points joined to intervals containing them — intervals
  explode over fixed-width bins (bounded by interval length), points
  map to exactly one bin, equi-join + exact predicate refine. The 1-D
  analog of the cell-bucketed PiP join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join (backward, inclusive): each left row picks up the
    most recent right row with ``right.on <= left.on`` and the same
    ``by`` key — null-filled when no prior right row exists (DuckDB
    `ASOF JOIN` semantics, which is the oracle).

    Plan shape: union the two sides with a source tag, one window over
    (by, on, tag) doing last(ignorenulls) carry-forward, filter back to
    left rows. Exactly one shuffle (hash by ``by``), map-side nothing
    crosses twice — at 10^12 rows this is the only shape that works;
    the naive inequality join is a product.

    Ties on ``on``: the right row sorts BEFORE the left row (tag
    order), so an equal-timestamp right row is visible — inclusive
    semantics, matching DuckDB's `ON l.ts >= r.ts`.
    """
    from pyspark.sql import Window

    if direction != "backward":
        raise ValueError("only direction='backward' (latest prior row) is implemented")
    value_cols = value_cols or [c for c in right.columns if c not in (on, by)]
    l_tag = left.withColumn("_src", F.lit(1))
    for c in value_cols:
        l_tag = l_tag.withColumn(f"_r_{c}", F.lit(None).cast(right.schema[c].dataType))
    r_tag = right.select(
        by, on, *[F.col(c).alias(f"_r_{c}") for c in value_cols]
    ).withColumn("_src", F.lit(0))
    for c in left.columns:
        if c not in (on, by):
            r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = l_tag.unionByName(r_tag.select(l_tag.columns))
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_src").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in value_cols:
        u = u.withColumn(f"_r_{c}", F.last(f"_r_{c}", ignorenulls=True).over(w))
    out = u.where(F.col("_src") == 1).drop("_src")
    for c in value_cols:
        out = out.withColumnRenamed(f"_r_{c}", c)
    return out


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    val: str,
    lo: str,
    hi: str,
    bin_width: float,
    how_bounds: str = "closed",
) -> DataFrame:
    """Interval containment join: point rows x interval rows where
    ``lo <= val <= hi`` (closed; 'halfopen' = lo <= val < hi) — the
    1-D twin of the cell-bucketed PiP join.

    Each interval explodes over the fixed-width bins it overlaps
    (bounded by ceil(len/bin_width)+1 rows — size ``bin_width`` to the
    TYPICAL interval length); each point maps to exactly ONE bin, so
    the equi-join output needs no dedup; the exact predicate refines.
    Pure JVM throughout.
    """
    b0 = F.floor(F.col(lo) / bin_width).cast("long")
    b1 = F.floor(F.col(hi) / bin_width).cast("long")
    iv = intervals.withColumn("_bin", F.explode(F.sequence(b0, b1)))
    pt = points.withColumn("_bin", F.floor(F.col(val) / bin_width).cast("long"))
    joined = pt.join(iv, "_bin").drop("_bin")
    if how_bounds == "closed":
        cond = (F.col(val) >= F.col(lo)) & (F.col(val) <= F.col(hi))
    else:
        cond = (F.col(val) >= F.col(lo)) & (F.col(val) < F.col(hi))
    return joined.where(cond)
