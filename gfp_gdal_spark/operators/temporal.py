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
- interval_join: interval x interval overlap — both sides bin-explode,
  each overlapping pair kept only in its canonical bin (the bin of
  greatest(lo_l, lo_r)), so no dedup shuffle is ever needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["asof_join", "interval_join", "interval_union_length", "range_join", "resample_series"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str] | None = None,
    direction: str = "backward",
    suffix: str | None = None,
    bucket_width: float | None = None,
) -> DataFrame:
    """As-of join (inclusive): ``direction="backward"`` gives each left
    row the most recent right row with ``right.on <= left.on`` and the
    same ``by`` key; ``direction="forward"`` the EARLIEST right row
    with ``right.on >= left.on`` — null-filled when no such right row
    exists (DuckDB `ASOF JOIN` semantics with `>=` / `<=` respectively,
    which is the oracle).

    Plan shape: union the two sides with a source tag, one window over
    (by, on, tag) doing last(ignorenulls) carry-forward, filter back to
    left rows. Exactly one shuffle (hash by ``by``), map-side nothing
    crosses twice — at 10^12 rows this is the only shape that works;
    the naive inequality join is a product.

    Ties on ``on``: the right row sorts BEFORE the left row (tag
    order), so an equal-timestamp right row is visible — inclusive
    semantics, matching DuckDB's `ON l.ts >= r.ts`.

    Name collisions: a right value column that also exists on the left
    raises unless ``suffix`` is given, in which case the right copy is
    emitted as ``<c><suffix>`` (silently emitting two columns named
    ``<c>`` would poison every later select-by-name).

    Hot keys: ``bucket_width`` (in ``on``-axis units) range-buckets
    each ``by`` key — the carry-forward window then partitions on
    (by, bucket) so one hot key (one symbol with 10^9 events) never
    becomes a single-partition sort. Rows whose bucket saw no earlier
    right row get their carry-in from a per-bucket "latest right row"
    table cascaded across buckets (a window over O(#buckets) rows per
    key, not O(#events)). Output is identical to the unbucketed path.
    """
    from pyspark.sql import Window

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            "direction must be 'backward' (latest prior row), 'forward' "
            "(earliest following row), or 'nearest' (closer of the two, "
            "ties to backward)"
        )
    if direction == "nearest":
        if bucket_width is not None:
            raise ValueError(
                "direction='nearest' does not support bucket_width; for a "
                "hot key run the 'backward' and 'forward' paths bucketed "
                "and pick the closer row on a left-row key"
            )
        return _asof_nearest(left, right, on, by, value_cols, suffix)
    bwd = direction == "backward"
    value_cols = value_cols or [c for c in right.columns if c not in (on, by)]
    collide = [c for c in value_cols if c in left.columns]
    if collide and suffix is None:
        raise ValueError(
            f"right value column(s) {collide} also exist on the left side; "
            f"pass suffix='_r' (or similar) to emit them as <col><suffix>"
        )
    out_name = {c: (c + suffix if c in collide else c) for c in value_cols}

    # carry ONE struct per right row, not per-column last(ignorenulls):
    # the struct is non-null for every right row even when its VALUE
    # fields are null, so the latest right row always wins — a per-
    # column carry would skip a null-valued quote and resurrect an
    # older value (wrong vs DuckDB ASOF semantics).
    from pyspark.sql import types as T

    rrow_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in value_cols]
    )
    l_tag = left.withColumn("_src", F.lit(1)).withColumn(
        "_rrow", F.lit(None).cast(rrow_type)
    )
    r_tag = right.select(
        by, on, F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("_rrow")
    ).withColumn("_src", F.lit(0))
    for c in left.columns:
        if c not in (on, by):
            r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = l_tag.unionByName(r_tag.select(l_tag.columns))

    part_cols = [by]
    if bucket_width is not None:
        u = u.withColumn("_bkt", F.floor(F.col(on).cast("double") / bucket_width).cast("long"))
        part_cols = [by, "_bkt"]
    # scan order: backward walks time ascending (carry = latest prior
    # right row); forward walks descending (carry = earliest following).
    # _src asc in BOTH: at equal timestamps the right row sorts before
    # the left row, so ties are inclusive in either direction.
    on_ord = F.col(on).asc() if bwd else F.col(on).desc()
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(on_ord, F.col("_src").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = u.withColumn("_rrow", F.last("_rrow", ignorenulls=True).over(w))
    out = u.where(F.col("_src") == 1).drop("_src")

    if bucket_width is not None:
        # carry-in across buckets: boundary right row per (by, bucket) —
        # latest for backward, earliest for forward — cascaded so bucket
        # b sees the right rows of buckets < b (backward) / > b (forward)
        # (a window over O(#buckets) rows per key, not O(#events)).
        rb = right.withColumn(
            "_bkt", F.floor(F.col(on).cast("double") / bucket_width).cast("long")
        )
        wlast = Window.partitionBy(by, "_bkt").orderBy(
            F.col(on).desc() if bwd else F.col(on).asc()
        )
        last_pb = (
            rb.withColumn("_rn", F.row_number().over(wlast))
            .where(F.col("_rn") == 1)
            .select(
                by,
                F.col("_bkt"),
                F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("_crow"),
            )
        )
        # a right bucket's boundary row becomes visible from the NEXT
        # bucket onward (backward) / the PREVIOUS bucket back (forward);
        # within-bucket rows are already handled by the window above
        donor = last_pb.withColumn(
            "_bkt_eff", F.col("_bkt") + (1 if bwd else -1)
        ).withColumn("_tag", F.lit(0))
        need = (
            out.select(by, "_bkt").distinct()
            .withColumn("_bkt_eff", F.col("_bkt"))
            .withColumn("_tag", F.lit(1))
            .withColumn("_crow", F.lit(None).cast(rrow_type))
        )
        cas = donor.select(need.columns).unionByName(need.select(need.columns))
        wc = (
            Window.partitionBy(by)
            .orderBy(
                F.col("_bkt_eff").asc() if bwd else F.col("_bkt_eff").desc(),
                F.col("_tag").asc(),
            )
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        cas = cas.withColumn("_crow", F.last("_crow", ignorenulls=True).over(wc))
        carry_map = cas.where(F.col("_tag") == 1).select(by, "_bkt", "_crow")
        out = (
            out.join(carry_map, [by, "_bkt"], "left")
            .withColumn("_rrow", F.coalesce(F.col("_rrow"), F.col("_crow")))
            .drop("_bkt", "_crow")
        )

    for c in value_cols:
        out = out.withColumn(out_name[c], F.col("_rrow").getField(c))
    return out.drop("_rrow")


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str] | None,
    suffix: str | None,
) -> DataFrame:
    """direction='nearest': each left row takes whichever of its
    latest-prior / earliest-following right rows is closer on the
    ``on`` axis (|l.on - r.on|), ties to the PRIOR row (pandas
    merge_asof convention). ONE shuffle: both carries come from two
    window sorts over the SAME hash partition (by) — ascending for the
    backward carry, descending for the forward — with the right row's
    own ``on`` riding inside the carry struct so the distance compare
    is a plain column expression."""
    from pyspark.sql import Window
    from pyspark.sql import types as T

    value_cols = value_cols or [c for c in right.columns if c not in (on, by)]
    collide = [c for c in value_cols if c in left.columns]
    if collide and suffix is None:
        raise ValueError(
            f"right value column(s) {collide} also exist on the left side; "
            f"pass suffix='_r' (or similar) to emit them as <col><suffix>"
        )
    out_name = {c: (c + suffix if c in collide else c) for c in value_cols}

    rrow_type = T.StructType(
        [T.StructField("_ron", right.schema[on].dataType)]
        + [T.StructField(c, right.schema[c].dataType) for c in value_cols]
    )
    l_tag = left.withColumn("_src", F.lit(1)).withColumn(
        "_rrow", F.lit(None).cast(rrow_type)
    )
    r_tag = right.select(
        by,
        on,
        F.struct(
            F.col(on).alias("_ron"), *[F.col(c).alias(c) for c in value_cols]
        ).alias("_rrow"),
    ).withColumn("_src", F.lit(0))
    for c in left.columns:
        if c not in (on, by):
            r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = l_tag.unionByName(r_tag.select(l_tag.columns))

    # _src asc under asc time / desc under desc time: at equal
    # timestamps the right row sorts before the left row in BOTH
    # directions — inclusive ties, same as the directional paths
    wb = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_src").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(by)
        .orderBy(F.col(on).desc(), F.col("_src").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = u.withColumn("_rb", F.last("_rrow", ignorenulls=True).over(wb))
    u = u.withColumn("_rf", F.last("_rrow", ignorenulls=True).over(wf))
    lv = F.col(on)
    db = lv - F.col("_rb._ron")
    df_ = F.col("_rf._ron") - lv
    pick = (
        F.when(F.col("_rb").isNull(), F.col("_rf"))
        .when(F.col("_rf").isNull(), F.col("_rb"))
        .when(db <= df_, F.col("_rb"))  # tie -> backward (prior row)
        .otherwise(F.col("_rf"))
    )
    out = (
        u.where(F.col("_src") == 1)
        .withColumn("_rrow", pick)
        .drop("_src", "_rb", "_rf")
    )
    for c in value_cols:
        out = out.withColumn(out_name[c], F.col("_rrow").getField(c))
    return out.drop("_rrow")


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


def interval_union_length(
    df: DataFrame,
    by: str,
    lo: str = "lo",
    hi: str = "hi",
    out_col: str = "covered",
) -> DataFrame:
    """Total length of the UNION of (possibly overlapping) closed
    intervals per key — coverage analytics (sensor uptime, footprint
    span coverage, session airtime). The classic sweep: sort intervals
    by lo within each key; each row contributes
    max(0, hi - max(lo, running_max_hi_over_previous_rows)) — the part
    of it not already covered — and one sum per key totals the union.

    ONE shuffle: the window partitions on ``by`` and the following
    groupBy reuses that hash distribution (no second exchange —
    EnsureRequirements sees the partitioning is already satisfied).
    The running max replaces the naive sort-merge-stack with a pure
    Column plan. Hot keys sort in one partition, as any per-key sweep
    must; pre-merge per coarse lo-range and re-sweep the merged spans
    if a single key holds 10^9 intervals.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(by)
        .orderBy(F.col(lo).asc(), F.col(hi).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # coalesce (not null-skipping greatest) so both Spark and DuckDB
    # evaluate the first row of a key identically
    run = F.coalesce(F.max(F.col(hi)).over(w), F.col(lo))
    inc = F.greatest(F.lit(0.0), F.col(hi) - F.greatest(F.col(lo), run))
    return (
        df.withColumn("_inc", inc)
        .groupBy(by)
        .agg(F.round(F.sum("_inc"), 6).alias(out_col))
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    bin_width: float,
    l_lo: str = "l_lo",
    l_hi: str = "l_hi",
    r_lo: str = "r_lo",
    r_hi: str = "r_hi",
) -> DataFrame:
    """Interval-OVERLAP join: left x right rows whose closed intervals
    intersect (``l_lo <= r_hi AND r_lo <= l_hi``) — the interval x
    interval sibling of ``range_join`` (time-range sessions vs outage
    windows, footprint spans vs validity spans).

    Both sides explode over fixed-width bins (bounded by
    ceil(len/bin_width)+1 rows per interval — size ``bin_width`` to the
    TYPICAL interval length); the equi-join on the shared bin would
    emit a pair once per shared bin, so each pair is kept only in its
    CANONICAL bin — the bin of ``greatest(l_lo, r_lo)``, which every
    overlapping pair shares exactly once (both intervals contain that
    point). No dedup shuffle, no distinct. Pure JVM throughout; never
    builds the left x right product.

    The two sides' bound columns must have DISTINCT names (the output
    carries both, and the overlap predicate resolves by name after the
    bin equi-join) — fail loud rather than let Spark raise an opaque
    ambiguous-reference error or emit duplicate output columns.
    """
    clash = {l_lo, l_hi} & {r_lo, r_hi}
    if clash:
        raise ValueError(
            f"interval_join bound columns collide across sides: {sorted(clash)}; "
            "rename one side (e.g. right.withColumnRenamed) first"
        )
    lb0 = F.floor(F.col(l_lo) / bin_width).cast("long")
    lb1 = F.floor(F.col(l_hi) / bin_width).cast("long")
    rb0 = F.floor(F.col(r_lo) / bin_width).cast("long")
    rb1 = F.floor(F.col(r_hi) / bin_width).cast("long")
    lv = left.withColumn("_bin", F.explode(F.sequence(lb0, lb1)))
    rv = right.withColumn("_bin", F.explode(F.sequence(rb0, rb1)))
    joined = lv.join(rv, "_bin")
    overlap = (F.col(l_lo) <= F.col(r_hi)) & (F.col(r_lo) <= F.col(l_hi))
    canonical = F.col("_bin") == F.floor(
        F.greatest(F.col(l_lo), F.col(r_lo)) / bin_width
    ).cast("long")
    return joined.where(overlap & canonical).drop("_bin")


def resample_series(
    df: DataFrame,
    by: str,
    on: str = "ts",
    width_s: float = 300.0,
    value_col: str = "value",
    id_col: str = "event_id",
    cents: int = 100,
) -> DataFrame:
    """Per-key time-bucket downsampling (the OHLC / sensor-decimation
    resample): one row per (``by``, bucket) with n, first/last value
    (by (ts, ``id_col``) lexicographic order — deterministic even at
    duplicate timestamps), min/max, and mean.

    Determinism contract: the mean is summed in integer micro-units
    (``round(value * cents)``, the band_index rule) so the aggregate is
    partial-order-independent and bit-identical cross-engine; the one
    division happens per output row. first/last are struct-min/max —
    no window, no sort.

    Scale: ONE map-side-combined hash aggregate on (by, bucket) — the
    hot-key-proof shape (a hot key spreads over its buckets). No
    window function, no shuffle beyond the single agg exchange.
    """
    wus = int(round(float(width_s) * 1e6))
    if wus <= 0:
        raise ValueError(f"width_s must be > 0: {width_s!r}")
    # integer microseconds (NTZ columns cast via timestamp under the
    # UTC session contract) — epoch_us is exact where a double epoch
    # would round, and it matches DuckDB's epoch_us() bit-for-bit
    us = F.unix_micros(F.col(on).cast("timestamp"))
    b = F.floor(us / F.lit(float(wus))).cast("long")
    v = F.col(value_col)
    vi = F.round(v * cents, 0).cast("long")
    return (
        df.select(
            F.col(by),
            b.alias("bucket"),
            F.col(on).alias("_on"),
            F.col(id_col).alias("_id"),
            v.alias("_v"),
            vi.alias("_vi"),
        )
        .groupBy(by, "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.struct("_on", "_id", "_v"))["_v"].alias("first_val"),
            F.max(F.struct("_on", "_id", "_v"))["_v"].alias("last_val"),
            F.min("_v").alias("vmin"),
            F.max("_v").alias("vmax"),
            F.sum("_vi").alias("_sum_u"),
        )
        .select(
            by, "bucket", "n", "first_val", "last_val", "vmin", "vmax",
            (F.col("_sum_u") / (F.lit(float(cents)) * F.col("n"))).alias("vmean"),
        )
    )
