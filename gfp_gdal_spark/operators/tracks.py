"""Trajectory operators — GPS tracks, flight strips, AIS/ADS-B paths:
the moving-platform leg of the geospatial engine (the reference's
CSVSegmentLoader groups points into per-key segments,
gdal_nodes.cpp:92-101; these operators summarize such per-key ordered
point streams).

Determinism contract: per-leg haversine distances are rounded to
integer MILLIMETERS before summing, so every aggregate is a sum of
integer-valued doubles — order-independent, hence identical across
partial-aggregation orders, re-runs, and engines (the same trick as
the integer-valued fixtures in map_algebra; a raw double sum would
drift with Spark's partial-agg order and could never hash-match an
oracle). Sub-millimeter error is far below GPS noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gfp_gdal_spark.functions.geometry import haversine_m

__all__ = ["track_stats"]


def _leg_mm(plon, plat, lon: str, lat: str):
    # guard on the lag: haversine_m's least(a, 1.0) clamp IGNORES a
    # null accumulator (Spark least skips nulls), so an unguarded
    # first-fix leg would come out as half the Earth's circumference
    # instead of null
    return F.when(
        plon.isNotNull(),
        F.round(
            haversine_m(plon, plat, F.col(lon), F.col(lat)) * F.lit(1000.0), 0
        ),
    )


def track_stats(
    df: DataFrame,
    track: str = "track_id",
    ts: str = "ts",
    lon: str = "lon",
    lat: str = "lat",
    tiebreak: str | None = None,
    time_bucket: float | None = None,
) -> DataFrame:
    """Per-track trajectory summary: point count, time span, path
    length (haversine sum over consecutive fixes), longest leg, and
    average speed.

    Plain path (``time_bucket=None``): one shuffle total — the lag
    window hash-partitions on ``track`` and the groupBy reuses that
    partitioning (same plan shape as interval_union_length —
    plan-asserted in tests). Single-point tracks get path 0 and NULL
    speed; zero-duration multi-point tracks get NULL speed (undefined,
    not inf — fail-visible).

    Hot-track execution (``time_bucket=w``): a 10^9-fix single track
    would serialize the plain window partition, exactly like
    ``sessionize``'s hot keys — so the same coarse-range + boundary-
    stitch rewrite applies, BIT-IDENTICAL output for any width:

    1. legs within each (track, floor(ts/w)) bucket via a window whose
       widest partition is one bucket, not one track;
    2. one summary row per non-empty bucket carrying its first/last
       fix (lexicographic struct min/max on (ts[, tiebreak])) and its
       local integer-mm sums;
    3. a lag over the O(#non-empty buckets) summary rows per track
       adds each boundary leg (previous bucket's last fix -> this
       bucket's first fix — exactly the one consecutive-fix leg the
       local windows cannot see; empty buckets are simply absent and
       the lag skips them);
    4. one final per-track aggregate merges counts, spans, and the
       integer-mm leg sums (order-independent by the mm contract).

    With duplicate timestamps inside one bucket, pass ``tiebreak`` so
    the struct min/max and the window order agree deterministically
    (same requirement as the plain path).
    """
    from pyspark.sql import Window

    order = [F.col(ts).asc()]
    cols = [track, ts, lon, lat]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
        cols.append(tiebreak)

    if time_bucket is None:
        w = Window.partitionBy(track).orderBy(*order)
        d = df.select(*cols).withColumns(
            {"_plon": F.lag(lon).over(w), "_plat": F.lag(lat).over(w)}
        )
        d = d.withColumn(
            "_leg_mm", _leg_mm(F.col("_plon"), F.col("_plat"), lon, lat)
        )
        agg = d.groupBy(track).agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min(ts).alias("t0"),
            F.max(ts).alias("t1"),
            (F.coalesce(F.sum("_leg_mm"), F.lit(0.0)) / 1000.0).alias("path_m"),
            (F.coalesce(F.max("_leg_mm"), F.lit(0.0)) / 1000.0).alias(
                "max_leg_m"
            ),
        )
    else:
        if time_bucket <= 0:
            raise ValueError(f"time_bucket must be positive, got {time_bucket}")
        fix_fields = [F.col(ts).alias("_ts")]
        if tiebreak is not None:
            fix_fields.append(F.col(tiebreak).alias("_tb"))
        fix_fields += [F.col(lon).alias("_lon"), F.col(lat).alias("_lat")]
        fix = F.struct(*fix_fields)
        d = df.select(*cols).withColumn(
            "_bkt", F.floor(F.col(ts) / F.lit(float(time_bucket)))
        )
        w_local = Window.partitionBy(track, "_bkt").orderBy(*order)
        d = d.withColumns(
            {"_plon": F.lag(lon).over(w_local), "_plat": F.lag(lat).over(w_local)}
        )
        d = d.withColumn(
            "_leg_mm", _leg_mm(F.col("_plon"), F.col("_plat"), lon, lat)
        )
        summ = d.groupBy(track, "_bkt").agg(
            F.count(F.lit(1)).alias("_nb"),
            F.min(ts).alias("_t0b"),
            F.max(ts).alias("_t1b"),
            F.sum("_leg_mm").alias("_smm"),
            F.max("_leg_mm").alias("_mmm"),
            F.min(fix).alias("_first"),
            F.max(fix).alias("_last"),
        )
        w_b = Window.partitionBy(track).orderBy(F.col("_bkt").asc())
        prev = F.lag("_last").over(w_b)
        summ = summ.withColumn(
            "_bmm",
            F.when(
                prev.isNotNull(),
                F.round(
                    haversine_m(
                        prev["_lon"],
                        prev["_lat"],
                        F.col("_first._lon"),
                        F.col("_first._lat"),
                    )
                    * F.lit(1000.0),
                    0,
                ),
            ),
        )
        agg = summ.groupBy(track).agg(
            F.sum("_nb").alias("n_points"),
            F.min("_t0b").alias("t0"),
            F.max("_t1b").alias("t1"),
            (
                (
                    F.coalesce(F.sum("_smm"), F.lit(0.0))
                    + F.coalesce(F.sum("_bmm"), F.lit(0.0))
                )
                / 1000.0
            ).alias("path_m"),
            (
                F.coalesce(
                    F.greatest(F.max("_mmm"), F.max("_bmm")), F.lit(0.0)
                )
                / 1000.0
            ).alias("max_leg_m"),
        )

    speed = F.when(
        F.col("t1") > F.col("t0"), F.col("path_m") / (F.col("t1") - F.col("t0"))
    )
    return agg.withColumn("avg_speed_ms", speed)
