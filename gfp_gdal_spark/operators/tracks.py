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


def track_stats(
    df: DataFrame,
    track: str = "track_id",
    ts: str = "ts",
    lon: str = "lon",
    lat: str = "lat",
    tiebreak: str | None = None,
) -> DataFrame:
    """Per-track trajectory summary: point count, time span, path
    length (haversine sum over consecutive fixes), longest leg, and
    average speed.

    One shuffle total: the lag window hash-partitions on ``track`` and
    the groupBy reuses that partitioning (same plan shape as
    interval_union_length — plan-asserted in tests). Single-point
    tracks get path 0 and NULL speed; zero-duration multi-point tracks
    get NULL speed (undefined, not inf — fail-visible).

    Hot-track ceiling: a 10^9-fix single track serializes its window
    partition, exactly like ``sessionize``; the same coarse
    time-bucket + boundary-stitch mitigation applies (compute legs per
    (track, time_bucket), then add the O(#buckets) boundary legs) —
    compose ``sessionize(time_bucket=...)``'s pattern if you have such
    keys.
    """
    from pyspark.sql import Window

    order = [F.col(ts).asc()]
    cols = [track, ts, lon, lat]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
        cols.append(tiebreak)
    w = Window.partitionBy(track).orderBy(*order)
    d = df.select(*cols).withColumns(
        {
            "_plon": F.lag(lon).over(w),
            "_plat": F.lag(lat).over(w),
        }
    )
    # guard on the lag: haversine_m's least(a, 1.0) clamp IGNORES a
    # null accumulator (Spark least skips nulls), so an unguarded
    # first-fix leg would come out as half the Earth's circumference
    # instead of null
    leg_mm = F.when(
        F.col("_plon").isNotNull(),
        F.round(
            haversine_m(F.col("_plon"), F.col("_plat"), F.col(lon), F.col(lat))
            * F.lit(1000.0),
            0,
        ),
    )
    d = d.withColumn("_leg_mm", leg_mm)
    dur = F.max(ts) - F.min(ts)
    agg = d.groupBy(track).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.min(ts).alias("t0"),
        F.max(ts).alias("t1"),
        (F.coalesce(F.sum("_leg_mm"), F.lit(0.0)) / 1000.0).alias("path_m"),
        (F.coalesce(F.max("_leg_mm"), F.lit(0.0)) / 1000.0).alias("max_leg_m"),
    )
    speed = F.when(
        F.col("t1") > F.col("t0"), F.col("path_m") / (F.col("t1") - F.col("t0"))
    )
    return agg.withColumn("avg_speed_ms", speed)
