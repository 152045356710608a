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

__all__ = ["track_stats", "interpolate_track"]


def interpolate_track(
    fixes: DataFrame,
    queries: DataFrame,
    track: str = "track_id",
    ts: str = "ts",
    lon: str = "lon",
    lat: str = "lat",
    qid: str = "query_id",
    tiebreak: str | None = None,
    time_bucket: float | None = None,
) -> DataFrame:
    """Position-at-time lookup over GPS/AIS/flight tracks: for every
    query row (track, qid, ts) find the bracketing fixes and linearly
    interpolate (lon, lat) — the trajectory complement of ``asof_join``
    (which carries the PREVIOUS value; interpolation needs BOTH
    brackets). Standard use: align fix streams to frame timestamps,
    sensor fusion, map-matching preprocessing.

    Semantics (deterministic): the backward bracket is the fix with
    the greatest (ts[, tiebreak]) <= query ts; the forward bracket the
    least (ts[, tiebreak]) > query ts. A query exactly on a fix time
    returns that fix's position (even when it is the last fix).
    Queries before the first or after the last fix emit NULL lon/lat
    with ``in_range = false`` (fail-visible, no extrapolation).
    Longitude interpolates linearly — tracks crossing the antimeridian
    must be unwrapped upstream (documented limitation; same convention
    as linear lon handling elsewhere in the engine). With duplicate
    fix timestamps pass ``tiebreak`` so the bracket choice is
    deterministic.

    Plain path: ONE shuffle — fixes and queries union into one
    (track)-partitioned window; the backward bracket is a running
    ``last`` carry and the forward a ``first`` over the following
    frame (fix rows sort BEFORE query rows at equal ts, so exact hits
    resolve to the fix).

    Hot-track execution (``time_bucket=w``, the sessionize/track_stats
    cascade): local brackets inside each (track, floor(ts/w)) bucket
    (widest window partition = one bucket), then per-bucket carry-in /
    carry-out fixes from a summary cascade over O(#buckets) rows per
    track — queried-but-empty buckets are unioned into the summary so
    their carries resolve; BIT-identical to the plain path for any
    width."""
    from pyspark.sql import Window

    qdt = queries.schema[qid].dataType
    fix_fields = [F.col(ts).alias("_ts")]
    order = [F.col(ts).asc(), F.col("_isfix").desc()]
    fcols = [track, ts, lon, lat]
    if tiebreak is not None:
        fix_fields.append(F.col(tiebreak).alias("_tb"))
        order.append(F.col(tiebreak).asc())
        fcols.append(tiebreak)
    fix_fields += [F.col(lon).alias("_lon"), F.col(lat).alias("_lat")]

    fx = fixes.select(*fcols).withColumns(
        {"_isfix": F.lit(1), qid: F.lit(None).cast(qdt)}
    )
    qx = queries.select(track, ts, qid).withColumns(
        {
            "_isfix": F.lit(0),
            lon: F.lit(None).cast("double"),
            lat: F.lit(None).cast("double"),
            **(
                {tiebreak: F.lit(None).cast(fixes.schema[tiebreak].dataType)}
                if tiebreak is not None
                else {}
            ),
        }
    )
    u = fx.unionByName(qx)
    fix = F.when(F.col("_isfix") == 1, F.struct(*fix_fields))

    if time_bucket is None:
        w = Window.partitionBy(track).orderBy(*order)
        d = u.withColumns(
            {
                "_f0": F.last(fix, ignorenulls=True).over(
                    w.rowsBetween(Window.unboundedPreceding, 0)
                ),
                "_f1": F.first(fix, ignorenulls=True).over(
                    w.rowsBetween(0, Window.unboundedFollowing)
                ),
            }
        )
        q = d.where(F.col("_isfix") == 0)
    else:
        if time_bucket <= 0:
            raise ValueError(f"time_bucket must be positive, got {time_bucket}")
        u = u.withColumn("_bkt", F.floor(F.col(ts) / F.lit(float(time_bucket))))
        w_local = Window.partitionBy(track, "_bkt").orderBy(*order)
        d = u.withColumns(
            {
                "_l0": F.last(fix, ignorenulls=True).over(
                    w_local.rowsBetween(Window.unboundedPreceding, 0)
                ),
                "_l1": F.first(fix, ignorenulls=True).over(
                    w_local.rowsBetween(0, Window.unboundedFollowing)
                ),
            }
        )
        fsum = (
            u.where(F.col("_isfix") == 1)
            .groupBy(track, "_bkt")
            .agg(
                F.min(F.struct(*fix_fields)).alias("_first"),
                F.max(F.struct(*fix_fields)).alias("_last"),
            )
        )
        # queried-but-fixless buckets must still resolve carries
        buckets = (
            u.select(track, "_bkt").distinct().join(fsum, [track, "_bkt"], "left")
        )
        w_b = Window.partitionBy(track).orderBy(F.col("_bkt").asc())
        carries = buckets.withColumns(
            {
                "_cin": F.max("_last").over(
                    w_b.rowsBetween(Window.unboundedPreceding, -1)
                ),
                "_cout": F.min("_first").over(
                    w_b.rowsBetween(1, Window.unboundedFollowing)
                ),
            }
        ).select(track, "_bkt", "_cin", "_cout")
        q = (
            d.where(F.col("_isfix") == 0)
            .join(carries, [track, "_bkt"], "left")
            .withColumns(
                {
                    "_f0": F.coalesce(F.col("_l0"), F.col("_cin")),
                    "_f1": F.coalesce(F.col("_l1"), F.col("_cout")),
                }
            )
        )

    f0, f1 = F.col("_f0"), F.col("_f1")
    exact = f0.isNotNull() & (f0["_ts"] == F.col(ts))
    ok = exact | (f0.isNotNull() & f1.isNotNull())
    frac = (F.col(ts) - f0["_ts"]) / (f1["_ts"] - f0["_ts"])
    lon_i = F.when(exact, f0["_lon"]).otherwise(
        F.when(ok, f0["_lon"] + (f1["_lon"] - f0["_lon"]) * frac)
    )
    lat_i = F.when(exact, f0["_lat"]).otherwise(
        F.when(ok, f0["_lat"] + (f1["_lat"] - f0["_lat"]) * frac)
    )
    return q.select(
        track,
        qid,
        F.col(ts),
        lon_i.alias(lon),
        lat_i.alias(lat),
        ok.alias("in_range"),
    )


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
