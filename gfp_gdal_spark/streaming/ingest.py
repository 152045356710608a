"""Streaming ingest: file-source image stream -> footprints -> tiles ->
windowed counts. The batch operators compose unchanged because they
are stateless column transforms; only the aggregation needs a
watermark. Smoke-tested with the memory sink + processAllAvailable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gfp_gdal_spark.functions.spatial import with_footprint
from gfp_gdal_spark.operators.joins import tile_assign
from gfp_gdal_spark.sources.datagen import IMAGES_SCHEMA

__all__ = [
    "streaming_label_regions",
    "streaming_pip_join",
    "streaming_viewshed",
    "read_image_stream",
    "streaming_tile_counts",
    "streaming_tile_rollup",
    "streaming_tile_rollup_stats",
    "streaming_hash_split",
    "windowed_event_counts",
    "streaming_exact_dedup",
    "streaming_redact_pii",
    "streaming_resample",
    "streaming_clip",
    "streaming_band_index",
    "streaming_sessionize",
]


def read_image_stream(spark: SparkSession, path: str) -> DataFrame:
    """readStream over a parquet directory of input_hint-schema images."""
    return spark.readStream.schema(IMAGES_SCHEMA).parquet(path)


def streaming_tile_counts(images_stream: DataFrame, z: int = 8) -> DataFrame:
    """Per-microbatch tile counts (stateless transform + stateful agg).
    Complete/update output mode; keyed state is bounded by 4^z tiles."""
    fp = tile_assign(with_footprint(images_stream), z=z)
    return fp.groupBy("tile_z", "tile_x", "tile_y").count()


def streaming_tile_rollup(images_stream: DataFrame, z: int = 8, z_to: int = 4) -> DataFrame:
    """Whole-pyramid rollup over the image stream: the batch
    operators.joins.tile_rollup composes UNCHANGED — the ancestor
    explode is stateless and the single (tile_z, tile_x, tile_y) hash
    agg becomes the stream's one stateful operator. Complete/update
    output mode; keyed state is bounded by sum_{l=z_to..z} 4^l tiles,
    independent of stream length."""
    from gfp_gdal_spark.operators.joins import tile_rollup

    fp = tile_assign(with_footprint(images_stream), z=z)
    return tile_rollup(fp, z_to=z_to)


def streaming_tile_rollup_stats(
    images_stream: DataFrame, val_col: str, z: int = 8, z_to: int = 4
) -> DataFrame:
    """Value-statistics pyramid over the image stream: the batch
    operators.joins.tile_rollup_stats composes UNCHANGED — count, min,
    max and sum are all mergeable aggregates, so the stream keeps O(1)
    partial state per pyramid tile and the mean divides on emit.
    Complete/update output mode; keyed state bounded by
    sum_{l=z_to..z} 4^l tiles, independent of stream length."""
    from gfp_gdal_spark.operators.joins import tile_rollup_stats

    fp = tile_assign(with_footprint(images_stream), z=z)
    return tile_rollup_stats(fp, z_to=z_to, val_col=val_col)


def streaming_hash_split(
    stream: DataFrame, id_col: str, fractions: dict[str, float], salt: int = 0
) -> DataFrame:
    """operators.sampling.hash_split applied to a stream verbatim —
    it is a pure stateless column expression, so a late-arriving file,
    a restarted stream, and a batch job over the same rows all assign
    the SAME split (the resume-invariance that matters for continuous
    training-data ingest). Append output mode, no state."""
    from gfp_gdal_spark.operators.sampling import hash_split

    return hash_split(stream, id_col, fractions, salt)


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked sliding-window counts per event_type over the
    driver `events` table schema (ts timestamp, event_type string) —
    the late-data-tolerant streaming aggregation pattern."""
    # watermarks require TIMESTAMP (LTZ); parquet NTZ columns are cast
    events_stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(w, "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
    )


def streaming_exact_dedup(
    docs_stream: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """CUSTOM STATEFUL streaming operator (applyInPandasWithState):
    exact first-seen-wins dedup ACROSS micro-batches — the streaming
    twin of operators.dedup.exact_dedup for continuous training-data
    ingest.

    Keyed by the same 192-bit fingerprint as the batch operator
    (md5 + two seeded xxhash64, JVM-side): the shuffle/state key is
    ~28 bytes, not the document body, and birthday collisions are
    ~0 at any corpus size (a single 64-bit key would silently drop
    distinct docs past ~10^9 — the advertised scale). Per-key state
    is a single 'seen' flag, so state size is O(distinct docs)
    booleans and never grows with the stream. Within a first batch of a
    key, the minimum id wins (deterministic). Append output mode."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    keyed = (
        docs_stream.withColumn("_fp0", F.md5(F.col(text)))
        .withColumn("_fp1", F.xxhash64(F.col(text)))
        .withColumn("_fp2", F.xxhash64(F.col(text), F.lit(1)))
    )
    out_schema = docs_stream.schema
    out_cols = [f.name for f in out_schema.fields]

    def dedup_fn(key, pdf_iter, state: GroupState):
        seen = state.get[0] if state.exists else 0
        best = None  # one-row pandas slice — preserves column dtypes
        for pdf in pdf_iter:
            if seen or not len(pdf):
                continue
            i = pdf[id_col].idxmin()
            row = pdf.loc[[i], out_cols]
            if best is None or row[id_col].iloc[0] < best[id_col].iloc[0]:
                best = row
        if best is not None and not seen:
            state.update((1,))
            yield best

    return keyed.groupBy("_fp0", "_fp1", "_fp2").applyInPandasWithState(
        dedup_fn,
        outputStructType=out_schema,
        stateStructType="seen integer",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_sessionize(
    events_stream: DataFrame,
    by: str,
    ts: str,
    gap: float,
) -> DataFrame:
    """CUSTOM STATEFUL streaming operator: gap-based sessionization
    across micro-batches — the streaming twin of
    operators.sampling.sessionize for continuous event ingest.

    Per-key state is (last event time, current session index): a new
    batch's first event opens a new session iff its gap to the stored
    last event exceeds ``gap``, so sessions span micro-batch
    boundaries exactly as they would in one batch. Events are sorted
    by ``ts`` WITHIN each batch (numpy argsort, no per-row Python);
    cross-batch order must be monotone per key (the file/kafka source
    contract for event logs) — an out-of-order arrival joins the
    CURRENT session rather than rewriting closed ones (documented
    at-ingest semantics; true late-data rework needs watermarked
    windows, `windowed_event_counts`).

    Append output mode; state never grows past one (double, long) per
    key.
    """
    import numpy as np

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(events_stream.schema.fields)
        + [T.StructField("session_idx", T.LongType())]
    )
    out_cols = [f.name for f in events_stream.schema.fields]

    def fn(key, pdf_iter, state: GroupState):
        last_ts, cur_idx = state.get if state.exists else (None, -1)
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            pdf = pdf.iloc[np.argsort(pdf[ts].to_numpy(), kind="stable")]
            t = pdf[ts].to_numpy(dtype=np.float64)
            prev = np.empty_like(t)
            prev[1:] = t[:-1]
            prev[0] = last_ts if last_ts is not None else -np.inf
            new = (t - prev > gap) if last_ts is not None else np.concatenate(
                [[True], (t[1:] - t[:-1]) > gap]
            )
            idx = cur_idx + np.cumsum(new)
            out = pdf[out_cols].copy()
            out["session_idx"] = idx
            last_ts = float(t[-1])
            cur_idx = int(idx[-1])
            yield out
        if last_ts is not None:
            state.update((last_ts, cur_idx))

    return events_stream.groupBy(by).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="last_ts double, cur_idx long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_band_index(images_stream: DataFrame) -> DataFrame:
    """operators.map_algebra.band_index_stats over the image stream
    verbatim — the whole-batch decode + micro-unit quantized index is
    stateless (one output row per input image), so a streaming
    micro-batch, a restarted stream, and the batch job emit identical
    rows (append mode, no state). The continuous-ingest form of the
    quality-screen: score each arriving image's band index before it
    enters the corpus."""
    from gfp_gdal_spark.operators.map_algebra import band_index_stats

    return band_index_stats(images_stream)


def streaming_label_regions(
    images_stream: DataFrame, connectivity: int = 4, nodata: int | None = None
) -> DataFrame:
    """operators.vectorize.label_regions over the image stream
    verbatim — per-frame labeling is stateless (rows depend only on
    their own frame's bytes), so micro-batch, restart, and batch runs
    emit identical region rows (append mode, no state). The
    continuous-ingest form of raster->vector extraction: polygonize
    each arriving tile before it enters the corpus; cross-tile region
    stitching stays a periodic batch connected_components job over the
    accumulated region table (streams can't see a not-yet-arrived
    neighbor tile, by construction)."""
    from gfp_gdal_spark.operators.vectorize import label_regions

    return label_regions(images_stream, connectivity=connectivity, nodata=nodata)


def streaming_pip_join(
    images_stream: DataFrame,
    polys: DataFrame,
    z: int = 8,
    **pip_kwargs,
) -> DataFrame:
    """The north-star ingest shape as a STREAM: arriving image records
    footprint-derive, cell-bucket, and point-in-polygon join against a
    STATIC vector layer — ``operators.joins.pip_join`` composes
    verbatim as a stream-static equi-join (the polygon side replicates
    over its covering cells exactly as in batch; Structured Streaming
    plans stream-static inner joins stateless, so this is append mode
    with NO state store). Micro-batch, restart, and batch runs emit
    identical join rows — the batch-parity test asserts it.

    The static side must be a batch DataFrame (zones, parcels, AOIs);
    broadcast defaults to True because a streaming micro-batch should
    never shuffle the static layer per trigger.
    """
    from gfp_gdal_spark.operators.joins import pip_join

    pip_kwargs.setdefault("broadcast", True)
    pts = with_footprint(images_stream).select(
        "image_id", "lon_c", "lat_c", "w", "h"
    )
    return pip_join(pts, polys, z=z, **pip_kwargs)


def streaming_viewshed(
    images_stream: DataFrame,
    observer_r: int,
    observer_c: int,
    observer_height: float = 2.0,
    target_height: float = 0.0,
) -> DataFrame:
    """operators.vectorize.viewshed over the DEM-tile stream verbatim —
    visibility depends only on a frame's own pixels, so micro-batch,
    restart, and batch runs emit identical rows (append mode, no
    state). The continuous form of tower-coverage screening: score
    each arriving terrain tile as it lands; cross-tile viewsheds stay
    a batch mosaic-then-viewshed job, as in the batch operator's
    contract."""
    from gfp_gdal_spark.operators.vectorize import viewshed

    return viewshed(
        images_stream,
        observer_r,
        observer_c,
        observer_height=observer_height,
        target_height=target_height,
    )


def streaming_redact_pii(docs_stream: DataFrame, text_col: str = "text") -> DataFrame:
    """operators.curation.redact_pii over a document stream verbatim —
    pure stateless column regexps, so micro-batch, restart, and batch
    runs emit identical rows (append mode, no state). The
    continuous-ingest form of the PII scrub: redact before anything
    lands in the corpus, counts feed the audit stream."""
    from gfp_gdal_spark.operators.curation import redact_pii

    return redact_pii(docs_stream, text_col=text_col)


def streaming_clip(
    features_stream: DataFrame,
    bbox: tuple[float, float, float, float],
    ring: str = "ring",
) -> DataFrame:
    """operators.transforms.clip_polygons over a vector-feature stream
    verbatim — per-feature Sutherland-Hodgman is stateless, so stream
    and batch emit identical clipped rows (append mode, no state).
    The continuous-ingest form of the `-clipsrc` extent cut: clip each
    arriving feature to the AOI before it enters the layer."""
    from gfp_gdal_spark.operators.transforms import clip_polygons

    return clip_polygons(features_stream, bbox, ring=ring)


def streaming_resample(
    events_stream: DataFrame,
    by: str = "user_id",
    on: str = "ts",
    width_s: float = 600.0,
    watermark: str = "30 minutes",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """operators.temporal.resample_series over the event stream — the
    continuous OHLC/decimation feed. The aggregates compose verbatim
    (struct-extrema first/last + integer-cent sums are all mergeable,
    so partial state per (key, bucket) is O(1)); the grouping key must
    be ``F.window(on, ...)`` rather than the batch operator's derived
    ``floor(unix_micros/w)`` bucket — a plain derived column strips the
    event-time metadata, so the watermark would never bind to the
    aggregation (append mode rejected, state never evicted). Tumbling
    windows are epoch-aligned exactly like the batch bucket, so
    ``unix_micros(window.start) / w`` recovers the identical bucket
    index and the output schema/values match the batch operator
    row-for-row. Update/append output mode; state is bounded by
    keys x open-buckets-inside-the-watermark, never by stream length.
    """
    cents = 100
    wus = int(round(float(width_s) * 1e6))
    if wus <= 0:
        raise ValueError(f"width_s must be > 0: {width_s!r}")
    v = F.col(value_col)
    s = (
        events_stream.withColumn(on, F.col(on).cast("timestamp"))
        .withWatermark(on, watermark)
        .select(
            F.col(on),
            F.col(by),
            F.col(on).alias("_on"),
            F.col(id_col).alias("_id"),
            v.alias("_v"),
            F.round(v * cents, 0).cast("long").alias("_vi"),
        )
    )
    return (
        s.groupBy(F.window(on, f"{wus} microseconds"), by)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.struct("_on", "_id", "_v"))["_v"].alias("first_val"),
            F.max(F.struct("_on", "_id", "_v"))["_v"].alias("last_val"),
            F.min("_v").alias("vmin"),
            F.max("_v").alias("vmax"),
            F.sum("_vi").alias("_sum_u"),
        )
        .select(
            by,
            F.floor(F.unix_micros(F.col("window.start")) / F.lit(float(wus)))
            .cast("long")
            .alias("bucket"),
            "n", "first_val", "last_val", "vmin", "vmax",
            (F.col("_sum_u") / (F.lit(float(cents)) * F.col("n"))).alias("vmean"),
        )
    )
