"""Structured-streaming smoke: the batch operators compose under
readStream; watermarked windowed agg completes on the events table."""

import pytest
from pyspark.sql import functions as F

from gfp_gdal_spark.streaming import ingest as SI
from gfp_gdal_spark.sources import datagen

SF = "/root/testdata/sf0.001"


def test_streaming_tile_counts_matches_batch(spark, tmp_path):
    imgs = datagen.images_table(spark, 400, with_bytes=False)
    path = str(tmp_path / "imgs")
    imgs.write.parquet(path)

    stream = SI.read_image_stream(spark, path)
    assert stream.isStreaming
    agg = SI.streaming_tile_counts(stream, z=6)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("tile_counts_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(
            "SELECT sum(count) AS total FROM tile_counts_stream"
        ).collect()[0]["total"]
        assert got == 400
        # batch parity: same pipeline over a static read
        from gfp_gdal_spark.functions.spatial import with_footprint
        from gfp_gdal_spark.operators.joins import tile_assign

        static = (
            tile_assign(with_footprint(spark.read.parquet(path)), z=6)
            .groupBy("tile_z", "tile_x", "tile_y")
            .count()
        )
        stream_out = spark.sql("SELECT tile_z, tile_x, tile_y, count FROM tile_counts_stream")
        assert static.exceptAll(stream_out).isEmpty()
        assert stream_out.exceptAll(static).isEmpty()
    finally:
        q.stop()


def test_windowed_event_counts(spark, tmp_path):
    # streaming file source needs a directory
    ev_dir = str(tmp_path / "events")
    spark.read.parquet(f"{SF}/events.parquet").write.parquet(ev_dir)
    schema = spark.read.parquet(ev_dir).schema
    ev_stream = spark.readStream.schema(schema).parquet(ev_dir)
    agg = SI.windowed_event_counts(ev_stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("ev_counts")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT sum(n) AS total FROM ev_counts").collect()[0]["total"]
        exp = spark.read.parquet(f"{SF}/events.parquet").count()
        assert got == exp
    finally:
        q.stop()


def test_streaming_exact_dedup_across_batches(spark, tmp_path):
    """First-seen-wins dedup must hold ACROSS micro-batches (keyed
    state), not just within one batch."""
    import pandas as pd

    d = str(tmp_path / "docs")
    schema = "doc_id long, text string"
    b1 = pd.DataFrame({"doc_id": [3, 1, 2], "text": ["aa", "aa", "bb"]})
    b2 = pd.DataFrame({"doc_id": [10, 11, 12], "text": ["aa", "bb", "cc"]})
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(d)

    stream = spark.readStream.schema(schema).parquet(d)
    out = SI.streaming_exact_dedup(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = {
            (r["doc_id"], r["text"])
            for r in spark.sql("SELECT * FROM dedup_stream").collect()
        }
        assert got1 == {(1, "aa"), (2, "bb")}  # min id per text in batch 1
        spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(d)
        q.processAllAvailable()
        got2 = {
            (r["doc_id"], r["text"])
            for r in spark.sql("SELECT * FROM dedup_stream").collect()
        }
        # batch-2 'aa'/'bb' suppressed by state; 'cc' is new
        assert got2 == {(1, "aa"), (2, "bb"), (12, "cc")}
    finally:
        q.stop()


def test_streaming_sessionize_across_batches(spark, tmp_path):
    """Session continuity must hold ACROSS micro-batches: a batch-2
    event within `gap` of batch-1's last event continues that session;
    one beyond it opens the next index. Result must equal the batch
    sessionize over the concatenated stream."""
    import pandas as pd

    from gfp_gdal_spark.operators.sampling import sessionize

    d = str(tmp_path / "sess")
    schema = "u string, t double, eid long"
    b1 = pd.DataFrame(
        {"u": ["a", "a", "a", "b"], "t": [0.0, 10.0, 300.0, 5.0], "eid": [0, 1, 2, 3]}
    )
    b2 = pd.DataFrame(
        {"u": ["a", "a", "b"], "t": [310.0, 900.0, 700.0], "eid": [4, 5, 6]}
    )
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(d)
    stream = spark.readStream.schema(schema).parquet(d)
    out = SI.streaming_sessionize(stream, by="u", ts="t", gap=100.0)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(d)
        q.processAllAvailable()
        got = {
            r["eid"]: r["session_idx"]
            for r in spark.sql("SELECT * FROM sess_stream").collect()
        }
        # batch twin over the full stream
        full = spark.createDataFrame(pd.concat([b1, b2]), schema)
        want = {
            r["eid"]: r["session_idx"]
            for r in sessionize(full, by="u", ts="t", gap=100.0, tiebreak="eid").collect()
        }
        assert got == want
        assert [got[i] for i in (0, 1, 2, 4, 5)] == [0, 0, 1, 1, 2]  # user a
        assert [got[i] for i in (3, 6)] == [0, 1]                    # user b
    finally:
        q.stop()


def test_streaming_tile_rollup_matches_batch(spark, tmp_path):
    """The whole-pyramid rollup over a stream (delivered in TWO
    micro-batches) must equal the batch tile_rollup over the full
    static table (VERDICT r4 ask #6)."""
    from gfp_gdal_spark.functions.spatial import with_footprint
    from gfp_gdal_spark.operators.joins import tile_assign, tile_rollup

    d = str(tmp_path / "imgs_rollup")
    imgs = datagen.images_table(spark, 400, with_bytes=False)
    imgs.where("image_id < 'img00000200'").coalesce(1).write.mode("append").parquet(d)

    stream = SI.read_image_stream(spark, d)
    q = (
        SI.streaming_tile_rollup(stream, z=6, z_to=3)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("rollup_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        imgs.where("image_id >= 'img00000200'").coalesce(1).write.mode("append").parquet(d)
        q.processAllAvailable()
        static = tile_rollup(
            tile_assign(with_footprint(spark.read.parquet(d)), z=6), z_to=3
        )
        got = spark.sql("SELECT tile_z, tile_x, tile_y, n FROM rollup_stream")
        assert static.exceptAll(got).isEmpty()
        assert got.exceptAll(static).isEmpty()
        # every level of the pyramid carries the full image count
        per_level = {
            r["tile_z"]: r["s"]
            for r in got.groupBy("tile_z").agg(F.sum("n").alias("s")).collect()
        }
        assert per_level == {z: 400 for z in range(3, 7)}
    finally:
        q.stop()


def test_streaming_tile_rollup_stats_matches_batch(spark, tmp_path):
    """The value-statistics pyramid over a TWO-micro-batch stream must
    equal the batch tile_rollup_stats over the full static table
    (count/min/max/sum are mergeable; mean divides on emit)."""
    from gfp_gdal_spark.functions.spatial import with_footprint
    from gfp_gdal_spark.operators.joins import tile_assign, tile_rollup_stats

    d = str(tmp_path / "imgs_rollup_stats")
    imgs = datagen.images_table(spark, 300, with_bytes=False)
    imgs.where("image_id < 'img00000150'").coalesce(1).write.mode("append").parquet(d)

    stream = SI.read_image_stream(spark, d)
    q = (
        SI.streaming_tile_rollup_stats(stream, "w", z=6, z_to=3)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("rollup_stats_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        imgs.where("image_id >= 'img00000150'").coalesce(1).write.mode("append").parquet(d)
        q.processAllAvailable()
        static = tile_rollup_stats(
            tile_assign(with_footprint(spark.read.parquet(d)), z=6),
            z_to=3, val_col="w",
        )
        got = spark.sql("SELECT * FROM rollup_stats_stream")
        assert static.exceptAll(got).isEmpty()
        assert got.exceptAll(static).isEmpty()
    finally:
        q.stop()


def test_streaming_hash_split_matches_batch(spark, tmp_path):
    """Split assignment must be identical stream-vs-batch and stable
    across micro-batch boundaries (VERDICT r4 ask #6)."""
    from gfp_gdal_spark.operators.sampling import hash_split

    d = str(tmp_path / "split_rows")
    rows = spark.range(0, 2000).withColumnRenamed("id", "rid")
    rows.where("rid < 1000").coalesce(1).write.mode("append").parquet(d)
    stream = spark.readStream.schema("rid long").parquet(d)
    q = (
        SI.streaming_hash_split(
            stream, "rid", {"train": 0.6, "val": 0.2, "test": 0.2}
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("split_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        rows.where("rid >= 1000").coalesce(1).write.mode("append").parquet(d)
        q.processAllAvailable()
        got = {
            r["rid"]: r["split"]
            for r in spark.sql("SELECT rid, split FROM split_stream").collect()
        }
        want = {
            r["rid"]: r["split"]
            for r in hash_split(
                spark.read.parquet(d), "rid", {"train": 0.6, "val": 0.2, "test": 0.2}
            ).collect()
        }
        assert got == want and len(got) == 2000
    finally:
        q.stop()


def test_streaming_band_index_matches_batch(spark, tmp_path):
    """Stateless image scoring over a TWO-micro-batch stream must
    equal the batch band_index_stats over the full static table."""
    from gfp_gdal_spark.operators.map_algebra import band_index_stats

    d = str(tmp_path / "imgs_bidx")
    imgs = datagen.images_table(spark, 120, with_bytes=True)
    imgs.where("image_id < 'img00000060'").coalesce(1).write.mode("append").parquet(d)
    stream = SI.read_image_stream(spark, d)
    q = (
        SI.streaming_band_index(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("bidx_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        imgs.where("image_id >= 'img00000060'").coalesce(1).write.mode("append").parquet(d)
        q.processAllAvailable()
        static = band_index_stats(spark.read.parquet(d))
        got = spark.sql("SELECT * FROM bidx_stream")
        assert got.count() == 120
        assert static.exceptAll(got).isEmpty()
        assert got.exceptAll(static).isEmpty()
    finally:
        q.stop()


def test_streaming_label_regions_matches_batch(spark, tmp_path):
    """Stateless raster->vector extraction over a TWO-micro-batch
    stream must equal batch label_regions over the full table."""
    from gfp_gdal_spark.operators.vectorize import label_regions

    d = str(tmp_path / "imgs_lab")
    imgs = datagen.images_table(spark, 100, with_bytes=True)
    imgs.where("image_id < 'img00000050'").coalesce(1).write.mode("append").parquet(d)
    stream = SI.read_image_stream(spark, d)
    q = (
        SI.streaming_label_regions(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("lab_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        imgs.where("image_id >= 'img00000050'").coalesce(1).write.mode("append").parquet(d)
        q.processAllAvailable()
        static = label_regions(spark.read.parquet(d))
        got = spark.sql("SELECT * FROM lab_stream")
        assert static.exceptAll(got).isEmpty()
        assert got.exceptAll(static).isEmpty()
    finally:
        q.stop()


def test_streaming_redact_pii_matches_batch(spark, tmp_path):
    """Stateless PII scrub over a TWO-micro-batch stream must equal
    the batch redact_pii over the full static table."""
    from gfp_gdal_spark.operators.curation import redact_pii

    d = str(tmp_path / "docs_pii")
    rows = [
        (i, f"user{i}@ex{i % 3}.org at 10.{i % 200}.0.{i % 250} t +1 {100 + i % 900}-555-{1000 + i}")
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.where("doc_id < 40").coalesce(1).write.mode("append").parquet(d)
    stream = spark.readStream.schema("doc_id long, text string").parquet(d)
    q = (
        SI.streaming_redact_pii(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("pii_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        df.where("doc_id >= 40").coalesce(1).write.mode("append").parquet(d)
        q.processAllAvailable()
        static = redact_pii(spark.read.parquet(d))
        got = spark.sql("SELECT * FROM pii_stream")
        assert got.count() == 80
        assert static.exceptAll(got).isEmpty()
        assert got.exceptAll(static).isEmpty()
    finally:
        q.stop()


def test_streaming_clip_matches_batch(spark, tmp_path):
    """Stateless extent clip over a TWO-micro-batch stream must equal
    the batch clip_polygons over the full static table."""
    from gfp_gdal_spark.operators.transforms import clip_polygons

    d = str(tmp_path / "feat_clip")
    rows = []
    for i in range(60):
        x0, y0 = (i % 10) - 5.0, (i % 7) - 3.0
        rows.append((i, [[x0, y0], [x0 + 2, y0], [x0 + 2, y0 + 2], [x0, y0 + 2]]))
    df = spark.createDataFrame(rows, "fid long, ring array<array<double>>")
    df.where("fid < 30").coalesce(1).write.mode("append").parquet(d)
    stream = spark.readStream.schema(
        "fid long, ring array<array<double>>"
    ).parquet(d)
    bbox = (-4.0, -2.0, 4.0, 3.0)
    q = (
        SI.streaming_clip(stream, bbox)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("clip_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        df.where("fid >= 30").coalesce(1).write.mode("append").parquet(d)
        q.processAllAvailable()
        static = clip_polygons(spark.read.parquet(d), bbox)
        got = spark.sql("SELECT * FROM clip_stream")
        assert static.exceptAll(got).isEmpty()
        assert got.exceptAll(static).isEmpty()
    finally:
        q.stop()


def test_streaming_resample_matches_batch(spark, tmp_path):
    """Watermarked OHLC resample over a TWO-micro-batch stream must
    equal the batch resample_series over the full static table (every
    aggregate is mergeable, so late-arriving rows of an open bucket
    merge into the same state)."""
    import datetime as dt

    from gfp_gdal_spark.operators.temporal import resample_series

    d = str(tmp_path / "ev_resample")
    base = dt.datetime(2024, 1, 1)
    rows = [
        (
            i,
            base + dt.timedelta(seconds=37 * i % 3600),
            i % 5,
            float(round((i * 7 % 50) + 0.25, 2)),
        )
        for i in range(400)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    df.where("event_id < 200").coalesce(1).write.mode("append").parquet(d)
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, value double"
    ).parquet(d)
    q = (
        SI.streaming_resample(stream, width_s=600.0)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("resample_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        df.where("event_id >= 200").coalesce(1).write.mode("append").parquet(d)
        q.processAllAvailable()
        static = resample_series(
            spark.read.parquet(d).withColumn("ts", F.col("ts").cast("timestamp")),
            "user_id",
            width_s=600.0,
        )
        got = spark.sql("SELECT * FROM resample_stream")
        assert static.exceptAll(got).isEmpty()
        assert got.exceptAll(static).isEmpty()
    finally:
        q.stop()


def test_streaming_resample_append_evicts_state(spark, tmp_path):
    """Append-mode regression test: the watermark must BIND to the
    aggregation (grouping by F.window, not a derived bucket column —
    a plain alias strips the event-time metadata, append mode then
    fails at analysis and state grows forever). Proven by (a) the
    append query starting at all, (b) closed buckets emitting once
    the watermark passes them, (c) the state store reporting evicted
    rows."""
    import datetime as dt

    d = str(tmp_path / "ev_resample_append")
    base = dt.datetime(2024, 1, 1)
    early = [
        (i, base + dt.timedelta(seconds=13 * i % 600), i % 3, float(i % 7))
        for i in range(120)
    ]
    late = [
        (1000 + i, base + dt.timedelta(hours=3, seconds=11 * i % 600), i % 3, 1.5)
        for i in range(60)
    ]
    schema = "event_id long, ts timestamp, user_id long, value double"
    spark.createDataFrame(early, schema).coalesce(1).write.mode("append").parquet(d)
    stream = spark.readStream.schema(schema).parquet(d)
    q = (
        SI.streaming_resample(stream, width_s=600.0, watermark="30 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("resample_append")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2 sits 3h later: watermark advances past every early
        # bucket, so they close, emit, and their state is dropped
        spark.createDataFrame(late, schema).coalesce(1).write.mode("append").parquet(d)
        q.processAllAvailable()
        # watermark updates at batch END; one more non-empty batch
        # (an empty parquet write triggers no micro-batch) flushes the
        # now-closed buckets to the append sink
        tick = [(2000, base + dt.timedelta(hours=4), 0, 1.0)]
        spark.createDataFrame(tick, schema).coalesce(1).write.mode("append").parquet(d)
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM resample_append")
        # buckets are epoch-absolute: the early rows all live in
        # floor(epoch(base)/600) — all 3 user groups emitted, full counts
        b0 = int(base.replace(tzinfo=dt.timezone.utc).timestamp()) // 600
        assert got.where(f"bucket = {b0}").count() == 3
        assert got.where(f"bucket = {b0}").agg(F.sum("n")).first()[0] == 120
        removed = sum(
            s["numRowsRemoved"] for s in q.lastProgress["stateOperators"]
        )
        assert removed > 0, "watermark never evicted aggregation state"
    finally:
        q.stop()


def test_streaming_viewshed_matches_batch(spark, tmp_path):
    """Stateless per-frame visibility over a TWO-micro-batch stream
    must equal batch viewshed over the full table."""
    from gfp_gdal_spark.operators.vectorize import viewshed

    d = str(tmp_path / "imgs_vs")
    imgs = datagen.images_table(spark, 60, with_bytes=True)
    imgs.where("image_id < 'img00000030'").coalesce(1).write.mode("append").parquet(d)
    stream = SI.read_image_stream(spark, d)
    q = (
        SI.streaming_viewshed(stream, 0, 0, observer_height=1.5)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("vs_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        imgs.where("image_id >= 'img00000030'").coalesce(1).write.mode("append").parquet(d)
        q.processAllAvailable()
        static = viewshed(spark.read.parquet(d), 0, 0, observer_height=1.5)
        got = spark.sql("SELECT * FROM vs_stream")
        assert static.exceptAll(got).isEmpty()
        assert got.exceptAll(static).isEmpty()
    finally:
        q.stop()


def test_streaming_pip_join_matches_batch(spark, tmp_path):
    """Stream-static PiP join over a TWO-micro-batch image stream must
    equal the batch pip_join over the full table (stateless append —
    the north-star ingest as a stream)."""
    from gfp_gdal_spark.functions.spatial import with_footprint
    from gfp_gdal_spark.operators.joins import pip_join

    d = str(tmp_path / "imgs_pip")
    imgs = datagen.images_table(spark, 400, with_bytes=False)
    polys = datagen.vector_layer_zones(spark, 60)
    imgs.where("image_id < 'img00000200'").coalesce(1).write.mode("append").parquet(d)
    stream = SI.read_image_stream(spark, d)
    q = (
        SI.streaming_pip_join(stream, polys, z=6)
        .select("image_id", "polygon_id")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("pip_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        imgs.where("image_id >= 'img00000200'").coalesce(1).write.mode("append").parquet(d)
        q.processAllAvailable()
        pts = with_footprint(spark.read.parquet(d)).select(
            "image_id", "lon_c", "lat_c", "w", "h"
        )
        static = pip_join(pts, polys, z=6, broadcast=True).select(
            "image_id", "polygon_id"
        )
        got = spark.sql("SELECT * FROM pip_stream")
        assert static.count() > 0
        assert static.exceptAll(got).isEmpty()
        assert got.exceptAll(static).isEmpty()
    finally:
        q.stop()
