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
