"""Bench harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": ..., "value": <total_sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "images_per_sec": ...}

The flagship measures the north_rule metric: spatial-join +
tile-assignment throughput (images/sec) over the synthetic input_hint
image table. Run tools/bench_scaling.py for the local[8]-vs-local[32]
scaling-efficiency evidence (BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_BENCH_IMAGES = int(os.environ.get("SPARK_GRAFT_BENCH_IMAGES", "2000000"))


def _images_parquet(spark, n_images: int) -> str:
    """Materialize the synthetic input_hint table once (the metric is
    over a TABLE SCAN, not over on-the-fly generation)."""
    from gfp_gdal_spark.sources import datagen

    path = f"/tmp/spark_graft_bench_cache/images_{n_images}"
    try:
        if spark.read.parquet(path).count() == n_images:
            return path
    except Exception:
        pass
    datagen.images_table(spark, n_images, with_bytes=False).write.mode(
        "overwrite"
    ).parquet(path)
    datagen.vector_layer_zones(spark, 2000).write.mode("overwrite").parquet(
        path + "_polys"
    )
    return path


N_SKEW_POINTS = int(os.environ.get("SPARK_GRAFT_SKEW_POINTS", "2000000"))


def _skew_inputs(spark, n: int):
    """Hot-cell-skewed join inputs (cached): 30% of points land in ONE
    z8 WebMercator cell AND sit contiguously in the input layout (the
    common real shape — ingest batches are geographically coherent).
    Contiguity matters: AQE's skew-join split works at map-output-block
    granularity, so a hot cell fed by a handful of input splits can
    only be split a handful of ways — while explicit salting scatters
    it across all shuffle partitions BEFORE the exchange. The polygon
    side gets 40 zone polygons inside the hot cell so hot candidates do
    real ray-cast refine work."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from gfp_gdal_spark.sources import datagen

    path = f"/tmp/spark_graft_bench_cache/skewpts_{n}"
    try:
        ok = spark.read.parquet(path).count() == n
    except Exception:
        ok = False
    if not ok:
        hot_n = int(n * 0.3)
        ids = spark.range(n).repartitionByRange(32, "id")
        u1 = F.hash(F.col("id"), F.lit(1)).cast("double") / 4294967296.0 + 0.5
        u2 = F.hash(F.col("id"), F.lit(2)).cast("double") / 4294967296.0 + 0.5
        hot = F.col("id") < hot_n
        pts = ids.select(
            F.col("id").alias("image_id"),
            F.when(hot, 10.0 + u1 * 0.6).otherwise(-178.0 + u1 * 356.0).alias("lon_c"),
            F.when(hot, 45.0 + u2 * 0.6).otherwise(-83.0 + u2 * 166.0).alias("lat_c"),
        )
        pts.write.mode("overwrite").parquet(path)
    ppath = "/tmp/spark_graft_bench_cache/skewpolys"
    try:
        spark.read.parquet(ppath).count()
    except Exception:
        base = datagen.vector_layer_zones_pandas(2000)
        rng = np.random.default_rng(7)
        rows = []
        for j in range(40):
            cx, cy = rng.uniform(10.0, 10.6), rng.uniform(45.0, 45.6)
            rad = rng.uniform(0.05, 0.3)
            k = 3 + (j % 6)
            ang = rng.uniform(0, 2 * np.pi) + np.arange(k) * 2 * np.pi / k
            ring = np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], axis=1)
            rows.append(
                {
                    "polygon_id": 100000 + j, "ring": ring.tolist(), "holes": None,
                    "name": f"hotzone_{j}", "category": "hot",
                    "valid_from": pd.Timestamp("2020-01-01").date(),
                }
            )
        pdf = pd.concat([base, pd.DataFrame(rows)], ignore_index=True)
        spark.createDataFrame(pdf, schema=datagen.VECTOR_SCHEMA).write.mode(
            "overwrite"
        ).parquet(ppath)
    return path, ppath


def _flagship(spark, images_path: str):
    """images scan -> footprints -> cell-bucketed PiP join vs
    2k-polygon layer -> WebMercator tile assign -> per-tile counts."""
    from pyspark.sql import functions as F

    from gfp_gdal_spark.functions.spatial import with_footprint
    from gfp_gdal_spark.operators import joins as J
    from gfp_gdal_spark.sources import datagen

    imgs = spark.read.parquet(images_path)
    pts = with_footprint(imgs).select("image_id", "lon_c", "lat_c")
    try:
        polys = spark.read.parquet(images_path + "_polys")
    except Exception:
        polys = datagen.vector_layer_zones(spark, 2000)
    joined = J.pip_join(pts, polys, z=8, broadcast=True)
    tiled = J.tile_assign(joined, z=12)
    return tiled.groupBy("category", "tile_z", "tile_x", "tile_y").agg(
        F.count(F.lit(1)).alias("n")
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from gfp_gdal_spark.session import get_spark

    spark = get_spark(app="gfp_gdal_spark_bench", cores=cpus)

    import __spark_entry__ as E

    qs = E.queries()
    bench_queries = [
        "tile_assign",
        "tile_counts",
        "tile_cover",
        "pip_join_rect",
        "pip_join_shuffle",
        "pip_join_salted",
        "pip_join_polygons",
        "pip_join_s2",
        "knn_join",
        "knn_join_ring",
        "radius_join",
        "asof_join",
        "asof_join_fwd",
        "asof_join_near",
        "range_join",
        "interval_join",
        "bbox_join",
        "iou_join",
        "nms_boxes",
        "polygon_join",
        "overlap_clusters",
        "density_clusters",
        "pack_chunks",
        "focal_stats",
        "hillshade",
        "terrain",
        "color_relief",
        "zonal_stats",
        "zonal_mode",
        "band_index",
        "idw",
        "sample_raster",
        "crop",
        "rescale",
        "coverage",
        "tile_pyramid",
        "mosaic",
        "rasterize",
        "reproject",
        "label_regions",
        "stitch_regions",
        "proximity",
        "viewshed",
        "contour",
        "sieve",
        "fill_nodata",
        "augment",
        "image_histogram",
        "equalize",
        "verify_pairs",
        "kmeans",
        "decontaminate",
        "dup_spans",
        "track_stats",
        "track_stats_bucketed",
        "interp_track",
        "bm25_search",
        "bm25_sharded",
        "tfidf",
        "bigram_lm",
        "centroid",
        "convex_hull",
        "clip",
        "segmentize",
        "repetition",
        "redact_pii",
        "paragraph_dedup",
        "lr_quality",
        "vocab_topk",
        "distinct_profile",
        "tile_rollup",
        "tile_rollup_stats",
        "audio_stats",
        "resample_audio",
        "audio_fingerprint",
        "hash_split",
        "stratified_split",
        "sample_per_group",
        "sample_per_group_sharded",
        "weighted_sample_pg",
        "sessionize",
        "sessionize_sharded",
        "interval_union",
        "resample",
        "simplify_lines",
        "connected_components",
        "pagerank",
        "bfs_hops",
        "salted_cell_count",
        "agg_pricing",
        "group_segments",
        "topk_per_user",
        "exact_dedup",
        "embedding_dedup",
        "token_stats",
        "token_bpe",
        "cosine_topk",
        "minhash_recall",
        "phash_pairs",
        "hex_cells",
        "geohash_cells",
        "crs_webmercator",
    ]
    # JVM warmup: run the first query once untimed so query #1's number
    # is compute, not classloading/codegen warmup
    qs["tile_assign"](spark, sf_dir).count()

    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    for name in bench_queries:
        best, n = None, 0
        for _ in range(n_runs):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            n = df.count()  # materialize the full result
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]}s ({n} rows, best of {n_runs})", file=sys.stderr)

    # flagship throughput (images/sec): the north_rule metric. The
    # DataFrame is built once and executed n_runs times — planning +
    # broadcast build amortize exactly as in a long-running job (same
    # method as tools/bench_scaling.py); every count() re-executes the
    # full scan->join->tile->agg.
    images_path = _images_parquet(spark, N_BENCH_IMAGES)
    job = _flagship(spark, images_path)
    n_out = job.count()  # warmup run (JIT + codegen + broadcast)
    flagship_sec = None
    for _ in range(n_runs):
        t0 = time.time()
        job.count()
        dt = time.time() - t0
        flagship_sec = dt if flagship_sec is None else min(flagship_sec, dt)
    timings["flagship_pip_tile"] = round(flagship_sec, 3)
    print(f"# flagship: {flagship_sec:.2f}s ({n_out} tiles, best of {n_runs})", file=sys.stderr)

    # hot-cell skew pair (VERDICT r03 ask #8): same shuffle PiP join on
    # a deliberately skewed, layout-clustered input — salted must beat
    # unsalted while producing the identical row count.
    from gfp_gdal_spark.operators import joins as J

    sk_path, sk_polys = _skew_inputs(spark, N_SKEW_POINTS)
    sk_pts = spark.read.parquet(sk_path)
    sk_pl = spark.read.parquet(sk_polys)
    skew_rows = {}
    for name, kw in (
        ("pip_skew_unsalted", {}),
        ("pip_skew_salted", {"salt": "auto"}),
    ):
        best, n = None, 0
        for _ in range(2):
            t0 = time.time()
            n = J.pip_join(sk_pts, sk_pl, z=8, broadcast=False, **kw).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        skew_rows[name] = n
        print(f"# {name}: {timings[name]}s ({n} rows, best of 2)", file=sys.stderr)
    assert skew_rows["pip_skew_unsalted"] == skew_rows["pip_skew_salted"], (
        "salting identity violated on the skew bench"
    )

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "spatial_join_tile_assign_suite_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "cpus": cpus,
        "n_bench_images": N_BENCH_IMAGES,
        "images_per_sec": round(N_BENCH_IMAGES / flagship_sec, 1),
    }
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
