"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship spatial pipeline on /root/testdata/sf0.001
queries()      -> one entry per implemented operator (SURVEY.md §2.5)
oracle_sql()   -> DuckDB-runnable ANSI SQL twins for the SQL-expressible ones

Spatial queries derive deterministic lon/lat from table keys with
Knuth multiplicative hashes so that the EXACT same doubles are
computable in both Spark and DuckDB (no data leaves the driver tables):

    lon(key) = ((key * 2654435761) % 2^32) / 2^32 * 360 - 180
    lat(key) = ((key * 2246822519) % 2^32) / 2^32 * 170 - 85

Operators with no SQL-expressible oracle (hex/S2 cell ids, minhash/
simhash signatures, image codecs, general-polygon PiP) are registered
without an oracle entry — the driver records rows-only checks and the
pytest suite (tests/) holds their brute-force/golden verification.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import gfp_gdal_spark.operators.joins as J
from gfp_gdal_spark.functions import text as TX
from gfp_gdal_spark.functions.spatial import hex_cell, s2_cell, with_footprint
from gfp_gdal_spark.operators import dedup as DD
from gfp_gdal_spark.operators import multimodal as MM
from gfp_gdal_spark.operators import similarity as SIM
from gfp_gdal_spark.operators import transforms as TR
from gfp_gdal_spark.plans.salting import salted_count
from gfp_gdal_spark.sources import datagen

# Knuth multiplicative hash constants (public): lon/lat derivation
_MLON = 2654435761
_MLAT = 2246822519
_P32 = 4294967296


def _prep(spark: SparkSession) -> None:
    # oracle parity: DuckDB timestamps are UTC-naive
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _lon(key):
    return ((key * _MLON) % _P32).cast("double") / _P32 * 360.0 - 180.0


def _lat(key):
    return ((key * _MLAT) % _P32).cast("double") / _P32 * 170.0 - 85.0


_SQL_LON = f"((({{k}}) * {_MLON}) % {_P32}) / {_P32}.0 * 360.0 - 180.0"
_SQL_LAT = f"((({{k}}) * {_MLAT}) % {_P32}) / {_P32}.0 * 170.0 - 85.0"


def _points_from(df: DataFrame, key: str, id_alias: str) -> DataFrame:
    k = F.col(key)
    return df.select(
        k.alias(id_alias), _lon(k).alias("lon_c"), _lat(k).alias("lat_c")
    )


def _rects_from_customer(cust: DataFrame) -> DataFrame:
    """One axis-aligned rect polygon per customer (ring canon: CCW,
    unclosed) — the SQL-oracle-checkable vector layer."""
    k = F.col("c_custkey")
    clon, clat = _lon(k), _lat(k)
    dlon = 0.5 + (k % 7).cast("double") * 0.3
    dlat = 0.4 + (k % 5).cast("double") * 0.25
    x0, x1, y0, y1 = clon - dlon, clon + dlon, clat - dlat, clat + dlat
    ring = F.array(F.array(x0, y0), F.array(x1, y0), F.array(x1, y1), F.array(x0, y1))
    return cust.select(k.alias("c_custkey"), F.col("c_mktsegment"), ring.alias("ring"))


_SQL_RECT = f"""
  SELECT c_custkey, c_mktsegment,
         {_SQL_LON.format(k='c_custkey')} AS clon,
         {_SQL_LAT.format(k='c_custkey')} AS clat,
         0.5 + (c_custkey % 7) * 0.3 AS dlon,
         0.4 + (c_custkey % 5) * 0.25 AS dlat
  FROM customer
"""

_SQL_OPOINTS = f"""
  SELECT o_orderkey,
         {_SQL_LON.format(k='o_orderkey')} AS lon_c,
         {_SQL_LAT.format(k='o_orderkey')} AS lat_c
  FROM orders
"""


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: points (orders-derived) -> cell-bucketed PiP join vs a
    1.5k-polygon vector layer -> WebMercator tile assignment -> counts
    per (segment, tile). sf0.001."""
    _prep(spark)
    sf = "/root/testdata/sf0.001"
    pts = _points_from(_t(spark, sf, "orders"), "o_orderkey", "o_orderkey")
    polys = _rects_from_customer(_t(spark, sf, "customer"))
    joined = J.pip_join(pts, polys, z=4, holes=None, broadcast=True)
    tiled = J.tile_assign(joined, lon="lon_c", lat="lat_c", z=8)
    return (
        tiled.groupBy("c_mktsegment", "tile_z", "tile_x", "tile_y")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q_tile_assign(spark, sf):
    _prep(spark)
    pts = _points_from(_t(spark, sf, "orders"), "o_orderkey", "o_orderkey")
    out = J.tile_assign(pts, z=12)
    return out.select("o_orderkey", "tile_x", "tile_y")


def _q_tile_counts(spark, sf):
    _prep(spark)
    pts = _points_from(_t(spark, sf, "orders"), "o_orderkey", "o_orderkey")
    out = J.tile_assign(pts, z=8)
    return out.groupBy("tile_x", "tile_y").agg(F.count(F.lit(1)).alias("n_points"))


def _q_tile_cover(spark, sf):
    # centers on a shrunken domain so bbox edges never cross the
    # +-180/+-85 clamp (the oracle SQL has no clamp)
    _prep(spark)
    o = _t(spark, sf, "orders")
    k = F.col("o_orderkey")
    slon = ((k * _MLON) % _P32).cast("double") / _P32 * 358.0 - 179.0
    slat = ((k * _MLAT) % _P32).cast("double") / _P32 * 168.0 - 84.0
    df = o.select(
        k.alias("o_orderkey"),
        (slon - (0.05 + (k % 7).cast("double") * 0.05)).alias("min_lon"),
        (slat - (0.04 + (k % 5).cast("double") * 0.04)).alias("min_lat"),
        (slon + (0.05 + (k % 7).cast("double") * 0.05)).alias("max_lon"),
        (slat + (0.04 + (k % 5).cast("double") * 0.04)).alias("max_lat"),
    )
    return J.tile_cover(df, z=9).select("o_orderkey", "tile_x", "tile_y")


def _q_pip_join_rect(spark, sf):
    _prep(spark)
    pts = _points_from(_t(spark, sf, "orders"), "o_orderkey", "o_orderkey")
    polys = _rects_from_customer(_t(spark, sf, "customer"))
    out = J.pip_join(pts, polys, z=4, holes=None, broadcast=True)
    return out.select("o_orderkey", "c_custkey")


def _q_pip_join_hex(spark, sf):
    """Same join, hex (H3-style) bucketing instead of tile bucketing —
    identical result set by construction (the refine is exact), so it
    shares the rect-join SQL oracle."""
    _prep(spark)
    pts = _points_from(_t(spark, sf, "orders"), "o_orderkey", "o_orderkey")
    polys = _rects_from_customer(_t(spark, sf, "customer"))
    out = J.pip_join(pts, polys, holes=None, broadcast=True, bucket="hex", res=3)
    return out.select("o_orderkey", "c_custkey")


def _q_merge_lines(spark, sf):
    """GEOSMergeLines analog: events-derived segments (9 per decade of
    event_id, gap at *9) merge into 10-point polylines; output is the
    structural summary (n_segments, n_lines) so the oracle is plain SQL."""
    _prep(spark)
    from gfp_gdal_spark.operators.lines import merge_lines

    e = _t(spark, sf, "events").where(F.pmod("event_id", F.lit(10)) != 9)
    seg = e.select(
        F.col("event_id").cast("double").alias("x1"),
        F.lit(0.0).alias("y1"),
        (F.col("event_id") + 1).cast("double").alias("x2"),
        F.lit(0.0).alias("y2"),
    )
    merged = merge_lines(seg)
    return merged.groupBy("n_segments").agg(F.count(F.lit(1)).alias("n_lines"))


def _q_pip_join_shuffle(spark, sf):
    """Same join, forced shuffle (sort-merge/hash) path — proves the
    non-broadcast variant returns identical rows."""
    _prep(spark)
    pts = _points_from(_t(spark, sf, "orders"), "o_orderkey", "o_orderkey")
    polys = _rects_from_customer(_t(spark, sf, "customer"))
    out = J.pip_join(pts, polys, z=4, holes=None, broadcast=False)
    return out.select("o_orderkey", "c_custkey")


def _q_knn(spark, sf):
    _prep(spark)
    n = _t(spark, sf, "nation")
    q = n.select(
        F.col("n_nationkey").cast("long").alias("query_id"),
        _lon(F.col("n_nationkey").cast("long")).alias("q_lon"),
        _lat(F.col("n_nationkey").cast("long")).alias("q_lat"),
    )
    p = _points_from(_t(spark, sf, "customer"), "c_custkey", "point_id")
    out = J.knn_join(q, p, k=3, res=3, kring=2)
    return out.select(
        F.col("query_id").alias("n_nationkey"),
        F.col("point_id").alias("c_custkey"),
        F.col("rank").alias("rnk"),
    )


def _q_salted_cell_count(spark, sf):
    _prep(spark)
    pts = _points_from(_t(spark, sf, "lineitem"), "l_orderkey", "l_orderkey")
    t = J.tile_assign(pts, z=5)
    cells = t.withColumn("cell", F.col("tile_x") * 64 + F.col("tile_y"))
    return salted_count(cells, ["cell"], n_salt=16, salt_src="l_orderkey")


def _q_thin_points(spark, sf):
    _prep(spark)
    e = _t(spark, sf, "events")
    return e.where(F.pmod(F.col("event_id"), F.lit(5)) == 0).select("event_id", "value")


def _q_group_segments(spark, sf):
    _prep(spark)
    li = _t(spark, sf, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum("l_quantity").alias("sum_qty"),
    )


def _q_rename_project(spark, sf):
    _prep(spark)
    p = _t(spark, sf, "part")
    return p.select(
        F.col("p_partkey").alias("part_id"),
        F.col("p_name").alias("part_name"),
        F.col("p_retailprice").alias("price"),
    )


def _q_attribute_filter(spark, sf):
    _prep(spark)
    o = _t(spark, sf, "orders")
    return o.where(
        (F.col("o_totalprice") > 100000.0) & (F.col("o_orderstatus") == "O")
    ).select("o_orderkey", "o_custkey", "o_totalprice")


def _q_agg_pricing(spark, sf):
    _prep(spark)
    li = _t(spark, sf, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def _q_date_parts(spark, sf):
    _prep(spark)
    o = _t(spark, sf, "orders")
    return (
        o.select(
            F.year("o_orderdate").cast("long").alias("y"),
            F.month("o_orderdate").cast("long").alias("m"),
        )
        .groupBy("y", "m")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


def _q_topk_per_user(spark, sf):
    _prep(spark)
    from pyspark.sql import Window

    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id").asc())
    return (
        e.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("user_id", "event_id", "rnk")
    )


def _q_exact_dedup(spark, sf):
    _prep(spark)
    d = _t(spark, sf, "documents")
    return DD.exact_dedup(d).select("keeper_id", "n_dupes")


def _q_token_stats(spark, sf):
    _prep(spark)
    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id",
        TX.token_count(F.col("text")).alias("n_tokens"),
        TX.char_count(F.col("text")).alias("n_chars_calc"),
    )


def _q_text_quality(spark, sf):
    _prep(spark)
    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.round(TX.punct_ratio(F.col("text")), 6).alias("punct_r"),
        F.round(TX.digit_ratio(F.col("text")), 6).alias("digit_r"),
        F.round(TX.stopword_ratio(F.col("text")), 6).alias("stop_r"),
    )


def _q_lang_id(spark, sf):
    _prep(spark)
    d = _t(spark, sf, "documents")
    return d.select("doc_id", TX.lang_id(F.col("text")).alias("lang_pred"))


def _q_cosine_topk(spark, sf):
    _prep(spark)
    emb = _t(spark, sf, "embeddings")
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = SIM.cosine_topk(q, emb, k=5)
    return out.select("q_id", "vec_id", F.col("rank").alias("rnk"))


def _q_ngram_jaccard(spark, sf):
    _prep(spark)
    d = _t(spark, sf, "documents").where(F.col("doc_id") < 100)
    out = DD.ngram_jaccard_pairs(d, n=3, threshold=0.01)
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jac"))


# ---- rows-only (no SQL oracle; pytest holds the brute-force checks) ----

def _q_hex_cells(spark, sf):
    _prep(spark)
    pts = _points_from(_t(spark, sf, "orders"), "o_orderkey", "o_orderkey")
    return pts.select(
        "o_orderkey",
        hex_cell(F.col("lon_c"), F.col("lat_c"), 7).alias("hex7"),
        hex_cell(F.col("lon_c"), F.col("lat_c"), 9).alias("hex9"),
        s2_cell(F.col("lon_c"), F.col("lat_c"), 12).alias("s2_12"),
    )


def _q_minhash_pairs(spark, sf):
    _prep(spark)
    d = _t(spark, sf, "documents")
    return DD.minhash_lsh_pairs(d, n_hashes=64, bands=16).select(
        "id_a", "id_b", F.round("est_jaccard", 4).alias("est_j")
    )


def _q_simhash_pairs(spark, sf):
    _prep(spark)
    d = _t(spark, sf, "documents")
    return DD.simhash_pairs(d, max_hamming=3)


def _q_image_roundtrip(spark, sf):
    """Codec invariant over the synthetic input_hint image table:
    decode -> stats -> re-encode round-trip PSNR (>=40dB lossy, inf
    lossless). Rows-only; exact pixel equality is pytest-checked."""
    _prep(spark)
    imgs = datagen.images_table(spark, 300, with_bytes=True)
    st = MM.image_stats(imgs)
    return st.select(
        "image_id", "fmt", "caption", (F.col("psnr_roundtrip") >= 40.0).alias("psnr_ok")
    )


def _q_image_ahash(spark, sf):
    _prep(spark)
    imgs = datagen.images_table(spark, 300, with_bytes=True)
    return MM.image_ahash(imgs)


def _q_simplify(spark, sf):
    _prep(spark)
    vl = datagen.vector_layer(spark, 300)
    out = TR.simplify_polygons(vl, tolerance=0.05)
    return out.select(
        "polygon_id", F.size("ring").alias("n_vertices"), "simplify_ok"
    )


def _q_buffer_area(spark, sf):
    _prep(spark)
    polys = _rects_from_customer(_t(spark, sf, "customer"))
    buf = TR.buffer_polygons(polys, offset=0.1)
    return TR.enrich_geometry(buf).select(
        "c_custkey", F.round("area", 9).alias("area_buf"), "is_valid"
    )


def _q_raster_stats(spark, sf):
    """GDALReader stats analog over the synthetic image table."""
    _prep(spark)
    from gfp_gdal_spark.operators.raster import raster_stats

    imgs = datagen.images_table(spark, 300, with_bytes=True)
    return raster_stats(imgs, band=0)


def _q_raster_points(spark, sf):
    """GDALReader gridded-pointcloud analog (pixel fan-out)."""
    _prep(spark)
    from gfp_gdal_spark.functions.spatial import with_footprint as _wf
    from gfp_gdal_spark.operators.raster import raster_to_points

    imgs = _wf(datagen.images_table(spark, 30, with_bytes=True))
    pts = raster_to_points(imgs, band=0, thin_nth=7)
    return pts.groupBy("image_id").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(F.avg("z"), 4).alias("mean_z"),
    )


def _q_ivf_topk(spark, sf):
    """IVF-style approximate nearest neighbors over embeddings."""
    _prep(spark)
    emb = _t(spark, sf, "embeddings")
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = SIM.ivf_cosine_topk(q, emb, k=5, n_centroids=16, n_probe=4)
    return out.select("q_id", "vec_id", F.col("rank").alias("rnk"))


def _q_minhash_clusters(spark, sf):
    """Near-dup clustering with exact connected components."""
    _prep(spark)
    d = _t(spark, sf, "documents")
    out = DD.minhash_dedup(d, threshold=0.5, exact_clusters=True)
    return out.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n_members"))


def _q_pip_join_polygons(spark, sf):
    """General k-gon polygons with holes (datagen vector layer) —
    ray-cast refine on non-rectangular rings; brute-force-verified in
    tests/test_joins.py."""
    _prep(spark)
    pts = _points_from(_t(spark, sf, "orders"), "o_orderkey", "o_orderkey")
    vl = datagen.vector_layer(spark, 400)
    out = J.pip_join(pts, vl, z=4, broadcast=True)
    return out.select("o_orderkey", "polygon_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "tile_assign": _q_tile_assign,
        "tile_counts": _q_tile_counts,
        "tile_cover": _q_tile_cover,
        "pip_join_rect": _q_pip_join_rect,
        "pip_join_hex": _q_pip_join_hex,
        "pip_join_shuffle": _q_pip_join_shuffle,
        "merge_lines": _q_merge_lines,
        "knn_join": _q_knn,
        "salted_cell_count": _q_salted_cell_count,
        "thin_points": _q_thin_points,
        "group_segments": _q_group_segments,
        "rename_project": _q_rename_project,
        "attribute_filter": _q_attribute_filter,
        "agg_pricing": _q_agg_pricing,
        "date_parts": _q_date_parts,
        "topk_per_user": _q_topk_per_user,
        "exact_dedup": _q_exact_dedup,
        "token_stats": _q_token_stats,
        "text_quality": _q_text_quality,
        "lang_id": _q_lang_id,
        "cosine_topk": _q_cosine_topk,
        "ngram_jaccard": _q_ngram_jaccard,
        # rows-only (non-SQL-expressible; pytest brute-force/golden checks)
        "hex_cells": _q_hex_cells,
        "minhash_pairs": _q_minhash_pairs,
        "simhash_pairs": _q_simhash_pairs,
        "image_roundtrip": _q_image_roundtrip,
        "image_ahash": _q_image_ahash,
        "simplify_polygons": _q_simplify,
        "buffer_area": _q_buffer_area,
        "pip_join_polygons": _q_pip_join_polygons,
        "raster_stats": _q_raster_stats,
        "raster_points": _q_raster_points,
        "ivf_topk": _q_ivf_topk,
        "minhash_clusters": _q_minhash_clusters,
    }


# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------

_TILE_X = "CAST(floor((lon_c + 180.0) / 360.0 * {n}) AS BIGINT)"
_TILE_Y = (
    "CAST(floor((1.0 - ln(tan(radians(lat_c)) + 1.0 / cos(radians(lat_c))) / pi()) "
    "/ 2.0 * {n}) AS BIGINT)"
)


def oracle_sql() -> dict[str, str]:
    opoints = _SQL_OPOINTS
    rects = _SQL_RECT
    hav = (
        "2 * 6371008.8 * asin(sqrt(least("
        "pow(sin(radians(p_lat - q_lat) / 2), 2) + "
        "cos(radians(q_lat)) * cos(radians(p_lat)) * "
        "pow(sin(radians(p_lon - q_lon) / 2), 2), 1.0)))"
    )
    return {
        "tile_assign": f"""
            WITH p AS ({opoints})
            SELECT o_orderkey,
                   {_TILE_X.format(n=4096)} AS tile_x,
                   {_TILE_Y.format(n=4096)} AS tile_y
            FROM p
        """,
        "tile_counts": f"""
            WITH p AS ({opoints}),
            t AS (SELECT {_TILE_X.format(n=256)} AS tile_x,
                         {_TILE_Y.format(n=256)} AS tile_y FROM p)
            SELECT tile_x, tile_y, count(*) AS n_points FROM t GROUP BY 1, 2
        """,
        "tile_cover": f"""
            WITH s AS (
              SELECT o_orderkey,
                ((o_orderkey * {_MLON}) % {_P32}) / {_P32}.0 * 358.0 - 179.0 AS slon,
                ((o_orderkey * {_MLAT}) % {_P32}) / {_P32}.0 * 168.0 - 84.0 AS slat
              FROM orders
            ),
            b AS (
              SELECT o_orderkey,
                slon - (0.05 + (o_orderkey % 7) * 0.05) AS min_lon,
                slat - (0.04 + (o_orderkey % 5) * 0.04) AS min_lat,
                slon + (0.05 + (o_orderkey % 7) * 0.05) AS max_lon,
                slat + (0.04 + (o_orderkey % 5) * 0.04) AS max_lat
              FROM s
            ),
            r AS (
              SELECT o_orderkey,
                CAST(floor((min_lon + 180.0) / 360.0 * 512) AS BIGINT) AS x0,
                CAST(floor((max_lon + 180.0) / 360.0 * 512) AS BIGINT) AS x1,
                CAST(floor((1.0 - ln(tan(radians(max_lat)) + 1.0/cos(radians(max_lat))) / pi()) / 2.0 * 512) AS BIGINT) AS y0,
                CAST(floor((1.0 - ln(tan(radians(min_lat)) + 1.0/cos(radians(min_lat))) / pi()) / 2.0 * 512) AS BIGINT) AS y1
              FROM b
            )
            SELECT o_orderkey, xs.x AS tile_x, ys.y AS tile_y
            FROM r, unnest(generate_series(x0, x1)) AS xs(x),
                    unnest(generate_series(y0, y1)) AS ys(y)
        """,
        "pip_join_rect": f"""
            WITH p AS ({opoints}), c AS ({rects})
            SELECT p.o_orderkey, c.c_custkey
            FROM p, c
            WHERE p.lon_c > c.clon - c.dlon AND p.lon_c < c.clon + c.dlon
              AND p.lat_c > c.clat - c.dlat AND p.lat_c < c.clat + c.dlat
        """,
        "pip_join_shuffle": f"""
            WITH p AS ({opoints}), c AS ({rects})
            SELECT p.o_orderkey, c.c_custkey
            FROM p, c
            WHERE p.lon_c > c.clon - c.dlon AND p.lon_c < c.clon + c.dlon
              AND p.lat_c > c.clat - c.dlat AND p.lat_c < c.clat + c.dlat
        """,
        "pip_join_hex": f"""
            WITH p AS ({opoints}), c AS ({rects})
            SELECT p.o_orderkey, c.c_custkey
            FROM p, c
            WHERE p.lon_c > c.clon - c.dlon AND p.lon_c < c.clon + c.dlon
              AND p.lat_c > c.clat - c.dlat AND p.lat_c < c.clat + c.dlat
        """,
        "merge_lines": """
            SELECT 9 AS n_segments,
                   count(DISTINCT CAST(floor(event_id / 10) AS BIGINT)) AS n_lines
            FROM events WHERE event_id % 10 <> 9
        """,
        "knn_join": f"""
            WITH q AS (
              SELECT n_nationkey,
                     {_SQL_LON.format(k='n_nationkey')} AS q_lon,
                     {_SQL_LAT.format(k='n_nationkey')} AS q_lat
              FROM nation
            ),
            p AS (
              SELECT c_custkey,
                     {_SQL_LON.format(k='c_custkey')} AS p_lon,
                     {_SQL_LAT.format(k='c_custkey')} AS p_lat
              FROM customer
            ),
            d AS (
              SELECT q.n_nationkey, p.c_custkey, {hav} AS dist
              FROM q, p
            ),
            r AS (
              SELECT n_nationkey, c_custkey,
                     row_number() OVER (PARTITION BY n_nationkey
                                        ORDER BY dist ASC, c_custkey ASC) AS rnk
              FROM d
            )
            SELECT n_nationkey, c_custkey, rnk FROM r WHERE rnk <= 3
        """,
        "salted_cell_count": f"""
            WITH p AS (
              SELECT l_orderkey,
                     {_SQL_LON.format(k='l_orderkey')} AS lon_c,
                     {_SQL_LAT.format(k='l_orderkey')} AS lat_c
              FROM lineitem
            ),
            t AS (SELECT {_TILE_X.format(n=32)} * 64 + {_TILE_Y.format(n=32)} AS cell FROM p)
            SELECT cell, count(*) AS n FROM t GROUP BY cell
        """,
        "thin_points": """
            SELECT event_id, value FROM events WHERE event_id % 5 = 0
        """,
        "group_segments": """
            SELECT l_orderkey, count(*) AS n_segments, sum(l_quantity) AS sum_qty
            FROM lineitem GROUP BY l_orderkey
        """,
        "rename_project": """
            SELECT p_partkey AS part_id, p_name AS part_name, p_retailprice AS price
            FROM part
        """,
        "attribute_filter": """
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM orders WHERE o_totalprice > 100000.0 AND o_orderstatus = 'O'
        """,
        "agg_pricing": """
            SELECT l_returnflag, l_linestatus,
                   sum(l_quantity) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "date_parts": """
            SELECT CAST(extract(year FROM o_orderdate) AS BIGINT) AS y,
                   CAST(extract(month FROM o_orderdate) AS BIGINT) AS m,
                   count(*) AS n_orders
            FROM orders GROUP BY 1, 2
        """,
        "topk_per_user": """
            WITH r AS (
              SELECT user_id, event_id,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY value DESC, event_id ASC) AS rnk
              FROM events
            )
            SELECT user_id, event_id, rnk FROM r WHERE rnk <= 3
        """,
        "exact_dedup": """
            SELECT min(doc_id) AS keeper_id, count(*) AS n_dupes
            FROM documents GROUP BY text
        """,
        "token_stats": """
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   CAST(length(text) AS BIGINT) AS n_chars_calc
            FROM documents
        """,
        "text_quality": r"""
            SELECT doc_id,
              round((length(text) - length(regexp_replace(text, '[.,;:!?''"()\[\]{}-]', '', 'g')))
                    / greatest(length(text), 1)::DOUBLE, 6) AS punct_r,
              round((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
                    / greatest(length(text), 1)::DOUBLE, 6) AS digit_r,
              round(len(list_filter(string_split(lower(text), ' '),
                        x -> x IN ('the','and','of','to','in','is','that','it','was','for')))
                    / greatest(len(string_split(lower(text), ' ')), 1)::DOUBLE, 6) AS stop_r
            FROM documents
        """,
        "lang_id": """
            WITH h AS (
              SELECT doc_id,
                len(list_filter(string_split(lower(text), ' '),
                    x -> x IN ('the','and','of','to','in','is','that','it','was','for'))) AS h_en,
                len(list_filter(string_split(lower(text), ' '),
                    x -> x IN ('der','die','und','das','ist','nicht','ein','mit','auf','zu'))) AS h_de,
                len(list_filter(string_split(lower(text), ' '),
                    x -> x IN ('le','la','et','les','des','est','un','une','dans','que'))) AS h_fr,
                len(list_filter(string_split(lower(text), ' '),
                    x -> x IN ('el','la','de','que','los','es','un','una','por','con'))) AS h_es
              FROM documents
            )
            SELECT doc_id,
              CASE WHEN greatest(h_en, h_de, h_fr, h_es) = 0 THEN 'und'
                   WHEN h_en = greatest(h_en, h_de, h_fr, h_es) THEN 'en'
                   WHEN h_de = greatest(h_en, h_de, h_fr, h_es) THEN 'de'
                   WHEN h_fr = greatest(h_en, h_de, h_fr, h_es) THEN 'fr'
                   ELSE 'es' END AS lang_pred
            FROM h
        """,
        "cosine_topk": """
            WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 5),
            d AS (
              SELECT q.q_id, e.vec_id,
                     list_cosine_similarity(q.q_vec, e.embedding) AS cosine
              FROM q, embeddings e
            ),
            r AS (
              SELECT q_id, vec_id,
                     row_number() OVER (PARTITION BY q_id
                                        ORDER BY cosine DESC, vec_id ASC) AS rnk
              FROM d
            )
            SELECT q_id, vec_id, rnk FROM r WHERE rnk <= 5
        """,
        "ngram_jaccard": """
            WITH toks AS (
              SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents WHERE doc_id < 100
            ),
            grams AS (
              SELECT DISTINCT doc_id,
                     array_to_string(t[i : i + 2], ' ') AS gram
              FROM toks, unnest(generate_series(1, greatest(len(t) - 2, 1))) AS g(i)
              WHERE length(array_to_string(t[i : i + 2], ' ')) > 0
            ),
            sizes AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
              FROM grams a JOIN grams b USING (gram)
              WHERE a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT id_a, id_b,
                   round(inter / (sa.n_grams + sb.n_grams - inter)::DOUBLE, 6) AS jac
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE inter / (sa.n_grams + sb.n_grams - inter)::DOUBLE >= 0.01
        """,
    }
