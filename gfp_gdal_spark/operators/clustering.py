"""Spatial density clustering — DBSCAN (Ester et al. 1996) over
lon/lat point tables: the scene-extraction / POI-grouping / GPS-stop
detection workhorse, composed entirely from the engine's certified
bucketed primitives (radius_join for the eps-neighborhood graph,
plans.graph connected components for the core subgraph) — no
all-pairs stage anywhere.

Semantics (textbook DBSCAN, deterministic border rule):
- |N_eps(p)| >= min_pts (self INCLUDED) -> p is a CORE point;
- core points whose eps-graph connects them (directly or through
  other cores) share a cluster; the label is the minimum core id of
  the cluster (connected_components' canonical representative);
- a non-core point with >= 1 core neighbor is a BORDER point and
  joins the MINIMUM cluster label among its core neighbors (plain
  DBSCAN leaves border assignment order-dependent; min-label makes
  it reproducible);
- everything else is NOISE: cluster_id NULL.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["density_clusters", "kmeans_lloyd"]


def density_clusters(
    df: DataFrame,
    id_col: str = "point_id",
    lon: str = "lon_c",
    lat: str = "lat_c",
    eps_m: float = 1000.0,
    min_pts: int = 4,
    max_iter: int = 40,
) -> DataFrame:
    """DBSCAN over (lon, lat) points. Returns every input row with
    ``is_core`` (boolean) and ``cluster_id`` (min core id of the
    cluster; NULL = noise).

    Plan: ONE hex-bucketed ``radius_join`` self-join builds the
    eps-neighborhood pairs (per-row adaptive cover, haversine-exact,
    antimeridian/pole-guarded); neighbor counts, the core flag, the
    core-core edge list, and border attachment are each one keyed
    aggregate/join over those pairs; the only iterative piece is the
    O(log n)-round hook+compress CC on the CORE subgraph (typically a
    small fraction of the input). Nothing is quadratic in the corpus —
    fan-out is bounded by true eps-neighbor counts + cover cells.

    Ids must be orderable and globally unique.
    """
    from gfp_gdal_spark.operators.joins import radius_join
    from gfp_gdal_spark.plans.graph import connected_components
    from gfp_gdal_spark.plans.lineage import flat_checkpoint

    lv = df.select(
        F.col(id_col).alias("_ida"),
        F.col(lon).alias("q_lon"),
        F.col(lat).alias("q_lat"),
    )
    rv = df.select(
        F.col(id_col).alias("_idb"),
        F.col(lon).alias("lon_c"),
        F.col(lat).alias("lat_c"),
    )
    # eps-neighbor pairs, self-pair included (dist 0) — so the count
    # below is |N_eps(p)| with p itself, the textbook formulation.
    # flat_checkpoint: the pair set feeds THREE consumers (counts,
    # core-core edges, border attachment) and then the iterative CC —
    # without it the bucketed join re-executes per consumer and the CC
    # loop squares its size estimate (see plans/lineage.py)
    pairs = flat_checkpoint(
        radius_join(lv, rv, radius_m=eps_m).select("_ida", "_idb")
    )
    ncnt = pairs.groupBy("_ida").agg(F.count(F.lit(1)).alias("_n_nbrs"))
    core = ncnt.where(F.col("_n_nbrs") >= min_pts).select("_ida")

    core_a = core.select(F.col("_ida").alias("_ca"))
    core_b = core.select(F.col("_ida").alias("_cb"))
    edges = (
        pairs.where(F.col("_ida") < F.col("_idb"))
        .join(core_a, pairs["_ida"] == core_a["_ca"])
        .join(core_b, pairs["_idb"] == core_b["_cb"])
        .select(F.col("_ida").alias("src"), F.col("_idb").alias("dst"))
    )
    comp = connected_components(edges, max_iter=max_iter)
    core_cid = (
        core.join(comp, core["_ida"] == comp["vertex"], "left")
        .select(
            F.col("_ida").alias("_cid_key"),
            F.coalesce(F.col("component"), F.col("_ida")).alias("_cid"),
        )
    )
    # border: non-core point -> min cluster among its CORE neighbors
    border = (
        pairs.join(core_cid, pairs["_idb"] == core_cid["_cid_key"])
        .join(core, "_ida", "left_anti")
        .groupBy("_ida")
        .agg(F.min("_cid").alias("_cid"))
    )
    assign = core_cid.select(F.col("_cid_key").alias("_ida"), "_cid").unionByName(
        border
    )
    out = (
        df.join(assign, df[id_col] == assign["_ida"], "left")
        .join(
            core.select(F.col("_ida").alias("_corek")),
            df[id_col] == F.col("_corek"),
            "left",
        )
        .withColumn("is_core", F.col("_corek").isNotNull())
        .withColumn("cluster_id", F.col("_cid"))
        .drop("_ida", "_cid", "_corek")
    )
    return out


def kmeans_lloyd(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "doc_id",
    k: int = 8,
    max_iters: int = 10,
) -> DataFrame:
    """K-means (Lloyd 1982) over an embedding column — the corpus-
    partitioning / coreset / IVF-list-building primitive. DETERMINISTIC
    init: centers 0..k-1 are the vectors of the k smallest ids (no
    RNG — resume-invariant and cross-run stable like every sampler
    here). Returns (id_col, cluster, dist2).

    Scale shape per iteration (driver holds only the k x dim centers):
    - ASSIGN: broadcast centers into an Arrow-batched pandas UDF —
      one (batch x k) matmul per batch, no per-row Python;
    - UPDATE: posexplode to (cluster, dim, val) + ONE groupBy —
      map-side combine reduces shuffle volume to partitions x k x dim
      rows regardless of corpus size; empty clusters keep their
      previous center (documented, the standard fix).
    Ties in assign break to the LOWEST cluster index. Centroid means
    are float sums (order depends on partitioning); assignments are
    reproducible whenever the cluster margin exceeds float-sum noise —
    the planted-fixture certification regime; bitwise cross-partition
    determinism of the means themselves is NOT promised (use the
    integer-exact operators when that is the contract).
    """
    from pyspark.sql import types as T

    if k < 1 or max_iters < 1:
        raise ValueError("k and max_iters must be >= 1")
    base = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    first = base.orderBy("_id").limit(k).orderBy("_id").collect()
    if len(first) < k:
        raise ValueError(f"k={k} exceeds the number of rows ({len(first)})")
    centers = np.asarray([list(map(float, r["_v"])) for r in first], dtype=np.float64)
    dim = centers.shape[1]
    spark = df.sparkSession
    base = base.persist()
    try:
        assigned = None
        for _ in range(max_iters):
            C = spark.sparkContext.broadcast(centers)

            @F.pandas_udf(T.StructType([
                T.StructField("cluster", T.IntegerType()),
                T.StructField("dist2", T.DoubleType()),
            ]))
            def _assign(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
                cc = C.value
                for vecs in it:
                    X = np.asarray(
                        [np.asarray(v, dtype=np.float64) for v in vecs]
                    )
                    # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2; ties -> low idx
                    d2 = (
                        (X * X).sum(axis=1)[:, None]
                        - 2.0 * X @ cc.T
                        + (cc * cc).sum(axis=1)[None, :]
                    )
                    a = d2.argmin(axis=1)
                    yield pd.DataFrame(
                        {"cluster": a.astype(np.int32),
                         "dist2": np.maximum(d2[np.arange(len(a)), a], 0.0)}
                    )

            assigned = base.withColumn("_a", _assign(F.col("_v")))
            sums = (
                assigned.select(
                    F.col("_a.cluster").alias("cluster"),
                    F.posexplode(F.col("_v")).alias("dim", "val"),
                )
                .groupBy("cluster", "dim")
                .agg(F.sum(F.col("val").cast("double")).alias("s"),
                     F.count(F.lit(1)).alias("n"))
            )
            rows = sums.collect()
            new = centers.copy()
            cnt = np.zeros(k, np.int64)
            for r in rows:
                new[r["cluster"], r["dim"]] = r["s"] / r["n"]
                cnt[r["cluster"]] = r["n"]
            if np.array_equal(new, centers):
                break
            centers = new
        return assigned.select(
            F.col("_id").alias(id_col),
            F.col("_a.cluster").alias("cluster"),
            F.round(F.col("_a.dist2"), 9).alias("dist2"),
        )
    finally:
        base.unpersist()
