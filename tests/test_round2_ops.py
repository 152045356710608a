"""Round-2 operator regressions: CC pointer jumping, knn auto-res,
dedup fingerprint grouping, ngram df cap, LSH multiprobe."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_connected_components_long_chain_converges(spark):
    """A 200-edge chain has diameter 200: one-hop min-label propagation
    needs 200 rounds; pointer jumping must converge in <= 12."""
    from gfp_gdal_spark.plans.graph import connected_components

    edges = spark.range(200).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    comp = connected_components(edges, max_iter=12)
    rows = comp.collect()
    assert len(rows) == 201
    assert all(r["component"] == 0 for r in rows)


def test_connected_components_raises_on_nonconvergence(spark):
    from gfp_gdal_spark.plans.graph import connected_components

    edges = spark.range(300).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=2)


def _pts(spark, n, seed):
    rng = np.random.default_rng(seed)
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "point_id": np.arange(n),
                "lon_c": rng.uniform(-10, 10, n),
                "lat_c": rng.uniform(40, 50, n),
            }
        )
    )


def test_knn_auto_res_matches_bruteforce(spark):
    from gfp_gdal_spark.operators import joins as J

    q = spark.createDataFrame(
        pd.DataFrame({"query_id": [0, 1, 2], "q_lon": [0.0, 5.0, -7.0], "q_lat": [45.0, 42.0, 48.0]})
    )
    # dense: ring path; sparse: BNL shortcut — both must equal brute force
    for n in (4000, 40):
        p = _pts(spark, n, seed=n)
        got = {
            (r["query_id"], r["point_id"], r["rank"])
            for r in J.knn_join(q, p, k=4, res="auto", kring=2).collect()
        }
        want = {
            (r["query_id"], r["point_id"], r["rank"])
            for r in J.knn_join_bruteforce(
                q, p, 4, "query_id", "q_lon", "q_lat", "point_id", "lon_c", "lat_c"
            ).collect()
        }
        assert got == want, f"n={n}"


def test_exact_dedup_fingerprint_grouping(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(8),
                "text": ["aa", "bb", "aa", "cc", "bb", "aa", "dd", "ee"],
            }
        )
    )
    from gfp_gdal_spark.operators.dedup import exact_dedup

    out = {r["keeper_id"]: r["n_dupes"] for r in exact_dedup(docs).collect()}
    assert out == {0: 3, 1: 2, 3: 1, 6: 1, 7: 1}
    witht = exact_dedup(docs, keep_text=True).collect()
    assert {r["text"] for r in witht} == {"aa", "bb", "cc", "dd", "ee"}
    # the plan must NOT shuffle on the raw text column
    plan = exact_dedup(docs)._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(_fp" in plan


def test_ngram_jaccard_max_df_drops_hot_grams(spark):
    from gfp_gdal_spark.operators.dedup import ngram_jaccard_pairs

    # 'x y z' appears in every doc: with max_df=2 it cannot create pairs
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(4),
                "text": [
                    "x y z a b c",
                    "x y z d e f",
                    "x y z a b c g",
                    "x y z h i j",
                ],
            }
        )
    )
    uncapped = ngram_jaccard_pairs(docs, n=3, threshold=0.01).count()
    capped = ngram_jaccard_pairs(docs, n=3, threshold=0.01, max_df=2).collect()
    assert uncapped >= 6  # the hot gram links every pair
    # only docs 0 and 2 share low-df grams ('a b c', 'y z a', 'z a b')
    assert {(r["id_a"], r["id_b"]) for r in capped} == {(0, 2)}


def test_lsh_multiprobe_recall_monotone(spark):
    from gfp_gdal_spark.operators.similarity import cosine_topk, lsh_cosine_topk

    rng = np.random.default_rng(3)
    emb = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": range(400),
                "embedding": [rng.standard_normal(16).tolist() for _ in range(400)],
            }
        ),
        schema="vec_id long, embedding array<double>",
    )
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = {(r["q_id"], r["vec_id"]) for r in cosine_topk(q, emb, k=5).collect()}

    def recall(m):
        got = {
            (r["q_id"], r["vec_id"])
            for r in lsh_cosine_topk(q, emb, k=5, dim=16, bits=6, multiprobe=m).collect()
        }
        return len(got & exact) / len(exact)

    r0, r2 = recall(0), recall(2)
    assert r2 >= r0
    assert r2 >= 0.5


def test_embedding_dedup_pairs_vs_bruteforce(spark):
    """LSH-bucketed near-dup pairs must find every pair brute force
    finds at the planted threshold (scaled copies share all buckets)."""
    from gfp_gdal_spark.operators.similarity import embedding_dedup_pairs

    rng = np.random.default_rng(11)
    base = rng.standard_normal((60, 16))
    vecs = list(base) + [base[i] * 2.0 for i in range(0, 60, 5)]  # 12 copies
    ids = list(range(60)) + [1000 + i for i in range(0, 60, 5)]
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": ids, "embedding": [v.tolist() for v in vecs]}),
        schema="vec_id long, embedding array<double>",
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in embedding_dedup_pairs(emb, threshold=0.95, dim=16, bits=6).collect()
    }
    # brute force
    m = np.stack(vecs)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    cos = mn @ mn.T
    want = {
        (min(ids[i], ids[j]), max(ids[i], ids[j]))
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if cos[i, j] >= 0.95
    }
    assert want <= got  # planted pairs always found
    assert got == want  # and nothing below threshold survives the verify


def test_token_count_bpe(spark):
    from gfp_gdal_spark.functions.text import token_count_bpe

    df = spark.createDataFrame(
        pd.DataFrame({"t": ["It's 42 degrees, isn't it?", "", "hello   world"]})
    )
    got = [r["n"] for r in df.select(token_count_bpe(F.col("t")).alias("n")).collect()]
    # "It|'s| 42| degrees|,| isn|'t| it|?" -> 9
    # "hello|   |world" -> 3 (no-lookahead variant: \s+ eats the run)
    assert got == [9, 0, 3]


def test_asof_join_matches_naive(spark):
    from gfp_gdal_spark.operators.temporal import asof_join

    l_pdf = pd.DataFrame({"k": [1, 1, 1, 2, 2], "t": [5, 10, 2, 7, 1], "lid": range(5)})
    r_pdf = pd.DataFrame({"k": [1, 1, 2], "t": [3, 10, 9], "v": [30.0, 100.0, 90.0]})
    l = spark.createDataFrame(l_pdf)
    r = spark.createDataFrame(r_pdf)
    out = {r_["lid"]: r_["v"] for r_ in asof_join(l, r, on="t", by="k").collect()}
    # lid0 t=5 -> v@3=30; lid1 t=10 -> v@10=100 (tie inclusive);
    # lid2 t=2 -> none; lid3 t=7 -> none (r k=2 at 9 is later); lid4 -> none
    assert out == {0: 30.0, 1: 100.0, 2: None, 3: None, 4: None}
    # zero-python, single shuffle on the by key
    plan = asof_join(l, r, on="t", by="k")._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_range_join_matches_naive(spark):
    from gfp_gdal_spark.operators.temporal import range_join

    rng = np.random.default_rng(7)
    pts_pdf = pd.DataFrame({"pid": range(500), "v": rng.uniform(0, 100, 500)})
    iv_pdf = pd.DataFrame(
        {"iid": range(30), "lo": rng.uniform(0, 90, 30)}
    )
    iv_pdf["hi"] = iv_pdf["lo"] + rng.uniform(0.5, 20, 30)
    pts = spark.createDataFrame(pts_pdf)
    iv = spark.createDataFrame(iv_pdf)
    got = {
        (r["pid"], r["iid"])
        for r in range_join(pts, iv, val="v", lo="lo", hi="hi", bin_width=5.0).collect()
    }
    want = {
        (int(p.pid), int(i.iid))
        for _, p in pts_pdf.iterrows()
        for _, i in iv_pdf.iterrows()
        if i.lo <= p.v <= i.hi
    }
    assert got == want
    plan = range_join(pts, iv, val="v", lo="lo", hi="hi", bin_width=5.0)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan


def test_radius_join_antimeridian_and_bruteforce(spark):
    from gfp_gdal_spark.operators import joins as J
    from gfp_gdal_spark.kernels.geom import haversine

    rng = np.random.default_rng(13)
    # points clustered around the antimeridian and high latitudes
    lons = np.concatenate([rng.uniform(170, 180, 150), rng.uniform(-180, -170, 150),
                           rng.uniform(-20, 20, 200)])
    lats = np.concatenate([rng.uniform(60, 84, 300), rng.uniform(-30, 30, 200)])
    p = spark.createDataFrame(pd.DataFrame({"pid": range(500), "lon_c": lons, "lat_c": lats}))
    q = spark.createDataFrame(pd.DataFrame(
        {"qid": [0, 1, 2], "q_lon": [179.5, -179.9, 0.0], "q_lat": [75.0, 82.0, 5.0]}))
    R = 400_000.0
    got = {(r["qid"], r["pid"]) for r in
           J.radius_join(q, p, R, l_lon="q_lon", l_lat="q_lat").collect()}
    want = set()
    for qi, (ql, qf) in enumerate([(179.5, 75.0), (-179.9, 82.0), (0.0, 5.0)]):
        d = haversine(np.full(500, ql), np.full(500, qf), lons, lats)
        want |= {(qi, int(i)) for i in np.flatnonzero(d <= R)}
    assert got == want
    assert any(lons[pid] < -170 for (qid, pid) in got if qid == 0)  # wrap pairs found


def test_knn_join_antimeridian_neighbor(spark):
    """A query at lon 179.9 whose true nearest point sits at -179.9
    must get it (the wrap-blind ring certification falls through to
    the exact tail instead of certifying wrongly)."""
    from gfp_gdal_spark.operators import joins as J

    rng = np.random.default_rng(21)
    # dense cluster near the query ON ITS SIDE plus one closer point
    # across the antimeridian
    lons = np.concatenate([rng.uniform(178.0, 179.4, 500), [-179.95]])
    lats = np.concatenate([rng.uniform(40.0, 42.0, 500), [41.0]])
    p = spark.createDataFrame(pd.DataFrame({"point_id": range(501), "lon_c": lons, "lat_c": lats}))
    q = spark.createDataFrame(pd.DataFrame({"query_id": [0], "q_lon": [179.9], "q_lat": [41.0]}))
    got = {r["point_id"] for r in J.knn_join(q, p, k=1, res="auto", kring=2).collect()}
    assert got == {500}  # the cross-wrap point is the true NN (~12.5 km)
