"""Embedding similarity search vs numpy brute force."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gfp_gdal_spark.operators import similarity as S

DIM = 64


@pytest.fixture(scope="module")
def corpus_pdf():
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((400, DIM)).astype(np.float32)
    return pd.DataFrame({"vec_id": range(400), "embedding": list(vecs)})


@pytest.fixture(scope="module")
def corpus(spark, corpus_pdf):
    pdf = corpus_pdf.copy()
    pdf["embedding"] = pdf["embedding"].apply(lambda v: v.tolist())
    return spark.createDataFrame(pdf, schema="vec_id long, embedding array<float>").cache()


def brute_topk(corpus_pdf, qids, k):
    mat = np.stack(corpus_pdf["embedding"].values).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1)
    out = {}
    for q in qids:
        cos = (mat @ mat[q]) / np.maximum(norms * norms[q], 1e-12)
        order = np.lexsort((corpus_pdf["vec_id"].values, -cos))[:k]
        out[q] = corpus_pdf["vec_id"].values[order].tolist()
    return out


def test_cosine_topk_exact(spark, corpus, corpus_pdf):
    q = corpus.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    got = S.cosine_topk(q, corpus, k=10).toPandas()
    exp = brute_topk(corpus_pdf, range(5), 10)
    for qid in range(5):
        sub = got[got.q_id == qid].sort_values("rank")
        assert sub["vec_id"].tolist() == exp[qid], qid


def test_cosine_self_is_rank_one(spark, corpus):
    q = corpus.where(F.col("vec_id") == 17).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    top = S.cosine_topk(q, corpus, k=1).collect()[0]
    assert top["vec_id"] == 17 and top["cosine"] == pytest.approx(1.0)


def test_ivf_topk_recall(spark, corpus, corpus_pdf):
    q = corpus.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    got = S.ivf_cosine_topk(q, corpus, k=5, n_centroids=16, n_probe=4).toPandas()
    exp = brute_topk(corpus_pdf, range(10), 5)
    recalls = []
    for qid in range(10):
        sub = got[got.q_id == qid].sort_values("rank")
        assert sub["vec_id"].iloc[0] == qid  # self survives probing
        recalls.append(len(set(sub["vec_id"]) & set(exp[qid])) / 5.0)
    assert sum(recalls) / len(recalls) > 0.5  # 4/16 probes on gaussians


def test_lsh_topk_contains_self_and_is_subset_quality(spark, corpus, corpus_pdf):
    q = corpus.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    got = S.lsh_cosine_topk(q, corpus, k=5, dim=DIM, bits=4).toPandas()
    exp = brute_topk(corpus_pdf, range(10), 40)
    recalls = []
    for qid in range(10):
        sub = got[got.q_id == qid]
        assert (sub["rank"].sort_values().values <= 5).all()
        # self is always in the same bucket -> rank 1
        assert sub.sort_values("rank")["vec_id"].iloc[0] == qid
        got_ids = set(sub["vec_id"])
        recalls.append(len(got_ids & set(exp[qid][:5])) / 5.0)
    # 4-bit LSH on random gaussians: expect decent but imperfect recall
    assert np.mean(recalls) > 0.3
