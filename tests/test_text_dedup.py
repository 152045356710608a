"""Text functions + dedup operators (Spark) vs numpy/python oracles."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gfp_gdal_spark.functions import text as TX
from gfp_gdal_spark.operators import dedup as DD


@pytest.fixture(scope="module")
def docs(spark):
    base = [
        "the cat sat on the mat and looked at the dog",
        "the cat sat on the mat and looked at the dog",  # exact dup of 0
        "the cat sat on the mat and glared at the dog",  # near dup of 0
        "der hund ist nicht auf der matte und das ist gut",
        "le chat est dans la maison et les chiens sont dans le jardin",
        "el gato es un animal que vive con los humanos por siglos",
        "completely different text about spark shuffles and partitions",
        "1234 5678 9999 0000 1111",
    ]
    pdf = pd.DataFrame({"doc_id": range(len(base)), "text": base})
    return spark.createDataFrame(pdf)


def test_exact_dedup(spark, docs):
    out = DD.exact_dedup(docs).toPandas().sort_values("keeper_id")
    assert len(out) == 7  # 8 docs, one exact dup
    dup = out[out.n_dupes == 2]
    assert dup.keeper_id.tolist() == [0]


def test_token_and_quality_columns(spark, docs):
    out = docs.select(
        "doc_id",
        TX.token_count(F.col("text")).alias("n_tok"),
        TX.punct_ratio(F.col("text")).alias("punct"),
        TX.digit_ratio(F.col("text")).alias("digit"),
        TX.quality_score(F.col("text")).alias("q"),
    ).toPandas().set_index("doc_id")
    assert out.loc[0, "n_tok"] == 11
    assert out.loc[7, "digit"] > 0.7
    assert out.loc[0, "q"] > out.loc[7, "q"]  # prose beats digit soup


def test_lang_id(spark, docs):
    out = docs.select("doc_id", TX.lang_id(F.col("text")).alias("lang")).toPandas()
    langs = out.set_index("doc_id")["lang"]
    assert langs[0] == "en"
    assert langs[3] == "de"
    assert langs[4] == "fr"
    assert langs[5] == "es"
    assert langs[7] == "und"


def _true_jaccard(a: str, b: str, n=5) -> float:
    sa = {a[i : i + n] for i in range(max(len(a) - n + 1, 1))}
    sb = {b[i : i + n] for i in range(max(len(b) - n + 1, 1))}
    return len(sa & sb) / len(sa | sb)


def test_minhash_estimates_jaccard(spark, docs):
    pairs = DD.minhash_lsh_pairs(docs, n_hashes=128, bands=32).toPandas()
    texts = docs.toPandas().set_index("doc_id")["text"]
    # the exact dup pair must be found with est ~ 1.0
    exact = pairs[(pairs.id_a == 0) & (pairs.id_b == 1)]
    assert len(exact) == 1 and exact.est_jaccard.iloc[0] == 1.0
    # every reported estimate within 0.25 of true jaccard (128 hashes)
    for _, r in pairs.iterrows():
        t = _true_jaccard(texts[r.id_a], texts[r.id_b])
        assert abs(r.est_jaccard - t) < 0.25, (r.id_a, r.id_b, r.est_jaccard, t)


def test_minhash_dedup_clusters(spark, docs):
    out = DD.minhash_dedup(docs, threshold=0.6).toPandas().set_index("doc_id")
    assert out.loc[1, "cluster_id"] == 0  # exact dup joins cluster 0
    assert out.loc[2, "cluster_id"] == 0  # near dup joins cluster 0
    assert out.loc[6, "cluster_id"] == 6  # unique doc keeps itself


def test_simhash_finds_near_dups(spark, docs):
    pairs = DD.simhash_pairs(docs, max_hamming=10).toPandas()
    found = set(map(tuple, pairs[["id_a", "id_b"]].values))
    assert (0, 1) in found
    assert pairs.set_index(["id_a", "id_b"]).loc[(0, 1), "hamming"] == 0


def test_ngram_jaccard_exact(spark, docs):
    out = DD.ngram_jaccard_pairs(docs, n=3, threshold=0.1).toPandas()
    row = out[(out.id_a == 0) & (out.id_b == 1)]
    assert len(row) == 1 and row.jaccard.iloc[0] == 1.0
    # independent python oracle for the near-dup pair
    def grams(t, n=3):
        toks = t.lower().split(" ")
        if len(toks) <= n:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    row2 = out[(out.id_a == 0) & (out.id_b == 2)]
    ga, gb = grams("the cat sat on the mat and looked at the dog"), grams(
        "the cat sat on the mat and glared at the dog"
    )
    expected = len(ga & gb) / len(ga | gb)
    assert row2.jaccard.iloc[0] == pytest.approx(expected)


def test_fingerprint_and_simhash_deterministic(spark, docs):
    a = docs.select("doc_id", TX.doc_fingerprint(F.col("text")).alias("fp")).toPandas()
    b = docs.select("doc_id", TX.doc_fingerprint(F.col("text")).alias("fp")).toPandas()
    assert a.equals(b)
    assert a.set_index("doc_id").loc[0, "fp"] == a.set_index("doc_id").loc[1, "fp"]
