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


# ---------------------------------------------------------------- #
# duplicate_spans (Lee et al. 2021 exact-substring dedup)          #
# ---------------------------------------------------------------- #


def _dup_spans_ref(texts: dict[int, str], k: int, min_count: int = 2):
    """Independent Python reference: brute-force window counting +
    interval-union span merge (merge when coverage overlaps OR
    touches, i.e. next_pos <= prev_pos + k)."""
    occ = []  # (doc, pos, win)
    from collections import Counter

    for d, t in texts.items():
        toks = t.lower().split(" ")
        for i in range(len(toks) - k + 1):
            occ.append((d, i, " ".join(toks[i : i + k])))
    cnt = Counter(w for _, _, w in occ)
    hits = sorted((d, p) for d, p, w in occ if cnt[w] >= min_count)
    spans = []
    for d, p in hits:
        if spans and spans[-1][0] == d and p <= spans[-1][2] + k:
            spans[-1][2] = p
            spans[-1][3] += 1
        else:
            spans.append([d, p, p, 1])
    return {(d, s, e + k - 1, n) for d, s, e, n in spans}


def test_duplicate_spans_planted(spark):
    # doc 0 and doc 1 share an interior 6-token run; doc 2 repeats a
    # window internally; doc 3 is clean; doc 4 is shorter than k
    texts = {
        0: "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        1: "one two gamma delta epsilon zeta eta theta nine ten",
        2: "x y z w x y z w x y z w",
        3: "totally unrelated words without any shared windows here",
        4: "too short",
    }
    k = 4
    pdf = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    out = DD.duplicate_spans(spark.createDataFrame(pdf), k=k).toPandas()
    got = {
        (r.doc_id, r.span_start, r.span_end, r.n_windows)
        for r in out.itertuples()
    }
    assert got == _dup_spans_ref(texts, k)
    # the shared run: tokens 2..7 in doc 0 ("gamma..theta", 6 tokens,
    # 3 overlapping windows of 4)
    assert (0, 2, 7, 3) in got
    assert not (out.doc_id == 3).any()
    assert not (out.doc_id == 4).any()


def test_duplicate_spans_gap_vs_touch(spark):
    # Two duplicated windows in one doc: at pos p and p+k they TOUCH
    # (one span); at pos p and p+k+1 they leave a 1-token gap (two
    # spans). Construct with doc 0 carrying both patterns and doc 1
    # supplying the matching windows.
    k = 2
    texts = {
        0: "a b a b q c d zz c d",  # "a b" dup at 0 and 2 (touch at gap=k); "c d" at 5 and 8 (gap>k)
        1: "a b x1 x2 c d",  # x1/x2 keep the bridging windows unique
    }
    pdf = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    out = DD.duplicate_spans(spark.createDataFrame(pdf), k=k).toPandas()
    got = {
        (r.doc_id, r.span_start, r.span_end, r.n_windows)
        for r in out.itertuples()
    }
    assert got == _dup_spans_ref(texts, k)
    d0 = sorted((s, e) for d, s, e, _ in got if d == 0)
    assert (0, 3) in d0  # touching windows merged
    assert (5, 6) in d0 and (8, 9) in d0  # gapped windows split


def test_duplicate_spans_random_parity_and_hash_path(spark):
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(12)]
    texts = {
        d: " ".join(rng.choice(vocab, size=int(rng.integers(3, 40))))
        for d in range(30)
    }
    pdf = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    sdf = spark.createDataFrame(pdf)
    for k in (2, 3, 5):
        out = DD.duplicate_spans(sdf, k=k).toPandas()
        got = {
            (r.doc_id, r.span_start, r.span_end, r.n_windows)
            for r in out.itertuples()
        }
        assert got == _dup_spans_ref(texts, k), f"k={k}"
        hashed = DD.duplicate_spans(sdf, k=k, hash_windows=True).toPandas()
        goth = {
            (r.doc_id, r.span_start, r.span_end, r.n_windows)
            for r in hashed.itertuples()
        }
        assert goth == got, f"hash_windows parity k={k}"


def test_duplicate_spans_min_count_and_args(spark):
    texts = {0: "a b c a b c a b c", 1: "z z2 z3"}
    pdf = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    sdf = spark.createDataFrame(pdf)
    # "a b c" occurs 3x in doc 0 (pos 0,3,6): min_count=4 finds nothing
    assert DD.duplicate_spans(sdf, k=3, min_count=4).count() == 0
    out = DD.duplicate_spans(sdf, k=3, min_count=3).toPandas()
    assert {(r.doc_id, r.span_start, r.span_end) for r in out.itertuples()} == {(0, 0, 8)}
    with pytest.raises(ValueError):
        DD.duplicate_spans(sdf, k=0)
    with pytest.raises(ValueError):
        DD.duplicate_spans(sdf, min_count=1)
