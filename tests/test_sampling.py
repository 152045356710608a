"""operators.sampling: determinism, distribution, and boundary checks
for hash_split / sample_per_group / sessionize."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gfp_gdal_spark.operators.sampling import hash_split, sample_per_group, sessionize


def test_hash_split_deterministic_and_partition_invariant(spark):
    df = spark.range(20_000).withColumnRenamed("id", "k")
    a = hash_split(df, "k", {"train": 0.5, "val": 0.25, "test": 0.25})
    b = hash_split(df.repartition(17), "k", {"train": 0.5, "val": 0.25, "test": 0.25})
    pa_ = {r["k"]: r["split"] for r in a.collect()}
    pb = {r["k"]: r["split"] for r in b.collect()}
    assert pa_ == pb  # assignment must not depend on physical layout
    counts = pd.Series(list(pa_.values())).value_counts(normalize=True)
    assert counts["train"] == pytest.approx(0.5, abs=0.02)
    assert counts["val"] == pytest.approx(0.25, abs=0.02)
    assert counts["test"] == pytest.approx(0.25, abs=0.02)
    assert None not in pa_.values()  # fractions sum to 1 -> no holdout


def test_hash_split_holdout_and_overflow(spark):
    df = spark.range(5_000).withColumnRenamed("id", "k")
    out = hash_split(df, "k", {"train": 0.5}).collect()
    holdout = sum(1 for r in out if r["split"] is None)
    assert holdout == pytest.approx(2500, abs=150)
    with pytest.raises(ValueError, match="fractions"):
        hash_split(df, "k", {"a": 0.8, "b": 0.3})


def test_sample_per_group_caps_and_determinism(spark):
    pdf = pd.DataFrame(
        {"g": np.repeat(np.arange(50), 40), "rid": np.arange(2000)}
    )
    df = spark.createDataFrame(pdf)
    out = sample_per_group(df, by="g", n=7, id_col="rid")
    got = out.groupBy("g").count().collect()
    assert all(r["count"] == 7 for r in got)
    # small groups pass through whole
    small = spark.createDataFrame(pd.DataFrame({"g": [1, 1], "rid": [5, 9]}))
    assert sample_per_group(small, by="g", n=10, id_col="rid").count() == 2
    # same rows regardless of layout
    s1 = {(r["g"], r["rid"]) for r in out.collect()}
    s2 = {
        (r["g"], r["rid"])
        for r in sample_per_group(df.repartition(13), by="g", n=7, id_col="rid").collect()
    }
    assert s1 == s2


def test_sessionize_gap_semantics(spark):
    pdf = pd.DataFrame(
        {
            "u": ["a"] * 6 + ["b"] * 3,
            "t": [0.0, 10.0, 20.0, 200.0, 210.0, 900.0, 5.0, 6.0, 1000.0],
            "eid": range(9),
        }
    )
    out = sessionize(
        spark.createDataFrame(pdf), by="u", ts="t", gap=100.0, tiebreak="eid"
    ).collect()
    got = {r["eid"]: r["session_idx"] for r in out}
    # user a: [0,10,20] | [200,210] | [900]; user b: [5,6] | [1000]
    assert [got[i] for i in range(6)] == [0, 0, 0, 1, 1, 2]
    assert [got[i] for i in range(6, 9)] == [0, 0, 1]


def test_mix_no_overflow_at_huge_and_negative_ids(spark):
    """Ids past 2^32 (real at trillion-row scale) and negative ids must
    split without long overflow and stay uniform-ish."""
    df = spark.range(10_000).select(
        (F.col("id") * 1_000_003 + 5_000_000_000_000).alias("k")
    )
    out = hash_split(df, "k", {"train": 0.5, "val": 0.5}).collect()
    frac = sum(1 for r in out if r["split"] == "train") / len(out)
    assert 0.45 < frac < 0.55
    neg = spark.createDataFrame(
        pd.DataFrame({"k": [-5, -4_000_000_000, 7]})
    )
    rows = hash_split(neg, "k", {"train": 1.0}).collect()
    assert all(r["split"] == "train" for r in rows)


def test_corpus_quantiles_exact_and_approx(spark):
    from gfp_gdal_spark.operators.profiling import corpus_quantiles

    pdf = pd.DataFrame(
        {
            "text": ["a " * (i + 1) for i in range(100)],
            "lang": ["en" if i % 2 == 0 else "de" for i in range(100)],
        }
    )
    df = spark.createDataFrame(pdf)
    out = {r["lang"]: r for r in corpus_quantiles(df, by="lang").collect()}
    # en docs: lengths 2,6,10,... ("a " * odd count) -> medians known
    assert out["en"]["n_docs"] == 50 and out["de"]["n_docs"] == 50
    lens = pdf[pdf["lang"] == "en"]["text"].str.len().to_numpy(dtype=float)
    assert out["en"]["chars_p5"] == pytest.approx(np.percentile(lens, 50), rel=1e-12)
    toks = np.array([len(t.split()) for t in pdf[pdf["lang"] == "en"]["text"]], float)
    assert out["en"]["tokens_p9"] == pytest.approx(np.percentile(toks, 90), rel=1e-12)
    # global profile (no grouping) + approx path run and bracket the exact
    g = corpus_quantiles(df, exact=False).collect()[0]
    all_lens = pdf["text"].str.len().to_numpy(dtype=float)
    assert all_lens.min() <= g["chars_p5"] <= all_lens.max()
