"""Statistical language-model scoring — the CCNet-style corpus
quality signal: train an add-k-smoothed bigram model on the corpus
itself (or any reference corpus) and score every document's
perplexity under it. Low-perplexity = fluent/common text,
high-perplexity = gibberish, boilerplate soup, or wrong-language —
the standard pretraining quality-filter axis alongside the heuristic
scores in functions/text.py.

Everything is Column algebra: bigrams come from one transform+explode
over the token array (position-preserving, no self-join), the model
is two groupBy counts, scoring is two keyed joins + one per-doc
aggregate. No UDFs, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bigram_lm_scores"]


def _doc_bigrams(df: DataFrame, text: str, id_col: str) -> DataFrame:
    """(doc, w1, w2) rows — one per ADJACENT token pair, order
    preserved via the array-slice construction (no posexplode
    self-join). Docs with < 2 tokens contribute nothing."""
    toks = F.split(F.lower(F.col(text)), " ")
    bg = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - 2, F.lit(0))),
        lambda i: F.struct(
            F.element_at(toks, i + 1).alias("w1"),
            F.element_at(toks, i + 2).alias("w2"),
        ),
    )
    return (
        df.where(F.size(toks) >= 2)
        .select(F.col(id_col).alias("_id"), F.explode(bg).alias("_b"))
        .select("_id", F.col("_b.w1").alias("w1"), F.col("_b.w2").alias("w2"))
        .where(F.col("w2").isNotNull() & (F.length("w1") > 0) & (F.length("w2") > 0))
    )


def bigram_lm_scores(
    docs: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    train: DataFrame | None = None,
    k_smooth: float = 0.1,
) -> DataFrame:
    """Per-document add-k bigram perplexity. Returns
    (id, n_bigrams, nll, ppl) where

    - model: c(w1, w2) and c(w1) = sum_w2 c(w1, w2) counted over
      ``train`` (default: the scored corpus itself — the CCNet
      self-scoring setup); V = distinct token count of the train
      corpus;
    - p(w2 | w1) = (c(w1,w2) + k) / (c(w1) + k * V); bigrams whose
      context or pair never occurred in training fall back through
      the same formula with zero counts (LEFT joins, coalesce 0);
    - nll = -mean ln p over the doc's bigrams; ppl = exp(nll).

    Scale shape: the model is two groupBy counts over the exploded
    train bigrams; scoring joins the doc bigrams to the model on
    (w1, w2) then (w1) — keyed shuffle joins whose right sides are
    model tables (vocabulary-sized, not corpus-sized) — then ONE
    per-doc aggregate. V rides along as a lazy broadcast 1-row cross
    join (no driver collect).
    """
    tr = _doc_bigrams(train if train is not None else docs, text, id_col)
    pair_c = tr.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("_c12"))
    ctx_c = pair_c.groupBy("w1").agg(F.sum("_c12").alias("_c1"))
    vocab = (
        tr.select(F.col("w1").alias("w"))
        .unionByName(tr.select(F.col("w2").alias("w")))
        .distinct()
        .agg(F.count(F.lit(1)).alias("_v"))
    )
    d = _doc_bigrams(docs, text, id_col)
    scored = (
        d.join(pair_c, ["w1", "w2"], "left")
        .join(ctx_c, ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
    )
    p = (F.coalesce(F.col("_c12"), F.lit(0)) + F.lit(k_smooth)) / (
        F.coalesce(F.col("_c1"), F.lit(0)) + F.lit(k_smooth) * F.col("_v")
    )
    out = scored.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (-F.avg(F.log(p))).alias("nll"),
    )
    return out.select(
        F.col("_id").alias(id_col),
        "n_bigrams",
        "nll",
        F.exp("nll").alias("ppl"),
    )
