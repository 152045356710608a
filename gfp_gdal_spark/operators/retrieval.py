"""Corpus retrieval / relevance scoring — the lexical complement of
the embedding ANN family (operators/similarity.py): BM25 top-k over a
document corpus, pure DataFrame algebra (tokenize -> explode -> count
-> join -> window), no UDFs.

Scale shape: term statistics are ONE groupBy over the exploded
(doc, term) table; the query side is tiny (a benchmark/query set) and
broadcasts, so the corpus postings never shuffle for the match — only
the final per-(query, doc) aggregate and the top-k window move data,
both keyed and bounded. Corpus-level scalars (N, avgdl) stay lazy via
a broadcast 1-row cross join (no driver collect on the data path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bm25_search", "hashed_tfidf"]


def _terms(df: DataFrame, text: str, id_col: str, out_id: str) -> DataFrame:
    toks = F.split(F.lower(F.col(text)), " ")
    return (
        df.select(
            F.col(id_col).alias(out_id),
            F.size(toks).alias("_dl"),
            F.explode(toks).alias("term"),
        )
        .where(F.length("term") > 0)
    )


def bm25_search(
    docs: DataFrame,
    queries: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    q_id: str = "q_id",
    q_text: str = "q_text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
    shards: int | None = None,
) -> DataFrame:
    """Okapi BM25 top-k retrieval: for each query row, the ``top_k``
    highest-scoring documents with their scores.

    - tf = term occurrences in the doc; dl = doc token count;
      idf = ln(1 + (N - df + 0.5) / (df + 0.5)) (the Lucene form —
      never negative);
    - score(q, d) = sum over shared terms of
      idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)).

    Determinism: scores are rounded to 9 decimals BEFORE ranking and
    ties break on doc id, so the top-k set is reproducible across
    partial-agg orders and engines (an unrounded float rank could flip
    equal-score neighbors). Returned ``score`` is the rounded value.

    Hot-query execution (``shards=k``): a query hitting a common term
    can score millions of docs, and the plain top-k window serializes
    that one partition — the same hot-key shape as sample_per_group.
    ``shards=k`` first ranks per (query, hash-shard of the doc id) and
    keeps each shard's top_k, then re-ranks the <= k*top_k survivors —
    bit-identical output (the global top-k is contained in the union
    of per-shard top-ks), widest window partition divided by k.
    """
    t = _terms(docs, text, id_col, "_did")
    tf = t.groupBy("_did", "term").agg(
        F.count(F.lit(1)).alias("tf"), F.first("_dl").alias("dl")
    )
    stats = t.groupBy("_did").agg(F.first("_dl").alias("_dl")).agg(
        F.count(F.lit(1)).alias("_n"), F.avg("_dl").alias("_avgdl")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qt = _terms(queries, q_text, q_id, "_qid").select("_qid", "term").distinct()
    posting = tf.join(dfreq, "term").crossJoin(F.broadcast(stats))
    idf = F.log(
        F.lit(1.0)
        + (F.col("_n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    w_td = idf * (
        F.col("tf").cast("double")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("_avgdl"))
        )
    )
    scored = (
        posting.join(F.broadcast(qt), "term")
        .groupBy("_qid", "_did")
        .agg(F.round(F.sum(w_td), 9).alias("score"))
    )
    from pyspark.sql import Window

    if shards is not None:
        if shards < 1:
            raise ValueError(f"shards must be >= 1, got {shards}")
        sh = F.pmod(F.xxhash64(F.col("_did")), F.lit(shards))
        scored = (
            scored.withColumn("_sh", sh)
            .withColumn(
                "_srn",
                F.row_number().over(
                    Window.partitionBy("_qid", "_sh").orderBy(
                        F.col("score").desc(), F.col("_did").asc()
                    )
                ),
            )
            .where(F.col("_srn") <= top_k)
            .drop("_sh", "_srn")
        )
    rankw = Window.partitionBy("_qid").orderBy(
        F.col("score").desc(), F.col("_did").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(rankw))
        .where(F.col("_rn") <= top_k)
        .select(
            F.col("_qid").alias(q_id),
            F.col("_did").alias(id_col),
            "score",
            F.col("_rn").alias("rank"),
        )
    )


def hashed_tfidf(
    docs: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    dim: int = 1 << 20,
    assemble: bool = False,
) -> DataFrame:
    """Hashed TF-IDF featurization — the sparse-vector complement of
    BM25 (classifier features, cheap similarity, IVF/kmeans inputs):
    tokens route through the PORTABLE 31-polynomial hash mod ``dim``
    (functions.text.token_hash64 — the lr_quality_score routing
    contract, so collisions replay exactly in any engine), tf/df come
    from the exploded term table, idf = ln((N+1)/(df+1)) + 1 (the
    smooth sklearn form), weight = tf * idf.

    Output (default): one row per (doc, feature) —
    (doc_id, fid, tf, df, n_docs, weight). The INTEGER columns
    (fid, tf, df, n_docs) are the certified cross-engine contract;
    ``weight`` applies ln(), whose last ulp is libm-specific — like
    lr_quality_score's sigmoid, certify the integers, not the float.
    ``assemble=True`` instead emits one row per doc with fid-sorted
    parallel arrays (fids, weights) — the form kmeans/ANN consume.

    Scale shape: tf is ONE (doc, fid)-keyed hash agg over the exploded
    terms (map-side combine collapses repeats); df derives from the tf
    table itself (one vocabulary-keyed agg — never a second pass over
    raw tokens); the df join-back is vocabulary-sized (AQE broadcasts
    it) and N rides a lazy broadcast 1-row cross join (no driver
    collect). Nothing shuffles the corpus more than once.
    """
    from gfp_gdal_spark.functions.text import token_hash64

    if dim <= 0:
        raise ValueError(f"dim must be > 0: {dim}")
    terms = _terms(docs, text, id_col, "_id")
    # pmod for the same uint64-bit-pattern reason as lr_quality_score
    tf = (
        terms.select("_id", F.pmod(token_hash64(F.col("term")), F.lit(dim)).alias("fid"))
        .groupBy("_id", "fid")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("fid").agg(F.count(F.lit(1)).alias("df"))
    n = F.broadcast(docs.select(F.count(F.lit(1)).alias("n_docs")))
    out = (
        tf.join(dfreq, "fid")
        .crossJoin(n)
        .withColumn(
            "weight",
            F.col("tf")
            * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0),
        )
    )
    if not assemble:
        return out.select(
            F.col("_id").alias(id_col), "fid", "tf", "df", "n_docs", "weight"
        )
    pairs = F.sort_array(F.collect_list(F.struct("fid", "weight")))
    return (
        out.groupBy("_id")
        .agg(pairs.alias("_p"))
        .select(
            F.col("_id").alias(id_col),
            F.transform("_p", lambda s: s["fid"]).alias("fids"),
            F.transform("_p", lambda s: s["weight"]).alias("weights"),
        )
    )
