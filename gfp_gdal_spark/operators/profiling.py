"""Corpus profiling — the look-before-you-train summary pass every
large-scale text pipeline runs (length distributions per slice drive
truncation limits, bucketing and contamination triage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["corpus_quantiles", "vocab_topk", "distinct_profile"]


def corpus_quantiles(
    docs: DataFrame,
    text: str = "text",
    by: str | None = None,
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
    exact: bool = True,
) -> DataFrame:
    """Per-group character-length and whitespace-token-count profile:
    doc count, means, and the requested quantiles.

    ``exact=True`` uses Spark's exact ``percentile`` — bit-identical to
    DuckDB's ``quantile_cont`` (verified: linear interpolation on the
    sorted multiset), which is what makes this oracle-checkable. Exact
    percentile buffers each group's values on the agg side, so it is
    the MODERATE-group-size path (fine for per-language / per-domain
    slices). ``exact=False`` switches to ``approx_percentile`` (t-digest
    style sketch, mergeable map-side, bounded memory) — the 10^12-doc
    path, at the cost of oracle-exactness.
    """
    length = F.length(F.col(text)).cast("double")
    ntok = F.size(F.split(F.trim(F.col(text)), r"\s+")).cast("double")
    fn = F.percentile if exact else (
        lambda c, p: F.percentile_approx(c, p, 10_000)
    )
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(length), 6).alias("mean_chars"),
        F.round(F.avg(ntok), 6).alias("mean_tokens"),
    ]
    for p in probs:
        tag = str(p).replace("0.", "p")
        aggs.append(fn(length, F.lit(p)).alias(f"chars_{tag}"))
        aggs.append(fn(ntok, F.lit(p)).alias(f"tokens_{tag}"))
    g = docs.groupBy(by) if by else docs.groupBy()
    return g.agg(*aggs)


def vocab_topk(
    docs: DataFrame,
    text: str = "text",
    by: str | None = None,
    n: int = 20,
    shards: int | None = None,
) -> DataFrame:
    """Vocabulary profile — the tokenizer-building / stop-word-triage
    pass: the top-``n`` whitespace tokens by frequency, globally or per
    ``by`` slice (language, domain). Pure integer counting: one explode
    + one (slice, token) hash agg (map-side combined) + the top-n
    window; ties break on the token string, so the result is fully
    deterministic.

    Hot-slice execution (``shards=k``): the top-n window partitions per
    slice over VOCABULARY-sized partitions (10^7+ distinct tokens for a
    web-scale slice); ``shards=k`` first ranks per (slice, token-hash
    shard) and keeps each shard's top n, then re-ranks the <= k*n
    survivors — bit-identical (the global top-n is inside the union of
    per-shard top-ns), widest window partition divided by k.
    """
    from pyspark.sql import Window

    toks = F.explode(F.split(F.lower(F.col(text)), " ")).alias("token")
    d = docs.select(*([by] if by else []), toks).where(F.length("token") > 0)
    keys = [by] if by else []
    counts = d.groupBy(*keys, "token").agg(F.count(F.lit(1)).alias("n_occ"))
    order = [F.col("n_occ").desc(), F.col("token").asc()]
    if shards is not None:
        if shards < 1:
            raise ValueError(f"shards must be >= 1, got {shards}")
        sh = F.pmod(F.xxhash64("token"), F.lit(shards))
        counts = (
            counts.withColumn("_sh", sh)
            .withColumn(
                "_srn",
                F.row_number().over(Window.partitionBy(*keys, "_sh").orderBy(*order)),
            )
            .where(F.col("_srn") <= n)
            .drop("_sh", "_srn")
        )
    w = Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1))
    return (
        counts.withColumn("rank", F.row_number().over(w.orderBy(*order)))
        .where(F.col("rank") <= n)
    )


def distinct_profile(
    df: DataFrame,
    cols: list[str],
    exact: bool = True,
    rsd: float = 0.02,
) -> DataFrame:
    """Cardinality profile: distinct count per column — the dedup-rate
    / key-space sizing pass (distinct URLs, domains, doc fingerprints).
    Returns one narrow row per column: (column, n_distinct).

    ``exact=True`` computes every count(DISTINCT) in one aggregate
    (exact, oracle-checkable; Catalyst plans the multi-distinct via
    one Expand — k-way row multiplication inside ONE scan, not k
    scans). ``exact=False`` switches every column to
    ``approx_count_distinct`` (HyperLogLog++, relative error ``rsd``) —
    the mergeable-sketch path for 10^12-row tables, same trade as
    ``corpus_quantiles(exact=False)``: all k sketches fill in a single
    pass over the table, and at that scale the scan IS the cost.
    Certified by bracketing against the exact counts (see the driver's
    `distinct_profile_approx`). The wide 1-row aggregate is unpivoted
    to the narrow (column, n_distinct) shape with a Column-only
    explode (no name interpolation) — it is one row, so the unpivot
    is free.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    fn = (
        (lambda c: F.countDistinct(F.col(c)))
        if exact
        else (lambda c: F.approx_count_distinct(F.col(c), rsd))
    )
    wide = df.agg(*[fn(c).alias(f"_n{i}") for i, c in enumerate(cols)])
    narrow = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col(f"_n{i}").alias("n_distinct"),
                )
                for i, c in enumerate(cols)
            ]
        )
    )
    return wide.select(narrow.alias("_kv")).select("_kv.column", "_kv.n_distinct")
