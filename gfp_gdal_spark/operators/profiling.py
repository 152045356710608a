"""Corpus profiling — the look-before-you-train summary pass every
large-scale text pipeline runs (length distributions per slice drive
truncation limits, bucketing and contamination triage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["corpus_quantiles"]


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
