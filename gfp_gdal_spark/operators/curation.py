"""Corpus-curation quality operators for training-data pipelines.

``repetition_stats`` is the Gopher/MassiveText repetition filter family
(Rae et al. 2021, §A1.1): per-document fraction of characters sitting
in duplicated lines, plus the fraction of characters covered by the
most frequent word n-gram, for each requested n. Filtering on these
columns removes boilerplate-heavy and degenerate-loop documents — the
repetition axis the heuristic `functions.text.quality_score` ratios
don't see.

``redact_pii`` is the pre-training scrub step: regex-based removal of
emails / IPv4 addresses / phone numbers with per-document match counts
(the counts feed audit dashboards; the redacted text feeds the
tokenizer).

Reference parity note: the reference (geoflow3d/gfp-gdal) has no text
leg — these are engine operators for the 100 TB curation pipeline the
brief's LLM-data section asks for.

Scale/determinism contract (shared with the rest of the package):
every aggregate here is an integer sum/max (character counts, match
counts), so results are independent of partial-aggregation order and
hash-stable across engines; the only divisions happen once per
document on exact integer operands. All expressions are JVM Columns —
no Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["repetition_stats", "redact_pii", "paragraph_dedup", "lr_quality_score"]


def _literal_regex(sep: str) -> str:
    """Quote a LITERAL separator for a Java-regex argument (F.split)
    with \\Q..\\E, escaping any embedded \\E."""
    return "\\Q" + sep.replace("\\E", "\\E\\\\E\\Q") + "\\E"

# (name, java/RE2-compatible pattern, replacement) — applied in order,
# each pattern counted on the text AFTER the previous replacements so
# the counts are exactly "how many replacements happened".
DEFAULT_PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,2}[- ]\d{3}[- ]\d{3}[- ]\d{4}", "<PHONE>"),
)


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram_ns: tuple[int, ...] = (2, 3, 4),
    line_sep: str = "\n",
) -> DataFrame:
    """Per-document repetition profile (the Gopher filter axes):

    - ``n_lines``: non-empty lines (split on ``line_sep``).
    - ``dup_line_frac``: characters in lines whose exact text occurs
      more than once in the document, over all non-empty-line
      characters (0.0 for documents with no lines).
    - ``top{n}gram_frac`` for each n in ``ngram_ns``: max over word
      n-grams of ``occurrences * len(gram)`` divided by ``length(text)``
      (0.0 when the document has fewer than n tokens). Using the
      product directly makes the statistic tie-free — no
      which-gram-wins tie-break can affect it.

    Tokenization matches ``dedup._word_grams`` (lowercase, split on
    single spaces) so repetition and dedup agree on gram semantics;
    grams here are COUNTED, not distinct.

    Shuffle shape at scale: one (id, line) hash agg + one (id) agg for
    lines; one (id, n, gram) hash agg + one (id, n) agg for all gram
    sizes TOGETHER (the n column rides the explode — k gram sizes cost
    one shuffle, not k); final per-id joins reuse the id partitioning.
    All keys are (id, token)-grained so a hot document spreads over
    its distinct lines/grams — no single-reducer key.
    """
    if not ngram_ns or any(int(n) < 1 for n in ngram_ns):
        raise ValueError(f"ngram_ns must be positive ints: {ngram_ns!r}")
    ns = sorted({int(n) for n in ngram_ns})
    kid = F.col(id_col)

    base = df.select(kid.alias("_id"), F.col(text_col).alias("_t"))

    # --- duplicate-line characters -------------------------------------
    # line_sep is a LITERAL separator (same contract as
    # paragraph_dedup's sep)
    sep_re = _literal_regex(line_sep)
    lines = base.select(
        "_id", F.explode(F.split(F.col("_t"), sep_re)).alias("line")
    ).where(F.length("line") > 0)
    per_line = lines.groupBy("_id", "line").agg(F.count(F.lit(1)).alias("cnt"))
    line_stats = per_line.groupBy("_id").agg(
        F.sum("cnt").alias("n_lines"),
        F.sum(F.col("cnt") * F.length("line")).alias("_tot_chars"),
        F.sum(
            F.when(F.col("cnt") > 1, F.col("cnt") * F.length("line")).otherwise(
                F.lit(0)
            )
        ).alias("_dup_chars"),
    )

    # --- top n-gram coverage, all n in one explode ---------------------
    toks = F.split(F.lower(F.col("_t")), " ")

    # NB: a 2-arg lambda would be called by F.transform as (element,
    # index) — capture n via a closure factory, not a default arg.
    def _tagged_grams(n: int):
        return lambda i: F.struct(
            F.lit(n).alias("n"),
            F.concat_ws(" ", F.slice(toks, i + 1, n)).alias("g"),
        )

    gram_sets = F.flatten(
        F.array(
            *[
                F.when(
                    F.size(toks) >= n,
                    F.transform(
                        F.sequence(F.lit(0), F.size(toks) - n), _tagged_grams(n)
                    ),
                ).otherwise(F.array().cast("array<struct<n:int,g:string>>"))
                for n in ns
            ]
        )
    )
    grams = base.select(
        "_id", F.length("_t").alias("_len"), F.explode(gram_sets).alias("_g")
    ).select("_id", "_len", F.col("_g.n").alias("n"), F.col("_g.g").alias("g"))
    per_gram = grams.groupBy("_id", "n", "g").agg(
        F.count(F.lit(1)).alias("cnt"), F.first("_len").alias("_len")
    )
    per_n = per_gram.groupBy("_id", "n").agg(
        F.max(F.col("cnt") * F.length("g")).alias("_top"),
        F.first("_len").alias("_len"),
    )
    top_cols = [
        F.max(
            F.when(F.col("n") == n, F.col("_top") / F.col("_len")).otherwise(
                F.lit(None)
            )
        ).alias(f"top{n}gram_frac")
        for n in ns
    ]
    gram_stats = per_n.groupBy("_id").agg(*top_cols)

    out = (
        base.select("_id", F.length("_t").alias("n_chars"))
        .join(line_stats, "_id", "left")
        .join(gram_stats, "_id", "left")
    )
    return out.select(
        F.col("_id").alias(id_col),
        "n_chars",
        F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
        F.when(F.coalesce("_tot_chars", F.lit(0)) > 0,
               F.col("_dup_chars") / F.col("_tot_chars"))
        .otherwise(F.lit(0.0))
        .alias("dup_line_frac"),
        *[
            F.coalesce(f"top{n}gram_frac", F.lit(0.0)).alias(f"top{n}gram_frac")
            for n in ns
        ],
    )


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: tuple[tuple[str, str, str], ...] = DEFAULT_PII_PATTERNS,
    out_col: str | None = None,
) -> DataFrame:
    """Regex PII scrub: sequentially apply each (name, pattern,
    replacement) — counting matches on the text as it stands AFTER the
    previous replacements, so ``n_{name}`` is exactly the number of
    substitutions performed — and append the redacted text as
    ``out_col`` (default: replace ``text_col`` in place).

    Patterns must stay inside the Java-regex ∩ RE2 common subset
    (char classes, \\d, \\b, bounded repeats; no backrefs/lookaround)
    so DuckDB/RE2-based oracles replay them byte-identically.

    Scale: narrow per-row Column expressions only — shuffle-free,
    whole-stage-codegen'd, pipeline-safe at any corpus size.
    """
    if not patterns:
        raise ValueError("patterns must be non-empty")
    out_col = out_col or text_col
    cur = F.col(text_col)
    counts = []
    for name, pat, repl in patterns:
        counts.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0))).alias(
                f"n_{name}"
            )
        )
        cur = F.regexp_replace(cur, pat, repl)
    return df.select(
        *[c for c in df.columns if c != out_col], *counts, cur.alias(out_col)
    )


def paragraph_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    min_chars: int = 1,
) -> DataFrame:
    """CCNet/C4-style corpus-global paragraph deduplication: split each
    document on ``sep``, drop every paragraph whose exact text already
    occurred earlier in the corpus — "earlier" = the smallest
    (``id_col``, position) pair, so the winner is deterministic under
    any partitioning — and reassemble the survivors in original order.
    Paragraphs shorter than ``min_chars`` are exempt (kept verbatim;
    with the default 1 that's empty paragraphs, which would otherwise
    all collapse into one).

    Output: (id, text, n_paras, n_dropped); documents whose every
    paragraph was dropped come back with empty text (filter on
    n_paras > n_dropped downstream).

    Scale: explode -> ONE paragraph-keyed hash agg (map-side combined;
    the key space is the distinct-paragraph vocabulary, hot boilerplate
    paragraphs are exactly one row each after the combine) -> winner
    equi-join keyed by the same paragraph hash partitioning -> ONE
    id-keyed reassembly agg. No window over the whole corpus, no
    driver collect.
    """
    kid = F.col(id_col)
    # sep is a LITERAL separator (it is re-inserted verbatim by the
    # concat_ws below) — otherwise sep='.' would split on every
    # character while the reassembly joins with a literal dot
    sep_re = _literal_regex(sep)
    paras = df.select(
        kid.alias("_id"),
        F.posexplode(F.split(F.col(text_col), sep_re)).alias("_pos", "_para"),
    )
    dedupable = F.length("_para") >= int(min_chars)
    winners = (
        paras.where(dedupable)
        .groupBy("_para")
        .agg(
            F.min(F.struct(F.col("_id"), F.col("_pos"))).alias("_first")
        )
    )
    kept = (
        paras.join(winners, "_para", "left")
        .where(
            ~dedupable
            | (
                (F.col("_first._id") == F.col("_id"))
                & (F.col("_first._pos") == F.col("_pos"))
            )
        )
        .select("_id", "_pos", "_para")
    )
    n_paras = paras.groupBy("_id").agg(F.count(F.lit(1)).alias("n_paras"))
    out = (
        kept.groupBy("_id")
        .agg(
            F.concat_ws(
                sep,
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("_pos"), F.col("_para")))
                    ),
                    lambda s: s["_para"],
                ),
            ).alias(text_col),
            F.count(F.lit(1)).alias("_n_kept"),
        )
        .join(n_paras, "_id", "right")
    )
    return out.select(
        F.col("_id").alias(id_col),
        F.coalesce(text_col, F.lit("")).alias(text_col),
        F.col("n_paras"),
        (F.col("n_paras") - F.coalesce("_n_kept", F.lit(0))).alias("n_dropped"),
    )


def lr_quality_score(
    df: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bias: float = 0.0,
    dim: int = 1 << 20,
    quantum: int = 1_000_000,
) -> DataFrame:
    """Linear quality-classifier inference over hashed bag-of-words
    features — the GPT-3/CCNet curation staple (a logistic model
    scoring "reference-corpus-like" documents; fastText's hashing
    trick). ``weights`` is a (token: string, weight: double) model
    table; features route through ``functions.text.token_hash64 % dim``
    on BOTH sides, so hash collisions behave exactly like the trained
    model's.

    Output per document: n_tokens, n_matched, ``logit`` = bias +
    (Σ matched weights)/n_tokens, and ``score`` = sigmoid(logit).

    Determinism contract: weights are quantized to ``quantum`` units
    (round(w*quantum) as int64) so the per-document sum is an
    order-independent integer; ``logit`` divides two exact numbers and
    is bit-identical cross-engine. ``score`` applies exp(), whose last
    ulp is libm-specific — certify on ``logit``, not ``score``.

    Scale: explode -> hash (Arrow-batched) -> equi-join the
    vocabulary-sized model table (AQE broadcasts it) -> ONE doc-keyed
    hash agg. The model never shuffles the corpus.
    """
    from gfp_gdal_spark.functions.text import token_hash64

    if dim <= 0:
        raise ValueError(f"dim must be > 0: {dim}")
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("_tok"),
    ).where(F.length("_tok") > 0)
    # pmod, not %: the hash is a uint64 bit-pattern in an int64 —
    # for power-of-2 dim, pmod(h, dim) == the unsigned low bits even
    # when the long is negative (2^k divides 2^64); plain % would go
    # negative and silently never match the model side
    toks = toks.select(
        "_id", F.pmod(token_hash64(F.col("_tok")), F.lit(dim)).alias("_fid")
    )
    w = weights.select(
        F.pmod(token_hash64(F.lower(F.col("token"))), F.lit(dim)).alias("_fid"),
        F.round(F.col("weight") * quantum, 0).cast("long").alias("_wu"),
    )
    per_doc = (
        toks.join(w, "_fid", "left")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count("_wu").alias("n_matched"),
            F.coalesce(F.sum("_wu"), F.lit(0)).alias("_su"),
        )
    )
    # left-join back onto the distinct id set: a document with no
    # tokens (empty/whitespace-only text) produces no explode rows and
    # would silently vanish — it must surface as n_tokens=0 /
    # logit=bias so downstream gates can see (and flag) it rather than
    # skip it. distinct() preserves the one-row-per-id contract the
    # groupBy alone gave; the null-safe join keeps a NULL id's true
    # counts (a plain equi-join never matches null keys and would
    # zero it out)
    all_ids = df.select(F.col(id_col).alias("_aid")).distinct()
    per_doc = all_ids.join(
        per_doc, all_ids["_aid"].eqNullSafe(per_doc["_id"]), "left"
    ).select(
        F.col("_aid").alias("_id"),
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        F.coalesce("n_matched", F.lit(0)).alias("n_matched"),
        F.coalesce("_su", F.lit(0)).alias("_su"),
    )
    logit = F.lit(float(bias)) + F.when(
        F.col("n_tokens") > 0,
        F.col("_su") / (F.lit(float(quantum)) * F.col("n_tokens")),
    ).otherwise(F.lit(0.0))
    return per_doc.select(
        F.col("_id").alias(id_col),
        "n_tokens",
        "n_matched",
        logit.alias("logit"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))).alias("score"),
    )
