"""Text-analysis column functions for training-data pipelines.

All the cheap statistics are pure Column expressions (JVM-side,
whole-stage codegen, and — deliberately — expressible in the same ANSI
SQL the DuckDB oracles run). Hash-based signatures (minhash, simhash,
fingerprints) are vectorized numpy pandas UDFs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "token_count",
    "token_count_bpe",
    "BPE_TOKEN_PATTERN",
    "char_count",
    "punct_ratio",
    "digit_ratio",
    "whitespace_ratio",
    "stopword_ratio",
    "quality_score",
    "lang_id",
    "minhash_signature",
    "simhash64",
    "doc_fingerprint",
    "token_hash64",
]

# tiny per-language stopword lists (public common words); argmax hit-rate
_LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "dans", "que"],
    "es": ["el", "la", "de", "que", "los", "es", "un", "una", "por", "con"],
}

_EN_STOP = _LANG_STOPWORDS["en"]


def token_count(text: Column) -> Column:
    """Whitespace token count (split on single space; empty tokens from
    runs of spaces are counted like the SQL oracle counts them)."""
    return F.size(F.split(text, " ")).cast("long")


# GPT-2-style pretokenizer pattern, ASCII form without the \s+(?!\S)
# lookahead (RE2 — the DuckDB oracle engine — has no lookahead; the
# trailing \s+ alternative subsumes it for counting purposes)
BPE_TOKEN_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


def token_count_bpe(text: Column) -> Column:
    """BPE-ish token count: matches of the GPT-2-style pretokenizer
    regex — the standard LLM-pipeline length signal (JVM regexp)."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_PATTERN)).cast("long")


def char_count(text: Column) -> Column:
    return F.length(text).cast("long")


def _removed_ratio(text: Column, pattern: str) -> Column:
    kept = F.length(F.regexp_replace(text, pattern, ""))
    return (F.length(text) - kept).cast("double") / F.greatest(F.length(text), F.lit(1)).cast("double")


def punct_ratio(text: Column) -> Column:
    return _removed_ratio(text, r"[.,;:!?\'\"()\[\]{}-]")


def digit_ratio(text: Column) -> Column:
    return _removed_ratio(text, r"[0-9]")


def whitespace_ratio(text: Column) -> Column:
    return _removed_ratio(text, r"\s")


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or _EN_STOP
    toks = F.split(F.lower(text), " ")
    hits = F.size(F.filter(toks, lambda t: t.isin(sw)))
    return hits.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def quality_score(text: Column) -> Column:
    """Heuristic document quality in [0,1]: long enough, not
    punctuation/digit soup, some stopwords (prose-ness)."""
    length_term = F.least(F.length(text).cast("double") / 500.0, F.lit(1.0))
    punct_term = F.greatest(F.lit(0.0), 1.0 - punct_ratio(text) * 4.0)
    digit_term = F.greatest(F.lit(0.0), 1.0 - digit_ratio(text) * 4.0)
    stop_term = F.least(stopword_ratio(text) * 5.0, F.lit(1.0))
    return (0.25 * length_term + 0.25 * punct_term + 0.25 * digit_term + 0.25 * stop_term)


def lang_id(text: Column) -> Column:
    """n-gram-free heuristic language id: argmax per-language stopword
    hit count over {en,de,fr,es}; 'und' (undetermined) if all zero."""
    toks = F.split(F.lower(text), " ")
    hits = {
        lang: F.size(F.filter(toks, lambda t: t.isin(words)))
        for lang, words in _LANG_STOPWORDS.items()
    }
    best = F.greatest(*hits.values())
    out = F.lit("und")
    # deterministic priority order on ties: en > de > fr > es
    for lang in ["es", "fr", "de", "en"]:
        out = F.when((best > 0) & (hits[lang] == best), F.lit(lang)).otherwise(out)
    return out


# ---------------------------------------------------------------------------
# hashing signatures (numpy pandas UDFs)
# ---------------------------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


def _shingle_hashes(text: str, n: int = 5) -> np.ndarray:
    """Rolling 64-bit polynomial hashes of char n-grams (vectorized)."""
    b = np.frombuffer(text.encode("utf-8", "ignore"), dtype=np.uint8).astype(np.uint64)
    if len(b) < n:
        b = np.pad(b, (0, n - len(b)), constant_values=32)
    base = np.uint64(1000003)
    powers = base ** np.arange(n, dtype=np.uint64)  # wraps mod 2^64 (intended)
    windows = np.lib.stride_tricks.sliding_window_view(b, n)
    return (windows * powers[None, :]).sum(axis=1, dtype=np.uint64)


def minhash_signature(text: Column, n_hashes: int = 64, shingle: int = 5) -> Column:
    """MinHash signature as array<long>: min over shingles of
    (a_i * h + b_i) mod p for n_hashes seeded (a, b) pairs.

    Vectorized ACROSS documents: shingle hashes of the whole Arrow
    batch concatenate into one ragged array and the (shingles x
    n_hashes) affine map + per-doc min run as numpy reduceat passes —
    no per-document Python in the hot loop. Docs are chunked so the
    intermediate matrix stays ~64 MB."""
    rng = np.random.default_rng(42)
    a = rng.integers(1, (1 << 61) - 1, size=n_hashes, dtype=np.uint64)
    bb = rng.integers(0, (1 << 61) - 1, size=n_hashes, dtype=np.uint64)
    chunk_shingles = max(8_000_000 // n_hashes, 1024)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _sig(s: pd.Series) -> pd.Series:
        hs = [_shingle_hashes(t or "", shingle) for t in s]
        counts = np.fromiter((len(h) for h in hs), dtype=np.int64, count=len(hs))
        out: list[np.ndarray] = []
        i = 0
        while i < len(hs):
            j = i
            tot = 0
            while j < len(hs) and (tot == 0 or tot + counts[j] <= chunk_shingles):
                tot += counts[j]
                j += 1
            allh = (
                np.concatenate(hs[i:j]) % _MERSENNE
                if tot
                else np.empty(0, dtype=np.uint64)
            )
            vals = (allh[:, None] * a[None, :] + bb[None, :]) % _MERSENNE
            offs = np.zeros(j - i, dtype=np.int64)
            np.cumsum(counts[i:j][:-1], out=offs[1:])
            mins = np.minimum.reduceat(vals, offs, axis=0)
            out.extend(mins.astype(np.int64))
            i = j
        return pd.Series(out)

    return _sig(text)


def simhash64(text: Column, shingle: int = 3) -> Column:
    """64-bit SimHash over char shingles (sign of per-bit weight sums).
    Vectorized across the batch: one (shingles x 64) bit matrix + a
    per-doc add.reduceat — no per-document Python in the hot loop."""

    chunk_shingles = 250_000  # bit matrix ~128 MB per chunk

    @F.pandas_udf(T.LongType())
    def _sh(s: pd.Series) -> pd.Series:
        n_docs = len(s)
        if n_docs == 0:
            return pd.Series(np.empty(0, dtype=np.int64))
        hs = [_shingle_hashes(t or "", shingle) for t in s]
        counts = np.fromiter((len(h) for h in hs), dtype=np.int64, count=n_docs)
        bits = np.arange(64, dtype=np.uint64)
        outs: list[np.ndarray] = []
        i = 0
        while i < n_docs:
            j = i
            tot = 0
            while j < n_docs and (tot == 0 or tot + counts[j] <= chunk_shingles):
                tot += counts[j]
                j += 1
            allh = np.concatenate(hs[i:j])
            bitmat = ((allh[:, None] >> bits[None, :]) & np.uint64(1)).astype(np.int64)
            weights = bitmat * 2 - 1
            offs = np.zeros(j - i, dtype=np.int64)
            np.cumsum(counts[i:j][:-1], out=offs[1:])
            sums = np.add.reduceat(weights, offs, axis=0)
            sig = (sums > 0).astype(np.uint64)
            outs.append((sig << bits[None, :]).sum(axis=1, dtype=np.uint64))
            i = j
        return pd.Series(np.concatenate(outs).view(np.int64))

    return _sh(text)


def doc_fingerprint(text: Column, shingle: int = 8) -> Column:
    """Single 64-bit rolling-hash fingerprint (winnowing-style min of
    shingle hashes) — cheap near-exact document identity."""

    @F.pandas_udf(T.LongType())
    def _fp(s: pd.Series) -> pd.Series:
        out = np.zeros(len(s), dtype=np.uint64)
        for i, txt in enumerate(s):
            h = _shingle_hashes(txt or "", shingle)
            if len(h):
                out[i] = h.min()
        return pd.Series(out.view(np.int64))

    return _fp(text)


def token_hash64(token: Column) -> Column:
    """Portable 64-bit polynomial token hash: h = Σ byte_i * 31^i
    (mod 2^64), i = 0-based byte position. Chosen over xxhash64 for
    the same reason as hash_split's Knuth mix: the engine contract is
    that feature routing must be REPLAYABLE in any engine (a DuckDB
    oracle computes the identical value with HUGEINT arithmetic and a
    31^i lookup CTE), so a hashed-feature model scores identically
    everywhere. Vectorized across the Arrow batch: all token bytes
    concatenate once, the per-position 31-powers come from one uint64
    cumprod (numpy uint64 multiply wraps mod 2^64 natively), and one
    reduceat folds each token.
    """

    @F.pandas_udf(T.LongType())
    def _h(s: pd.Series) -> pd.Series:
        bs = [(t or "").encode("utf-8") for t in s]
        counts = np.fromiter((len(b) for b in bs), dtype=np.int64, count=len(bs))
        total = int(counts.sum())
        if total == 0:
            return pd.Series(np.zeros(len(bs), dtype=np.int64))
        flat = np.frombuffer(b"".join(bs), dtype=np.uint8).astype(np.uint64)
        offs = np.zeros(len(bs), dtype=np.int64)
        np.cumsum(counts[:-1], out=offs[1:])
        pos = np.arange(total, dtype=np.int64) - np.repeat(offs, counts)
        # 31^pos mod 2^64 via cumprod over per-token position resets
        maxlen = int(counts.max())
        pw = np.ones(maxlen, dtype=np.uint64)
        if maxlen > 1:
            np.cumprod(np.full(maxlen - 1, 31, dtype=np.uint64), out=pw[1:])
        p = pw[pos]
        terms = flat * p
        out = np.zeros(len(bs), dtype=np.uint64)
        nonempty = counts > 0
        if nonempty.any():
            out[nonempty] = np.add.reduceat(terms, offs[nonempty])
        return pd.Series(out.view(np.int64))

    return _h(token)
