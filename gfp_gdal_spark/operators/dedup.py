"""Deduplication operators for training-data pipelines.

Exact dedup is a hash groupBy; near-dup goes signature -> LSH banding
-> bucket equi-join -> exact verify — the same
turn-a-theta-join-into-an-equi-join rewrite as the spatial joins.

Scale notes: candidate pairs are generated per LSH band bucket with a
size cap (a degenerate bucket of b identical docs would otherwise emit
b^2 pairs); minhash pairs carry the ESTIMATED Jaccard (signature match
fraction) — exact verification, when needed, is ngram_jaccard_pairs
restricted to the candidate set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gfp_gdal_spark.functions.text import minhash_signature, simhash64

__all__ = [
    "exact_dedup",
    "minhash_lsh_pairs",
    "minhash_dedup",
    "hamming_pairs",
    "simhash_pairs",
    "ngram_jaccard_pairs",
    "decontaminate",
    "duplicate_spans",
]


def _word_grams(df: DataFrame, text: str, id_col: str, n: int) -> DataFrame:
    """Distinct word n-grams per document: (_id, gram) rows via the
    pure-Column tokenize -> sliding-slice -> explode pipeline (no UDF).
    Shared by ngram_jaccard_pairs and decontaminate so the two agree
    on gram semantics exactly."""
    toks = F.split(F.lower(F.col(text)), " ")
    return (
        df.select(
            F.col(id_col).alias("_id"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
                    lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
                )
            ).alias("gram"),
        )
        .where(F.length("gram") > 0)
        .distinct()
    )


def exact_dedup(
    df: DataFrame, text: str = "text", id_col: str = "doc_id", keep_text: bool = False
) -> DataFrame:
    """Exact duplicate removal: keep the minimum id per identical text.

    Groups on a 192-bit fingerprint (md5 + two seeded xxhash64), NOT on
    the text column, so the shuffle key is ~28 bytes instead of the
    document body — at 100 TB the groupBy key traffic drops by the mean
    doc size. Collision probability across the three independent hashes
    is ~0 at any corpus size (birthday bound ≪ 2^-60 at 10^12 docs).

    Returns (keeper_id, n_dupes[, text]). ``keep_text=True`` carries
    one representative text per group through the map-side partial agg
    (one text per distinct fingerprint per partition crosses the wire).
    """
    fp = F.struct(
        F.md5(F.col(text)).alias("h0"),
        F.xxhash64(F.col(text)).alias("h1"),
        F.xxhash64(F.col(text), F.lit(1)).alias("h2"),
    )
    aggs = [F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("n_dupes")]
    if keep_text:
        aggs.append(F.min(text).alias(text))
    out = df.withColumn("_fp", fp).groupBy("_fp").agg(*aggs)
    cols = ["keeper_id", "n_dupes"] + ([text] if keep_text else [])
    return out.select(*cols)


def minhash_lsh_pairs(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 64,
    bands: int = 16,
    shingle: int = 5,
    max_bucket: int = 1000,
) -> DataFrame:
    """Candidate near-dup pairs via MinHash + LSH banding.

    signature(n_hashes) -> split into ``bands`` bands of
    n_hashes/bands rows -> explode (band_idx, band_slice) -> equi-join
    docs sharing any band bucket -> distinct (id_a < id_b) pairs with
    estimated jaccard = matching minhash fraction.
    """
    rows = n_hashes // bands
    sig = df.select(
        F.col(id_col).alias("_id"),
        minhash_signature(F.col(text), n_hashes=n_hashes, shingle=shingle).alias("_sig"),
    )
    banded = sig.select(
        "_id",
        "_sig",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"), F.slice("_sig", b * rows + 1, rows).alias("key")
                ),
            )
        ).alias("bk"),
    ).select("_id", "_sig", F.col("bk.band").alias("band"), F.hash("bk.key").alias("bkey"))
    # cap degenerate buckets
    from pyspark.sql import Window

    w = Window.partitionBy("band", "bkey").orderBy("_id")
    banded = banded.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= max_bucket)
    a = banded.select(
        F.col("band"), F.col("bkey"), F.col("_id").alias("id_a"), F.col("_sig").alias("sig_a")
    )
    b = banded.select(
        F.col("band"), F.col("bkey"), F.col("_id").alias("id_b"), F.col("_sig").alias("sig_b")
    )
    pairs = (
        a.join(b, ["band", "bkey"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    est = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")), lambda v: v == 1
        )
    ).cast("double") / F.lit(float(n_hashes))
    return pairs.withColumn("est_jaccard", est).drop("sig_a", "sig_b")


def minhash_dedup(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    exact_clusters: bool = False,
    **kw,
) -> DataFrame:
    """Near-dup clusters: every doc gets a ``cluster_id``.

    Pairs are thresholded on the minhash-ESTIMATED Jaccard (matching
    signature fraction) — the standard LSH-dedup operating point; for
    exact-Jaccard verification of candidates, join the pairs back to
    ngram_jaccard_pairs or the shingle sets before clustering.

    Default (one-hop union): minimum id among its >=threshold neighbors
    (itself included) — collapses the mirror/copy clusters that dominate
    web corpora in a single join. ``exact_clusters=True`` runs full
    connected components (plans.graph label propagation) so transitive
    chains a~b~c land in ONE cluster even when a~c is below threshold.
    """
    pairs = minhash_lsh_pairs(df, text=text, id_col=id_col, **kw).where(
        F.col("est_jaccard") >= threshold
    )
    if exact_clusters:
        from gfp_gdal_spark.plans.graph import connected_components

        comp = connected_components(pairs, src="id_a", dst="id_b")
        return (
            df.join(comp, df[id_col] == comp["vertex"], "left")
            .withColumn("cluster_id", F.coalesce("component", df[id_col]))
            .drop("vertex", "component")
        )
    fwd = pairs.select(F.col("id_b").alias("_id"), F.col("id_a").alias("peer"))
    bwd = pairs.select(F.col("id_a").alias("_id"), F.col("id_b").alias("peer"))
    links = fwd.unionByName(bwd)
    rep = links.groupBy("_id").agg(F.min("peer").alias("min_peer"))
    return (
        df.join(rep, df[id_col] == rep["_id"], "left")
        .withColumn("cluster_id", F.least(F.coalesce("min_peer", df[id_col]), df[id_col]))
        .drop("_id", "min_peer")
    )


def _block_bounds(n_blocks: int) -> list[tuple[int, int]]:
    """Split the 64 signature bits into n_blocks contiguous (offset,
    width) spans, widths as even as possible (leading blocks take the
    remainder bit)."""
    base, extra = divmod(64, n_blocks)
    bounds, off = [], 0
    for b in range(n_blocks):
        w = base + (1 if b < extra else 0)
        bounds.append((off, w))
        off += w
    return bounds


def hamming_pairs(
    df: DataFrame,
    sig: str = "sig",
    id_col: str = "id",
    max_hamming: int = 3,
    n_blocks: int | None = None,
    materialize: bool = False,
) -> DataFrame:
    """EXACT near-dup pairs on a precomputed 64-bit signature column
    (SimHash, image perceptual hash, audio fingerprint) within
    ``max_hamming`` bits — (id_a, id_b, hamming), id_a < id_b.

    Pigeonhole banding: the 64 bits split into ``n_blocks`` (default
    max_hamming+1) contiguous blocks; any pair within max_hamming
    differing bits shares at least one block EXACTLY, so candidates
    come from n_blocks equi-joins (one explode per side, all JVM).
    A qualifying pair would match in every block that happens to agree,
    so it is kept ONLY at its FIRST matching block — the canonical
    block, decided by re-deriving earlier blocks from the carried
    signatures — which removes the dropDuplicates shuffle the naive
    banding needs (same trick as bbox_join's canonical tile).

    Scale: candidate volume is sum over blocks of bucket^2; uniform
    64-bit signatures keep buckets tiny at any corpus size (a 9-bit
    block has 512 buckets — use MORE blocks only when max_hamming
    demands it, wider blocks = fewer collisions).
    """
    if n_blocks is None:
        n_blocks = max_hamming + 1
    if not 1 <= n_blocks <= 64:
        raise ValueError(f"n_blocks must be in [1, 64], got {n_blocks}")
    if n_blocks <= max_hamming:
        raise ValueError(
            f"pigeonhole needs n_blocks > max_hamming "
            f"(got n_blocks={n_blocks}, max_hamming={max_hamming}): "
            f"a pair could differ in every block and be missed"
        )
    bounds = _block_bounds(n_blocks)

    def blk(col, b: int):
        off, w = bounds[b]
        c = F.shiftrightunsigned(col, off) if off else col
        if w < 64:
            c = c.bitwiseAND(F.lit((1 << w) - 1))
        return c

    s = df.select(F.col(id_col).alias("_id"), F.col(sig).alias("_sh"))
    if materialize:
        # Persist AND materialize the (id, sig) projection so the
        # signature pipeline runs exactly once (16 bytes a row:
        # MEMORY_AND_DISK holds 10^12 sigs cluster-wide). The eager
        # count() is what buys compute-once — without it, both join
        # sides of the first action race the empty cache and an
        # expensive upstream (e.g. an image decode feeding phash)
        # runs twice. Caller owns the cache lifetime (unpersist when
        # done — knn_join's persisted-side contract).
        from pyspark import StorageLevel

        s = s.persist(StorageLevel.MEMORY_AND_DISK)
        s.count()
    blocks = s.select(
        "_id",
        "_sh",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("blk"), blk(F.col("_sh"), b).alias("key"))
                    for b in range(n_blocks)
                ]
            )
        ).alias("bk"),
    ).select("_id", "_sh", "bk.blk", "bk.key")
    a = blocks.select("blk", "key", F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a"))
    b = blocks.select("blk", "key", F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b"))

    def no_earlier_match(upto: int):
        c = blk(F.col("sh_a"), 0) != blk(F.col("sh_b"), 0)
        for i in range(1, upto):
            c = c & (blk(F.col("sh_a"), i) != blk(F.col("sh_b"), i))
        return c

    canonical = F.lit(True) if n_blocks == 1 else F.when(F.col("blk") == 0, F.lit(True))
    for bb in range(1, n_blocks):
        canonical = canonical.when(F.col("blk") == bb, no_earlier_match(bb))
    return (
        a.join(b, ["blk", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .where(canonical)
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash_pairs(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    shingle: int = 3,
) -> DataFrame:
    """Near-dup pairs via 64-bit SimHash + ``hamming_pairs`` banding
    (>=4 blocks; more when max_hamming > 3 — the fixed-4-block form
    would MISS pairs at hamming 4+, one differing bit per block)."""
    sig = df.select(F.col(id_col).alias("_id"), simhash64(F.col(text), shingle=shingle).alias("_sh"))
    return hamming_pairs(
        sig, sig="_sh", id_col="_id", max_hamming=max_hamming, n_blocks=max(4, max_hamming + 1)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = 10_000,
) -> DataFrame:
    """EXACT n-gram (word) Jaccard similarity for all pairs sharing at
    least one n-gram — pure DataFrame ops (explode + self-join on the
    n-gram + count algebra), no UDF: |A∩B| from the join, |A|,|B| from
    per-doc distinct counts, J = inter / (|A|+|B|-inter).

    ``max_df`` (document-frequency cap) drops grams appearing in more
    than ``max_df`` docs BEFORE the self-join: one stop-phrase gram
    shared by 10^6 docs would otherwise emit 10^12 candidate rows. The
    cap changes the semantics to Jaccard over the capped gram sets
    (|A|,|B| are recomputed after the cap) — standard stop-gram removal,
    mirrored verbatim in the SQL oracle. REQUIRED at scale, so the
    DEFAULT is a large-but-finite 10_000; pass ``max_df=None``
    explicitly to opt into the uncapped (quadratic-fan-out-reachable)
    semantics on small fixture corpora.
    """
    grams = _word_grams(df, text, id_col, n)
    if max_df is not None:
        # cheap pre-aggregation: gram -> document frequency; hot grams out
        dfreq = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("_df"))
        grams = grams.join(dfreq.where(F.col("_df") <= max_df), "gram").drop("_df")
    sizes = grams.groupBy("_id").agg(F.count(F.lit(1)).alias("n_grams"))
    a = grams.select(F.col("_id").alias("id_a"), "gram")
    b = grams.select(F.col("_id").alias("id_b"), "gram")
    inter = (
        a.join(b, "gram")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("n_grams").alias("nb"))
    out = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    min_hits: int = 1,
    broadcast: bool = True,
    hash_grams: bool = False,
) -> DataFrame:
    """Train/eval contamination detection — the pretraining-corpus
    staple (the GPT-3-style 13-gram overlap check): a train document
    is flagged when it shares >= ``min_hits`` distinct word n-grams
    with the eval/benchmark set. Returns one row per flagged train
    doc: (train_id, n_hit_grams = distinct overlapping grams,
    n_eval_docs = distinct eval docs hit); clean the corpus with
    ``train.join(out, train[id]==out.train_id, "left_anti")``.

    Scale shape: the eval side is the SMALL side by construction
    (benchmarks are ~10^4-10^7 grams vs 10^12 train docs), so its
    distinct gram set is broadcast (``broadcast=True``) — train grams
    stream through a map-side hash join and NEVER shuffle; the only
    exchange is the final per-train-doc aggregate. ``hash_grams=True``
    joins on xxhash64(gram) instead of the gram string (8-byte
    broadcast table and join keys; collision odds ~2^-64 per pair —
    pytest asserts parity with the exact path), for when the eval gram
    table pushes broadcast limits.
    """
    if min_hits < 1:
        raise ValueError(f"min_hits must be >= 1, got {min_hits}")
    tg = _word_grams(train, text, id_col, n).withColumnRenamed("_id", "train_id")
    eg = _word_grams(eval_df, text, id_col, n).withColumnRenamed("_id", "eval_id")
    if hash_grams:
        tg = tg.select("train_id", F.xxhash64("gram").alias("gram"))
        eg = eg.select("eval_id", F.xxhash64("gram").alias("gram"))
    if broadcast:
        eg = F.broadcast(eg)
    out = (
        tg.join(eg, "gram")
        .groupBy("train_id")
        .agg(
            F.countDistinct("gram").alias("n_hit_grams"),
            F.countDistinct("eval_id").alias("n_eval_docs"),
        )
        .where(F.col("n_hit_grams") >= min_hits)
    )
    return out


def duplicate_spans(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    k: int = 13,
    min_count: int = 2,
    hash_windows: bool = False,
) -> DataFrame:
    """Exact-substring duplicate SPANS — the corpus-global
    substring-level dedup staple (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better": remove any k-token
    substring that occurs verbatim elsewhere in the corpus; this
    operator FINDS those regions so the caller can cut or downweight
    them). Where exact_dedup keys whole documents and paragraph_dedup
    keys paragraphs, this keys every k-token rolling window, so shared
    boilerplate INSIDE otherwise-distinct documents is caught.

    Semantics: tokens = lower(text) split on single spaces (the
    _word_grams contract); every k-token window whose exact string
    occurs >= ``min_count`` times corpus-wide (within- and cross-doc
    occurrences both count, as in the paper's suffix-array form) marks
    its k token positions as duplicated; overlapping/adjacent
    duplicated windows merge into maximal spans. Returns one row per
    maximal span: (doc_id, span_start, span_end, n_windows) with
    token-position bounds inclusive (span_end = last covered token).
    Docs shorter than k tokens emit nothing — they cannot contain a
    k-token duplicate.

    Scale shape (designed against a 10^12-doc corpus where the
    suffix-array build of the paper doesn't distribute):
    - window occurrences are a pure-Column transform+explode (no UDF);
      the frequency pass is ONE vocabulary-keyed hash aggregate whose
      map-side combine collapses hot boilerplate (a window repeated
      10^9 times crosses the wire once per map partition, not 10^9
      times);
    - the match-back is an equi-join on the window key — both sides
      hash-partition on the same key, and the aggregate side arrives
      pre-partitioned, so EnsureRequirements inserts no extra exchange
      for it;
    - span assembly is ONE per-doc window (gaps-and-islands: a new
      island starts when the next duplicated window begins more than k
      tokens after the previous one, i.e. its coverage neither overlaps
      nor touches) and the final groupBy reuses the window's hash
      distribution — partitioning on doc_id satisfies the (doc_id,
      island) clustering, no second exchange (the interval_union_length
      plan shape). Per-doc state is bounded by doc length.
    - ``hash_windows=True`` shuffles xxhash64(window) instead of the
      k-token string — 8-byte keys (collision odds ~2^-64 per pair;
      pytest asserts parity with the exact path). Use it at corpus
      scale; the default string key is what the DuckDB oracle replays.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    from pyspark.sql import Window

    toks = F.split(F.lower(F.col(text)), " ")
    # sequence() descends when start > stop, so short docs must be
    # filtered BEFORE the transform, not cleaned up after
    occ = (
        df.where(F.size(toks) >= k)
        .select(
            F.col(id_col).alias("_id"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size(toks) - k),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.concat_ws(" ", F.slice(toks, i + 1, k)).alias("win"),
                    ),
                )
            ).alias("w"),
        )
        .select("_id", F.col("w.pos").alias("pos"), F.col("w.win").alias("win"))
    )
    if hash_windows:
        occ = occ.withColumn("win", F.xxhash64("win"))
    dup = (
        occ.groupBy("win")
        .agg(F.count(F.lit(1)).alias("_c"))
        .where(F.col("_c") >= min_count)
        .select("win")
    )
    hits = occ.join(dup, "win").select("_id", "pos")
    w_ord = Window.partitionBy("_id").orderBy("pos")
    gap = F.col("pos") - F.lag("pos").over(w_ord)
    island = F.sum(F.when(gap > k, 1).otherwise(0)).over(
        w_ord.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        hits.withColumn("_isl", island)
        .groupBy("_id", "_isl")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + k - 1).alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select(F.col("_id").alias(id_col), "span_start", "span_end", "n_windows")
    )
