"""Deterministic corpus sampling / splitting — the training-data
pipeline staples (reproducible train/eval splits, per-class balancing,
session construction). Everything here is a pure Column-expression
plan (no UDFs, no rand()): determinism comes from key arithmetic, so
re-runs, resumed jobs, and the DuckDB oracles all agree bit-for-bit.

The mixing function is Knuth's multiplicative hash
``(key * 2654435761) mod 2^32`` — deliberately chosen over xxhash64
because every engine (Spark, DuckDB, numpy) evaluates it identically,
so split/sample assignments are portable across the whole toolchain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hash_split",
    "stratified_split",
    "sample_per_group",
    "weighted_sample_per_group",
    "sessionize",
    "pack_chunks",
]

_KNUTH = 2654435761
_MOD = 4294967296


def _mix(col: Column) -> Column:
    """Deterministic uniform-ish u32 from an integer key column.

    The key is pre-reduced mod 2^31 BEFORE the multiply so the product
    stays below 2^63 for any long id (otherwise ids past ~3.5e9 — real
    at 10^12-row scale — overflow: Spark would wrap silently with ANSI
    off while DuckDB errors, silently breaking the portability
    contract). pmod keeps negative ids in range too; ids differing by
    exactly 2^31 share an assignment, which is harmless for
    split/sample purposes (it is a hash, not an identity)."""
    return F.pmod(F.pmod(col.cast("long"), F.lit(2_147_483_648)) * F.lit(_KNUTH), F.lit(_MOD))


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    salt: int = 0,
) -> DataFrame:
    """Reproducible dataset split: adds a ``split`` column assigning
    each row to a named fraction by hashing its id — no shuffle, no
    rand(), stable under any partitioning/resume (the property that
    matters at 10^12 rows: a re-run or a late-arriving partition gets
    the SAME assignment). Fractions must sum to <= 1.0; any remainder
    becomes split = NULL (explicit holdout).
    """
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1.0")
    u = _mix(F.col(id_col) + F.lit(salt)).cast("double") / F.lit(float(_MOD))
    expr = F.lit(None).cast("string")
    acc = 0.0
    # build the CASE from the LAST bucket backward so earlier buckets win
    bounds = []
    for name, frac in fractions.items():
        bounds.append((name, acc, acc + frac))
        acc += frac
    for name, lo, hi in reversed(bounds):
        expr = F.when((u >= lo) & (u < hi), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def stratified_split(
    df: DataFrame,
    by: str,
    id_col: str,
    fractions: dict[str, float],
    salt: int = 0,
) -> DataFrame:
    """hash_split with PER-GROUP decorrelation: the split hash mixes
    the (integer) group key into the id before hashing, so an id that
    appears under two groups draws independent assignments and each
    group's split is class-conditionally exact-in-expectation — the
    stratified train/val/test construction (per-language, per-domain).
    Plain hash_split would give correlated splits across groups for
    recycled ids, starving small strata. Same scale properties:
    shuffle-free, resume/partition-invariant, engine-portable integer
    arithmetic. ``by`` must be an integer column (fail loud otherwise —
    a portable cross-engine string hash is not part of the contract).

    The group key enters through XOR, not addition: the Knuth mix is
    affine, so mix(mix(g) + id) is just mix(id) circularly SHIFTED by
    a per-group constant — two groups would disagree on only ~shift
    fraction of assignments (measured: 0.3%). XOR breaks the affinity
    (DuckDB twin: xor()), restoring the ~2*p*(1-p) disagreement an
    independent draw gives.
    """
    f = dict(df.dtypes).get(by)
    if f not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"stratified_split needs an integer group column; {by!r} is {f!r}"
        )
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1.0")
    x = F.pmod(F.col(id_col).cast("long") + F.lit(salt), F.lit(2_147_483_648))
    u = _mix(_mix(F.col(by)).bitwiseXOR(x)).cast("double") / F.lit(float(_MOD))
    expr = F.lit(None).cast("string")
    acc = 0.0
    bounds = []
    for name, frac in fractions.items():
        bounds.append((name, acc, acc + frac))
        acc += frac
    for name, lo, hi in reversed(bounds):
        expr = F.when((u >= lo) & (u < hi), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def sample_per_group(
    df: DataFrame,
    by: str,
    n: int,
    id_col: str,
    salt: int = 0,
    shards: int = 1,
) -> DataFrame:
    """Deterministic n-per-group sample (class balancing / per-domain
    caps): rank rows inside each ``by`` group by the mixed id and keep
    the first ``n``. Groups smaller than n pass through whole. The
    mixed-id order is a reproducible stand-in for a random order —
    unlike rand(), identical across re-runs and engines.

    ``shards=1`` is one shuffle (the window partition) — fine while no
    single group dwarfs an executor. ``shards=k`` is the HOT-GROUP
    path: rows first rank inside (by, mix'(id) % k) so the widest
    window partition shrinks k-fold, each shard keeps its own top-n
    (a superset of the group's true top-n members in that shard), and
    a second window over the surviving <= k*n rows per group re-ranks
    by the SAME total order and keeps n. Output is bit-identical to
    the plain path for any k: the global top-n by the (mix, id) total
    order is preserved shard-by-shard (same prefix-merge trade as
    asof_join's bucket cascade).
    """
    from pyspark.sql import Window

    rank_key = [_mix(F.col(id_col) + F.lit(salt)).asc(), F.col(id_col).asc()]
    if shards <= 1:
        w = Window.partitionBy(by).orderBy(*rank_key)
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= n)
            .drop("_rn")
        )
    # decorrelate the shard hash from the rank hash with a salt offset
    # (correctness needs neither independence nor balance — only that
    # the shard is a deterministic function of the row)
    shard = F.pmod(_mix(F.col(id_col) + F.lit(salt) + F.lit(0x9E3779B9)), F.lit(shards))
    w1 = Window.partitionBy(by, "_shard").orderBy(*rank_key)
    w2 = Window.partitionBy(by).orderBy(*rank_key)
    return (
        df.withColumn("_shard", shard)
        .withColumn("_rn", F.row_number().over(w1))
        .where(F.col("_rn") <= n)
        .withColumn("_rn2", F.row_number().over(w2))
        .where(F.col("_rn2") <= n)
        .drop("_shard", "_rn", "_rn2")
    )


def weighted_sample_per_group(
    df: DataFrame,
    by: str,
    n: int,
    id_col: str,
    weight: str,
    salt: int = 0,
    shards: int = 1,
) -> DataFrame:
    """Deterministic WEIGHTED n-per-group sample without replacement —
    Efraimidis & Spirakis (2006) priority sampling: each row draws
    u in (0,1) from its mixed id and gets priority u^(1/w); the n
    largest priorities per group are a weighted sample without
    replacement (importance-weighted corpus sampling: quality-score
    weights, dedup-cluster-size downweighting). rand() is replaced by
    the Knuth-mixed id, so re-runs, resumes, and the DuckDB oracle all
    select the same rows.

    The priority is rounded to 12 decimals before ranking (id
    tiebreak), pinning the cross-engine comparison against last-ulp
    pow() differences. Rows with weight <= 0 are excluded (their
    priority would be 0^inf). ``shards=k`` is the same hot-group
    prefix-merge as sample_per_group: top-n per (group, shard), then
    top-n of the <= k*n survivors — identical output for any k because
    the group's true top-n members are each in their shard's top-n.
    """
    from pyspark.sql import Window

    u = (_mix(F.col(id_col) + F.lit(salt)).cast("double") + 0.5) / F.lit(float(_MOD))
    prio = F.round(
        F.pow(u, F.lit(1.0) / F.col(weight).cast("double")), 12
    )
    base = df.where(F.col(weight) > 0).withColumn("_prio", prio)
    rank_key = [F.col("_prio").desc(), F.col(id_col).asc()]
    if shards <= 1:
        w = Window.partitionBy(by).orderBy(*rank_key)
        return (
            base.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= n)
            .drop("_prio", "_rn")
        )
    shard = F.pmod(_mix(F.col(id_col) + F.lit(salt) + F.lit(0x9E3779B9)), F.lit(shards))
    w1 = Window.partitionBy(by, "_shard").orderBy(*rank_key)
    w2 = Window.partitionBy(by).orderBy(*rank_key)
    return (
        base.withColumn("_shard", shard)
        .withColumn("_rn", F.row_number().over(w1))
        .where(F.col("_rn") <= n)
        .withColumn("_rn2", F.row_number().over(w2))
        .where(F.col("_rn2") <= n)
        .drop("_prio", "_shard", "_rn", "_rn2")
    )


def sessionize(
    events: DataFrame,
    by: str,
    ts: str,
    gap: float,
    tiebreak: str | None = None,
    time_bucket: float | None = None,
) -> DataFrame:
    """Gap-based sessionization: within each ``by`` key, order events
    by ``ts`` and start a new session whenever the gap to the previous
    event exceeds ``gap`` (same units as ts). Adds ``session_idx``
    (0-based per key). Default is one shuffle + one window — the
    standard clickstream/session construction.

    ``time_bucket=width`` is the HOT-KEY path (a single key with 10^9
    events would otherwise sort in one window partition). Sessions are
    chains, so they split by coarse TIME RANGE, not by a stateless
    hash: pass 1 sessionizes each (key, floor(ts/width)) range
    independently (widest partition shrinks to the events of one
    range); pass 2 stitches at range boundaries over a per-range
    summary — O(#ranges) rows per key, the same small-cascade shape as
    asof_join's bucket carry — by checking whether the first event of
    a range continues the previous non-empty range's last session, and
    turning the per-range local indices into global ones with a
    prefix-sum offset (sessions opened before the range, minus merged
    boundaries). Output is bit-identical to the plain path for ANY
    width (boundary gaps are re-checked on real timestamps; empty
    ranges are skipped by the summary lag). Pick width >> gap so
    ranges hold whole sessions typically; correctness never depends on
    it.
    """
    from pyspark.sql import Window

    order = [F.col(ts).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    if time_bucket is None:
        w = Window.partitionBy(by).orderBy(*order)
        prev = F.lag(F.col(ts)).over(w)
        new_sess = F.when(
            prev.isNull() | ((F.col(ts) - prev) > gap), F.lit(1)
        ).otherwise(F.lit(0))
        wsum = w.rowsBetween(Window.unboundedPreceding, 0)
        return events.withColumn("session_idx", F.sum(new_sess).over(wsum) - 1)

    rg = F.floor(F.col(ts) / time_bucket).cast("long")
    e = events.withColumn("_rg", rg)
    w1 = Window.partitionBy(by, "_rg").orderBy(*order)
    prev = F.lag(F.col(ts)).over(w1)
    new_local = F.when(
        prev.isNull() | ((F.col(ts) - prev) > gap), F.lit(1)
    ).otherwise(F.lit(0))
    e = e.withColumn(
        "_li", F.sum(new_local).over(w1.rowsBetween(Window.unboundedPreceding, 0)) - 1
    )
    summary = e.groupBy(by, "_rg").agg(
        F.min(ts).alias("_first"),
        F.max(ts).alias("_last"),
        (F.max("_li") + 1).alias("_nloc"),
    )
    ws = Window.partitionBy(by).orderBy(F.col("_rg").asc())
    prev_last = F.lag("_last").over(ws)
    merge = F.when(
        prev_last.isNotNull() & ((F.col("_first") - prev_last) <= gap), F.lit(1)
    ).otherwise(F.lit(0))
    opened_before = F.coalesce(
        F.sum("_nloc").over(ws.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    merged_upto = F.sum(merge).over(ws.rowsBetween(Window.unboundedPreceding, 0))
    off_map = summary.select(
        by, "_rg", (opened_before - merged_upto).alias("_off")
    )
    return (
        e.join(off_map, [by, "_rg"])
        .withColumn("session_idx", F.col("_li") + F.col("_off"))
        .drop("_rg", "_li", "_off")
    )


def pack_chunks(
    df: DataFrame,
    id_col: str,
    tokens: str,
    budget: int,
    shards: int = 64,
    salt: int = 0,
) -> DataFrame:
    """Concat-and-chunk packing plan — the standard LLM-pretraining
    batch construction: documents are laid end-to-end and the token
    stream is cut every ``budget`` tokens. Emits, per document, which
    training chunks its tokens land in:

    - ``shard``        mix(id+salt) % shards — the packing STREAM the
                       doc belongs to (one independent stream per
                       output writer; this is what makes the plan
                       scale: each stream packs in parallel and the
                       widest window partition is ~1/shards of the
                       corpus, not the whole corpus)
    - ``tok_offset``   the doc's first token's position in its stream
    - ``chunk_first`` / ``chunk_last`` / ``n_chunks``  the chunk index
                       range [tok_offset, tok_offset+tokens) spans —
                       a doc straddling a cut appears in both chunks,
                       exactly like the real concat-then-slice loader

    Within a stream docs are ordered by (mix(id), id) — a reproducible
    stand-in for the random document shuffle, identical across re-runs,
    resumes, and engines (same Knuth-mix portability contract as
    hash_split). One shuffle total (the per-shard window). Rows with
    ``tokens <= 0`` occupy no stream space and are dropped (documented
    contract; filter upstream to keep them).
    """
    from pyspark.sql import Window

    if budget <= 0 or shards <= 0:
        raise ValueError(f"budget and shards must be positive; got {budget}, {shards}")
    u = _mix(F.col(id_col) + F.lit(salt))
    d = df.where(F.col(tokens) > 0).withColumn("_u", u).withColumn(
        "shard", F.pmod(F.col("_u"), F.lit(shards)).cast("int")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("_u").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum(F.col(tokens).cast("long")).over(w)
    d = d.withColumn("tok_offset", (cum - F.col(tokens).cast("long")))
    # integer `div` (exact at any offset — floor(double/double) would
    # drift past 2^53 total tokens), but never interpolate the USER'S
    # column name into the expr string: a non-identifier name like
    # "n-chars" would parse as arithmetic. Route it through a safe
    # internal alias instead.
    d = d.withColumn("_tok", F.col(tokens).cast("long"))
    first = F.expr(f"tok_offset div {int(budget)}")
    last = F.expr(f"(tok_offset + _tok - 1) div {int(budget)}")
    return (
        d.withColumn("chunk_first", first)
        .withColumn("chunk_last", last)
        .withColumn("n_chunks", (F.col("chunk_last") - F.col("chunk_first") + 1))
        .drop("_u", "_tok")
    )
