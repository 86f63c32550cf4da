"""Deterministic sampling / dataset-split operators for corpus curation.

A training-data pipeline needs reproducible, coordination-free membership
decisions: train/valid/test splits that never leak across reruns, and
stratified subsamples whose composition is a pure function of the data. Both
come from the same primitive — a content-derived hash bucket per key
(``textprep.hash64``: int64 of the first 15 hex chars of sha256, the repo's
portable-hash convention with an exact DuckDB twin) — so membership is stable
under any partitioning, any cluster size, and any execution order, and needs
no shuffle at all: every operator here is a narrow map + one aggregation.

At 100 TB this matters twice over: (a) `df.sample()` / `rand()` are
nondeterministic across retries and partition re-splits (a recomputed task
would sample different rows — silent train/test leakage); (b) membership is
a narrow filter evaluated inside the scan's codegen stage (no shuffle, no
sort, columns pruned to the key). The computed sha256 bucket itself can't
prune parquet row groups — materialize it as a partition/bucket column at
write time (one extra int64 column) when repeated subsample reads should
scan only their slice.

No reference analogue (the reference has no sampling surface); these are the
standard corpus-curation ops (C4/Gopher/RefinedWeb pipelines all split and
subsample this way).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .textprep import hash64, spread, tokens_col

N_BUCKETS = 1000


def hash_bucket(key: Column, n_buckets: int = N_BUCKETS) -> Column:
    """Stable per-key bucket in [0, n_buckets): hash64(key) % n_buckets."""
    return hash64(key) % F.lit(n_buckets)


def assign_split(
    key: Column,
    bounds: Sequence[Tuple[str, int]] = (("train", 900), ("valid", 950)),
    last: str = "test",
    n_buckets: int = N_BUCKETS,
) -> Column:
    """Split label from the key's hash bucket: first (name, upper) whose
    upper bound exceeds the bucket wins; ``last`` catches the rest.

    Default 90/5/5. Pure column expression — composes with any projection
    and costs one sha256 per row (codegen, no shuffle)."""
    b = hash_bucket(key, n_buckets)
    expr = None
    for name, upper in bounds:
        cond = b < F.lit(upper)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return expr.otherwise(F.lit(last))


def sample_by_hash(
    df: DataFrame, key: Column, keep_per_mille: int, n_buckets: int = N_BUCKETS
) -> DataFrame:
    """Deterministic ``keep_per_mille``/1000 subsample: keep rows whose hash
    bucket falls below the threshold. Identical membership on every rerun and
    every cluster size; a plain filter, so it pushes down to the scan."""
    return df.filter(hash_bucket(key, n_buckets) < F.lit(keep_per_mille))


def vocab_topk(df: DataFrame, text_col: str = "text", k: int = 50) -> DataFrame:
    """Global top-k token vocabulary: (tok, n) ordered by count desc, token
    asc (deterministic tie-break). The canonical wordcount shape: explode →
    partial map-side count → one shuffle on tok → TakeOrderedAndProject for
    the top-k (no full global sort materializes)."""
    toks = df.select(
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    return (
        toks.groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "tok")
        .limit(k)
    )


def pack_shards(
    df: DataFrame,
    key: str,
    weight: str,
    target_weight: int,
    n_buckets: int = 256,
) -> DataFrame:
    """Token-aware shard packing: assign every row a ``shard_id`` so that
    consecutive shards each hold ~``target_weight`` units (tokens/chars) in a
    deterministic global order. This is the training-shard writer's problem:
    ~equal-token output files regardless of document-length skew.

    Semantics: rows are globally ordered by ``(bucket, key)`` where
    ``bucket = hash64(key) % n_buckets``; ``shard_id = (prefix-sum of weight
    BEFORE this row) div target_weight`` — i.e. the exact greedy
    sequential packer over that order.

    Scale shape: the naive formulation is one global un-partitioned window
    (a single-task total sort — dead at 10^10 rows). This implements the
    same function as a distributed two-level prefix sum:
      1. within-bucket cumulative sums (one shuffle on bucket, n_buckets-way
         parallel windows);
      2. per-bucket totals -> prefix offsets (n_buckets rows, driver-scale;
         the only un-partitioned window runs over those ~256 rows);
      3. broadcast the offsets back and add.
    Exactness vs the sequential packer is pinned by the DuckDB oracle, which
    computes the naive global window over the identical order.

    Division is integral (`div`) to stay exact at sums beyond 2^53 where
    double-precision floor(a/b) would drift.
    """
    kb = hash64(F.col(key).cast("string")) % F.lit(n_buckets)
    staged = df.withColumn("_bkt", kb).withColumn(
        "_w", F.col(weight).cast("long")
    )
    within = staged.withColumn(
        "_cum_in",
        F.sum("_w").over(Window.partitionBy("_bkt").orderBy(key)),
    )
    totals = staged.groupBy("_bkt").agg(F.sum("_w").alias("_tot"))
    off_win = (
        Window.orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_tot").over(off_win), F.lit(0))
    ).drop("_tot")
    packed = within.join(F.broadcast(offsets), "_bkt").withColumn(
        "_cumb", F.col("_off") + F.col("_cum_in") - F.col("_w")
    )
    return packed.withColumn(
        "shard_id", F.expr(f"_cumb div {int(target_weight)}L")
    ).drop("_bkt", "_w", "_cum_in", "_off", "_cumb")


def chunk_docs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    stride: int = 96,
) -> DataFrame:
    """Sliding-window training-sequence chunking: split every document into
    fixed-budget token windows of ``chunk_tokens`` tokens, advancing by
    ``stride`` tokens (stride < chunk_tokens gives the standard LM overlap so
    no context is lost at window boundaries). A final clipped window is always
    emitted at ``n - chunk_tokens + 1`` when the stride grid doesn't land
    there, so every token of every doc is covered by >= 1 chunk.

    Returns (doc_id, chunk_idx, start_tok, n_tokens, chunk_hash):
    chunk_idx is 0-based in window order, start_tok is the 1-based token
    offset, n_tokens the actual window size (== chunk_tokens except for
    whole-doc windows of short docs), chunk_hash = sha256 of the
    space-rejoined window. Zero-token docs emit no rows.

    Scale shape at 100 TB: narrow map + explode — NO shuffle at all. The
    window arithmetic (sequence/slice/array_join) happens per row; output
    row count is ~n_tokens/stride per doc. Chunk identity is a pure function
    of the text, so re-chunking after a re-crawl is idempotent and chunk
    tables from different runs are mergeable by hash.
    """
    if stride < 1 or chunk_tokens < 1:
        raise ValueError("chunk_tokens and stride must be >= 1")
    if stride > chunk_tokens:
        raise ValueError("stride > chunk_tokens would skip tokens between windows")
    toks = tokens_col(F.col(text_col))
    base = (
        spread(df)
        .select(F.col(id_col), toks.alias("_tk"))
        .withColumn("_n", F.size("_tk"))
        .filter(F.col("_n") > 0)
    )
    # last valid start m = max(n - chunk, 0) + 1; the stride grid 1, 1+s, ...
    # may stop short of m, so m is appended (array_distinct for the aligned
    # case, array_sort to keep window order deterministic).
    m = F.greatest(F.col("_n") - chunk_tokens, F.lit(0)) + F.lit(1)
    starts = F.array_sort(
        F.array_distinct(
            F.concat(F.sequence(F.lit(1), m, F.lit(stride)), F.array(m))
        )
    )
    ex = base.select(
        F.col(id_col), F.col("_tk"), F.col("_n"),
        F.posexplode(starts).alias("chunk_idx", "start_tok"),
    )
    win = F.slice(F.col("_tk"), F.col("start_tok"), chunk_tokens)
    return ex.select(
        F.col(id_col),
        F.col("chunk_idx"),
        F.col("start_tok"),
        F.size(win).cast("long").alias("n_tokens"),
        F.sha2(F.array_join(win, " "), 256).alias("chunk_hash"),
    )


def mixture_rates(
    df: DataFrame,
    domain: str,
    weight: str,
    weights_pm: Dict[str, int],
    budget: int,
) -> DataFrame:
    """Per-domain keep rates (in per-mille) for a target mixture: given a
    total ``budget`` of weight units and per-domain mixture weights
    ``weights_pm`` (per-mille shares of the budget), each domain's rate is

        rate_pm = min(1000, (budget * w_pm) div available_weight)

    — the deterministic integral approximation of target/available. Domains
    absent from ``weights_pm`` are excluded (rate row absent). One tiny
    aggregation (|domains| rows) joined against a broadcast literal weight
    table; no data-sized shuffle.
    """
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        sorted(weights_pm.items()), schema=f"{domain} string, w_pm long"
    )
    avail = df.groupBy(domain).agg(
        F.sum(F.col(weight).cast("long")).alias("avail_w")
    )
    return (
        avail.join(F.broadcast(wdf), domain)
        .withColumn(
            "rate_pm",
            F.least(F.lit(1000).cast("long"), F.expr(f"({int(budget)}L * w_pm) div avail_w")),
        )
        # repeat factor when the target EXCEEDS availability: the standard
        # data-mixture answer is epochs > 1 (upsample by repetition), e.g.
        # multi-epoch books/wiki in public LM mixes. ceil via integer math.
        .withColumn(
            "epochs",
            F.greatest(
                F.lit(1).cast("long"),
                F.expr(f"({int(budget)}L * w_pm + avail_w * 1000 - 1) div (avail_w * 1000)"),
            ),
        )
    )


def mixture_sample(
    df: DataFrame,
    key: str,
    domain: str,
    weight: str,
    weights_pm: Dict[str, int],
    budget: int,
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Domain-mixture subsample: keep each row iff its hash bucket falls under
    its domain's mixture rate (``mixture_rates``). Membership is a pure
    function of (key, domain totals), so it is stable across reruns and
    cluster sizes. Plan shape at 100 TB: one small per-domain aggregate, a
    broadcast join of |domains| rate rows, and a narrow filter — the
    document-sized relation is never shuffled."""
    rates = mixture_rates(df, domain, weight, weights_pm, budget)
    return (
        df.join(F.broadcast(rates), domain)
        .filter(hash_bucket(F.col(key).cast("string"), n_buckets) < F.col("rate_pm"))
        .drop("avail_w", "w_pm", "epochs")
    )


def quantile_buckets(
    df: DataFrame, bin_col: Column, n_buckets: int = 10
) -> DataFrame:
    """Adds ``bucket`` ∈ [0, n_buckets): the row's GLOBAL quantile bucket of
    an integer-valued histogram bin column — curriculum/quality binning
    without a global sort.

    ``ntile() OVER (ORDER BY score)`` is the textbook formulation and a
    single-task total sort at corpus scale. This computes the same buckets
    (bin-granular: rows sharing a bin always share a bucket) from the bin
    HISTOGRAM instead: one count aggregation (|bins| rows, driver-scale),
    an un-partitioned cumulative window over those bins only, and a
    broadcast join back — the data relation is never sorted or re-shuffled
    beyond the count's map-side combine.

    bucket(bin) = min(n_buckets-1, (rows-before-bin * n_buckets) div total):
    exact integer math, deterministic everywhere. ``bin_col`` must be an
    integer-valued expression (e.g. a scaled-e4 score); granularity of the
    bins bounds the boundary error.
    """
    staged = df.withColumn("_bin", bin_col.cast("long"))
    counts = staged.groupBy("_bin").agg(F.count("*").alias("_c"))
    cum_w = Window.orderBy("_bin").rowsBetween(Window.unboundedPreceding, -1)
    all_w = Window.orderBy("_bin").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    mapping = (
        counts.withColumn("_cum", F.coalesce(F.sum("_c").over(cum_w), F.lit(0)))
        .withColumn("_tot", F.sum("_c").over(all_w))
        .select(
            "_bin",
            F.least(
                F.lit(n_buckets - 1).cast("long"),
                F.expr(f"(_cum * {int(n_buckets)}) div _tot"),
            ).alias("bucket"),
        )
    )
    return staged.join(F.broadcast(mapping), "_bin").drop("_bin")


def quantile_buckets_by(
    df: DataFrame, part_col: str, bin_col: Column, n_buckets: int = 10
) -> DataFrame:
    """Group-wise :func:`quantile_buckets`: ``bucket`` ∈ [0, n_buckets) is
    the row's quantile bucket of ``bin_col`` WITHIN its ``part_col`` group —
    the CCNet shape (per-language perplexity head/middle/tail), where a
    global binning would let one dominant language define every other
    language's thresholds.

    Same scale story as the global version: the only windows run over the
    (group × bin) histogram — |groups|·|bins| rows, driver-scale — and the
    mapping broadcasts back; the data relation is never sorted. ntile()
    OVER (PARTITION BY lang ORDER BY score) computes the same buckets but
    ships every row of each group through one task."""
    staged = df.withColumn("_bin", bin_col.cast("long"))
    counts = staged.groupBy(part_col, "_bin").agg(F.count("*").alias("_c"))
    cum_w = (
        Window.partitionBy(part_col)
        .orderBy("_bin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    all_w = (
        Window.partitionBy(part_col)
        .orderBy("_bin")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    mapping = (
        counts.withColumn("_cum", F.coalesce(F.sum("_c").over(cum_w), F.lit(0)))
        .withColumn("_tot", F.sum("_c").over(all_w))
        .select(
            part_col,
            "_bin",
            F.least(
                F.lit(n_buckets - 1).cast("long"),
                F.expr(f"(_cum * {int(n_buckets)}) div _tot"),
            ).alias("bucket"),
        )
    )
    return staged.join(F.broadcast(mapping), [part_col, "_bin"]).drop("_bin")


def pack_sequences(
    df: DataFrame,
    key: str,
    n_tokens: str,
    seq_len: int,
    n_buckets: int = 256,
) -> DataFrame:
    """Training-sequence packing, GPT-style: the corpus is one concatenated
    token stream in a deterministic global order, cut every ``seq_len``
    tokens; each document maps to the context windows its tokens land in.
    This is how LM pretraining consumes a corpus (concat-and-chunk, documents
    crossing window boundaries), and the writer needs exactly this table to
    emit fixed-length sequences with document provenance.

    Returns the input plus: ``tok_start`` (the doc's global token offset),
    ``first_seq``/``last_seq`` (window ids its tokens touch), ``n_seqs``,
    and ``seq_offset`` (position inside its first window). Zero-token rows
    are dropped (they occupy no window).

    Global order and scale shape are identical to :func:`pack_shards`:
    order by (hash-bucket, key); the prefix sum is two-level — per-bucket
    windows (one shuffle, n_buckets-way parallel) plus a driver-scale
    offset window over n_buckets totals broadcast back. The naive
    single-window formulation is a one-task total sort at 10^10 docs. All
    math is integral (``div``/``%``) — exact past 2^53.
    """
    kb = hash64(F.col(key).cast("string")) % F.lit(n_buckets)
    staged = (
        df.filter(F.col(n_tokens) > 0)
        .withColumn("_bkt", kb)
        .withColumn("_w", F.col(n_tokens).cast("long"))
    )
    within = staged.withColumn(
        "_cum_in",
        F.sum("_w").over(Window.partitionBy("_bkt").orderBy(key)),
    )
    totals = staged.groupBy("_bkt").agg(F.sum("_w").alias("_tot"))
    off_win = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_tot").over(off_win), F.lit(0))
    ).drop("_tot")
    L = int(seq_len)
    return (
        within.join(F.broadcast(offsets), "_bkt")
        .withColumn("tok_start", F.col("_off") + F.col("_cum_in") - F.col("_w"))
        .withColumn("first_seq", F.expr(f"tok_start div {L}L"))
        .withColumn("last_seq", F.expr(f"(tok_start + _w - 1) div {L}L"))
        .withColumn("n_seqs", F.col("last_seq") - F.col("first_seq") + F.lit(1))
        .withColumn("seq_offset", F.expr(f"tok_start % {L}L"))
        .drop("_bkt", "_w", "_cum_in", "_off")
    )


def temperature_rates(
    df: DataFrame,
    domain: str,
    alpha_sqrt: bool = True,
    budget: int = 0,
) -> DataFrame:
    """Temperature-based mixture reweighting (multilingual/multi-source
    standard: sample domain i with probability ∝ n_i^α, α < 1 flattens the
    head so low-resource domains are not drowned; mT5/XLM-R use exactly
    this). α is fixed at 1/2 (``alpha_sqrt``) because integer-exact
    cross-engine parity is part of the contract: score = isqrt(n_docs) —
    floor of a correctly-rounded IEEE sqrt of an exact integer is
    deterministic on every engine, while pow(x, 0.7) is libm-dependent.

    Returns per domain: ``n_docs``, ``score``, ``share_ppm`` (the α-mixture
    share, per-million, integral) and — when ``budget`` > 0 — ``take_n``,
    the document count a sampler should draw. One |domains|-row aggregate;
    the data relation is never shuffled beyond the count's map-side combine.
    """
    assert alpha_sqrt, "only α=1/2 (integer-exact) is implemented"
    counts = df.groupBy(domain).agg(F.count("*").alias("n_docs"))
    scored = counts.withColumn(
        "score", F.floor(F.sqrt(F.col("n_docs").cast("double"))).cast("long")
    )
    out = scored.withColumn(
        "share_ppm", F.expr("(score * 1000000) div sum(score) over ()")
    )
    if budget:
        out = out.withColumn(
            "take_n", F.expr(f"({int(budget)}L * score) div sum(score) over ()")
        )
    return out
