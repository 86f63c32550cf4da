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

from typing import Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textprep import hash64

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
