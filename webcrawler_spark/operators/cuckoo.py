"""URL-seen dedup sidecar #2: partitioned **cuckoo filter** (north_star:
"partitioned Bloom/cuckoo filter maintained per host-hash partition via
mapInPandas").

Why a second filter when the Bloom sidecar (operators/dedup.py) exists: a
cuckoo filter (Fan et al., "Cuckoo Filter: Practically Better Than Bloom",
CoNEXT 2014 — public paper) supports **deletion**, which a crawl actually
needs: a URL evicted from the seen set (recrawl scheduling decides a GONE /
expired page is fetchable again) must stop hitting the fast-path "seen"
answer — with a Bloom sidecar the only options are rebuild or tolerate
staleness until the next rebuild. The cuckoo sidecar removes the key's
fingerprint in place, per bucket, incrementally. It also answers "maybe"
from ONE table lookup of at most two 4-slot buckets (cache-friendly) versus
the Bloom's k=7 scattered bit probes, at a comparable false-positive rate
(16-bit fingerprints, 4-slot buckets: fpr ≈ 2·b/2^16 ≈ 0.012%).

Same JVM/numpy hash split as the Bloom sidecar (input_hint: "no per-row
Python"): the two base hashes are ``xxhash64`` COLUMNS; the fingerprint and
both candidate buckets derive from them vectorized inside the UDF:

    f  = low 16 bits of h2, 0 mapped to 1      (0 = empty slot sentinel)
    i1 = h1 mod m
    i2 = i1 XOR (f · 0x5bd1e995 mod m)         (partial-key cuckooing)

so i2(i1, f) is an involution: either bucket recovers the other without the
key — that is what makes displacement (and deletion) possible.

Determinism (the engine's cross-run contract): a cuckoo table's layout
depends on insert order, so every build/upsert inserts in SORTED ``(h1,
h2)`` order and evictions pick victims round-robin — the table BYTES are a
pure function of the key set, independent of arrow batching or task
placement. Duplicate (h1, h2) pairs collapse before insert (the seen set is
a set; multiset duplicates would burn slots and break delete-once).

Capacity under skew: a fixed-size cuckoo filter ABORTS when a bucket's
keys exceed ~95% of its slots — and a Zipf-hot host-hash bucket will (a
4M-page bench crawl hit this at 89% load on the hottest of 64 buckets).
The sidecar therefore stores a CHAIN of sub-filters per bucket
(RedisBloom's scalable-filter pattern): inserts go to the newest
sub-filter, a full one is sealed and a double-size successor appended,
membership ORs the chain, deletes probe oldest→newest. Growth points are
deterministic (sorted insert + undo-on-fail displacement), so chain bytes
remain a pure function of the key set.

Deletion contract (standard cuckoo-filter caveat, stated honestly): only
delete keys that were inserted. Deleting removes ONE copy of the
fingerprint from the key's buckets; deleting a never-inserted key can strip
a colliding key's fingerprint (a false negative). The crawl only deletes
from ``url_seen`` rows, which satisfies the contract by construction —
and for a SINGLE table that is sufficient: n colliding inserted keys store
n copies, so deleting d of them leaves n-d ≥ the survivors' count. A CHAIN
weakens this (ADVICE r4): sub-filters have different bucket masks, so the
oldest→newest probe can remove a collider's copy from an old sub-filter
while the deleted key's own copy sits in a newer one — the collider's copy
was its only one VISIBLE AT ITS OWN PROBE POSITIONS, so it goes false
negative. Probability per delete ≈ the fingerprint-collision rate
(2·SLOTS/2^16 ≈ 0.012% per resident colliding key, and only when the
bucket has actually chained). The exact repair exists because the caller
holds the exact surviving key set: ``cuckoo_sidecar_delete(..., kept=...)``
re-probes the kept keys of every touched bucket after the deletes and
re-inserts any stripped fingerprint — restoring no-false-negatives exactly
(a re-inserted copy can at worst re-create a FALSE POSITIVE for the
deleted key, which the engine's maybe→exact-anti-join path absorbs).
jobs/recrawl.py passes ``kept`` on eviction.

Scale shape is identical to the Bloom sidecar: state lives per host_hash
bucket (co-located with the frontier partitioning), built and maintained by
``mapInPandas`` / cogrouped ``applyInPandas`` over int64 hash columns —
URL strings never cross into Python, the seen table never reshuffles for
the fast path, and per-round maintenance is O(|delta| + touched buckets),
never a rebuild.

Sizing at a 10^10-URL frontier: insertion is a per-key Python loop
(~1.3e5 keys/s/core measured — the price of displacement; probes are
vectorized at ~1e7 keys/s/core), so ``n_buckets`` must scale with the seen
set: at 10^10 urls use n_buckets ≈ 2^16 so a bucket holds ~1.5e5 keys
(m_buckets 2^16 → 94% max load) and a full build is ~1 s/task × 65k
parallel tasks; per-round delta upserts touch only the delta's buckets.
The Bloom sidecar stays the build-throughput choice; this filter is the
one you can delete from.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from .dedup import anti_join_new, bloom_hash_cols, bucket_col

SLOTS = 4                 # entries per bucket (b=4: the paper's sweet spot)
MAX_KICKS = 500           # displacement bound before "filter full"
_FP_MUL = np.uint64(0x5BD1E995)  # fingerprint -> alt-bucket offset hash


def _fingerprints(h2: np.ndarray) -> np.ndarray:
    f = (np.ascontiguousarray(h2, dtype=np.int64).view(np.uint64)
         & np.uint64(0xFFFF)).astype(np.uint16)
    f[f == 0] = 1
    return f


def _i1(h1: np.ndarray, m: int) -> np.ndarray:
    return (np.ascontiguousarray(h1, dtype=np.int64).view(np.uint64)
            & np.uint64(m - 1)).astype(np.int64)


def _alt(i: np.ndarray, f: np.ndarray, m: int) -> np.ndarray:
    off = (f.astype(np.uint64) * _FP_MUL) & np.uint64(m - 1)
    return (i.astype(np.uint64) ^ off).astype(np.int64)


def _dedup_sort(h1: np.ndarray, h2: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Unique (h1, h2) pairs in sorted order — the deterministic insert
    sequence regardless of how arrow batches sliced the partition."""
    pairs = np.stack(
        [np.ascontiguousarray(h1, np.int64), np.ascontiguousarray(h2, np.int64)],
        axis=1,
    )
    uniq = np.unique(pairs, axis=0)
    return uniq[:, 0], uniq[:, 1]


def cuckoo_new(m_buckets: int) -> np.ndarray:
    assert m_buckets & (m_buckets - 1) == 0, "m_buckets must be a power of two"
    return np.zeros((m_buckets, SLOTS), dtype=np.uint16)


def _try_insert(table: np.ndarray, f: int, i1: int) -> bool:
    """Insert one fingerprint with the deterministic round-robin kick walk.
    Returns False — with the table UNCHANGED (the displacement path is
    undone) — when MAX_KICKS is hit, so a full table never silently drops a
    displaced victim (that would be a false negative)."""
    m = table.shape[0]
    mask = m - 1
    mul = int(_FP_MUL)
    cur_f, cur_i = int(f), int(i1)
    path = []  # (bucket, slot, previous value) per eviction, for undo
    for kick in range(MAX_KICKS):
        row = table[cur_i]
        empty = np.flatnonzero(row == 0)
        if empty.size:
            row[empty[0]] = cur_f
            return True
        if kick == 0:
            alt = (cur_i ^ (cur_f * mul)) & mask
            row2 = table[alt]
            empty2 = np.flatnonzero(row2 == 0)
            if empty2.size:
                row2[empty2[0]] = cur_f
                return True
        slot = kick % SLOTS
        victim = int(row[slot])
        path.append((cur_i, slot, victim))
        row[slot] = cur_f
        cur_f = victim
        cur_i = (cur_i ^ (cur_f * mul)) & mask
    for b, s, old in reversed(path):
        table[b][s] = old
    return False


def cuckoo_insert_hashed(table: np.ndarray, h1: np.ndarray, h2: np.ndarray) -> int:
    """Insert the (deduped, sorted) key set into ``table`` in place; returns
    the number of fingerprints stored. Raises when the displacement bound is
    hit — single-table form; the engine's distributed sidecar uses the
    CHAIN form below, which grows instead of failing."""
    m = table.shape[0]
    u1, u2 = _dedup_sort(h1, h2)
    fs = _fingerprints(u2)
    i1s = _i1(u1, m)
    stored = 0
    for f, i in zip(fs.tolist(), i1s.tolist()):
        if not _try_insert(table, f, i):
            raise ValueError(
                f"cuckoo filter full after {MAX_KICKS} kicks "
                f"(m_buckets={m}, stored={stored}); size m_buckets for the "
                "bucket's key count"
            )
        stored += 1
    return stored


def chain_insert_hashed(tables: list, h1: np.ndarray, h2: np.ndarray) -> int:
    """Insert into a CHAINED filter (RedisBloom-style scaling): keys go to
    the newest sub-filter; when its displacement bound is hit the chain
    appends a fresh sub-filter of DOUBLE size and the key (whose insert
    left the full table untouched — see :func:`_try_insert`) lands there.
    Mutates ``tables`` (a list of per-sub-filter arrays) in place, possibly
    appending; returns fingerprints stored. Deterministic: growth points
    are a pure function of the sorted key sequence, so chain bytes stay a
    pure function of the key set.

    This is what makes the sidecar safe under hot-bucket skew at frontier
    scale: a Zipf-hot host-hash bucket grows its chain instead of aborting
    the crawl (found by a 4M-page bench run at 89% bucket load)."""
    assert tables, "chain must start with at least one sub-filter"
    u1, u2 = _dedup_sort(h1, h2)
    fs = _fingerprints(u2)
    for f, hh1 in zip(fs.tolist(), u1.tolist()):
        last = tables[-1]
        i1 = int(np.int64(hh1).view(np.uint64) & np.uint64(last.shape[0] - 1))
        if not _try_insert(last, f, i1):
            grown = cuckoo_new(last.shape[0] * 2)
            tables.append(grown)
            gi1 = int(np.int64(hh1).view(np.uint64) & np.uint64(grown.shape[0] - 1))
            # NOT an assert: under python -O asserts are stripped and the
            # fingerprint would silently never be stored — a false negative
            # violating the sidecar contract (ADVICE r4)
            if not _try_insert(grown, f, gi1):  # fresh table: always fits
                raise RuntimeError(
                    "insert into freshly grown cuckoo sub-filter failed "
                    f"(m_buckets={grown.shape[0]})"
                )
    return len(fs)


def chain_contains_hashed(tables: list, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    """Membership across the chain: OR of each sub-filter's vectorized
    probe. No false negatives for inserted-and-not-deleted keys."""
    if not len(h1):
        return np.zeros(0, dtype=bool)
    out = np.zeros(len(h1), dtype=bool)
    for t in tables:
        out |= cuckoo_maybe_contains_hashed(t, h1, h2)
    return out


def chain_delete_hashed(tables: list, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    """Delete ONE stored copy per key, probing sub-filters oldest→newest
    (insertion order). Returns the per-unique-key deleted mask.

    Residual caveat (module docstring, "Deletion contract"): in a chain the
    removed copy can belong to a fingerprint-colliding key resident in a
    DIFFERENT sub-filter, leaving that key false-negative. Callers holding
    the exact surviving key set should repair with
    :func:`chain_reinsert_missing` (``cuckoo_sidecar_delete(kept=...)``
    does)."""
    mul = int(_FP_MUL)
    u1, u2 = _dedup_sort(h1, h2)
    fs = _fingerprints(u2)
    out = np.zeros(len(fs), dtype=bool)
    for k, (f, hh1) in enumerate(zip(fs.tolist(), u1.tolist())):
        for t in tables:
            m = t.shape[0]
            i1 = int(np.int64(hh1).view(np.uint64) & np.uint64(m - 1))
            done = False
            for b in (i1, (i1 ^ (int(f) * mul)) & (m - 1)):
                row = t[b]
                hits = np.flatnonzero(row == f)
                if hits.size:
                    row[hits[0]] = 0
                    out[k] = True
                    done = True
                    break
            if done:
                break
    return out


def chain_reinsert_missing(tables: list, h1: np.ndarray, h2: np.ndarray) -> int:
    """Repair pass after :func:`chain_delete_hashed`: probe the chain for
    every SURVIVING key and re-insert the ones a colliding delete stripped
    (module docstring, "Deletion contract"). Vectorized probe over the full
    kept set, Python-loop insert over only the (rare) missing ones; returns
    the number re-inserted. Deterministic: missing keys re-insert in the
    same sorted (h1, h2) order as every other insert path."""
    if not len(h1):
        return 0
    u1, u2 = _dedup_sort(h1, h2)
    present = chain_contains_hashed(tables, u1, u2)
    missing = ~present
    if not missing.any():
        return 0
    return chain_insert_hashed(tables, u1[missing], u2[missing])


def cuckoo_maybe_contains_hashed(
    table: np.ndarray, h1: np.ndarray, h2: np.ndarray
) -> np.ndarray:
    """Vectorized membership: fingerprint present in either candidate
    bucket. No false negatives for inserted-and-not-deleted keys."""
    if not len(h1):
        return np.zeros(0, dtype=bool)
    m = table.shape[0]
    fs = _fingerprints(np.asarray(h2))
    i1s = _i1(np.asarray(h1), m)
    i2s = _alt(i1s, fs, m)
    hit1 = (table[i1s] == fs[:, None]).any(axis=1)
    hit2 = (table[i2s] == fs[:, None]).any(axis=1)
    return hit1 | hit2


def cuckoo_delete_hashed(
    table: np.ndarray, h1: np.ndarray, h2: np.ndarray
) -> np.ndarray:
    """Remove ONE stored copy of each key's fingerprint (bucket i1 first,
    then i2), in the same sorted deterministic order as insertion. Returns
    the per-unique-key deleted mask. In-place."""
    m = table.shape[0]
    mask = m - 1
    mul = int(_FP_MUL)
    u1, u2 = _dedup_sort(h1, h2)
    fs = _fingerprints(u2)
    i1s = _i1(u1, m)
    out = np.zeros(len(fs), dtype=bool)
    for k, (f, i) in enumerate(zip(fs.tolist(), i1s.tolist())):
        for b in (int(i), (int(i) ^ (int(f) * mul)) & mask):
            row = table[b]
            hits = np.flatnonzero(row == f)
            if hits.size:
                row[hits[0]] = 0
                out[k] = True
                break
    return out


def _to_bytes(table: np.ndarray) -> bytes:
    return table.astype("<u2").tobytes()


def _from_bytes(blob: bytes) -> np.ndarray:
    arr = np.frombuffer(bytes(blob), dtype="<u2").astype(np.uint16)
    return arr.reshape(len(arr) // SLOTS, SLOTS).copy()


# ---------------------------------------------------------------------------
# Distributed operators (mirror the Bloom sidecar's shapes)
# ---------------------------------------------------------------------------

CUCKOO_SCHEMA = StructType(
    [
        StructField("bucket", IntegerType()),
        StructField("m_buckets", LongType()),
        StructField("tables", ArrayType(BinaryType())),
        StructField("n_keys", LongType()),
    ]
)


def _chain_to_bytes(tables: list) -> list:
    return [_to_bytes(t) for t in tables]


def _chain_from_bytes(blobs) -> list:
    # each sub-filter's m is implied by its byte length (m·SLOTS·2 bytes),
    # so the chain needs no per-table metadata
    return [_from_bytes(bytes(b)) for b in blobs]


def cuckoo_sidecar_build(
    seen: DataFrame,
    n_buckets: int = 64,
    m_buckets: int = 1 << 14,
    url_col: str = "url",
    host_hash_col: str = "host_hash",
) -> DataFrame:
    """Per-host_hash-bucket CHAINED cuckoo filters from a url_seen table
    (or a round's delta — see :func:`cuckoo_sidecar_upsert`). ``m_buckets``
    sizes the first sub-filter only: a bucket whose key count outgrows it
    (hot-host Zipf skew) chains doubled sub-filters instead of failing.
    Only (bucket, h1, h2) int64 columns cross into Python. Each partition
    accumulates its bucket's full hash set first so the sorted-insert
    determinism holds across arrow batch boundaries."""
    h1, h2 = bloom_hash_cols(F.col(url_col))

    def build(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict = {}
        for pdf in pdf_iter:
            if pdf.empty:
                continue
            for bucket, grp in pdf.groupby("_bucket"):
                acc.setdefault(int(bucket), []).append(
                    (grp["_h1"].to_numpy(np.int64), grp["_h2"].to_numpy(np.int64))
                )
        if acc:
            rows = []
            for b, chunks in acc.items():
                chain = [cuckoo_new(m_buckets)]
                n = chain_insert_hashed(
                    chain,
                    np.concatenate([c[0] for c in chunks]),
                    np.concatenate([c[1] for c in chunks]),
                )
                rows.append((b, m_buckets, _chain_to_bytes(chain), n))
            yield pd.DataFrame(rows, columns=["bucket", "m_buckets", "tables", "n_keys"])

    hashed = seen.select(
        bucket_col(F.col(host_hash_col), n_buckets).alias("_bucket"),
        h1.alias("_h1"),
        h2.alias("_h2"),
    )
    return hashed.repartition(n_buckets, "_bucket").mapInPandas(build, CUCKOO_SCHEMA)


def _hashed_keys(df: DataFrame, n_buckets: int, url_col: str,
                 host_hash_col: str) -> DataFrame:
    if host_hash_col in df.columns:
        hh = F.col(host_hash_col)
    else:
        from ..functions import host_hash_col as _hh, parse_host

        hh = _hh(parse_host(F.col(url_col)))
    h1, h2 = bloom_hash_cols(F.col(url_col))
    return df.select(
        bucket_col(hh, n_buckets).alias("bucket"),
        h1.alias("_h1"),
        h2.alias("_h2"),
    )


def _apply_per_bucket(
    sidecar: DataFrame, keys: DataFrame, op: str, m_buckets_default: int
) -> DataFrame:
    """Cogroup (sidecar row, key slice) per bucket and mutate the table —
    the shared shape of upsert and delete. Buckets with no keys pass
    through untouched; keys with no filter row get a fresh
    ``m_buckets_default`` table (upsert) or are no-ops (delete)."""

    cols = ["bucket", "m_buckets", "tables", "n_keys"]

    def fold(key, side_pdf: pd.DataFrame, keys_pdf: pd.DataFrame) -> pd.DataFrame:
        if keys_pdf.empty:
            return side_pdf[cols] if not side_pdf.empty else pd.DataFrame(columns=cols)
        bucket = int(key[0])
        if side_pdf.empty:
            if op == "delete":
                return pd.DataFrame(columns=cols)
            m, chain, n = m_buckets_default, [cuckoo_new(m_buckets_default)], 0
        else:
            row = side_pdf.iloc[0]
            m = int(row["m_buckets"])
            chain = _chain_from_bytes(row["tables"])
            n = int(row["n_keys"])
        h1 = keys_pdf["_h1"].to_numpy(np.int64)
        h2 = keys_pdf["_h2"].to_numpy(np.int64)
        if op == "upsert":
            n += chain_insert_hashed(chain, h1, h2)
        else:
            n -= int(chain_delete_hashed(chain, h1, h2).sum())
        return pd.DataFrame([(bucket, m, _chain_to_bytes(chain), n)], columns=cols)

    return (
        sidecar.groupBy("bucket")
        .cogroup(keys.groupBy("bucket"))
        .applyInPandas(fold, CUCKOO_SCHEMA)
    )


def cuckoo_sidecar_upsert(
    sidecar: DataFrame,
    delta_seen: DataFrame,
    n_buckets: int = 64,
    m_buckets: int = 1 << 14,
    url_col: str = "url",
    host_hash_col: str = "host_hash",
) -> DataFrame:
    """Per-round incremental maintenance: insert the round's new_seen delta
    into the persisted sidecar — O(|delta| + touched buckets). The delta's
    keys must be new (the round's post-anti-join new_seen rows are, by
    construction); re-upserting an existing key would store a second copy
    and skew delete-once accounting. ``m_buckets`` sizes tables for buckets
    the build never saw (first keys for a new host-hash range)."""
    keys = _hashed_keys(delta_seen, n_buckets, url_col, host_hash_col)
    return _apply_per_bucket(sidecar, keys, "upsert", m_buckets)


def cuckoo_sidecar_delete(
    sidecar: DataFrame,
    deletions: DataFrame,
    n_buckets: int = 64,
    url_col: str = "url",
    host_hash_col: str = "host_hash",
    kept: Optional[DataFrame] = None,
) -> DataFrame:
    """Evict keys (recrawl eligibility): remove one fingerprint copy per
    deleted URL. Callers pass rows FROM url_seen (the deletion contract).

    ``kept`` — the exact SURVIVING seen rows (url_seen minus deletions) —
    enables the chain-collision repair (module docstring, "Deletion
    contract"): after the deletes, every touched bucket re-probes its kept
    keys and re-inserts any fingerprint a colliding delete stripped,
    restoring the no-false-negative contract exactly. Cost is a vectorized
    probe over the touched buckets' kept keys only (untouched buckets never
    enter the cogroup's kept side). Without ``kept`` the raw delete runs
    with the documented ~0.012%-per-collision residual."""
    keys = _hashed_keys(deletions, n_buckets, url_col, host_hash_col)
    if kept is None:
        return _apply_per_bucket(sidecar, keys, "delete", 0)

    touched = keys.select("bucket").distinct()  # ≤ n_buckets rows
    kept_keys = _hashed_keys(kept, n_buckets, url_col, host_hash_col).join(
        touched, "bucket", "left_semi"
    )
    dels = keys.withColumn("_op", F.lit(0))
    verify = kept_keys.withColumn("_op", F.lit(1))
    cols = ["bucket", "m_buckets", "tables", "n_keys"]

    def fold(key, side_pdf: pd.DataFrame, keys_pdf: pd.DataFrame) -> pd.DataFrame:
        if keys_pdf.empty:
            return side_pdf[cols] if not side_pdf.empty else pd.DataFrame(columns=cols)
        if side_pdf.empty:
            return pd.DataFrame(columns=cols)
        bucket = int(key[0])
        row = side_pdf.iloc[0]
        m = int(row["m_buckets"])
        chain = _chain_from_bytes(row["tables"])
        n = int(row["n_keys"])
        d = keys_pdf[keys_pdf["_op"] == 0]
        k = keys_pdf[keys_pdf["_op"] == 1]
        n -= int(
            chain_delete_hashed(
                chain, d["_h1"].to_numpy(np.int64), d["_h2"].to_numpy(np.int64)
            ).sum()
        )
        n += chain_reinsert_missing(
            chain, k["_h1"].to_numpy(np.int64), k["_h2"].to_numpy(np.int64)
        )
        return pd.DataFrame([(bucket, m, _chain_to_bytes(chain), n)], columns=cols)

    return (
        sidecar.groupBy("bucket")
        .cogroup(dels.unionByName(verify).groupBy("bucket"))
        .applyInPandas(fold, CUCKOO_SCHEMA)
    )


def cuckoo_prefilter(
    candidates: DataFrame,
    sidecar: DataFrame,
    url_col: str = "url",
    host_hash_col: str = "host_hash",
    n_buckets: int = 64,
    cache_registry: Optional[list] = None,
) -> Tuple[DataFrame, DataFrame]:
    """Split candidates into (definitely_new, maybe_seen) — the same
    cogroup shape, persistence discipline, and no-false-negative contract
    as dedup.bloom_prefilter, probing the cuckoo table instead."""
    if host_hash_col in candidates.columns:
        hh = F.col(host_hash_col)
    else:
        from ..functions import host_hash_col as _hh, parse_host

        hh = _hh(parse_host(F.col(url_col)))
    h1, h2 = bloom_hash_cols(F.col(url_col))
    cand = (
        candidates.withColumn("_bucket", bucket_col(hh, n_buckets))
        .withColumn("_h1", h1)
        .withColumn("_h2", h2)
    )
    side = sidecar.withColumnRenamed("bucket", "_bucket")

    internal = {"_bucket", "_h1", "_h2"}
    carry = [f.name for f in cand.schema.fields if f.name not in internal]
    out_schema = StructType(
        [f for f in cand.schema.fields if f.name not in internal]
        + [StructField("_maybe", IntegerType())]
    )

    def split(key, cand_pdf: pd.DataFrame, side_pdf: pd.DataFrame) -> pd.DataFrame:
        if cand_pdf.empty:
            return cand_pdf.assign(_maybe=pd.Series([], dtype="int32"))[carry + ["_maybe"]]
        if side_pdf.empty:
            maybe = np.zeros(len(cand_pdf), dtype=bool)
        else:
            chain = _chain_from_bytes(side_pdf.iloc[0]["tables"])
            maybe = chain_contains_hashed(
                chain,
                cand_pdf["_h1"].to_numpy(np.int64),
                cand_pdf["_h2"].to_numpy(np.int64),
            )
        out = cand_pdf[carry].copy()
        out["_maybe"] = maybe.astype("int32")
        return out

    joined = cand.groupBy("_bucket").cogroup(side.groupBy("_bucket")).applyInPandas(
        split, out_schema
    )
    joined = joined.persist()
    if cache_registry is not None:
        cache_registry.append(joined)
    new = joined.filter(F.col("_maybe") == 0).drop("_maybe")
    maybe = joined.filter(F.col("_maybe") == 1).drop("_maybe")
    return new, maybe


def dedup_against_seen_cuckoo(
    candidates: DataFrame,
    seen: DataFrame,
    sidecar: DataFrame,
    url_col: str = "url",
    n_buckets: int = 64,
    cache_registry: Optional[list] = None,
) -> DataFrame:
    """Exact dedup gate through the cuckoo fast path: prefilter, then the
    exact anti-join on the maybe-residue only — semantics identical to
    ``anti_join_new`` (the filter is a shuffle saver, never an answer)."""
    new, maybe = cuckoo_prefilter(
        candidates, sidecar, url_col=url_col, n_buckets=n_buckets,
        cache_registry=cache_registry,
    )
    checked = anti_join_new(maybe, seen, url_col)
    return new.unionByName(checked)
