"""Cuckoo-filter URL-seen sidecar (operators/cuckoo.py): the north_star's
"Bloom/cuckoo filter maintained per host-hash partition via mapInPandas" —
the deletable half. Kernel properties + distributed build/upsert/delete/
prefilter exactness against the plain anti-join."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from webcrawler_spark.operators.cuckoo import (
    cuckoo_delete_hashed,
    cuckoo_insert_hashed,
    cuckoo_maybe_contains_hashed,
    cuckoo_new,
    cuckoo_prefilter,
    cuckoo_sidecar_build,
    cuckoo_sidecar_delete,
    cuckoo_sidecar_upsert,
    dedup_against_seen_cuckoo,
    _to_bytes,
)


# ---------------------------------------------------------------------------
# kernel


def _hashes(n, seed):
    rng = np.random.default_rng(seed)
    return (
        rng.integers(-2**63, 2**63 - 1, n, dtype=np.int64),
        rng.integers(-2**63, 2**63 - 1, n, dtype=np.int64),
    )


def test_kernel_no_false_negatives_and_low_fp():
    h1, h2 = _hashes(5000, 7)
    t = cuckoo_new(1 << 11)
    assert cuckoo_insert_hashed(t, h1, h2) == 5000
    assert cuckoo_maybe_contains_hashed(t, h1, h2).all()
    g1, g2 = _hashes(100_000, 8)
    assert cuckoo_maybe_contains_hashed(t, g1, g2).mean() < 0.005


def test_kernel_delete_exact():
    h1, h2 = _hashes(4000, 11)
    t = cuckoo_new(1 << 11)
    cuckoo_insert_hashed(t, h1, h2)
    deleted = cuckoo_delete_hashed(t, h1[:2000], h2[:2000])
    assert deleted.all()
    # survivors keep the no-false-negative contract
    assert cuckoo_maybe_contains_hashed(t, h1[2000:], h2[2000:]).all()


def test_kernel_bytes_are_order_independent():
    h1, h2 = _hashes(5000, 13)
    perm = np.random.default_rng(1).permutation(5000)
    a, b = cuckoo_new(1 << 11), cuckoo_new(1 << 11)
    cuckoo_insert_hashed(a, h1, h2)
    cuckoo_insert_hashed(b, h1[perm], h2[perm])
    assert _to_bytes(a) == _to_bytes(b)


def test_kernel_eviction_path_at_high_load():
    h1, h2 = _hashes(int(4096 * 0.9), 3)
    t = cuckoo_new(1 << 10)
    assert cuckoo_insert_hashed(t, h1, h2) == len(h1)
    assert cuckoo_maybe_contains_hashed(t, h1, h2).all()


def test_kernel_full_raises():
    h1, h2 = _hashes(600, 5)
    with pytest.raises(ValueError, match="full"):
        cuckoo_insert_hashed(cuckoo_new(1 << 7), h1, h2)  # 512 slots < 600 keys


# ---------------------------------------------------------------------------
# distributed


def _seen(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("https://h"), (F.col("id") % 13).cast("string"),
                 F.lit(".example.com/p/"), F.col("id").cast("string")).alias("url"),
        F.xxhash64(F.lit("h"), (F.col("id") % 13)).alias("host_hash"),
    )


def test_prefilter_matches_anti_join(spark):
    seen = _seen(spark, 0, 3000)
    cand = _seen(spark, 2000, 5000).select("url", "host_hash")
    side = cuckoo_sidecar_build(seen, n_buckets=8, m_buckets=1 << 11)
    got = dedup_against_seen_cuckoo(
        cand, seen.select("url"), side, n_buckets=8
    )
    want = cand.join(seen.select("url"), "url", "left_anti")
    assert sorted(r.url for r in got.collect()) == sorted(r.url for r in want.collect())


def test_prefilter_no_false_negatives(spark):
    """Every truly-seen candidate must land in the maybe branch."""
    seen = _seen(spark, 0, 2000)
    side = cuckoo_sidecar_build(seen, n_buckets=8, m_buckets=1 << 11)
    new, maybe = cuckoo_prefilter(seen.select("url", "host_hash"), side, n_buckets=8)
    assert new.count() == 0
    assert maybe.count() == 2000


def test_upsert_equals_full_rebuild_membership(spark):
    base = _seen(spark, 0, 1500)
    delta = _seen(spark, 1500, 2500)
    side0 = cuckoo_sidecar_build(base, n_buckets=8, m_buckets=1 << 11)
    side1 = cuckoo_sidecar_upsert(side0, delta, n_buckets=8, m_buckets=1 << 11)
    allk = _seen(spark, 0, 2500)
    new, maybe = cuckoo_prefilter(allk.select("url", "host_hash"), side1, n_buckets=8)
    assert new.count() == 0 and maybe.count() == 2500
    # per-bucket key accounting carried through the upsert
    assert (
        side1.agg(F.sum("n_keys")).collect()[0][0] == 2500
    )


def test_delete_makes_urls_readmittable(spark):
    seen = _seen(spark, 0, 2000)
    evict = seen.filter(F.xxhash64("url") % 5 == 0)
    side = cuckoo_sidecar_build(seen, n_buckets=8, m_buckets=1 << 11)
    side2 = cuckoo_sidecar_delete(side, evict, n_buckets=8)
    new, maybe = cuckoo_prefilter(
        evict.select("url", "host_hash"), side2, n_buckets=8
    )
    # evicted urls read definitely-new again (fp collisions aside: this
    # corpus has none at 16-bit fingerprints — asserted exactly)
    assert maybe.count() == 0
    assert new.count() == evict.count()
    # non-evicted urls still have no false negatives
    keep = seen.join(evict.select("url"), "url", "left_anti")
    n2, m2 = cuckoo_prefilter(keep.select("url", "host_hash"), side2, n_buckets=8)
    assert n2.count() == 0


def test_build_deterministic_across_partitioning(spark):
    seen = _seen(spark, 0, 3000)
    a = cuckoo_sidecar_build(seen.repartition(2), n_buckets=4, m_buckets=1 << 11)
    b = cuckoo_sidecar_build(seen.repartition(17), n_buckets=4, m_buckets=1 << 11)
    ra = {r.bucket: tuple(bytes(t) for t in r.tables) for r in a.collect()}
    rb = {r.bucket: tuple(bytes(t) for t in r.tables) for r in b.collect()}
    assert ra == rb


# ---------------------------------------------------------------------------
# chained growth (hot-bucket skew: the sidecar grows instead of aborting)


def test_chain_grows_past_single_table_capacity():
    from webcrawler_spark.operators.cuckoo import (
        chain_contains_hashed,
        chain_delete_hashed,
        chain_insert_hashed,
    )

    # 3000 keys into a 128-bucket (512-slot) first table: must chain
    h1, h2 = _hashes(3000, 21)
    chain = [cuckoo_new(1 << 7)]
    assert chain_insert_hashed(chain, h1, h2) == 3000
    assert len(chain) >= 2                      # grew
    assert chain[1].shape[0] == 2 * chain[0].shape[0]   # doubled
    assert chain_contains_hashed(chain, h1, h2).all()   # no false negatives
    g1, g2 = _hashes(50_000, 22)
    assert chain_contains_hashed(chain, g1, g2).mean() < 0.02
    # delete across sub-filters: every key removable exactly once
    assert chain_delete_hashed(chain, h1, h2).all()
    assert not chain_contains_hashed(chain, h1, h2).any() or \
        chain_contains_hashed(chain, h1, h2).mean() < 0.02


def test_chain_bytes_order_independent():
    from webcrawler_spark.operators.cuckoo import chain_insert_hashed, _to_bytes

    h1, h2 = _hashes(2000, 31)
    perm = np.random.default_rng(2).permutation(2000)
    a, b = [cuckoo_new(1 << 7)], [cuckoo_new(1 << 7)]
    chain_insert_hashed(a, h1, h2)
    chain_insert_hashed(b, h1[perm], h2[perm])
    assert [_to_bytes(t) for t in a] == [_to_bytes(t) for t in b]


def test_try_insert_failure_leaves_table_unchanged():
    from webcrawler_spark.operators.cuckoo import _to_bytes, cuckoo_insert_hashed

    h1, h2 = _hashes(480, 41)  # 93.75% of a 128-bucket table: fits
    t = cuckoo_new(1 << 7)
    cuckoo_insert_hashed(t, h1, h2)
    before = _to_bytes(t)
    g1, g2 = _hashes(200, 42)
    with pytest.raises(ValueError, match="full"):
        cuckoo_insert_hashed(t, g1, g2)
    # the failing insert undid its displacement path: members still present
    assert cuckoo_maybe_contains_hashed(t, h1, h2).all()
    # and nothing about the failed key's walk is left behind beyond the
    # keys that DID fit before the failure point
    assert len(_to_bytes(t)) == len(before)


def test_distributed_upsert_grows_hot_bucket(spark):
    """A hot bucket (everything hashes to few buckets) upserted past the
    base capacity chains instead of raising — the 4M-page bench failure
    mode, reproduced small."""
    base = _seen(spark, 0, 400)
    side0 = cuckoo_sidecar_build(base, n_buckets=2, m_buckets=1 << 6)
    delta = _seen(spark, 400, 1600)
    side1 = cuckoo_sidecar_upsert(side0, delta, n_buckets=2, m_buckets=1 << 6)
    rows = side1.collect()
    assert sum(r.n_keys for r in rows) == 1600
    assert any(len(r.tables) > 1 for r in rows)         # chained
    allk = _seen(spark, 0, 1600)
    new, maybe = cuckoo_prefilter(allk.select("url", "host_hash"), side1, n_buckets=2)
    assert new.count() == 0 and maybe.count() == 1600   # no false negatives


def test_chain_reinsert_missing_repairs_collateral_strips():
    """The chained-delete collision repair (ADVICE r4 low): simulate a
    collateral strip — a kept key's only copy removed by a colliding
    delete — and verify chain_reinsert_missing restores membership for
    every surviving key while leaving genuinely-deleted keys to the safe
    false-positive path."""
    import numpy as np
    from webcrawler_spark.operators.cuckoo import (
        chain_contains_hashed,
        chain_delete_hashed,
        chain_insert_hashed,
        chain_reinsert_missing,
        cuckoo_new,
    )

    rng = np.random.default_rng(11)
    h1 = rng.integers(-(2**62), 2**62, size=3000, dtype=np.int64)
    h2 = rng.integers(-(2**62), 2**62, size=3000, dtype=np.int64)
    chain = [cuckoo_new(256)]  # tiny first table: forces real chain growth
    chain_insert_hashed(chain, h1, h2)
    assert len(chain) > 1

    # delete a slice of due keys, then simulate the worst case: strip a few
    # KEPT keys' copies directly (what a fingerprint collision does)
    due = slice(0, 300)
    kept1, kept2 = h1[300:], h2[300:]
    chain_delete_hashed(chain, h1[due], h2[due])
    chain_delete_hashed(chain, kept1[:5], kept2[:5])  # the collateral strips

    assert not chain_contains_hashed(chain, kept1[:5], kept2[:5]).any()
    n_fixed = chain_reinsert_missing(chain, kept1, kept2)
    assert n_fixed >= 5
    # contract restored: every surviving key answers "maybe" again
    assert chain_contains_hashed(chain, kept1, kept2).all()
