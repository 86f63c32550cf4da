"""Corpus deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

All operators take a document DataFrame ``(id_col, text_col)`` (or
``(id_col, vec_col)``) and return either per-doc signatures or candidate
duplicate **pairs** ``(a, b)`` with ``a < b``.

Scale notes (the 100 TB story — each operator states its shuffle shape):

- ``exact_duplicates``: one hash-partitioned shuffle on the 64-hex digest —
  map-side combine applies, uniform key distribution by construction (sha256),
  no skew possible. The classic first-pass dedup.
- ``minhash_lsh_pairs``: signatures are a narrow projection (no shuffle);
  the *only* shuffle is groupBy(band, band_key), whose fan-in per bucket is
  the near-dup cluster size — the whole point of banding is that the O(n²)
  pair space never materializes. Bucket-size cap guards pathological clusters
  (e.g. boilerplate pages) from quadratic pair blow-up inside one bucket.
- ``simhash_pairs``: per-doc 64-bit signature via one token explode +
  conditional aggregation (single shuffle with combiners); candidate pairing
  blocks on four 16-bit bands (65,536 block values per band — the standard
  SimHash blocking config, so a band block holds ~n/65536 docs instead of the
  n/256 a narrower band would) with a ``max_block`` cap that drops
  pathological blocks (boilerplate clusters) before they go quadratic;
  ``simhash_dropped_blocks`` reports what the cap dropped.
- ``ngram_jaccard_pairs``: exact Jaccard via shingle-inverted-index self-join;
  shuffle keyed by shingle. Hot shingles (boilerplate) are dropped by a
  document-frequency cap — the standard "stop-shingle" guard that keeps the
  join output linear-ish at corpus scale.
- ``embedding_near_dupes``: exact cosine over LSH-bucketed candidates (random
  hyperplane signs, 65,536 buckets at the default 16 planes, ``max_bucket``
  cap on degenerate clusters) — avoids the O(n²) cross join; brute-force
  variant lives in ``similarity.cosine_topk``.

Everything is built-in expressions: value-for-value DuckDB-oracle-checkable.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textprep import cosine_sim, hash64, hash64_hi, shingles_col, spread, tokens_col

# 64-bit signature (the standard SimHash width): bits 0-59 come from hash64
# (sha256 hex chars 1-15), bits 60-63 from hash64_hi (chars 16-30 of the SAME
# digest) — full 64 bits without a second sha256 evaluation, and every bit is
# reproducible in ANSI SQL for the DuckDB oracle.
SIMHASH_BITS = 64
SIMHASH_LO_BITS = 60  # bits below this index read hash64; the rest hash64_hi


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Groups of byte-identical texts: (text_hash, n_dups, keep_id, dup_ids).

    keep_id = min id (deterministic canonical representative); only groups
    with n_dups > 1 are returned. Single shuffle on sha256(text).
    """
    h = F.lower(F.sha2(F.col(text_col), 256)).alias("text_hash")
    return (
        df.select(h, F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.count("*").cast("long").alias("n_dups"),
            F.min(id_col).alias("keep_id"),
            F.array_sort(F.collect_list(id_col)).alias("dup_ids"),
        )
        .filter(F.col("n_dups") > 1)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """(id, mh_0..mh_{n-1}): n_hashes MinHash coordinates over word-k-shingles.

    Each coordinate is the lexicographic min of sha256(seed:shingle) over the
    doc's shingles. Implemented as explode(shingles) + groupBy(id).agg(min…):
    sha2/min stay inside whole-stage codegen (the nested higher-order-function
    alternative compiles a pathologically large janino method and evaluates
    interpreted), and map-side combine collapses the shuffle to one row per
    doc per map partition — each doc lives in exactly one input partition, so
    shuffle volume is n_docs rows regardless of shingle count.
    """
    toks = tokens_col(F.col(text_col))
    sh = spread(df).select(
        F.col(id_col), F.explode(shingles_col(toks, shingle_k)).alias("_s")
    )
    aggs = [
        F.min(F.sha2(F.concat(F.lit(f"{i}:"), F.col("_s")), 256)).alias(f"mh_{i}")
        for i in range(n_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
    max_bucket: int = 1000,
) -> DataFrame:
    """Candidate near-dup pairs (a, b, n_bands) via banded MinHash-LSH.

    rows-per-band = n_hashes // bands; a pair is a candidate if any band's
    concatenated minhashes collide. Buckets larger than ``max_bucket`` are
    dropped (boilerplate guard). Output distinct pairs with band-collision
    count (a crude similarity proxy), a < b.
    """
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n_hashes, shingle_k)
    # one evaluation of the (expensive) signature projection, exploded into
    # band rows — a union of per-band selects would recompute it ``bands``×
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "|",
                    *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)],
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    exploded = sig.select(
        F.col(id_col).alias("id"), F.explode(band_structs).alias("bk")
    ).select(F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"), "id")

    buckets = (
        exploded.groupBy("band", "band_key")
        .agg(F.array_sort(F.collect_list("id")).alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= max_bucket))
    )
    # all in-bucket ordered pairs (i < j) via double explode over the sorted list
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ids"),
                    lambda a, i: F.transform(
                        F.slice(F.col("ids"), i + 2, F.size("ids")), lambda b: F.struct(
                            a.alias("a"), b.alias("b")
                        )
                    ),
                )
            )
        ).alias("p")
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    return pairs.groupBy("a", "b").agg(F.count("*").cast("long").alias("n_bands"))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, simhash): 64-bit SimHash over whitespace tokens.

    bit j of simhash = 1 iff Σ_tokens (±1 by bit j of the token hash) > 0;
    bits 0-59 read hash64(token), bits 60-63 read hash64_hi(token) (same
    sha256 digest, no extra hashing). Bit 63 contributes the two's-complement
    sign value so the signature is a plain signed int64 in both engines.
    One explode + one groupBy(id) with 64 conditional sums (combiners apply).
    """
    toks = tokens_col(F.col(text_col))
    tok = (
        spread(df).select(F.col(id_col), F.explode(toks).alias("tok"))
        .withColumn("h", hash64(F.col("tok")))
        .withColumn("h2", hash64_hi(F.col("tok")))
    )

    def bit(j: int) -> Column:
        if j < SIMHASH_LO_BITS:
            return F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1))
        return F.shiftright(F.col("h2"), j - SIMHASH_LO_BITS).bitwiseAND(F.lit(1))

    # branch-free ±1: bit ∈ {0,1} so 2*bit - 1 is exactly the signed vote.
    # The equivalent when(bit==1, 1).otherwise(-1) measures 2.5x slower in
    # the 64-way hash aggregate (branchy codegen per lane per row).
    aggs = [
        F.sum(bit(j) * 2 - 1).alias(f"s_{j}") for j in range(SIMHASH_BITS)
    ]
    summed = tok.groupBy(id_col).agg(*aggs)
    sim: Column = F.lit(0).cast("long")
    for j in range(SIMHASH_BITS):
        # bit 63 = -(2^63) in two's complement; the bit values are disjoint so
        # plain addition assembles the signed signature exactly. Branch-free:
        # (s_j > 0) casts to {0,1}.
        bitval = -(1 << 63) if j == 63 else (1 << j)
        sim = sim + (F.col(f"s_{j}") > 0).cast("long") * F.lit(bitval).cast("long")
    return summed.select(F.col(id_col), sim.alias("simhash"))


def _simhash_band_rows(
    df: DataFrame, id_col: str, text_col: str, n_bands: int
) -> DataFrame:
    """(id, simhash, band, blk): the signature exploded into band rows, one
    evaluation of the (expensive) signature aggregation. blk is the band's
    16-bit slice (arithmetic shift + mask — identical in Spark and DuckDB)."""
    sig = simhash_signatures(df, id_col, text_col)
    band_bits = SIMHASH_BITS // n_bands
    mask = (1 << band_bits) - 1
    band_structs = F.array(
        *[
            F.struct(
                F.lit(k).alias("band"),
                F.shiftright(F.col("simhash"), k * band_bits)
                .bitwiseAND(F.lit(mask))
                .alias("blk"),
            )
            for k in range(n_bands)
        ]
    )
    return sig.select(
        F.col(id_col).alias("id"), F.col("simhash"), F.explode(band_structs).alias("bb")
    ).select("id", "simhash", F.col("bb.band").alias("band"), F.col("bb.blk").alias("blk"))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_bands: int = 4,
    max_block: int = 2000,
) -> DataFrame:
    """Near-dup pairs (a, b, hamming ≤ max_hamming) via band blocking.

    Signature split into ``n_bands`` contiguous bands (16 bits each at the
    default 64/4 → 65,536 block values per band); pigeonhole guarantees any
    pair with hamming < n_bands shares at least one identical band, so
    candidate generation is lossless for max_hamming ≤ n_bands − 1 and
    recall-trading above that (standard SimHash practice: block on bands,
    verify exact Hamming on candidates).

    Scale: in-block pairing is quadratic in block size, so blocks larger than
    ``max_block`` are dropped outright (boilerplate guard — the same cap
    ``minhash_lsh_pairs`` applies); audit what was dropped with
    ``simhash_dropped_blocks``. Block membership is collected per (band, blk)
    — bounded by the cap — and pairs explode from the sorted member list, so
    the O(n²) pair space never materializes outside a block.
    """
    blocks = _simhash_band_rows(df, id_col, text_col, n_bands)
    buckets = (
        blocks.groupBy("band", "blk")
        .agg(F.array_sort(F.collect_list(F.struct("id", "simhash"))).alias("ms"))
        .filter((F.size("ms") > 1) & (F.size("ms") <= max_block))
    )
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ms"),
                    lambda a, i: F.transform(
                        F.slice(F.col("ms"), i + 2, F.size("ms")),
                        lambda b: F.struct(
                            a["id"].alias("a"),
                            b["id"].alias("b"),
                            a["simhash"].alias("sa"),
                            b["simhash"].alias("sb"),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.a", "p.b", "p.sa", "p.sb")
    # dedup pairs sharing several bands BEFORE scoring: distinct is the same
    # shuffle either way, the XOR/bit_count moves to once per unique pair
    return (
        pairs.distinct()
        .select(
            "a",
            "b",
            F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_dropped_blocks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bands: int = 4,
    max_block: int = 2000,
) -> DataFrame:
    """(band, blk, n_ids) for blocks the ``max_block`` cap silently drops from
    ``simhash_pairs`` — run/log this beside a production dedup pass so capped
    coverage is visible instead of silent (a dropped block is usually a
    boilerplate cluster worth exact-dedup'ing separately)."""
    return (
        _simhash_band_rows(df, id_col, text_col, n_bands)
        .groupBy("band", "blk")
        .agg(F.count("*").cast("long").alias("n_ids"))
        .filter(F.col("n_ids") > max_block)
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.5,
    max_df: Optional[int] = 1000,
    decimals: Optional[int] = 4,
) -> DataFrame:
    """Exact Jaccard-similar pairs (a, b, jaccard ≥ threshold) via a
    shingle inverted index: explode distinct shingles, drop shingles whose
    document frequency exceeds ``max_df`` (stop-shingle guard), self-join on
    shingle, count intersections, compute |A∪B| = |A|+|B|−|A∩B|.
    """
    toks = tokens_col(F.col(text_col))
    sh = spread(df).select(
        F.col(id_col).alias("id"), F.explode(shingles_col(toks, shingle_k)).alias("s")
    )
    sizes = sh.groupBy("id").agg(F.count("*").cast("long").alias("sz"))
    if max_df is not None:
        keep = sh.groupBy("s").count().filter(F.col("count") <= max_df).select("s")
        sh = sh.join(keep, "s", "inner")
    inter = (
        sh.alias("l")
        .join(sh.alias("r"), (F.col("l.s") == F.col("r.s")) & (F.col("l.id") < F.col("r.id")))
        .groupBy(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .agg(F.count("*").cast("long").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "a").withColumnRenamed("sz", "sza"), "a")
        .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("sz", "szb"), "b")
        .withColumn(
            "_jac_raw",
            F.col("inter").cast("double")
            / (F.col("sza") + F.col("szb") - F.col("inter")).cast("double"),
        )
        .filter(F.col("_jac_raw") >= threshold)  # threshold on RAW (engine-stable)
        .withColumn(
            "jaccard",
            F.round(F.col("_jac_raw"), decimals) if decimals is not None else F.col("_jac_raw"),
        )
        .select("a", "b", "jaccard")
    )
    return out


# ---------------------------------------------------------------------------
# Embedding cosine near-dup (LSH-bucketed)
# ---------------------------------------------------------------------------

def _plane_coef(p: int, i: int) -> float:
    """Deterministic pseudo-random hyperplane coefficient:
    (hash64('p:i') % 2001 − 1000)/1000 with hash64 = int64 of the first 15
    hex chars of sha256 — the exact Python twin of textprep.hash64, kept in
    lockstep with the DuckDB oracle's SQL formula."""
    import hashlib

    h = int(hashlib.sha256(f"{p}:{i}".encode()).hexdigest()[:15], 16)
    return (h % 2001 - 1000) / 1000.0


def _embedding_sketches(
    df: DataFrame, id_col: str, vec_col: str, n_planes: int, dim: int
) -> DataFrame:
    """(id, v, sk): sign-bit hyperplane sketch per vector. Hyperplanes are
    deterministic pseudo-random: coef(p, i) = (hash64('p:i') % 2001 − 1000)/1000
    — reproducible bit-for-bit in the DuckDB oracle.

    The coefficients are row-independent constants, so they are computed
    ONCE on the driver (`_plane_coef`) and embedded as literal arrays — the
    original in-plan formulation re-evaluated n_planes × dim sha256 calls
    per ROW (1024/row at 16 planes × 64 dims), pure waste at corpus scale.
    Bit p is branch-free: (dot > 0) casts to {0,1}."""

    def plane_dot(vec: Column, p: int) -> Column:
        vd = F.transform(vec, lambda x: x.cast("double"))
        coef = F.array(*[F.lit(_plane_coef(p, i)) for i in range(dim)])
        return F.aggregate(
            F.zip_with(vd, coef, lambda x, c: x * c), F.lit(0.0), lambda a, x: a + x
        )

    sketch: Column = F.lit(0)
    for p in range(n_planes):
        sketch = sketch + (plane_dot(F.col(vec_col), p) > 0).cast("int") * F.lit(
            1 << p
        )
    return df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), sketch.alias("sk")
    )


def embedding_near_dupes(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 16,
    dim: int = 64,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-duplicate vector pairs (a, b, cos ≥ threshold) via random-
    hyperplane LSH: sign-bit sketch over ``n_planes`` deterministic pseudo-
    random hyperplanes (hash64-derived coefficients), bucket on the sketch,
    exact cosine within buckets only. High-cosine pairs collide with
    probability (1 − θ/π)^n_planes — the scale path vs the O(n²) cross join.

    Scale: 16 planes → 65,536 sketch buckets (8 planes' 256 buckets would put
    ~n/256 vectors in every bucket and make the in-bucket exact cosine
    quadratic at corpus scale), and buckets larger than ``max_bucket`` are
    dropped before pairing (a giant bucket means a degenerate embedding
    cluster — exact-dedup it separately); audit the drops with
    ``embedding_dropped_buckets``. Identical vectors always share the full
    sketch, so exact duplicates survive any plane count.
    """
    sk = _embedding_sketches(df, id_col, vec_col, n_planes, dim)
    keep = (
        sk.groupBy("sk")
        .agg(F.count("*").alias("_n"))
        .filter((F.col("_n") > 1) & (F.col("_n") <= max_bucket))
        .select("sk")
    )
    skk = sk.join(keep, "sk", "inner")
    pairs = (
        skk.alias("l")
        .join(skk.alias("r"), (F.col("l.sk") == F.col("r.sk")) & (F.col("l.id") < F.col("r.id")))
        .select(
            F.col("l.id").alias("a"),
            F.col("r.id").alias("b"),
            cosine_sim(F.col("l.v"), F.col("r.v")).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
    return pairs


def embedding_dropped_buckets(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    dim: int = 64,
    max_bucket: int = 1000,
) -> DataFrame:
    """(sk, n_ids) for sketch buckets the ``max_bucket`` cap drops from
    ``embedding_near_dupes`` — surface capped coverage instead of hiding it."""
    return (
        _embedding_sketches(df, id_col, vec_col, n_planes, dim)
        .groupBy("sk")
        .agg(F.count("*").cast("long").alias("n_ids"))
        .filter(F.col("n_ids") > max_bucket)
    )


# ---------------------------------------------------------------------------
# Connected components: near-dup pairs -> dedup clusters
# ---------------------------------------------------------------------------

def connected_components(
    edges: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iters: int = 50,
) -> DataFrame:
    """Cluster labels (id, cluster) for the undirected graph given as a pair
    list — the last stage of a near-dup pipeline: candidate pairs from
    LSH/SimHash/Jaccard become duplicate CLUSTERS, one keeper per cluster.

    Algorithm: alternating large-star / small-star (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14) — the shuffle-bounded
    formulation that converges in O(log n) rounds even on path graphs, unlike
    naive min-label flooding whose round count is the cluster DIAMETER (a
    chain of near-dups at corpus scale would need thousands of rounds).
    Each round is two groupBy-shuffles keyed by node id; edge multiplicity is
    deduped per round, so the working set only shrinks. Iteration state is
    pinned with localCheckpoint per round (plan growth would otherwise be
    exponential in rounds).

    Returns one row per node that appears in ``edges``: (id, cluster) with
    cluster = min node id of the component. Raises if ``max_iters`` rounds do
    not converge (never observed: 2 rounds suffice for clique-ish dup
    clusters, O(log n) worst case).
    """
    e = (
        edges.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = e.select("u").union(e.select("v")).distinct().withColumnRenamed("u", "id")

    def _checksum(df: DataFrame):
        r = df.agg(
            F.count("*").alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
        ).collect()[0]
        return (r["n"], r["h"])

    prev = _checksum(e)
    for _ in range(max_iters):
        # large-star: every neighbor v > u links to m = min(N(u) + {u})
        nbrs = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = nbrs.groupBy("u").agg(
            F.least(F.first("u"), F.min("v")).alias("m")
        )
        e = (
            nbrs.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: orient (max -> min); u and all small neighbors link to m
        o = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        mins = o.groupBy("u").agg(F.min("v").alias("m"))
        small = o.join(mins, "u").select(F.col("v").alias("u"), F.col("m").alias("v"))
        selfe = mins.select(F.col("u"), F.col("m").alias("v"))
        e = (
            small.union(selfe)
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        cur = _checksum(e)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"connected_components: no convergence in {max_iters} rounds")

    # converged edge set is a star per component: member -> root(min). The
    # root's own label is itself (its neighbors are all larger).
    lab = e.groupBy("u").agg(F.min("v").alias("cluster")).withColumnRenamed("u", "id")
    return (
        nodes.join(lab, "id", "left")
        .select("id", F.coalesce(F.col("cluster"), F.col("id")).alias("cluster"))
    )


def dedup_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-dup clusters over MinHash-LSH candidate pairs: one row per member
    doc, (doc_id, cluster, cluster_size, keep) — ``keep`` marks the canonical
    representative (min doc id), everything else is the delete set. The
    composition a real training-data dedup ends with: pairs alone double-count
    (a~b, b~c is ONE group of three, not two pairs)."""
    pairs = minhash_lsh_pairs(
        df, id_col, text_col,
        n_hashes=n_hashes, bands=bands, shingle_k=shingle_k, max_bucket=max_bucket,
    )
    cc = connected_components(pairs, "a", "b")
    sizes = cc.groupBy("cluster").agg(F.count("*").cast("long").alias("cluster_size"))
    return (
        cc.join(sizes, "cluster")
        .select(
            F.col("id").alias(id_col),
            "cluster",
            "cluster_size",
            (F.col("id") == F.col("cluster")).alias("keep"),
        )
    )


def dup_span_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 16,
    decimals: int = 4,
) -> DataFrame:
    """Exact substring-duplication signal per document: the fraction of a
    doc's word n-grams (default n=16) that also occur in at least one OTHER
    document. This is the shuffle-friendly stand-in for suffix-array exact
    substring dedup (Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better"): a high dup_ratio marks boilerplate or
    copied spans even when the whole doc isn't a near-duplicate.

    Returns (id, n_grams, n_dup_grams, dup_ratio); docs with fewer than n
    tokens have no n-grams and are absent.

    Plan shape at 100 TB: one explode of distinct hashed grams (slim
    (id, gram) rows), one gram-keyed count aggregation with map-side
    combine, a join back on the gram key, and a per-doc aggregate — two
    shuffles on the gram key plus one on the doc key; no window, no
    all-pairs. The gram-count relation is vocabulary-like (heavy-tailed but
    bounded by corpus gram mass); AQE handles the join strategy and skew.
    """
    from .decontam import ngram_hashes_from_tokens
    from .textprep import spread, tokens_col

    grams = spread(df).select(
        F.col(id_col), tokens_col(F.col(text_col)).alias("_tk")
    ).select(
        F.col(id_col),
        F.explode(ngram_hashes_from_tokens(F.col("_tk"), n)).alias("g"),
    )
    counts = grams.groupBy("g").agg(F.count("*").alias("_docs"))
    return (
        grams.join(counts, "g")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum((F.col("_docs") >= 2).cast("long")).alias("n_dup_grams"),
        )
        .withColumn(
            "dup_ratio",
            F.round(F.col("n_dup_grams") / F.col("n_grams"), decimals),
        )
    )


def embedding_dup_clusters(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 16,
    dim: int = 64,
    max_bucket: int = 1000,
) -> DataFrame:
    """Embedding near-dup CLUSTERS: hyperplane-LSH candidate pairs closed
    under transitivity via large-star/small-star connected components — the
    embedding-space twin of ``dedup_clusters``. One row per member vector:
    (id, cluster, cluster_size, keep) with keep = canonical min-id member.
    Same scale shape as the parts: banded sketch join with a bucket cap,
    then O(log n) CC rounds of node-keyed shuffles."""
    pairs = embedding_near_dupes(
        df, id_col=id_col, vec_col=vec_col, threshold=threshold,
        n_planes=n_planes, dim=dim, max_bucket=max_bucket,
    )
    cc = connected_components(pairs, "a", "b")
    sizes = cc.groupBy("cluster").agg(F.count("*").cast("long").alias("cluster_size"))
    return (
        cc.join(sizes, "cluster")
        .select(
            F.col("id").alias(id_col),
            "cluster",
            "cluster_size",
            (F.col("id") == F.col("cluster")).alias("keep"),
        )
    )


def select_canonical(
    members: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster",
    score_col: str = "score",
) -> DataFrame:
    """Quality-aware canonical selection: given duplicate-cluster membership
    (``members``: one row per doc with its cluster label, e.g. from
    ``dedup_clusters``/``embedding_dup_clusters``) and a per-doc quality
    score (``scores``), keep the HIGHEST-scoring member of every cluster
    (tie-break: min doc id). ``dedup_clusters``' built-in keep = min-id is
    the right default when members are byte-identical; when they differ
    (truncated mirrors, boilerplate-wrapped syndications, re-crawls), a
    training pipeline wants the best COPY, not the first id — keep the one
    with the highest quality/completeness score and delete the rest.

    Returns (id, cluster, cluster_size, score, keep).

    Plan shape at 100 TB: one id-keyed join (scores is usually a projection
    of the doc table — AQE picks broadcast when the clustered slice is
    small), one cluster-keyed aggregate producing a winners relation of
    |clusters| rows, and a cluster-keyed join back. The winners join is NOT
    force-broadcast: |clusters| can be corpus-scale when dup rate is high,
    so the strategy is left to AQE's size estimate (same byte-gating policy
    as the crawl path's broadcasts).
    """
    j = members.select(F.col(id_col), F.col(cluster_col)).join(
        scores.select(F.col(id_col), F.col(score_col)), id_col
    )
    # min(struct(-score, id)) = argmax score with min-id tie-break, as one
    # combiner-friendly aggregate (no per-cluster window).
    best = j.groupBy(cluster_col).agg(
        F.count("*").cast("long").alias("cluster_size"),
        F.min(
            F.struct(
                (-F.col(score_col)).alias("_ns"), F.col(id_col).alias("_id")
            )
        ).alias("_b"),
    )
    return (
        j.join(best, cluster_col)
        .select(
            F.col(id_col),
            F.col(cluster_col),
            F.col("cluster_size"),
            F.col(score_col),
            (F.col(id_col) == F.col("_b._id")).alias("keep"),
        )
    )
