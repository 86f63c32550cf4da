"""Text-analysis operators for the training-data pipeline.

Each operator is a pure DataFrame→DataFrame function over a document table
``(doc_id, text, ...)`` built entirely from JVM-side expressions (whole-stage
codegen end to end; zero Python in the hot path → scales linearly with
executors, no shuffle except where stated).

Operators:
- ``with_token_stats``   — token count, char count, avg token length.
- ``with_quality``       — stopword ratio, punctuation ratio, a composite
  quality score (the length/punct/stopword heuristic family used by web-text
  cleaning pipelines such as C4/Gopher rules).
- ``with_lang_id``       — marker-word n-gram heuristic language ID
  (the reference carries ``language`` as a given field —
  model/WebPageContent.java:33; here we also *derive* it).
- ``with_fingerprint``   — document fingerprints: exact sha256 and a rolling
  min-shingle-hash fingerprint (winnowing-lite), both deterministic.

All per-row (narrow) transformations: no shuffle at any scale.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textprep import shingles_col, spread, tokens_col

# Marker stopwords per language for the heuristic language-ID. Deterministic
# and tiny — broadcast as literals into the plan.
LANG_MARKERS: Dict[str, List[str]] = {
    "en": ["the", "a", "and", "of", "to", "is", "in", "value", "table"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans"],
    "es": ["el", "los", "las", "es", "una", "para", "con"],
    "zh": ["de5", "shi4", "zai4", "le5", "he2"],
}

STOPWORDS: List[str] = ["the", "a", "and", "of", "to", "is", "in", "that", "it"]

PUNCT_RE = r"[.,!?;:]"


def _maybe_round(col: Column, decimals: Optional[int]) -> Column:
    """Round for human-facing output; decimals=None keeps the raw double.
    NEVER round twice (round-to-decimals then re-scale): the two engines'
    rounding of an exact-half decimal can differ — scale raw doubles once."""
    return F.round(col, decimals) if decimals is not None else col


def with_token_stats(
    df: DataFrame, text_col: str = "text", decimals: Optional[int] = 4
) -> DataFrame:
    """Adds n_tokens, n_chars_m (measured), avg_token_len (4 dp; raw double
    when decimals=None — callers that re-scale must round exactly once)."""
    toks = tokens_col(F.col(text_col))
    return (
        df.withColumn("n_tokens", F.size(toks).cast("long"))
        .withColumn("n_chars_m", F.length(F.col(text_col)).cast("long"))
        .withColumn("avg_token_len", _maybe_round(
            F.aggregate(
                toks, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double")
            )
            / F.greatest(F.size(toks), F.lit(1)).cast("double"),
            decimals,
        ))
    )


#: GPT-2-pretokenizer-style piece pattern (ASCII approximation, RE2-safe so
#: the DuckDB twin matches byte-for-byte): runs of letters, runs of digits,
#: runs of other non-space. No lookahead (RE2 lacks it) and no contraction
#: splits — those only matter for non-ASCII/apostrophe corpora.
BPE_PIECE_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+"


def with_bpe_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_bpe_tokens: the subword-tokenizer-facing piece count (what a
    BPE tokenizer's pretokenizer would emit pieces over), vs the whitespace
    n_tokens of with_token_stats. Pure codegen (regexp_extract_all + size);
    the standard budget estimator for token-count-targeted corpus mixes."""
    return df.withColumn(
        "n_bpe_tokens",
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(BPE_PIECE_RE), F.lit(0))
        ).cast("long"),
    )


def _count_in_list(toks: Column, words: Sequence[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast("long")


def with_quality(
    df: DataFrame, text_col: str = "text", decimals: Optional[int] = 4
) -> DataFrame:
    """Adds stopword_ratio, punct_ratio, quality_score ∈ [0,1] (4 dp).

    quality_score = 0.5·min(1, n_tokens/50) + 0.3·stopword_ratio·5 (capped
    at 0.3) + 0.2·(1 - min(1, punct_ratio·10)) — a deterministic instance of
    the standard length/stopword/punct web-text heuristics.
    """
    toks = tokens_col(F.col(text_col))
    n = F.greatest(F.size(toks), F.lit(1)).cast("double")
    stop = _count_in_list(toks, STOPWORDS).cast("double") / n
    tlen = F.greatest(F.length(F.col(text_col)), F.lit(1)).cast("double")
    punct = (
        tlen - F.length(F.regexp_replace(F.col(text_col), PUNCT_RE, ""))
    ).cast("double") / tlen
    score = (
        F.lit(0.5) * F.least(F.lit(1.0), F.size(toks).cast("double") / F.lit(50.0))
        + F.least(F.lit(0.3), F.lit(0.3) * stop * F.lit(5.0))
        + F.lit(0.2) * (F.lit(1.0) - F.least(F.lit(1.0), punct * F.lit(10.0)))
    )
    return (
        df.withColumn("stopword_ratio", _maybe_round(stop, decimals))
        .withColumn("punct_ratio", _maybe_round(punct, decimals))
        .withColumn("quality_score", _maybe_round(score, decimals))
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds pred_lang: arg-max marker-word hits; ties & zero-hits → 'und'.

    Deterministic tie-break: languages compared in sorted(code) order, strict
    > needed to displace the incumbent, so equal scores keep the earlier code.
    """
    df = spread(df)
    toks = tokens_col(F.col(text_col))
    best_lang: Column = F.lit("und")
    best_score: Column = F.lit(0).cast("long")
    for code in sorted(LANG_MARKERS):
        score = _count_in_list(toks, LANG_MARKERS[code])
        better = score > best_score
        best_lang = F.when(better, F.lit(code)).otherwise(best_lang)
        best_score = F.when(better, score).otherwise(best_score)
    return df.withColumn("pred_lang", best_lang).withColumn(
        "lang_score", best_score
    )


def with_fingerprint(
    df: DataFrame, text_col: str = "text", shingle_k: int = 3
) -> DataFrame:
    """Adds exact_fp = sha256(text) and rolling_fp = min over word-k-shingles
    of sha256(shingle) (a winnowing-style robust fingerprint: stable under
    local edits outside the minimal shingle)."""
    df = spread(df)
    toks = tokens_col(F.col(text_col))
    sh = shingles_col(toks, shingle_k)
    rolling = F.array_min(F.transform(sh, lambda s: F.sha2(s, 256)))
    return df.withColumn("exact_fp", F.lower(F.sha2(F.col(text_col), 256))).withColumn(
        "rolling_fp", rolling
    )


# Gopher-rule constants (Rae et al. 2021, "Scaling Language Models" §A1.1 —
# public heuristics; thresholds below are the published ones except the word
# bounds, parameterized for small test corpora).
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def with_gopher_flags(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """Adds the Gopher quality-filter rule flags plus the final ``keep``.

    Rules (each a boolean column; ``keep`` = all pass):
      ok_word_count   min_words <= n_words <= max_words
      ok_mean_len     3 <= mean word length <= 10
      ok_symbol_ratio (#hashes + #ellipses) / n_words <= 0.1
      ok_alpha_words  >= 80% of words contain an alphabetic character
      ok_stopwords    >= 2 distinct hits from the 8-word Gopher stop list

    Every flag is a pure JVM column expression over the token array — zero
    shuffle, zero Python; at 100 TB this is a narrow codegen'd filter stage
    directly over the scan. Integer-vs-double care: ratios compare as
    ``count * denom_scale <= threshold_scaled * n`` in exact integer math, so
    the flags are bit-stable and match the DuckDB oracle exactly (no float
    rounding at rule boundaries).
    """
    toks = tokens_col(F.col(text_col))
    n = F.size(toks).cast("long")
    # total word chars for mean length: 3n <= sum_len <= 10n (integer math)
    sum_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    hashes = F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col), r"#", "")
    )
    ellipses = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(r"\.\.\.|…"), F.lit(0))
    )
    symbols = (hashes + ellipses).cast("long")
    alpha_words = F.size(
        F.filter(toks, lambda t: t.rlike("[a-z]"))
    ).cast("long")
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
        )
    ).cast("long")
    return (
        df.withColumn("n_words", n)
        .withColumn(
            "ok_word_count", (n >= min_words) & (n <= max_words)
        )
        .withColumn(
            "ok_mean_len",
            (sum_len >= 3 * n) & (sum_len <= 10 * n) & (n > 0),
        )
        .withColumn("ok_symbol_ratio", symbols * 10 <= n)
        .withColumn("ok_alpha_words", alpha_words * 10 >= n * 8)
        .withColumn("ok_stopwords", stop_hits >= 2)
        .withColumn(
            "keep",
            F.col("ok_word_count")
            & F.col("ok_mean_len")
            & F.col("ok_symbol_ratio")
            & F.col("ok_alpha_words")
            & F.col("ok_stopwords"),
        )
    )


def unigram_logprob(
    df: DataFrame, key: str = "doc_id", text_col: str = "text", decimals: int = 4
) -> DataFrame:
    """Per-doc mean unigram log-probability under the corpus's own MLE
    unigram model — the CCNet-style LM quality proxy (docs far below the
    corpus mean read as boilerplate/gibberish). Returns (key, n_toks,
    avg_logp) with avg_logp = mean over tokens of ln(count(tok)/N), rounded.

    Plan: one token-keyed count aggregation, a join of the exploded corpus
    back to those counts, and a per-doc mean — two shuffles total. The count
    side is vocabulary-sized; Spark picks broadcast for small vocabularies
    and a shuffle join at web scale (both correct, AQE decides). Every token
    scores (it appeared, so count >= 1) — no smoothing term to drift between
    engines.
    """
    toks = df.select(
        F.col(key), F.explode(tokens_col(F.col(text_col))).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count("*").alias("c"))
    n_total = toks.count()
    scored = toks.join(counts, "tok").select(
        F.col(key),
        F.log(F.col("c").cast("double") / F.lit(float(n_total))).alias("lp"),
    )
    return scored.groupBy(key).agg(
        F.count("*").alias("n_toks"),
        F.round(F.avg("lp"), decimals).alias("avg_logp"),
    )


def winnow_fingerprints(
    df: DataFrame, text_col: str = "text", k: int = 5, w: int = 4
) -> DataFrame:
    """Adds ``winnow_fps``: the document's winnowing fingerprint set
    (Schleimer, Wilkerson, Aiken 2003 — the MOSS local fingerprinting
    algorithm): hash every word k-gram in order, slide a window of w hashes,
    keep each window's minimum, distinct the selections. Guarantees any
    shared token run of length >= w + k - 1 contributes at least one common
    fingerprint between two documents — the positional-locality property
    the single global-min ``rolling_fp`` (with_fingerprint) lacks.

    Docs with fewer than k tokens fingerprint their whole token join; fewer
    grams than w -> one fingerprint (the global min). Pure JVM array
    algebra over a materialized token column — zero shuffle, zero Python.
    """
    from .textprep import hash64, spread, tokens_col

    staged = spread(df).withColumn("_tk", tokens_col(F.col(text_col)))
    tk = F.col("_tk")
    # slice (not element_at) so the short-doc fallback run truncates cleanly
    # instead of raising under ANSI mode's strict array indexing
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(tk) - (k - 1), F.lit(1))),
        lambda i: hash64(F.array_join(F.slice(tk, i, k), " ")),
    )
    staged = staged.withColumn("_h", grams)
    h, m = F.col("_h"), F.size(F.col("_h"))
    mins = F.when(
        m >= w,
        F.transform(
            F.sequence(F.lit(1), m - (w - 1)),
            lambda i: F.array_min(F.slice(h, i, w)),
        ),
    ).otherwise(F.array(F.array_min(h)))
    return staged.withColumn(
        "winnow_fps", F.array_sort(F.array_distinct(mins))
    ).drop("_tk", "_h")


def bigram_logprob(
    df: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    lam_pm: int = 900,
    decimals: int = 4,
) -> DataFrame:
    """Per-doc mean interpolated bigram log-probability under the corpus's
    own counts — the step up from ``unigram_logprob`` toward the CCNet-style
    LM filter:

        p(t_i | t_{i-1}) = λ · c(t_{i-1} t_i)/c(t_{i-1}) + (1−λ) · c(t_i)/N

    with λ = lam_pm/1000 (Jelinek-Mercer interpolation; the unigram floor
    means unseen-in-context tokens still score, no zero-probability blowup).
    Docs need >= 2 tokens (no bigram otherwise). Returns
    (key, n_bigrams, avg_logp).

    Plan: one explode to (prev, cur) pairs via slice windows, bigram and
    unigram count aggregations on their natural keys, two joins back (each
    key-aligned with its count side), one per-doc mean.
    """
    from .textprep import spread, tokens_col

    staged = spread(df).withColumn("_tk", tokens_col(F.col(text_col)))
    tk = F.col("_tk")
    pairs = staged.filter(F.size(tk) >= 2).select(
        F.col(key),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(tk) - 1),
                lambda i: F.struct(
                    F.element_at(tk, i).alias("prev"),
                    F.element_at(tk, i + 1).alias("cur"),
                ),
            )
        ).alias("bg"),
    ).select(key, F.col("bg.prev").alias("prev"), F.col("bg.cur").alias("cur"))

    toks = spread(df).select(F.explode(tokens_col(F.col(text_col))).alias("tok"))
    uni = toks.groupBy("tok").agg(F.count("*").alias("c_uni"))
    n_total = toks.count()
    # c(prev) as bigram-context count = unigram count of prev EXCEPT when
    # prev ends its doc; use sum of bigram counts per prev (exact context mass)
    big = pairs.groupBy("prev", "cur").agg(F.count("*").alias("c_big"))
    ctx = big.groupBy("prev").agg(F.sum("c_big").alias("c_ctx"))

    lam = lam_pm / 1000.0
    scored = (
        pairs.join(big, ["prev", "cur"])
        .join(ctx, "prev")
        .join(uni.withColumnRenamed("tok", "cur"), "cur")
        .select(
            F.col(key),
            F.log(
                F.lit(lam) * (F.col("c_big").cast("double") / F.col("c_ctx").cast("double"))
                + F.lit(1.0 - lam) * (F.col("c_uni").cast("double") / F.lit(float(n_total)))
            ).alias("lp"),
        )
    )
    return scored.groupBy(key).agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg("lp"), decimals).alias("avg_logp"),
    )


def winnow_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 1000,
) -> DataFrame:
    """Candidate near-dup pairs from winnowing fingerprints: docs sharing at
    least ``min_shared`` fingerprints — the inverted-index join over the
    SELECTED (window-min) gram hashes, i.e. the MOSS match step. Because
    winnowing guarantees a fingerprint for every shared >= w+k-1-token run,
    this finds positional plagiarism/boilerplate that whole-doc MinHash
    dilutes away on long documents.

    Same scale guards as the other pair generators: fingerprints appearing
    in more than ``max_df`` docs are dropped as boilerplate stop-prints
    (audit separately) before the self-join, so no fingerprint fans out
    quadratically. Returns (a, b, n_shared >= min_shared), a < b."""
    from pyspark.sql import Window

    # Lazy checkpoint BEFORE the explode, for two reasons:
    # (1) explode lets the optimizer inline the _h gram-hash array into the
    #     window-min lambda, which then RE-HASHES every gram per window —
    #     O(grams^2 * k) sha256 per doc (measured 22s vs 0.2s at sf0.01);
    #     the checkpoint's RDD boundary pins _h as a materialized column.
    # (2) the plan below references the fingerprints three times (df-cap +
    #     both self-join sides); the checkpoint evaluates the subtree once.
    arrays = (
        winnow_fingerprints(df, text_col, k, w)
        .select(F.col(id_col).alias("id"), "winnow_fps")
        .localCheckpoint(eager=False)
    )
    fps = arrays.select("id", F.explode("winnow_fps").alias("fp"))
    pruned = (
        fps.withColumn("_df", F.count("*").over(Window.partitionBy("fp")))
        .filter(F.col("_df") <= max_df)
        .drop("_df")
    )
    pairs = (
        pruned.alias("l")
        .join(pruned.alias("r"), "fp")
        .filter(F.col("l.id") < F.col("r.id"))
        .groupBy(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return pairs


def char_entropy(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    decimals: int = 4,
) -> DataFrame:
    """Character-level Shannon entropy per document (bits/char) — the
    poor-man's compression-ratio quality signal: machine-generated spam
    (keyword stuffing, repeated templates) sits well below natural prose
    (~4.0-4.5 bits/char for English), binary-ish noise well above. CCNet
    uses LM perplexity for this; entropy is its model-free floor and costs
    one narrow map.

    Returns (id, n_chars, distinct_chars, entropy_bits). Zero-shuffle:
    everything is per-row array algebra. Cross-engine determinism: the sum
    runs in SORTED distinct-character order (run-length pass over the sorted
    character array, the same fixed order the DuckDB twin uses), and the
    result is rounded to ``decimals``.

    Single pass (ADVICE r3): the former form re-scanned the full character
    array once per DISTINCT character — O(distinct × n) per row, ~1e8
    comparisons for a large CJK page. Here the chars are sorted once and one
    ``aggregate`` walks them counting run lengths, emitting each run's
    -p·log2(p) term when the character changes: O(n log n) total, and the
    terms still accumulate in sorted-character order, so the float sum is
    bit-identical to the old form and to the oracle.
    """
    chars = F.filter(F.split(F.col(text_col), ""), lambda c: c != "")
    schars = F.array_sort(chars)
    uniq = F.array_distinct(schars)
    n = F.size(chars)

    def _term(run: Column) -> Column:
        p = run.cast("double") / n.cast("double")
        return F.when(run > 0, -p * F.log2(p)).otherwise(F.lit(0.0))

    def _step(s: Column, c: Column) -> Column:
        return F.when(
            c == s["prev"],
            F.struct(
                s["prev"].alias("prev"),
                (s["run"] + 1).alias("run"),
                s["acc"].alias("acc"),
            ),
        ).otherwise(
            F.struct(
                c.alias("prev"),
                F.lit(1).cast("long").alias("run"),
                (s["acc"] + _term(s["run"])).alias("acc"),
            )
        )

    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0.0).alias("acc"),
    )
    ent = F.aggregate(schars, init, _step, lambda s: s["acc"] + _term(s["run"]))
    return spread(df).select(
        F.col(id_col),
        n.cast("long").alias("n_chars"),
        F.size(uniq).cast("long").alias("distinct_chars"),
        F.when(n > 0, F.round(ent, decimals)).otherwise(0.0).alias("entropy_bits"),
    )


def domain_quality_priors(
    df: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    low_doc_e4: int = 7000,
    low_mean_e4: int = 6700,
    good_mean_e4: int = 7100,
) -> DataFrame:
    """Per-registrable-domain quality priors — the domain-level filtering
    signal web curations actually apply before any per-document model
    (RefinedWeb/CCNet drop or downweight whole domains; crawl frontiers
    reuse the same prior to spend budget on domains that historically yield
    keepable text). Aggregates the per-doc heuristic quality score
    (:func:`with_quality`) per registrable domain
    (functions.registrable_domain — subdomains fall with their registrant):

    Returns (domain, n_docs, sum_quality_e4, mean_quality_e4, low_pm,
    tier): mean is the integer e4 mean (sum div n), ``low_pm`` the
    per-mille share of docs scoring under ``low_doc_e4``, and ``tier``
    GOOD / MIXED / LOW by integer thresholds on the mean — every number is
    integral, so the output is bit-stable across engines and retries.

    Scale: one narrow per-row score map (zero shuffle) + ONE domain-keyed
    aggregate with map-side combine; domains are the web's small dimension
    (~10^7) so the result is broadcast-joinable back onto a frontier as an
    admission prior.
    """
    from ..functions import registrable_domain

    scored = with_quality(df, text_col=text_col, decimals=None)
    e4 = F.round(F.col("quality_score") * 10000).cast("long")
    keyed = scored.select(
        registrable_domain(F.lower(F.col(host_col))).alias("domain"),
        e4.alias("_e4"),
    )
    agg = keyed.groupBy("domain").agg(
        F.count("*").alias("n_docs"),
        F.sum("_e4").alias("sum_quality_e4"),
        F.sum((F.col("_e4") < int(low_doc_e4)).cast("long")).alias("_n_low"),
    )
    mean = F.expr("sum_quality_e4 div n_docs")
    tier = (
        F.when(mean >= int(good_mean_e4), F.lit("GOOD"))
        .when(mean >= int(low_mean_e4), F.lit("MIXED"))
        .otherwise(F.lit("LOW"))
    )
    return agg.select(
        "domain",
        "n_docs",
        "sum_quality_e4",
        mean.alias("mean_quality_e4"),
        F.expr("(1000 * _n_low) div n_docs").alias("low_pm"),
        tier.alias("tier"),
    )
