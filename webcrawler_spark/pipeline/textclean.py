"""Corpus cleaning operators for the training-data pipeline: line-level
dedup (C4-style), PII redaction, and repetition quality signals (Gopher-style).

These are the filters that run AFTER document-level dedup in a web-text
pipeline (C4: Raffel et al. 2020 §2.2 deduplicated three-sentence spans
corpus-wide; Gopher: Rae et al. 2021 appendix A1 repetition filters). The
reference crawler stops at document extraction — these extend the engine to
the corpus-preparation ops its output feeds at 100 TB.

Scale notes:
- ``line_dedup``: the only shuffle is groupBy(line_hash) with map-side
  combine; hot-line table is bounded by ``min_df`` (lines in < min_df docs
  never leave the combiner as survivors of the filter), and the join back is
  keyed by the same hash — uniform by construction. The reassembly groupBy
  rides the doc key.
- ``pii_scrub``: pure per-row column algebra (regexp_replace /
  regexp_extract_all stay inside whole-stage codegen) — zero shuffle.
- ``repetition_stats``: one explode + two groupBys that both key on doc_id
  (Catalyst reuses the exchange); everything is bounded by tokens-per-doc.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textprep import tokens_col

# Redaction patterns: valid and identical-semantics in java.util.regex
# (Spark) and RE2 (DuckDB oracle) — no lookarounds, no backrefs, ASCII
# classes only. Order matters: emails are scrubbed before phones so the
# digit runs inside a local-part are gone before the phone pass.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"


def line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
) -> DataFrame:
    """C4-style corpus-wide line dedup: any (trimmed, non-empty) line that
    occurs in ≥ ``min_df`` distinct docs is boilerplate (nav chrome, cookie
    banners, footers) and is removed from EVERY doc.

    Returns (doc_id, n_lines, n_removed, cleaned_hash) where cleaned_hash is
    sha256 of the kept lines re-joined with newline, in original order —
    hashable evidence of exactly which text survives.
    """
    lines = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_pos", "_line"),
    ).withColumn("_norm", F.trim(F.col("_line")))
    hot = (
        lines.filter(F.col("_norm") != "")
        .groupBy(F.sha2(F.col("_norm"), 256).alias("_lh"))
        .agg(F.count_distinct("_id").alias("_df"))
        .filter(F.col("_df") >= min_df)
        .select("_lh")
    )
    marked = lines.join(
        hot.withColumn("_hot", F.lit(1)),
        F.sha2(F.col("_norm"), 256) == F.col("_lh"),
        "left",
    )
    return (
        marked.groupBy("_id")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.coalesce(F.sum("_hot"), F.lit(0)).cast("long").alias("n_removed"),
            F.sha2(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    F.col("_hot").isNull(),
                                    F.struct(F.col("_pos"), F.col("_line")),
                                )
                            )
                        ),
                        lambda s: s["_line"],
                    ),
                    "\n",
                ),
                256,
            ).alias("cleaned_hash"),
        )
        .withColumnRenamed("_id", id_col)
    )


def pii_scrub(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Redact emails, IPv4 addresses and phone numbers with typed tokens.

    Returns (doc_id, n_emails, n_ips, n_phones, scrubbed_hash): counts of
    each redaction plus sha256 of the scrubbed text. Pure codegen — the
    standard pre-training PII pass at corpus scale costs one map. Passes run
    in order (emails, then IPs, then phones) so a digit run never double-
    counts across categories."""
    t = F.col(text_col)
    s1 = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    s2 = F.regexp_replace(s1, IPV4_RE, "<IP>")
    s3 = F.regexp_replace(s2, PHONE_RE, "<PHONE>")

    def _n(src: Column, pat: str) -> Column:
        return F.size(F.regexp_extract_all(src, F.lit(pat), F.lit(0))).cast("long")

    return df.select(
        F.col(id_col),
        _n(t, EMAIL_RE).alias("n_emails"),
        _n(s1, IPV4_RE).alias("n_ips"),
        _n(s2, PHONE_RE).alias("n_phones"),
        F.sha2(s3, 256).alias("scrubbed_hash"),
    )


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = 4,
) -> DataFrame:
    """Gopher-style repetition signals, scaled ints (10^scale) for
    cross-engine hash stability:

    - dup_line_frac: 1 - distinct/total over trimmed non-empty lines
    - top_bigram_frac: occurrences of the most frequent token 2-gram over
      total 2-grams (0 when the doc has < 2 tokens)
    - dup_trigram_frac: fraction of token 3-grams occurring more than once

    Quality filters threshold on these (Gopher drops docs with
    dup_line_frac > 0.30 or top_2gram char fraction > 0.20)."""
    toks = tokens_col(F.col(text_col))
    base = df.select(
        F.col(id_col).alias("_id"),
        F.filter(
            F.transform(F.split(F.col(text_col), "\n"), lambda l: F.trim(l)),
            lambda l: l != "",
        ).alias("_lines"),
        toks.alias("_toks"),
    )
    lf = base.select(
        "_id",
        F.when(
            F.size("_lines") > 0,
            1.0 - F.size(F.array_distinct("_lines")) / F.size("_lines"),
        )
        .otherwise(F.lit(0.0))
        .alias("_dlf"),
    )

    def _grams(n: int) -> DataFrame:
        g = base.select(
            "_id",
            F.explode(
                F.expr(
                    "transform(slice(_toks, 1, greatest(size(_toks) - {m}, 0)),"
                    " (x, i) -> concat_ws(' ', slice(_toks, i + 1, {n})))".format(
                        m=n - 1, n=n
                    )
                )
            ).alias("_g"),
        )
        return g.groupBy("_id", "_g").agg(F.count("*").alias("_c"))

    g2 = _grams(2).groupBy("_id").agg(
        (F.max("_c") / F.sum("_c")).alias("_tbf")
    )
    g3 = _grams(3).groupBy("_id").agg(
        (F.sum(F.when(F.col("_c") > 1, F.col("_c")).otherwise(F.lit(0)))
         / F.sum("_c")).alias("_dtf")
    )
    sc = F.lit(10 ** scale)
    return (
        lf.join(g2, "_id", "left")
        .join(g3, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.round(F.col("_dlf") * sc).cast("long").alias("dup_line_frac"),
            F.round(F.coalesce(F.col("_tbf"), F.lit(0.0)) * sc)
            .cast("long")
            .alias("top_bigram_frac"),
            F.round(F.coalesce(F.col("_dtf"), F.lit(0.0)) * sc)
            .cast("long")
            .alias("dup_trigram_frac"),
        )
    )


def with_nfc_text(
    df: DataFrame, text_col: str = "text", out_col: str = "text_nfc"
) -> DataFrame:
    """Adds ``out_col``: Unicode NFC normalization of the text plus control-
    character removal (C0 controls except tab/newline) — the canonical first
    cleaning step for web text, where the same glyph arrives precomposed
    ('é', U+00E9) or decomposed ('e' + U+0301) and would defeat every exact
    hash/dedup downstream.

    This is the engine's text-side Arrow path: Spark has no NFC built-in, so
    normalization runs as a vectorized pandas UDF (one Arrow batch crossing,
    ``unicodedata.normalize`` per value — C-implemented, no Python-level
    per-char work). The DuckDB oracle uses ``nfc_normalize`` (utf8proc);
    both implement the same Unicode normalization standard.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(col: pd.Series) -> pd.Series:
        import re as _re
        import unicodedata

        ctrl = _re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")
        return col.map(
            lambda s: None
            if s is None
            else ctrl.sub("", unicodedata.normalize("NFC", s))
        )

    return df.withColumn(out_col, _nfc(F.col(text_col)))


def host_boilerplate(
    df: DataFrame,
    id_col: str = "doc_id",
    host_col: str = "host",
    text_col: str = "text",
    min_df: int = 2,
) -> DataFrame:
    """Site-template boilerplate removal: a (trimmed, non-empty) line is
    boilerplate iff it occurs in >= ``min_df`` distinct docs OF THE SAME
    HOST. This is the site-scoped refinement of C4's corpus-wide
    ``line_dedup``: nav chrome / cookie banners / footers repeat within a
    site, while a common English sentence repeating across UNRELATED sites
    is content and must survive (global line-dedup at a low threshold would
    nuke it — the known C4 over-trigger).

    Returns (doc_id, host, n_lines, n_removed, cleaned_hash) with
    cleaned_hash = sha256 of the kept lines re-joined in original order.

    Scale shape: identical to line_dedup except every exchange keys on
    (host, line_hash) instead of line_hash — hot-line tables are per-site
    and tiny, the join back rides the same composite key, and host adds
    entropy that breaks the one-hot-line skew a global banner would create.
    """
    lines = df.select(
        F.col(id_col).alias("_id"),
        F.col(host_col).alias("_host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_pos", "_line"),
    ).withColumn("_lh", F.sha2(F.trim(F.col("_line")), 256))
    hot = (
        lines.filter(F.trim(F.col("_line")) != "")
        .groupBy("_host", "_lh")
        .agg(F.count_distinct("_id").alias("_df"))
        .filter(F.col("_df") >= min_df)
        .select("_host", "_lh", F.lit(1).alias("_hot"))
    )
    marked = lines.join(hot, ["_host", "_lh"], "left")
    return (
        marked.groupBy("_id", "_host")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.coalesce(F.sum("_hot"), F.lit(0)).cast("long").alias("n_removed"),
            F.sha2(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    F.col("_hot").isNull(),
                                    F.struct(F.col("_pos"), F.col("_line")),
                                )
                            )
                        ),
                        lambda s: s["_line"],
                    ),
                    "\n",
                ),
                256,
            ).alias("cleaned_hash"),
        )
        .withColumnRenamed("_id", id_col)
        .withColumnRenamed("_host", host_col)
    )
