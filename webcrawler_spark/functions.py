"""JVM-side column expressions for the engine's derived fields.

Each helper is the Spark built-in twin of a kernel function, so the hot path
stays inside whole-stage codegen (SURVEY §2.5 mappings):

- content_hash / content_hash_segments — sha2 over url + NUL + contents
  (model/WebPageContent.java:213-255); byte-identical to kernel.hashing.
- content_length_col — Σ char length of segments (:196-206).
- host_hash_col — first 15 hex chars of sha256(host) as int64; identical to
  kernel.hashing.host_hash.
- remove_html_tags_col — regexp_replace '<[^>]*>' (util/CrawlerUtils.java:13-18).
- accepted_by_filters — include/exclude rlike predicate with Java-regex find()
  semantics (service/CrawlerService.java:210-220); excludes take precedence.
"""

from __future__ import annotations

from functools import reduce
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NUL = "\x00"
UNIT_SEP = "\u001f"


def content_hash(url: Column, content: Column) -> Column:
    """sha2(url + '\\0' + content), nulls as empty (WebPageContent.java:213-225)."""
    return F.lower(
        F.sha2(
            F.concat(
                F.coalesce(url, F.lit("")), F.lit(NUL), F.coalesce(content, F.lit(""))
            ),
            256,
        )
    )


def content_hash_segments(url: Column, contents: Column) -> Column:
    """sha2 over url + '\\0' + join(contents, US) with null segments as ''
    (WebPageContent.java:232-255). array_join needs an explicit
    nullReplacement or it silently drops nulls (SURVEY §2.5 H2 caveat)."""
    joined = F.when(contents.isNull(), F.lit("")).otherwise(
        F.array_join(contents, UNIT_SEP, "")
    )
    return F.lower(
        F.sha2(F.concat(F.coalesce(url, F.lit("")), F.lit(NUL), joined), 256)
    )


def content_length_col(contents: Column) -> Column:
    """Σ length(segment), null segments 0 (WebPageContent.java:196-206)."""
    return F.when(contents.isNull(), F.lit(0).cast("long")).otherwise(
        F.aggregate(
            contents,
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.length(F.coalesce(x, F.lit(""))),
        )
    )


def host_hash_col(host: Column) -> Column:
    """int64 from the first 15 hex chars of sha256(host); 0 for null host.
    Matches kernel.hashing.host_hash exactly."""
    return F.when(host.isNull(), F.lit(0).cast("long")).otherwise(
        F.conv(F.substring(F.sha2(host, 256), 1, 15), 16, 10).cast("long")
    )


def remove_html_tags_col(col: Column) -> Column:
    return F.regexp_replace(col, "<[^>]*>", "")


def doc_id_col(url: Column) -> Column:
    """Deterministic doc id = sha256(canonical url) (reference README design,
    'id: SHA-256 of canonical URL'; SURVEY §2.3 P6)."""
    return F.lower(F.sha2(url, 256))


def accepted_by_filters(
    url: Column,
    includes: Optional[Sequence[str]],
    excludes: Optional[Sequence[str]],
) -> Column:
    """CrawlerService.isAcceptedByFilters as a JVM-side predicate.

    ``rlike`` is java.util.regex with Matcher.find() substring semantics —
    the same engine and dialect the reference compiles (SURVEY §2.2 T4).
    Blank patterns are skipped like compilePatterns (:196-208).
    """
    includes = [p for p in (includes or []) if p is not None and p.strip() != ""]
    excludes = [p for p in (excludes or []) if p is not None and p.strip() != ""]
    cond = F.lit(True)
    for p in excludes:
        cond = cond & ~url.rlike(p)
    if includes:
        inc = reduce(lambda a, b: a | b, [url.rlike(p) for p in includes])
        cond = cond & inc
    return cond


def parse_host(url: Column) -> Column:
    """parse_url(url, 'HOST') — exact equivalent of URI.getHost for the
    well-formed URLs the engine emits (WebPageProcessor.java:230-236)."""
    return F.parse_url(url, F.lit("HOST"))


# query-parameter canonicalization: tracking params the ad/analytics
# ecosystem appends that never change page identity. Public, stable list
# (utm_* per Google Analytics docs; click ids per the respective platforms).
TRACKING_PARAM_RE = r"^(utm_[a-z]+|fbclid|gclid|msclkid|mc_eid|igshid|ref_src)="


def canonicalize_tracking(url: Column) -> Column:
    """Dedup-strengthening URL canonicalization BEYOND the reference's T3
    normalizer (which keeps the query verbatim, `CrawlerService.java:222-260`
    — this op is therefore a separate pipeline pass, never part of the
    reference-parity crawl path): drop known tracking parameters and sort
    the surviving query params byte-wise, so `?b=2&a=1&utm_source=x` and
    `?a=1&b=2` collapse to one seen-set key.

    Pure JVM column algebra (split / filter / array_sort / rejoin) — a
    narrow map suited to the frontier's hot path. Fragments are assumed
    already stripped (T3 runs first)."""
    base = F.substring_index(url, "?", 1)
    qs = F.regexp_extract(url, r"\?(.*)$", 1)
    kept = F.array_sort(
        F.filter(
            F.split(qs, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    return F.when(
        F.size(kept) > 0, F.concat(base, F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(base)


# Multi-part public suffixes for the registrable-domain heuristic: a compact,
# documented SUBSET of the publicsuffix.org list covering the common ccTLD
# second-level registries. Swap in the full PSL (broadcast it) for production.
MULTIPART_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.nz", "com.sg",
)


def registrable_domain(host: Column) -> Column:
    """The registrable (pay-level) domain of a host: the label owned by one
    registrant, so 'a.example.com' and 'b.example.com' group together while
    'example.co.uk' keeps three labels (PSL-subset heuristic above).

    Politeness budgets keyed on this instead of the raw host close the
    subdomain loophole: a site fanning content across thousands of
    subdomains (blogspot-style) otherwise multiplies its budget by the
    subdomain count. Pure string algebra — split + slice + array_join."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, F.greatest(n - 1, F.lit(1)), 2), ".")
    last3 = F.array_join(F.slice(labels, F.greatest(n - 2, F.lit(1)), 3), ".")
    is_multi = F.lit(False)
    for suf in MULTIPART_SUFFIXES:
        is_multi = is_multi | last2.endswith(F.lit(suf))
    return F.when((n >= 3) & is_multi, last3).otherwise(last2)


def url_template(url: Column) -> Column:
    """The URL's structural template: digit runs in the path/query collapse
    to 'N', long hex runs (session ids, content hashes) to 'H'. Two URLs
    share a template iff they differ only in those generated parts —
    '/topic/123?page=7' and '/topic/456?page=9' are the same page TYPE."""
    t = F.regexp_replace(url, r"[0-9a-fA-F]{16,}", "H")
    return F.regexp_replace(t, r"[0-9]+", "N")


def trap_signal(
    urls: DataFrame,
    url_col: str = "url",
    min_urls: int = 100,
    amplification_pm: int = 50_000,
) -> DataFrame:
    """Crawler-trap detection per host: (host, n_urls, n_templates,
    amplification_pm, trap) where amplification_pm = 1000 · n_urls /
    n_templates. Calendar pages, session-id links and faceted search mint
    unbounded distinct URLs from a handful of page TYPES; a host whose
    distinct-URL count vastly exceeds its distinct-template count
    (amplification over ``amplification_pm``, with at least ``min_urls``
    URLs) is flagged so admission can cap or drop it — the classic frontier
    defense the reference lists under 'politeness and traps'
    (`/root/reference/README.md:143-147`).

    One host-keyed aggregate over distinct (host, url) — two
    count_distincts that share the exchange; no window, no join. Feed it
    the frontier or url_seen table each round and broadcast the trap list
    into admission.
    """
    u = urls.select(
        parse_host(F.col(url_col)).alias("host"),
        F.col(url_col).alias("u"),
        url_template(F.col(url_col)).alias("t"),
    ).filter(F.col("host").isNotNull())
    agg = u.groupBy("host").agg(
        F.count_distinct("u").cast("long").alias("n_urls"),
        F.count_distinct("t").cast("long").alias("n_templates"),
    )
    amp = F.expr("1000 * n_urls div n_templates")
    return agg.select(
        "host",
        "n_urls",
        "n_templates",
        amp.alias("amplification_pm"),
        (
            (F.col("n_urls") >= min_urls) & (amp >= amplification_pm)
        ).alias("trap"),
    )
