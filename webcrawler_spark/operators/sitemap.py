"""Sitemap discovery: parse sitemap XML bodies into bounded per-site seeds.

The reference declares (never implements): "Optionally discover sitemaps and
enqueue entries up to limits" — /root/reference/README.md:147.

``sitemap_entries`` extracts ``<loc>`` entries from sitemap documents in the
pages table and applies the declared per-site limit, preserving document
order (the sitemap's own priority order — first entries win the budget).

Scale shape: the regex extraction is JVM-side codegen (regexp_extract_all +
posexplode, no Python); the per-site cap is one row_number window on the
site host — the same per-host-budget shape as frontier admission, so hot
sites cannot flood the frontier. Output feeds the normal enqueue path
(normalize → dedup anti-join), which handles normalization and seen-set
semantics; extraction here keeps locs verbatim (trimmed) on purpose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

LOC_RE = r"<loc>\s*([^<\s][^<]*?)\s*</loc>"


def sitemap_entries(
    sitemaps: DataFrame,
    limit_per_site: int = 50_000,
    url_col: str = "url",
    body_col: str = "html",
) -> DataFrame:
    """(site, loc, rank) for each <loc> in each sitemap body, at most
    ``limit_per_site`` per site host in document order.

    ``sitemaps``: rows of (url, html[binary or string]) holding sitemap XML.
    50,000 is the sitemaps.org per-file entry cap — the natural default for
    "up to limits"."""
    from ..functions import parse_host

    body = F.col(body_col).cast("string")
    locs = sitemaps.select(
        parse_host(F.col(url_col)).alias("site"),
        F.posexplode(F.regexp_extract_all(body, F.lit(LOC_RE), F.lit(1))).alias(
            "pos", "loc"
        ),
    )
    w = Window.partitionBy("site").orderBy("pos")
    return (
        locs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= limit_per_site)
        .select("site", "loc", "rank")
    )
