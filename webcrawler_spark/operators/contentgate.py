"""Content-type allowlist + max-content-size gate, applied BEFORE parsing.

The reference declares both knobs but never implements them:
`/root/reference/README.md:60` (``allowedContentTypes: ["text/html"]``) and
`/root/reference/README.md:212` ("domain blacklists/whitelists and max
content size limits"). Without a gate, a fetched binary asset (PDF, image
served from an <a href>) or a multi-hundred-MB page would enter the HTML
parse kernel — the Python stage — and burn Arrow transfer + parse time on
bytes that can never produce a document. The gate is a pure JVM-side column
predicate evaluated on the fetch metadata (header content-type + payload
octet length), so skipped rows never cross into Python at all; at 100 TB
that is the difference between "the parse stage sees text/html only" and
"the parse stage decodes every byte fetched".

Statuses mirror SKIPPED_ROBOTS (CrawlStatus.java:10-11):
- ``SKIPPED_CONTENT_TYPE`` — the response's media type (the Content-Type
  header value up to the first ``;``, trimmed, lowercased — RFC 9110 §8.3
  parameters like ``charset=`` never participate) is not in the allowlist.
- ``SKIPPED_TOO_LARGE``    — the payload exceeds ``max_content_bytes``
  octets (checked on the raw fetched bytes, pre-decode).

Precedence: content-type first (a disallowed type is skipped for that reason
even when it is also oversize), matching the order a streaming fetcher would
abort in (headers arrive before the body).

A NULL / absent content type is ADMITTED: the gate judges evidence, and a
fetch log without the header (older WARC captures, test corpora) must not
silently drop every row the moment an allowlist is configured. Size is
evaluated independently, so an oversize row with an unknown type still
skips.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SKIPPED_CONTENT_TYPE = "SKIPPED_CONTENT_TYPE"
SKIPPED_TOO_LARGE = "SKIPPED_TOO_LARGE"


def media_type_col(content_type: Column) -> Column:
    """Normalized media type of a Content-Type header value: the segment
    before the first ``;``, trimmed and lowercased (``text/HTML ;
    charset=utf-8`` -> ``text/html``)."""
    return F.lower(F.trim(F.split_part(content_type, F.lit(";"), F.lit(1))))


def skip_status_col(
    allowed_content_types: Optional[Sequence[str]],
    max_content_bytes: Optional[int],
    html_col: str = "html",
    content_type_col: Optional[str] = "content_type",
) -> Optional[Column]:
    """The gate as ONE column: the skip status for a fetched row, or NULL
    when the row is admitted to the parse stage. Returns ``None`` (not a
    Column) when both knobs are off so callers can keep the gate entirely
    out of the plan — default-off leaves every existing plan byte-identical.

    Only rows that were actually fetched (non-null ``html_col``) can skip;
    fetch-missing rows stay on their ERROR_FETCH path.
    """
    if not allowed_content_types and max_content_bytes is None:
        return None
    fetched = F.col(html_col).isNotNull()
    expr = F.lit(None).cast("string")
    if max_content_bytes is not None:
        expr = F.when(
            fetched & (F.length(F.col(html_col)) > int(max_content_bytes)),
            F.lit(SKIPPED_TOO_LARGE),
        ).otherwise(expr)
    if allowed_content_types and content_type_col is not None:
        allowed = sorted({t.strip().lower() for t in allowed_content_types})
        mt = media_type_col(F.col(content_type_col))
        expr = F.when(
            fetched & F.col(content_type_col).isNotNull() & ~mt.isin(allowed),
            F.lit(SKIPPED_CONTENT_TYPE),
        ).otherwise(expr)
    return expr


def split_gated(
    df: DataFrame,
    allowed_content_types: Optional[Sequence[str]],
    max_content_bytes: Optional[int],
    html_col: str = "html",
    content_type_col: str = "content_type",
) -> Tuple[DataFrame, Optional[DataFrame]]:
    """Split fetched rows into (admitted, skipped-with-``skip_status``).

    ``skipped`` is ``None`` when the gate is off (and ``admitted`` is the
    input unchanged — zero plan delta). When the input has no content-type
    column the allowlist half of the gate is inert (no evidence to judge);
    the size half still applies.
    """
    ct = content_type_col if content_type_col in df.columns else None
    skip = skip_status_col(
        allowed_content_types, max_content_bytes, html_col=html_col,
        content_type_col=ct,
    )
    if skip is None:
        return df, None
    tagged = df.withColumn("skip_status", skip)
    admitted = tagged.filter(F.col("skip_status").isNull()).drop("skip_status")
    skipped = tagged.filter(F.col("skip_status").isNotNull())
    return admitted, skipped
