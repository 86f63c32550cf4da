"""Deterministic hashing / derived columns.

Reimplements WebPageContent's derived fields so Python (oracle/UDF), Spark SQL
built-ins, and DuckDB oracle SQL all agree byte-for-byte:

- ``compute_hash(url, content)``       — model/WebPageContent.java:213-225:
  sha256 hex of ``url + '\\0' + content`` (nulls -> ""), lowercase hex.
- ``compute_hash_segments(url, segs)`` — model/WebPageContent.java:232-255:
  sha256 hex of ``url + '\\0' + '\\u001f'.join(segs)`` (null segs -> "");
  order- and segmentation-sensitive (WebPageContentTest.java:289-298).
- ``content_length(segs)``             — model/WebPageContent.java:196-206:
  sum of per-segment char lengths, null segs count 0.
- ``host_hash(host)``                  — engine partitioning key (north_star
  frontier key ``(host_hash, priority, warc_ts)``): first 15 hex chars of
  sha256(host) as a non-negative int64 (60 bits), identical in Python,
  Spark (``conv(substring(sha2(host,256),1,15),16,10)``) and any sha256 impl.
"""

from __future__ import annotations

import hashlib
from typing import List, Optional

SEGMENT_SEPARATOR = "\u001f"
URL_SEPARATOR = "\x00"


def sha256_hex(s: str) -> str:
    # errors="replace" (-> '?') matches the reference's encode step exactly:
    # Java String.getBytes(UTF_8) "always replaces malformed-input ...
    # sequences with this charset's default replacement byte array" ({'?'}),
    # so an unpaired surrogate hashes as 0x3F there — raising here instead
    # was a fidelity gap (found by hypothesis fuzzing, test_properties.py).
    return hashlib.sha256(s.encode("utf-8", errors="replace")).hexdigest()


def compute_hash(url: Optional[str], content: Optional[str]) -> str:
    u = url or ""
    c = content or ""
    return sha256_hex(u + URL_SEPARATOR + c)


def compute_hash_segments(url: Optional[str], contents: Optional[List[Optional[str]]]) -> str:
    u = url or ""
    if not contents:
        joined = ""
    else:
        joined = SEGMENT_SEPARATOR.join((p if p is not None else "") for p in contents)
    return sha256_hex(u + URL_SEPARATOR + joined)


def content_length(contents: Optional[List[Optional[str]]]) -> int:
    if not contents:
        return 0
    return sum(len(c) for c in contents if c is not None)


def host_hash(host: Optional[str]) -> int:
    if host is None:
        return 0
    return int(sha256_hex(host)[:15], 16)
