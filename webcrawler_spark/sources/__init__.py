"""Input-format sources for the engine's pages table.

The canonical input is the Iceberg-style parquet pages table
``(url, warc_ts, html, text, lang)`` (BASELINE input_hint); sources in this
package ingest external formats into that shape. ``warc`` reads the
Common-Crawl archive format.
"""
