"""webcrawler_spark — a PySpark-native crawl/analytics engine.

A from-scratch reimplementation of the data-processing capabilities of the
``tatabox2/webcrawler`` reference (see SURVEY.md): frontier-with-dedup as
anti-joins + window ranks over parquet/Iceberg tables, content extraction as
vectorized pandas UDFs, plus the large-scale training-data operators
(dedup, similarity search, text analysis) a 100 TB pipeline needs.
"""

__version__ = "0.1.0"
