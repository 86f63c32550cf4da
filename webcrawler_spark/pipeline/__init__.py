"""Training-data pipeline operators over the crawled-document corpus.

Beyond the reference's own operators (SURVEY §2), a web-scale crawl feeds a
training-data pipeline; these are the first-class ops that pipeline needs:

- ``textstats``   — token counting, quality scoring, language-ID heuristic,
  document fingerprinting.
- ``dedup``       — exact hash dedup, MinHash+LSH, SimHash, n-gram Jaccard,
  embedding-cosine near-dup.
- ``similarity``  — brute-force cosine top-k and an IVF-style centroid-bucketed
  approximate variant.
- ``multimodal``  — binary-column plumbing (schema, batching, Arrow UDF
  signatures) for image/audio payloads; codec decode is stubbed (no media
  libs in this environment) behind a deterministic fake.

Everything except the multimodal decode stays in JVM-side built-in
expressions (whole-stage codegen; no Python in the hot path), which also
makes every operator DuckDB-oracle-checkable value-for-value.
"""
