"""Large-scale training-data pipeline operators.

Beyond the reference's own surface (SURVEY §7.0 north-star extensions):
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard),
embedding similarity search (brute-force cosine + hyperplane LSH),
text analysis (language-ID, quality, tokens, fingerprints) and
multimodal binary-column plumbing. Every operator is expression-first
(JVM-side, codegen'd) and engine-deterministic: the only hash primitive
is md5 (identical in Spark/DuckDB/Python), so each query has an exact
DuckDB oracle.
"""
