"""Large-scale training-data pipeline operators.

Beyond the reference's own surface (SURVEY §7.0 north-star extensions):
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
winnowing / Bloom incremental-ingestion), embedding similarity search
(brute-force cosine + hyperplane LSH + IVF with distributed Lloyd
training), text analysis (language-ID, quality, tokens, fingerprints,
tf-idf, corpus-LM log-prob), test-set decontamination, deterministic
sampling/splitting/packing, and multimodal binary-column plumbing with
a pure-numpy netpbm pixel decoder. Every operator is expression-first
(JVM-side, codegen'd) and engine-deterministic: the only hash primitive
is md5 (identical in Spark/DuckDB/Python), so each query has an exact
DuckDB oracle.
"""
