"""Large-scale training-data pipeline operations.

Beyond the reference's operator set: deduplication (exact, MinHash-LSH,
SimHash, n-gram Jaccard, embedding-cosine), approximate nearest
neighbor search, text analysis (language-ID, quality scoring, token
counting, fingerprinting, benchmark-contamination checks, repetition
signals), deterministic stratified sampling for data-mix recipes, and
multimodal binary-column plumbing.

Portability note: every hash used for dedup is derived from md5 of a
string (both Spark and the DuckDB oracle compute identical md5), so
MinHash/SimHash signatures are engine-independent and the correctness
gate compares exact values, not statistics.
"""
