"""Set-level operators for large-scale training-data pipelines.

These extend the reference's catalog-ETL surface with the operations a
100 TB text/embedding corpus needs: deduplication (exact, MinHash-LSH,
SimHash, n-gram Jaccard, embedding cosine), approximate nearest-neighbor
search, text analysis, and multimodal binary-column plumbing.
"""
