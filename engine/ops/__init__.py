"""Training-data-pipeline operators over document/embedding tables.

Beyond the reference's own operators (SURVEY.md §2), these are the ops a
100 TB training-data lake needs: deduplication (exact, MinHash-LSH, SimHash,
n-gram Jaccard, embedding-cosine), similarity search (brute-force and
LSH-bucketed ANN), text analysis (language ID, quality scores, token counts,
fingerprints) and multimodal column plumbing.
"""
