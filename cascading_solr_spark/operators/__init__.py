"""Training-data pipeline operators over the engine's corpus tables.

Beyond the reference's own operator inventory (SURVEY.md §2), these are the
operations a large-scale training-data pipeline needs, all DataFrame-native:
deduplication (exact, n-gram Jaccard, MinHash+LSH, SimHash), similarity
search (brute-force + LSH-bucketed cosine), text analysis (token counting,
quality scoring, language id, fingerprinting), and multimodal binary-column
plumbing.
"""
