"""[EXT] LLM-data-pipeline operators (SURVEY.md §2.13).

Beyond the reference's surface, per the driver north star: deduplication
(exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine),
similarity search (brute-force + LSH-bucketed ANN), text analysis
(language ID, quality scoring, token counting, fingerprinting), and
multimodal binary-column plumbing.

Cross-engine determinism rule: every "hash" in these operators is
md5-based (identical hex output in Spark and DuckDB), never the engines'
native ``hash()`` functions (different algorithms) — so each pipeline is
oracle-checkable end to end.
"""
