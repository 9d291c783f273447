"""[EXT] Streaming operators (SURVEY.md §2.11).

The reference has NO streaming machinery (milestones stop at "Extended
Query", README.md:23-29) — this package is driver-north-star extension.
Batch-mode event-time windows (oracle-checkable against DuckDB
``time_bucket`` / gap-and-island SQL) plus genuine Structured Streaming
variants (watermark, dedup-within-watermark) verified rows-only.
"""
