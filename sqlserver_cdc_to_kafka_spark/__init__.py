"""PySpark-native engine with the query / data-processing capabilities of
woodlee/sqlserver-cdc-to-kafka (reference at /root/reference, v4.4.0).

The reference is a SQL Server CDC → Kafka streaming pipeline. This package
re-expresses its capabilities Spark-first (DataFrame / SQL / Structured
Streaming), per SURVEY.md:

- ``model``      — ChangeIndex, CDC envelope schema, type mapping (SURVEY §1)
- ``fixtures``   — deterministic synthetic change feed over the test tables
- ``sources``    — snapshot / keyset-pagination / change-window scans (§2.1-2.2)
- ``operators``  — ordered merge, compaction, replay/merge, validation (§2.3-2.7)
- ``functions``  — scalar function layer (§2.8)
- ``pipeline``   — beyond-reference LLM-data-pipeline ops (dedup, similarity,
                   text analysis, multimodal plumbing)
- ``streaming``  — Structured Streaming wrappers (§2.9)
"""

__version__ = "0.1.0"
