"""Custom operators beyond built-in Spark surface:

- joins: as-of / ordered merge (reference declares merge_asof at
  /root/reference/modin/core/storage_formats/base/query_compiler.py:1713 as
  default-to-pandas; here it is distributed).
- dedup / similarity / text / multimodal: LLM-training-data pipeline
  operators (net-new vs the reference; first-class citizens here).
"""
