"""Custom operators (SURVEY.md §2.9): LLM-data-pipeline ops expressed
Spark-first — compositions of built-in DataFrame ops wherever the
semantics allow, Arrow-batched Pandas UDFs only where they don't
(multimodal decode)."""
