"""LLM-data-pipeline extensions (SURVEY.md §2.12): dedup, similarity
search, text analysis, multimodal columns.

Importing this package registers every LLM-ops query in the registry.
"""

from dst_spark_k8_lakehouse_spark.llm import (  # noqa: F401
    bpe,
    contamination,
    curation,
    dedup,
    health,
    multimodal,
    similarity,
    textstats,
)
