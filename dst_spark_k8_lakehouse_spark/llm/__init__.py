"""LLM-data-pipeline extensions (SURVEY.md §2.12): dedup, similarity
search, text analysis, multimodal columns."""
