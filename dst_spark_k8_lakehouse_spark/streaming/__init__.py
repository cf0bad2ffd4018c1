"""Structured Streaming operators (SURVEY.md §2.10): windowed aggs,
watermarks, stateful dedup."""
