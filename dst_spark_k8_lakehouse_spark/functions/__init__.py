"""Scalar function sweep (SURVEY.md §2.9): string/date/math/map/json/array."""
