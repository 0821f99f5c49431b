"""Scalar/column function library (SURVEY.md §2.8 F1-F18 mappings)."""
