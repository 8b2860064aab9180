"""Scalar-function families (SURVEY.md §2.8) + text analysis (§2.11 L3)."""
