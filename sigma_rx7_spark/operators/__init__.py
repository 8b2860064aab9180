"""Relational operator library (SURVEY.md §2.1-2.7)."""
