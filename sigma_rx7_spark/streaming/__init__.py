"""Structured Streaming surface (SURVEY.md §2.9)."""
