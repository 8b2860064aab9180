"""LLM-data-pipeline operators (SURVEY.md §2.11): dedup, similarity."""
