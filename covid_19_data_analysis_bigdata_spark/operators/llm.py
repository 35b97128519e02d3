"""LLM-data-pipeline operators (SURVEY.md §2 category 10)."""
