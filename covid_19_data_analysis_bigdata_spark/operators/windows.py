"""Window-function operators (SURVEY.md §2 category 5)."""
