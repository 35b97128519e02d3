"""Join operators (SURVEY.md §2 category 3)."""
