"""Scalar function families (SURVEY.md §2 category 8)."""
