"""Scan / source / sink operators (SURVEY.md §2 category 1)."""
