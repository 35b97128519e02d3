"""Structured Streaming operators over events (SURVEY.md §2 category 9)."""
