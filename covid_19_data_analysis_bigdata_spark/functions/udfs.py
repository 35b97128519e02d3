"""UDF / UDAF / UDTF surface (SURVEY.md §2 category 11)."""
