"""Column-level function library (SURVEY.md §2.3, §2.10, §2.12)."""
