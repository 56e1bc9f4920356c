"""Incremental execution (SURVEY.md §2.11)."""
