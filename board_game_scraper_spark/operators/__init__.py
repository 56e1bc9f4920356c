"""Batch operators (SURVEY.md §2.5-2.9 + training-pipeline additions)."""
