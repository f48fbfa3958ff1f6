"""Operator modules — one per family in SURVEY.md §2."""
