"""Scalar / string / hash / URL / text column functions (SURVEY.md §2.8)."""
