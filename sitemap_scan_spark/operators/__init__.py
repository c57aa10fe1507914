"""Distributed operators: frontier dequeue, URL-seen dedup, large-scale
dedup / similarity / text-analysis suites (SURVEY.md §2.4-2.6 + training-data
pipeline ops)."""
