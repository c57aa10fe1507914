"""Deterministic synthetic web corpus + sequential oracle (FIXTURES.md §A)."""
