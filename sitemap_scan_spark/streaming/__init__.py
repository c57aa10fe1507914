"""Structured-streaming analogs of the reference's cursor/cron loop (SURVEY §2.9)."""
