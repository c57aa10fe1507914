"""Crawl-round pipeline, checkpoint/resume, metrics (SURVEY §3, §2.9)."""
