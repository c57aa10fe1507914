"""sitemap_scan_spark — a from-scratch PySpark-native crawl/analytics engine.

Re-expresses the capabilities of the reference (wra-sol/sitemap-scan, a
Cloudflare Worker sitemap scanner; see SURVEY.md) as idiomatic Spark:
DataFrame/SQL plans, Arrow-vectorized pandas UDFs, snapshot-versioned tables.

Subpackages
-----------
functions  : scalar/string/hash/URL/text column functions (SURVEY §2.8)
sources    : pages-table reader, sitemap/robots parsing, seed lists (§2.1)
operators  : frontier dequeue, URL-seen dedup, large-scale dedup & similarity (§2.4-2.6)
plans      : crawl-round pipeline, checkpoint/resume, metrics (§3, §2.9)
streaming  : structured-streaming analogs of the cursor/cron loop (§2.9)
sim        : (top-level) deterministic corpus generator + sequential oracle
"""

__version__ = "0.1.0"
