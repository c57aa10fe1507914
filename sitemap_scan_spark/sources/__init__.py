"""Sources: pages-table reader, robots/sitemap parsing, seeds (SURVEY §2.1)."""
