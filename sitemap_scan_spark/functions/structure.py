"""Structural HTML metrics + element extraction (SURVEY §2.7 A7/A8, §2.8 F22).

All JVM-side (``regexp_count`` / ``regexp_extract_all``):

- A7 per-tag counts compared across versions (``detectTagChanges``,
  /root/reference/src/diff/comparer.ts:580-614);
- A8 <style> block + inline style= counts (``detectCSSChanges``,
  comparer.ts:542-578);
- F22 <title>/<h1>/<meta> extraction, both attribute orders
  (comparer.ts:616-653).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_TAGS = ["div", "p", "a", "img", "script", "style", "h1", "h2", "li"]


def _s(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("string")


def tag_counts(html_col: Column | str, tags: list[str] | None = None) -> list[Column]:
    """A7: per-tag opening-tag counts."""
    h = _s(html_col)
    return [
        F.regexp_count(h, F.lit(rf"(?i)<{t}\b")).alias(f"n_{t}")
        for t in (tags or DEFAULT_TAGS)
    ]


def style_counts(html_col: Column | str) -> list[Column]:
    """A8: style-block and inline-style counts."""
    h = _s(html_col)
    return [
        F.regexp_count(h, F.lit(r"(?is)<style[^>]*>.*?</style>")).alias("n_style_blocks"),
        F.regexp_count(h, F.lit(r'(?i)style="[^"]*"')).alias("n_inline_styles"),
    ]


def extract_title(html_col: Column | str) -> Column:
    """F22: <title> text ('' if absent)."""
    return F.regexp_extract(_s(html_col), r"(?is)<title[^>]*>(.*?)</title>", 1)


def extract_h1s(html_col: Column | str) -> Column:
    """F22: all <h1> texts (array<string>)."""
    return F.regexp_extract_all(_s(html_col), F.lit(r"(?is)<h1[^>]*>(.*?)</h1>"), 1)


def extract_meta(html_col: Column | str, name: str) -> Column:
    """F22: <meta name=… content=…> in either attribute order
    (comparer.ts:616-653)."""
    h = _s(html_col)
    a = F.regexp_extract(
        h, rf'(?i)<meta\s+name=["\']{name}["\']\s+content=["\']([^"\']*)["\']', 1
    )
    b = F.regexp_extract(
        h, rf'(?i)<meta\s+content=["\']([^"\']*)["\']\s+name=["\']{name}["\']', 1
    )
    return F.when(a != "", a).otherwise(b)
