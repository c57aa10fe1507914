"""HTML text + link extraction.

Text extraction re-expresses the reference's pure-regex pipeline
(``extractTextContent``, /root/reference/src/diff/comparer.ts:208-219) with
the EXACT same regex battery and order — this is the byte-identical
per-row invariant from BASELINE.json input_hint. Note the reference quirk
replicated on purpose: the comment regex is ``<!--[^>]*-->`` (no dotall
needed — ``[^>]`` already spans newlines, and comments containing ``>`` are
NOT stripped; SURVEY.md §7.3 risk 1).

All of it is pandas ``.str.replace`` (vectorized C string kernels) inside
Arrow-batched pandas UDFs — no per-row Python in the hot path.

Link extraction (``<a href>``, redirects, base resolution) feeds the frontier;
the reference analog is redirect following (fetcher.ts:1191-1217) plus sitemap
loc parsing (handled in sources/sitemap.py).
"""

from __future__ import annotations

import re
from typing import Iterator
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

# Exact battery, exact order (comparer.ts:209-216). JS flags gis → re.S|re.I;
# the comment regex has NO i/s flags in the reference, same here.
_RE_SCRIPT = re.compile(r"<script[^>]*>.*?</script>", re.S | re.I)
_RE_STYLE = re.compile(r"<style[^>]*>.*?</style>", re.S | re.I)
_RE_COMMENT = re.compile(r"<!--[^>]*-->")
_RE_TAG = re.compile(r"<[^>]*>")
_RE_WS = re.compile(r"\s+")


def extract_text_one(html: str) -> str:
    """Scalar extractor — single source of truth, used by the oracle and
    the corpus generator's ground-truth ``text`` column."""
    t = _RE_SCRIPT.sub("", html)
    t = _RE_STYLE.sub("", t)
    t = _RE_COMMENT.sub("", t)
    t = _RE_TAG.sub(" ", t)
    t = _RE_WS.sub(" ", t)
    return t.strip()


def extract_text_series(html: pd.Series) -> pd.Series:
    """Vectorized extractor (pandas .str.replace — C kernels, no row loop)."""
    t = html.astype("string")
    t = t.str.replace(_RE_SCRIPT, "", regex=True)
    t = t.str.replace(_RE_STYLE, "", regex=True)
    t = t.str.replace(_RE_COMMENT, "", regex=True)
    t = t.str.replace(_RE_TAG, " ", regex=True)
    t = t.str.replace(_RE_WS, " ", regex=True)
    return t.str.strip()


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    # html arrives as binary → bytes; decode UTF-8 with replacement.
    decoded = html.map(
        lambda b: b.decode("utf-8", "replace") if isinstance(b, (bytes, bytearray)) else b
    )
    return extract_text_series(pd.Series(decoded, dtype="object"))


# --- link extraction ---------------------------------------------------------

_RE_HREF = re.compile(r"""<a\s[^>]*?href\s*=\s*["']([^"']+)["']""", re.I)
_RE_META_REDIRECT = re.compile(
    r"""<meta\s+http-equiv=["']refresh["']\s+content=["']\d+;\s*url=([^"']+)["']""",
    re.I,
)


def extract_links_one(html: str, base_url: str) -> list[str]:
    """All <a href> targets resolved against base_url (scalar, for oracle)."""
    return [urljoin(base_url, h) for h in _RE_HREF.findall(html)]


def extract_redirect_one(html: str) -> str | None:
    m = _RE_META_REDIRECT.search(html)
    return m.group(1) if m else None


_LINKS_SCHEMA = StructType(
    [
        StructField("url_canon", StringType()),
        StructField("links", ArrayType(StringType())),
        StructField("redirect_to", StringType()),
    ]
)


def extract_links(df: DataFrame, html_col: str = "html", url_col: str = "url_canon") -> DataFrame:
    """(url_canon, links: array<string>, redirect_to) per page via mapInPandas.

    findall is per-row but regex-engine-bound (C), batched by Arrow; at scale
    this is the one genuinely non-columnar step of the parse stage, matching
    SURVEY.md §2.1 S1-S3 guidance (parse inside mapInPandas, then explode).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            htmls = pdf[html_col].map(
                lambda b: b.decode("utf-8", "replace")
                if isinstance(b, (bytes, bytearray))
                else (b or "")
            )
            bases = pdf[url_col]
            links = [
                extract_links_one(h, u) for h, u in zip(htmls, bases)
            ]
            redirects = [extract_redirect_one(h) for h in htmls]
            yield pd.DataFrame(
                {
                    "url_canon": bases,
                    "links": links,
                    "redirect_to": [
                        urljoin(u, r) if r else None
                        for u, r in zip(bases, redirects)
                    ],
                }
            )

    return df.select(url_col, html_col).mapInPandas(gen, _LINKS_SCHEMA)


def with_extracted_text(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Append the byte-identical ``text_extracted`` column."""
    return df.withColumn("text_extracted", extract_text_udf(F.col(html_col)))


# --- JVM-side twins (whole-stage codegen, zero Python) ------------------------
#
# In local mode every pandas-UDF stage runs JVM task threads AND python
# workers on the same cores (2× oversubscription); on clusters it doubles
# the memory footprint per slot. These twins express the exact same regex
# batteries with Java regex so the hot path never leaves Tungsten. Java's
# \s is ASCII-only while Python's is Unicode-aware — byte-identity is
# asserted against the scalar extractor in tests (our corpus is UTF-8 with
# ASCII whitespace; flip CrawlConfig.jvm_extraction for exotic corpora).

_JVM_HREF_PATTERN = r"""(?i)<a\s[^>]*?href\s*=\s*["']([^"']+)["']"""
_JVM_REDIRECT_PATTERN = (
    r"""(?i)<meta\s+http-equiv=["']refresh["']\s+content=["']\d+;\s*url=([^"']+)["']"""
)


def html_str_col(html_col) -> "F.Column":
    c = F.col(html_col) if isinstance(html_col, str) else html_col
    return c.cast("string")


def extract_text_col(html_col) -> "F.Column":
    """JVM twin of :func:`extract_text_one` — same battery, same order
    (comparer.ts:209-216)."""
    t = html_str_col(html_col)
    t = F.regexp_replace(t, r"(?is)<script[^>]*>.*?</script>", "")
    t = F.regexp_replace(t, r"(?is)<style[^>]*>.*?</style>", "")
    t = F.regexp_replace(t, r"<!--[^>]*-->", "")
    t = F.regexp_replace(t, r"<[^>]*>", " ")
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)


def extract_links_col(html_col) -> "F.Column":
    """All raw <a href> values (array<string>, unresolved) — JVM regex."""
    return F.regexp_extract_all(html_str_col(html_col), F.lit(_JVM_HREF_PATTERN), 1)


def extract_redirect_col(html_col) -> "F.Column":
    """Raw meta-refresh target or NULL — JVM regex."""
    return F.nullif(
        F.regexp_extract(html_str_col(html_col), _JVM_REDIRECT_PATTERN, 1), F.lit("")
    )
