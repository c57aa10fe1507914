"""URL canonicalization + URL hashing.

Re-expresses the reference's canonicalization semantics
(``canonicalizeForSitemapState``, /root/reference/src/backup/fetcher.ts:860-880;
``canonicalizeSitemapUrl`` :846-854; url hashing :1483-1489) as:

- one shared scalar implementation (:func:`canonicalize_one`) used by the
  sequential oracle, the corpus generator, and the Spark pipeline — a single
  source of truth so engine-vs-oracle parity is byte-exact;
- an Arrow-vectorized pandas UDF (:func:`canonicalize_udf`) with a fully
  vectorized fast path for plain URLs (regex extract + lowercase, no per-row
  parsing) and a scalar fallback only for the minority with query strings /
  percent-escapes / ports — at 100 TB this keeps the common case in
  pandas-native string kernels;
- JVM-side column expressions for hashing (``sha2`` → 16-hex prefix) so the
  hot join keys never leave Tungsten.

Semantics (RFC 3986-flavored, per BASELINE.json north_star):
  lowercase scheme + host, strip fragment, drop default ports, empty path →
  "/", dot-segment removal, percent-decode unreserved chars + uppercase
  remaining escapes, stable-sort query params by (key, value) PRESERVING
  duplicates (the reference quirk), non-http(s) / unparseable → None.
"""

from __future__ import annotations

import re
from urllib.parse import quote, unquote, urlsplit

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

URL_HASH_LEN = 16

# Fast path: scheme://host/simple-path with nothing that needs normalization
# beyond lowercasing (no %, ?, #, :port, userinfo, dot segments).
_FAST_RE = re.compile(
    r"^(https?)://([A-Za-z0-9.\-]+)(/[A-Za-z0-9/._~\-]*)?$"
)
_DOT_SEG_RE = re.compile(r"/\.{1,2}(?:/|$)")

_DEFAULT_PORT = {"http": "80", "https": "443"}
_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 dot-segment removal."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out:
                out.pop()
            continue
        out.append(seg)
    # preserve leading/trailing slash behavior of split/join
    p = "/".join(out)
    if path.startswith("/") and not p.startswith("/"):
        p = "/" + p
    if path.endswith(("/.", "/..", "/")) and not p.endswith("/"):
        p += "/"
    return p or "/"


def _norm_pct(s: str) -> str:
    """Percent-decode unreserved chars; re-encode everything else uppercase."""
    if "%" not in s:
        return s

    def fix(m: re.Match[str]) -> str:
        hexpair = m.group(1)
        try:
            ch = chr(int(hexpair, 16))
        except ValueError:
            return m.group(0)
        return ch if ch in _UNRESERVED else "%" + hexpair.upper()

    return re.sub(r"%([0-9A-Fa-f]{2})", fix, s)


def canonicalize_one(url: str | None) -> str | None:
    """Canonicalize a single URL (None if invalid / non-http(s))."""
    if url is None:
        return None
    url = url.strip()
    m = _FAST_RE.match(url)
    if m and not _DOT_SEG_RE.search(url):
        scheme, host, path = m.group(1).lower(), m.group(2).lower(), m.group(3)
        return f"{scheme}://{host}{path or '/'}"
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    host = (parts.hostname or "").lower()
    if not host:
        return None
    port = ""
    try:
        if parts.port is not None and str(parts.port) != _DEFAULT_PORT[scheme]:
            port = f":{parts.port}"
    except ValueError:
        return None
    path = _norm_pct(_remove_dot_segments(parts.path or "/"))
    query = ""
    if parts.query:
        # parse preserving duplicates and blanks, sort by (key, value) —
        # the reference's stable param order (fetcher.ts:867-874).
        pairs: list[tuple[str, str]] = []
        for item in parts.query.split("&"):
            if not item:
                continue
            k, _, v = item.partition("=")
            pairs.append((unquote(k), unquote(v)))
        pairs.sort()
        query = "?" + "&".join(
            f"{quote(k, safe='-._~')}={quote(v, safe='-._~')}" for k, v in pairs
        )
    return f"{scheme}://{host}{port}{path}{query}"


def canonicalize_series(urls: pd.Series) -> pd.Series:
    """Vectorized canonicalization over a pandas Series of URL strings."""
    s = urls.astype("string").str.strip()
    ext = s.str.extract(_FAST_RE)
    has_dots = s.str.contains(_DOT_SEG_RE, na=False)
    fast = ext[0].notna() & ~has_dots
    out = pd.Series([None] * len(s), index=s.index, dtype="object")
    if fast.any():
        path = ext.loc[fast, 2].fillna("/").replace("", "/")
        out.loc[fast] = (
            ext.loc[fast, 0].str.lower()
            + "://"
            + ext.loc[fast, 1].str.lower()
            + path
        )
    slow = ~fast & s.notna()
    if slow.any():
        out.loc[slow] = s.loc[slow].map(canonicalize_one)
    return out


@pandas_udf(StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:
    return canonicalize_series(urls)


@pandas_udf(StringType())
def resolve_canonicalize_udf(base: pd.Series, href: pd.Series) -> pd.Series:
    """urljoin(base, href) → canonicalize, with the three common href shapes
    resolved by vectorized string ops (pandas C kernels); only exotic
    relatives (.., ./, scheme-relative, query-only…) fall back to per-row
    urljoin. Verified equivalent to urljoin in tests."""
    from urllib.parse import urljoin

    h = href.astype("string")
    b = base.astype("string")
    valid = h.notna() & b.notna()
    origin = b.str.extract(r"^(https?://[^/]+)", expand=False)
    basedir = b.str.replace(r"[^/]*$", "", regex=True)

    is_abs = h.str.match(r"(?i)^https?://", na=False)
    is_root = valid & h.str.match(r"^/(?!/)", na=False)
    # sibling-relative: no scheme/colon-ish prefix, no leading slash or dot,
    # no '//' (urljoin collapses empty segments in RELATIVE refs)
    is_sib = valid & h.str.match(r"^[A-Za-z0-9_~%-][^:]*$", na=False) & ~h.str.contains(
        r"^\.|/\.|//", regex=True, na=False
    )

    resolved = h.copy()
    resolved.loc[is_root] = origin[is_root] + h[is_root]
    resolved.loc[is_sib & ~is_root] = basedir[is_sib & ~is_root] + h[is_sib & ~is_root]
    rest = valid & ~is_abs & ~is_root & ~(is_sib & ~is_root)
    if rest.any():
        resolved.loc[rest] = [urljoin(x, y) for x, y in zip(b[rest], h[rest])]
    return canonicalize_series(resolved)


def with_resolved_canonical(
    df,
    base_col: str,
    raw_col: str,
    out_col: str = "url_canon",
):
    """Resolve ``raw`` hrefs against ``base`` and canonicalize — ONE
    Arrow-vectorized pass (:func:`resolve_canonicalize_udf`, whose common
    href shapes and simple-URL canonical class run in pandas C string
    kernels; only the exotic remainder falls back to per-row urljoin).

    This used to be a JVM-fast/python-slow split + union; the split
    evaluated the input subtree twice and planned TWO extra stages (one of
    them an ArrowEvalPython) per call, which measured strictly slower than
    the single vectorized pass at round scale (0.76 s vs 0.52 s on an
    18k-link round, guide §4.1/4.2: one batch-vectorized crossing beats a
    plan-duplicating split whose python branch still pays full stage
    setup). Equality with urljoin ∘ canonicalize_one is fuzz-asserted in
    test_jvm_python_parity.py either way.

    Returns a DataFrame with ``out_col`` (non-null) — input rows whose URL
    is invalid/non-http(s) are dropped.
    """
    return df.withColumn(
        out_col, resolve_canonicalize_udf(base_col, raw_col)
    ).filter(F.col(out_col).isNotNull())


def url_hash_col(col: Column | str) -> Column:
    """16-hex-char URL key: substring(sha2(url, 256), 1, 16) — JVM-side,
    byte-identical to the reference's SHA-256-prefix key
    (fetcher.ts:1483-1489)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(F.sha2(c, 256), 1, URL_HASH_LEN)


def url_hash_one(url: str) -> str:
    """Scalar twin of :func:`url_hash_col` for the oracle."""
    import hashlib

    return hashlib.sha256(url.encode("utf-8")).hexdigest()[:URL_HASH_LEN]


def host_of_col(col: Column | str) -> Column:
    """Extract the host from a canonical URL, JVM-side."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, r"^https?://([^/:?#]+)", 1)


def host_of_one(url_canon: str) -> str:
    m = re.match(r"^https?://([^/:?#]+)", url_canon)
    return m.group(1) if m else ""
