"""Content normalization for change detection.

Ports the reference's two regex redaction batteries to JVM-side
``regexp_replace`` chains (whole-stage codegen — zero Python in this path):

- F7  DEFAULT_PATTERNS (12 dynamic-noise patterns → typed placeholders),
  /root/reference/src/diff/normalizer.ts:6-67, applied :161-173;
- F8  IGNORE_PATTERNS (17 patterns → ``[REDACTED]``),
  /root/reference/src/diff/comparer.ts:6-34, applied :117-119;
- F9  user ``ignorePatterns`` → ``[CUSTOM_IGNORE]`` (comparer.ts:121-130) —
  the reference's UDF surface, here a config-driven regexp_replace chain;
- F12 whitespace cleanup (comparer.ts:132-134);
- F13 normalized hash = sha2(normalize(content), 256) (comparer.ts:139-142);
- F15 content-type sniff (normalizer.ts:267-288).

Pattern order is semantic (the reference applies them in array order —
e.g. the weekday lookahead pattern depends on dates already being
``[REDACTED]``); we preserve it exactly.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

_MONTHS = (
    r"(?:jan(?:uary)?|feb(?:ruary)?|mar(?:ch)?|apr(?:il)?|may|jun(?:e)?|"
    r"jul(?:y)?|aug(?:ust)?|sep(?:t(?:ember)?)?|oct(?:ober)?|nov(?:ember)?|"
    r"dec(?:ember)?)"
)
_DAYS = r"(?:monday|tuesday|wednesday|thursday|friday|saturday|sunday)"

# F7 — (name, java_regex, replacement), reference order (normalizer.ts:6-67).
DEFAULT_PATTERNS: list[tuple[str, str, str]] = [
    ("timestamps", r"\b\d{4}-\d{2}-\d{2}\b", "[DATE]"),
    ("times", r"\b\d{2}:\d{2}:\d{2}\b", "[TIME]"),
    ("unix_timestamps", r"\b\d{10,13}\b", "[TIMESTAMP]"),
    (
        "csrf_tokens",
        r"""(?i)csrf["\s]*[:=]["\s]*["']?[^"'\s]{8,}["']?""",
        'csrf:"[CSRF_TOKEN]"',
    ),
    (
        "request_ids",
        r"""(?i)_requestid["\s]*[:=]["\s]*["']?[^"'\s]{8,}["']?""",
        '_requestid:"[REQUEST_ID]"',
    ),
    ("nonce", r'(?i)nonce="[^"]*"', 'nonce="[NONCE]"'),
    ("data_testids", r'data-testid="[^"]*"', ""),
    ("data_cy", r'data-cy="[^"]*"', ""),
    (
        "session_ids",
        r"""(?i)session["\s]*[:=]["\s]*["']?[^"'\s]{16,}["']?""",
        'session:"[SESSION]"',
    ),
    (
        "uuids",
        r"(?i)\b[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}\b",
        "[UUID]",
    ),
    ("version_numbers", r"\bv?\d+\.\d+\.\d+(-[a-zA-Z0-9]+)?\b", "[VERSION]"),
    ("build_numbers", r"""(?i)build["\s]*[:=]["\s]*["']?\d+["']?""", 'build:"[BUILD]"'),
]

# F8 — 17 patterns, reference order (comparer.ts:6-34), all → [REDACTED].
IGNORE_PATTERNS: list[str] = [
    r"\b\d{4}-\d{2}-\d{2}\b",
    r"\b\d{2}:\d{2}:\d{2}\b",
    r"\b\d{4}-\d{2}-\d{2}[tT ]\d{2}:\d{2}(?::\d{2})?(?:\.\d+)?(?:Z|[+-]\d{2}:?\d{2})?\b",
    r"\b\d{1,2}[/-]\d{1,2}[/-]\d{2,4}\b",
    r"\b\d{4}[/-]\d{1,2}[/-]\d{1,2}\b",
    rf"(?i)\b{_DAYS}\s*{_MONTHS}\s*\d{{1,2}}(?:st|nd|rd|th)?(?:,\s*)?\s*\d{{4}}\b",
    rf"(?i)\b{_MONTHS}\s*\d{{1,2}}(?:st|nd|rd|th)?(?:,\s*)?\s*\d{{4}}\b",
    rf"(?i)\b\d{{1,2}}(?:st|nd|rd|th)?\s*{_MONTHS}\s*\d{{4}}\b",
    rf"(?i)\b{_DAYS}\b\s*(?=\[REDACTED\])",
    r"(?i)\b(?:last\s+updated|updated|published|posted|modified|generated)\s*"
    r"[:\-–—]?\s*(?:today|yesterday|\d+\s+(?:seconds?|minutes?|hours?|"
    r"days?|weeks?|months?|years?)\s+ago)\b",
    r"""(?i)timestamp["\s]*[:=]["\s]*["']?\d+["']?""",
    r"""(?i)csrf["\s]*[:=]["\s]*["'][^"']+["']""",
    r"""(?i)_requestid["\s]*[:=]["\s]*["'][^"']+["']""",
    r'data-testid="[^"]*"',
    r'data-cy="[^"]*"',
    r'nonce="[^"]*"',
    r'style="[^"]*"',
    r'(?i)class="[^"]*\s+(active|selected|current)\s*[^"]*"',
    r"\b\d{10,13}\b",
]


def redact_default(col: Column | str) -> Column:
    """F7: typed-placeholder redaction chain (normalizer.ts:161-173)."""
    c = F.col(col) if isinstance(col, str) else col
    for _name, pat, repl in DEFAULT_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def redact_ignored(col: Column | str, custom_patterns: list[str] | None = None) -> Column:
    """F8+F9: [REDACTED] battery then user patterns → [CUSTOM_IGNORE]
    (comparer.ts:117-130). Invalid user regexes are skipped like the
    reference does."""
    c = F.col(col) if isinstance(col, str) else col
    for pat in IGNORE_PATTERNS:
        c = F.regexp_replace(c, pat, "[REDACTED]")
    for pat in custom_patterns or []:
        import re as _re

        try:
            _re.compile(pat)
        except _re.error:
            continue
        c = F.regexp_replace(c, "(?i)" + pat, "[CUSTOM_IGNORE]")
    return c


def cleanup_whitespace(col: Column | str) -> Column:
    """F12 (comparer.ts:132-134): \\s+→' ', '> <'→'><', trim."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"\s+", " ")
    c = F.regexp_replace(c, r"> <", "><")
    return F.trim(c)


_RE_TAG = re.compile(r"<([a-zA-Z][a-zA-Z0-9-]*)(\s[^<>]*?)(/?)>")
# One attribute, consumed left-to-right from the start of the remaining
# attr string. Unquoted values may contain '/' (href=/path/x is a single
# value — the self-close slash was already split off by _RE_TAG's tail
# group, so it can never leak in here).
_RE_ATTR = re.compile(
    r"""\s*([a-zA-Z_:][-a-zA-Z0-9_:.]*)(\s*=\s*(?:"[^"]*"|'[^']*'|[^\s"'>]+))?"""
)


def sort_attributes_one(html: str) -> str:
    """F10 ``sortAttributes`` analog (comparer.ts:96-112 html-minifier
    option): rewrite each tag with its attributes sorted by name so two
    captures differing only in attribute ORDER normalize (and hash) equal.
    Value text is preserved verbatim; malformed tags pass through — the
    tokenizer must consume the attr string COMPLETELY or the tag is left
    untouched (never silently drop bytes from a tag we half-understood)."""

    def fix(m):
        name, attrs, slash = m.group(1), m.group(2), m.group(3)
        parsed: list[tuple[str, str]] = []
        pos = 0
        while pos < len(attrs):
            am = _RE_ATTR.match(attrs, pos)
            if am is None or am.end() == pos:
                break
            parsed.append((am.group(1), am.group(2) or ""))
            pos = am.end()
        if not parsed or attrs[pos:].strip():
            return m.group(0)  # nothing parsed, or unconsumed leftovers
        rebuilt = " ".join(
            a + (v.strip() and "=" + v.split("=", 1)[1].strip() or "")
            for a, v in sorted(parsed, key=lambda kv: kv[0])
        )
        return f"<{name} {rebuilt}{slash}>"

    return _RE_TAG.sub(fix, html or "")


def sort_attributes_udf(col: Column | str) -> Column:
    """Arrow-batched pandas twin of :func:`sort_attributes_one` — the one
    normalize step regexes can't do JVM-side (needs an in-tag sort)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    def _apply(s: pd.Series) -> pd.Series:
        return s.map(lambda t: sort_attributes_one(t) if t is not None else None)

    _udf = pandas_udf(_apply, StringType())
    c = F.col(col) if isinstance(col, str) else col
    return _udf(c.cast("string"))


def normalize_content(
    col: Column | str,
    custom_patterns: list[str] | None = None,
    sort_attrs: bool = False,
) -> Column:
    """Full normalization used for change detection: ignore battery +
    custom patterns + whitespace cleanup (comparer.ts:96-134; the
    html-minifier step re-specified per SURVEY.md §7.3 risk 5).
    ``sort_attrs=True`` additionally applies the F10 sortAttributes pass
    (pandas UDF — off the JVM fast path, so opt-in: enable when captures
    churn attribute order, e.g. server-side-rendered attr maps)."""
    c = F.col(col) if isinstance(col, str) else col
    if sort_attrs:
        c = sort_attributes_udf(c)
    return cleanup_whitespace(redact_ignored(c, custom_patterns))


def normalized_hash(col: Column | str, custom_patterns: list[str] | None = None) -> Column:
    """F13: sha2(normalized content, 256) (comparer.ts:139-142)."""
    return F.sha2(normalize_content(col, custom_patterns), 256)


def sniff_content_type(col: Column | str) -> Column:
    """F15 (normalizer.ts:267-288): html / json / text heuristic."""
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    lower = F.lower(c)
    return (
        F.when(
            lower.startswith("<!doctype html") | lower.contains("<html"), "html"
        )
        .when(c.startswith("{") | c.startswith("["), "json")
        .otherwise("text")
    )
