"""JSON content normalization + extraction (SURVEY §2.8 F16/F17).

F16 (``normalizeJSON``, /root/reference/src/diff/normalizer.ts:118-141,
192-249): drop dynamic keys (csrf/token/session/...), mask dynamic values
(UUIDs, long hex, timestamps), re-serialize with stable key order — so two
captures of an API response differing only in nonces hash equal.

F17 (framework detection, normalizer.ts:323-406): classify a page by
framework marker substrings and expose the per-framework ignore-regex
chain (config-driven regexp_replace, same mechanism as F9).

JSON parsing runs in an Arrow-batched pandas UDF (the JVM has
get_json_object for extraction — used by the oracle-checked query — but
recursive normalize+re-serialize needs the json module).
"""

from __future__ import annotations

import json
import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# keys the reference drops entirely (normalizer.ts:192-214 flavor)
DYNAMIC_KEYS = {
    "csrf", "csrf_token", "csrftoken", "token", "nonce", "session",
    "session_id", "sessionid", "_requestid", "request_id", "timestamp",
    "ts", "generated_at", "trace_id",
}
_RE_UUID = re.compile(
    r"^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$", re.I
)
_RE_LONG_HEX = re.compile(r"^[0-9a-f]{16,}$", re.I)
_RE_UNIX_TS = re.compile(r"^\d{10,13}$")


def _norm_value(v):
    if isinstance(v, str):
        if _RE_UUID.match(v):
            return "[UUID]"
        if _RE_LONG_HEX.match(v):
            return "[HEX]"
        if _RE_UNIX_TS.match(v):
            return "[TIMESTAMP]"
        return v
    if isinstance(v, dict):
        return _norm_obj(v)
    if isinstance(v, list):
        return [_norm_value(x) for x in v]
    return v


def _norm_obj(obj: dict) -> dict:
    return {
        k: _norm_value(v)
        for k, v in obj.items()
        if k.lower() not in DYNAMIC_KEYS
    }


def normalize_json_one(text: str) -> str:
    """F16 scalar: parse → drop dynamic keys → mask dynamic values →
    stable-sorted re-serialization; non-JSON input returned unchanged
    (the reference's try/catch fallback)."""
    try:
        parsed = json.loads(text)
    except (ValueError, TypeError):
        return text
    return json.dumps(_norm_value(parsed), sort_keys=True, separators=(",", ":"))


@pandas_udf(StringType())
def normalize_json_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: normalize_json_one(t) if t is not None else None)


# --- F17 framework detection --------------------------------------------------

FRAMEWORK_MARKERS: dict[str, list[str]] = {
    "wordpress": ["wp-content", "wp-includes", "wp-json"],
    "react": ["data-reactroot", "__NEXT_DATA__", "react-dom"],
    "vue": ["data-v-", "__vue__", "vue-router"],
    "angular": ["ng-version", "ng-app", "angular"],
}

FRAMEWORK_PATTERNS: dict[str, list[str]] = {
    # per-framework dynamic-noise regexes applied after detection
    "wordpress": [r"\?ver=[0-9.]+", r"wp-json/[a-z-]+/v\d+"],
    "react": [r'data-react-checksum="[^"]*"', r"__NEXT_DATA__[^<]*"],
    "vue": [r"data-v-[0-9a-f]{8}"],
    "angular": [r'ng-version="[^"]*"'],
}


def detect_framework(col: Column | str) -> Column:
    """First matching framework by marker substrings, else 'unknown'
    (normalizer.ts:323-352 flavor) — JVM contains() probes."""
    c = F.col(col) if isinstance(col, str) else col
    c = c.cast("string")
    expr = F.lit("unknown")
    for fw in reversed(list(FRAMEWORK_MARKERS)):
        probe = None
        for m in FRAMEWORK_MARKERS[fw]:
            p = c.contains(m)
            probe = p if probe is None else (probe | p)
        expr = F.when(probe, fw).otherwise(expr)
    return expr


def apply_framework_patterns(col: Column | str, framework: str) -> Column:
    """Chain the framework's ignore regexes → [FW_DYNAMIC] (config-driven
    regexp_replace, the same UDF-surface mechanism as F9)."""
    c = F.col(col) if isinstance(col, str) else col
    c = c.cast("string")
    for pat in FRAMEWORK_PATTERNS.get(framework, []):
        c = F.regexp_replace(c, pat, "[FW_DYNAMIC]")
    return c
