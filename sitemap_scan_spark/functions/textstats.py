"""Text analysis for large-scale training-data pipelines.

All JVM-side column expressions (whole-stage codegen; zero Python) so the
same code runs unchanged over 100 TB of ``documents``:

- token counting (whitespace tokenizer + a BPE-ish word/punct splitter),
- quality scoring (length / punctuation / stopword / uppercase ratios),
- language ID (stopword-hit n-gram heuristic, argmax over languages),
- document fingerprinting (normalized sha256 + shingle rolling hashes).

Every function is also expressible in ANSI SQL (see __spark_entry__.py
oracle_sql) so the DuckDB oracle cross-checks the exact semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny deterministic stopword lists — a heuristic, not a model.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "pour", "dans"],
    "es": ["el", "la", "los", "las", "de", "que", "y", "en", "un", "es"],
    "de": ["der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "ein"],
}

# BPE-ish token pattern: word pieces OR single non-space punctuation.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def token_count_ws(col: Column | str) -> Column:
    """Whitespace token count (0 for empty/blank text)."""
    t = F.trim(_c(col))
    return F.when(t == "", 0).otherwise(F.size(F.split(t, r"\s+")))


def token_count_bpe(col: Column | str) -> Column:
    """Count of BPE-ish tokens (letters runs / digit runs / punct chars)."""
    return F.size(F.regexp_extract_all(_c(col), F.lit(BPE_TOKEN_RE), 0))


def stopword_hits(col: Column | str, lang: str) -> Column:
    """Number of stopword occurrences for ``lang`` (word-boundary regex)."""
    pat = r"(?i)\b(" + "|".join(STOPWORDS[lang]) + r")\b"
    return F.size(F.regexp_extract_all(_c(col), F.lit(pat), 0))


def lang_id(col: Column | str) -> Column:
    """argmax over per-language stopword hit counts; 'und' if all zero."""
    c = _c(col)
    scores = [stopword_hits(c, lg).alias(lg) for lg in STOPWORDS]
    pairs = F.array(
        *[F.struct(s.alias("hits"), F.lit(lg).alias("lang")) for lg, s in zip(STOPWORDS, scores)]
    )
    best = F.array_max(pairs)  # struct compare: hits first, then lang
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_features(col: Column | str) -> list[Column]:
    """(n_chars, n_tokens, punct_ratio, upper_ratio, stopword_ratio_en,
    mean_token_len) — rounded for cross-engine comparability."""
    c = _c(col)
    n_chars = F.length(c)
    n_tokens = token_count_ws(c)
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[.!?,;:]", ""))
    n_upper = F.length(c) - F.length(F.regexp_replace(c, r"[A-Z]", ""))
    sw = stopword_hits(c, "en")
    denom = F.greatest(n_chars, F.lit(1))
    tdenom = F.greatest(n_tokens, F.lit(1))
    return [
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(n_punct / denom, 6).alias("punct_ratio"),
        F.round(n_upper / denom, 6).alias("upper_ratio"),
        F.round(sw / tdenom, 6).alias("stopword_ratio"),
        F.round(n_chars / tdenom, 6).alias("mean_token_len"),
    ]


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: long enough, some punctuation,
    not shouting, natural stopword density."""
    c = _c(col)
    _n_chars, _n_tokens, punct, upper, sw, _mtl = quality_features(c)
    len_ok = F.least(F.length(c) / 500.0, F.lit(1.0))
    return F.round(
        0.4 * len_ok
        + 0.2 * F.least(punct * 50, F.lit(1.0))
        + 0.2 * (1 - F.least(upper * 5, F.lit(1.0)))
        + 0.2 * F.least(sw * 4, F.lit(1.0)),
        6,
    )


def doc_fingerprint(col: Column | str) -> Column:
    """sha256 of casefolded whitespace-collapsed text — exact-dup key."""
    c = F.trim(F.regexp_replace(F.lower(_c(col)), r"\s+", " "))
    return F.sha2(c, 256)


def shingle_fingerprints(col: Column | str, n: int = 3, prefix_hex: int = 8) -> Column:
    """Rolling document fingerprint: md5-prefix per word n-gram shingle
    (array<string>); the minhash/Jaccard substrate."""
    words = F.split(F.trim(F.regexp_replace(F.lower(_c(col)), r"\s+", " ")), " ")
    sh = F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.transform(sh, lambda s: F.substring(F.md5(s), 1, prefix_hex))
