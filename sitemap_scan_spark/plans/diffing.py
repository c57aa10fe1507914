"""Change detection across crawl rounds — the reference's core value.

Re-expresses the diff subsystem (/root/reference/src/diff/) over the
engine's ``fetch_log`` round deltas:

- J3  two-round self-join (``compareDates``, diff/generator.ts:175-218)
- W7  lag() change-flag history (``getUrlHistory``, generator.ts:166-170)
- F13 normalized hash (comparer.ts:139-142) via functions/normalize.py
- F14 change magnitude: shared prefix/suffix → added/removed chars
      (comparer.ts:144-189) — Arrow-batched; the per-text scans are numpy
      vector compares (no per-CHAR Python loop)
- D5  line-set added/removed counts (comparer.ts:258-284)
- D6  word-set diff samples (comparer.ts:492-537)
- A3  change summary w/ argmax (``summarizeChanges``, comparer.ts:336-361)
- W11 priority-capped change list (generator.ts:248-273)
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructField, StructType

from ..functions.normalize import normalized_hash


def round_pair_diff(fetch_log: DataFrame, r1: int, r2: int) -> DataFrame:
    """J3: URLs fetched in both rounds with change classification.
    Output: (url_canon, changed, size_delta, norm_hash_1, norm_hash_2)."""
    a = (
        fetch_log.filter((F.col("round") == r1) & (F.col("status") == "fetched"))
        .select(
            "url_canon",
            F.col("text_extracted").alias("text_1"),
            normalized_hash(F.col("text_extracted")).alias("norm_hash_1"),
        )
    )
    b = (
        fetch_log.filter((F.col("round") == r2) & (F.col("status") == "fetched"))
        .select(
            "url_canon",
            F.col("text_extracted").alias("text_2"),
            normalized_hash(F.col("text_extracted")).alias("norm_hash_2"),
        )
    )
    return a.join(b, "url_canon", "inner").select(
        "url_canon",
        (F.col("norm_hash_1") != F.col("norm_hash_2")).alias("changed"),
        (F.length("text_2") - F.length("text_1")).alias("size_delta"),
        "norm_hash_1",
        "norm_hash_2",
        "text_1",
        "text_2",
    )


def url_history_flags(fetch_log: DataFrame) -> DataFrame:
    """W7: per-URL history ordered by round with hasChanges = hash ≠ lag(hash)
    (generator.ts:166-170). First observation → false, like the reference."""
    w = Window.partitionBy("url_canon").orderBy("round")
    h = fetch_log.filter(F.col("status") == "fetched").select(
        "url_canon",
        "round",
        normalized_hash(F.col("text_extracted")).alias("norm_hash"),
    )
    prev = F.lag("norm_hash").over(w)
    return h.select(
        "url_canon",
        "round",
        "norm_hash",
        F.when(prev.isNull(), F.lit(False)).otherwise(prev != F.col("norm_hash")).alias(
            "has_changes"
        ),
    )


_MAG_SCHEMA = StructType(
    [
        StructField("added_chars", IntegerType()),
        StructField("removed_chars", IntegerType()),
    ]
)


def _common_prefix_suffix(p: str, c: str) -> int:
    """Shared prefix + shared suffix length (in CHARS, suffix disjoint from
    prefix) via numpy code-point compares — utf-32-le gives one uint32 per
    Python char, so semantics match the char-wise oracle exactly while the
    scans run as vector ops instead of per-char Python."""
    a = np.frombuffer(p.encode("utf-32-le"), dtype=np.uint32)
    b = np.frombuffer(c.encode("utf-32-le"), dtype=np.uint32)
    n = min(a.size, b.size)
    if n == 0:
        return 0
    neq = a[:n] != b[:n]
    i = int(neq.argmax()) if neq.any() else n
    m = n - i
    if m == 0:
        return i
    neq_s = a[a.size - m :][::-1] != b[b.size - m :][::-1]
    j = int(neq_s.argmax()) if neq_s.any() else m
    return i + j


@F.pandas_udf(_MAG_SCHEMA)
def change_magnitude_udf(prev: pd.Series, curr: pd.Series) -> pd.DataFrame:
    """F14 (comparer.ts:144-189): shared-prefix + shared-suffix lengths on
    the two texts; added = len(curr)-common, removed = len(prev)-common.
    The per-text scans are numpy vector compares (``_common_prefix_suffix``)
    — no per-CHAR Python loop; only the cheap per-row dispatch remains."""
    added, removed = [], []
    for p, c in zip(prev, curr):
        p = p or ""
        c = c or ""
        common = _common_prefix_suffix(p, c)
        added.append(len(c) - common)
        removed.append(len(p) - common)
    return pd.DataFrame({"added_chars": added, "removed_chars": removed})


def render_diff_one(
    text1: str | None,
    text2: str | None,
    max_changes: int = 10,
    max_lines: int = 20,
) -> str:
    """F20 scalar (``generateSimpleDiff``, comparer.ts:221-256): positional
    line-by-line diff — '  ctx' / '- old' / '+ new' rows, stop after
    ``max_changes`` changed lines (append '... (truncated)'), emit at most
    ``max_lines`` rows. Empty-vs-set lines render one-sided like the
    reference's truthiness checks."""
    lines1 = (text1 or "").split("\n")
    lines2 = (text2 or "").split("\n")
    out: list[str] = []
    changes = 0
    for i in range(max(len(lines1), len(lines2))):
        if changes >= max_changes:
            break
        l1 = lines1[i] if i < len(lines1) else ""
        l2 = lines2[i] if i < len(lines2) else ""
        if l1 == l2:
            out.append(f"  {l2}")
        elif l1 and not l2:
            out.append(f"- {l1}")
            changes += 1
        elif l2 and not l1:
            out.append(f"+ {l2}")
            changes += 1
        else:
            out.append(f"- {l1}")
            out.append(f"+ {l2}")
            changes += 1
    if changes >= max_changes:
        out.append("... (truncated)")
    return "\n".join(out[:max_lines])


def render_progressive_diff_one(
    text1: str | None, text2: str | None, chunk_size: int = 50_000
) -> tuple[str, bool]:
    """F20 progressive variant (``generateProgressiveDiff``,
    generator.ts:220-246): diff only the first ``chunk_size`` chars of each
    side; is_partial flags that more content exists beyond the chunk."""
    t1 = (text1 or "")[:chunk_size]
    t2 = (text2 or "")[:chunk_size]
    is_partial = max(len(text1 or ""), len(text2 or "")) > chunk_size
    return render_diff_one(t1, t2), is_partial


def with_rendered_diff(
    diff: DataFrame,
    col1: str = "text_1",
    col2: str = "text_2",
    max_changes: int = 10,
    max_lines: int = 20,
) -> DataFrame:
    """Append the F20 rendered ``diff`` string to a round_pair_diff that
    kept text_1/text_2 — Arrow-batched pandas over the (small) changed
    subset; call AFTER filtering on ``changed`` so unchanged pages never
    pay the render."""
    from pyspark.sql.types import StringType

    @F.pandas_udf(StringType())
    def render(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [render_diff_one(x, y, max_changes, max_lines) for x, y in zip(a, b)]
        )

    return diff.withColumn("diff", render(F.col(col1), F.col(col2)))


def with_progressive_diff(
    diff: DataFrame,
    col1: str = "text_1",
    col2: str = "text_2",
    chunk_size: int = 50_000,
) -> DataFrame:
    """Append the F20 progressive rendered diff (generator.ts:220-246):
    ``diff`` over only the first ``chunk_size`` chars of each side plus the
    ``is_partial`` flag (more content exists past the chunk). Arrow-batched
    pandas over the (pre-filtered) changed subset, like
    :func:`with_rendered_diff`."""
    from pyspark.sql.types import BooleanType, StringType

    schema = StructType(
        [
            StructField("diff", StringType()),
            StructField("is_partial", BooleanType()),
        ]
    )

    @F.pandas_udf(schema)
    def render(a: pd.Series, b: pd.Series) -> pd.DataFrame:
        rows = [render_progressive_diff_one(x, y, chunk_size) for x, y in zip(a, b)]
        return pd.DataFrame(
            {"diff": [r[0] for r in rows], "is_partial": [r[1] for r in rows]}
        )

    return (
        diff.withColumn("_pd", render(F.col(col1), F.col(col2)))
        .select("*", "_pd.diff", "_pd.is_partial")
        .drop("_pd")
    )


def with_change_magnitude(diff: DataFrame) -> DataFrame:
    """Append F14 magnitudes to a round_pair_diff that kept text_1/text_2."""
    return diff.withColumn(
        "mag", change_magnitude_udf(F.col("text_1"), F.col("text_2"))
    ).select("*", "mag.added_chars", "mag.removed_chars").drop("mag")


def line_set_counts(a_col, b_col):
    """D5 (comparer.ts:258-284): added/removed line counts as set difference
    of line sets — pure JVM array ops."""
    lines = lambda c: F.array_distinct(F.split(c, "\n"))
    return (
        F.size(F.array_except(lines(b_col), lines(a_col))).alias("added_lines"),
        F.size(F.array_except(lines(a_col), lines(b_col))).alias("removed_lines"),
    )


def word_diff_sample(a_col, b_col, min_len: int = 4, cap: int = 20):
    """D6 (comparer.ts:492-537): words (> min_len-1 chars) present in one
    side only, capped at ``cap`` shown — JVM array ops."""
    words = lambda c: F.array_distinct(
        F.filter(F.split(c, r"\s+"), lambda w: F.length(w) >= min_len)
    )
    return (
        F.slice(F.sort_array(F.array_except(words(b_col), words(a_col))), 1, cap).alias(
            "words_added"
        ),
        F.slice(F.sort_array(F.array_except(words(a_col), words(b_col))), 1, cap).alias(
            "words_removed"
        ),
    )


def summarize_changes(diff: DataFrame) -> DataFrame:
    """A3 (comparer.ts:336-361): count/sum/avg/argmax over changed rows."""
    changed = diff.filter(F.col("changed"))
    return changed.agg(
        F.count("*").alias("n_changed"),
        F.sum(F.abs("size_delta")).alias("total_change"),
        F.round(F.avg(F.abs("size_delta")), 4).alias("avg_change"),
        F.max_by("url_canon", F.abs("size_delta")).alias("largest_change_url"),
    )


def limit_changes(diff: DataFrame, cap: int = 50) -> DataFrame:
    """W11 (generator.ts:248-273): keep the top changes split 60/20/20
    across magnitude tiers (large/medium/small), rank within tier."""
    tier = (
        F.when(F.abs("size_delta") >= 100, "large")
        .when(F.abs("size_delta") >= 10, "medium")
        .otherwise("small")
    )
    quota = (
        F.when(F.col("tier") == "large", int(cap * 0.6))
        .when(F.col("tier") == "medium", int(cap * 0.2))
        .otherwise(int(cap * 0.2))
    )
    w = Window.partitionBy("tier").orderBy(
        F.abs("size_delta").desc(), F.col("url_canon")
    )
    return (
        diff.filter(F.col("changed"))
        .withColumn("tier", tier)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= quota)
        .drop("rn")
    )
