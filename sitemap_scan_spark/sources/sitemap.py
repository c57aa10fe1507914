"""Sitemap / sitemap-index parsing and recursive expansion.

Re-expresses the reference's ``parseSitemap`` recursion
(/root/reference/src/backup/fetcher.ts:916-993: depth ≤ 10, ≤ 500 sitemaps
visited, cycle set on canonicalized URLs) and its loc/urlset parsing
(src/backup/sitemap.ts:55-155, fetcher.ts:882-899). The reference recurses
with await; we expand breadth-first as an iterative driver loop where each
LEVEL is one distributed join + mapInPandas parse over all hosts at once —
at 10^10 scale every level is a DataFrame job, never a per-sitemap fetch.

Parsing is regex-based like the reference's loc extraction (no XML dependency
in this container); bodies are parsed inside Arrow-batched pandas iterators.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from ..config import CrawlConfig
from ..functions.canonicalize import canonicalize_one, canonicalize_series

_RE_ROOT_URLSET = re.compile(r"<\s*urlset[\s>]", re.I)
_RE_ROOT_INDEX = re.compile(r"<\s*sitemapindex[\s>]", re.I)
_RE_URL_BLOCK = re.compile(r"<url\b.*?</url>", re.S | re.I)
_RE_SMAP_BLOCK = re.compile(r"<sitemap\b.*?</sitemap>", re.S | re.I)
_RE_LOC = re.compile(r"<loc>\s*(.*?)\s*</loc>", re.S | re.I)
_RE_PRIORITY = re.compile(r"<priority>\s*(.*?)\s*</priority>", re.S | re.I)


def parse_sitemap_one(
    xml: str, default_priority: float = 0.5
) -> tuple[str, list[tuple[str, float]]]:
    """→ (kind, entries). kind ∈ {'index','urlset','other'};
    entries = [(loc, priority)] for urlset, [(child_loc, nan)] for index."""
    if _RE_ROOT_INDEX.search(xml):
        locs = []
        for block in _RE_SMAP_BLOCK.findall(xml):
            m = _RE_LOC.search(block)
            if m and m.group(1):
                locs.append((m.group(1), float("nan")))
        return "index", locs
    if _RE_ROOT_URLSET.search(xml):
        out = []
        for block in _RE_URL_BLOCK.findall(xml):
            m = _RE_LOC.search(block)
            if not m or not m.group(1):
                continue
            pm = _RE_PRIORITY.search(block)
            try:
                pr = float(pm.group(1)) if pm else default_priority
            except ValueError:
                pr = default_priority
            out.append((m.group(1), pr))
        return "urlset", out
    return "other", []


_PARSE_SCHEMA = StructType(
    [
        StructField("sitemap_url", StringType()),
        StructField("kind", StringType()),
        StructField("locs", ArrayType(StringType())),
        StructField("priorities", ArrayType(DoubleType())),
    ]
)


def _parse_batch(default_priority: float):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            kinds, locs_col, prios_col = [], [], []
            for b in pdf["html"]:
                xml = (
                    b.decode("utf-8", "replace")
                    if isinstance(b, (bytes, bytearray))
                    else (b or "")
                )
                kind, entries = parse_sitemap_one(xml, default_priority)
                kinds.append(kind)
                locs_col.append([e[0] for e in entries])
                prios_col.append([e[1] for e in entries])
            yield pd.DataFrame(
                {
                    "sitemap_url": pdf["url_canon"],
                    "kind": kinds,
                    "locs": locs_col,
                    "priorities": prios_col,
                }
            )

    return gen


def expand_sitemaps(
    spark: SparkSession,
    pages_canon: DataFrame,
    root_sitemaps: list[str],
    cfg: CrawlConfig,
) -> DataFrame:
    """Breadth-first sitemap expansion over ALL hosts at once.

    pages_canon: pages with a ``url_canon`` column (pre-canonicalized scan).
    Returns (url_canon, priority) of every urlset loc discovered, already
    canonicalized but NOT yet exclude-filtered.

    Cycle/depth guards as in the reference: global visited set (anti-join),
    depth ≤ cfg.sitemap_max_depth, ≤ cfg.sitemap_max_visited sitemaps per
    host (enforced per level, deterministic by url_canon order).
    """
    roots = sorted({u for u in (canonicalize_one(r) for r in root_sitemaps) if u})
    if not roots:
        return spark.createDataFrame([], "url_canon string, priority double")

    # one pass over the corpus to isolate sitemap-shaped URLs; every
    # recursion level then joins against this small cached subset instead of
    # rescanning 100 TB of pages per level
    sm_pages = (
        pages_canon.filter(F.col("url_canon").rlike(cfg.sitemap_url_pattern))
        .select("url_canon", "html")
        .persist()
    )

    to_visit = spark.createDataFrame([(u,) for u in roots], "url_canon string")
    visited = spark.createDataFrame([], "url_canon string, host string")
    results: list[DataFrame] = []

    for _depth in range(cfg.sitemap_max_depth):
        if to_visit.isEmpty():
            break
        # per-host visited cap (reference: ≤500 per site, fetcher.ts:82) —
        # DISTRIBUTED: rank the level's candidates per host by url_canon and
        # keep rank + already-visited-count ≤ cap. Equivalent to the scalar
        # walk in url_canon order (the cap is per host, so global vs per-host
        # ordering is indistinguishable), with no driver-side collect —
        # millions of sitemaps per level never leave the executors.
        lvl = to_visit.withColumn(
            "host", F.regexp_extract("url_canon", r"^https?://([^/:?#]+)", 1)
        )
        counts = visited.groupBy("host").agg(F.count("*").alias("n_seen"))
        rn = F.row_number().over(Window.partitionBy("host").orderBy("url_canon"))
        batch = (
            lvl.withColumn("_rn", rn)
            .join(counts, "host", "left")
            .filter(
                F.col("_rn") + F.coalesce(F.col("n_seen"), F.lit(0))
                <= cfg.sitemap_max_visited
            )
            .select("url_canon", "host")
            # materialize per level: truncates the union/anti-join lineage
            # that otherwise deepens every BFS iteration
            .localCheckpoint(eager=True)
        )
        if batch.isEmpty():
            break
        visited = visited.unionByName(batch).localCheckpoint(eager=True)

        fetched = batch.select("url_canon").join(sm_pages, "url_canon", "inner").select(
            "url_canon", "html"
        )
        parsed = fetched.mapInPandas(
            _parse_batch(cfg.sitemap_default_priority), _PARSE_SCHEMA
        )
        exploded = parsed.select(
            "kind",
            F.explode(F.arrays_zip("locs", "priorities")).alias("e"),
        ).select(
            "kind",
            F.col("e.locs").alias("loc"),
            F.col("e.priorities").alias("priority"),
        )

        @F.pandas_udf(StringType())
        def _canon(u: pd.Series) -> pd.Series:
            return canonicalize_series(u)

        exploded = exploded.withColumn("url_canon", _canon("loc")).filter(
            F.col("url_canon").isNotNull()
        )
        urls = exploded.filter(F.col("kind") == "urlset").select(
            "url_canon", "priority"
        )
        results.append(urls)
        children = (
            exploded.filter(F.col("kind") == "index")
            .select("url_canon")
            .distinct()
            .join(visited.select("url_canon"), "url_canon", "left_anti")
        )
        to_visit = children

    if not results:
        sm_pages.unpersist()
        return spark.createDataFrame([], "url_canon string, priority double")
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    # dedup locs across sitemaps keeping max priority (D7 + D1 semantics);
    # materialize before unpersisting the cached sitemap subset
    final = out.groupBy("url_canon").agg(F.max("priority").alias("priority"))
    final = final.localCheckpoint(eager=True)
    sm_pages.unpersist()
    return final
