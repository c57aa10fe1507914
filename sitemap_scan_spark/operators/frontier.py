"""Frontier politeness dequeue — the north-star operator (SURVEY §2.6 W1/P7).

Re-expresses the reference's batch slicing (``allUrls.slice(offset,
offset+batchSize)``, /root/reference/src/backup/fetcher.ts:185) and
concurrency clamp (:1098-1099) as a deterministic, parallelism-independent
window dequeue:

  total order  (priority DESC, depth ASC, discovered_round ASC, url_canon ASC)
  per-host     row_number() over that order ≤ budget(host)
  budget(host) = max(1, base // crawl_delay)   (politeness)
  global cap   orderBy(key).limit(round_size)  (TakeOrdered — no full sort)

Hot-host skew (north rule): a single host owning 50 % of the frontier makes
the naive per-host window one giant partition. We run a TWO-PHASE dequeue:
phase 1 ranks within (host, salt) buckets — salt = pmod(xxhash64(url_canon),
K) — keeping ≤ budget rows per bucket (semantics-preserving pruning: any row
outside the per-bucket top-budget cannot be in the per-host top-budget);
phase 2 ranks the ≤ K·budget survivors per host exactly. The skewed shuffle
now moves ≤ K·budget rows per host instead of the whole hot host.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def include_filter(
    df: DataFrame, patterns: list[str], col: str = "url_canon"
) -> DataFrame:
    """P2 (``filterUrlsByPattern``, src/backup/sitemap.ts:186-197): keep URLs
    matching ANY pattern; ``*`` is a glob wildcard (→ ``.*``), everything
    else regex-escaped like the reference's passthrough. One alternation
    rlike — a single JVM regex pass."""
    if not patterns:
        return df
    import re as _re

    parts = []
    for p in patterns:
        parts.append(".*".join(_re.escape(seg) for seg in p.split("*")))
    return df.filter(F.col(col).rlike("(?i)(" + "|".join(parts) + ")"))


def revisit_batch(
    snapshot: DataFrame,
    cursor: int,
    batch_size: int,
    col: str = "url_canon",
) -> tuple[DataFrame, int, int]:
    """W9 (``getSitemapListenerBatch``, fetcher.ts:507-559): rolling
    wrap-around recheck over the sorted canonical snapshot —
    rows [cursor, cursor+batch) mod total, new cursor wraps to 0.

    Returns (batch_df, new_cursor, total). The global row_number is bounded
    by a pre-filter in the wrap-free case; at 10^10 scale the snapshot
    carries a persisted ``seq`` column instead (assigned once at snapshot
    build), making this a pure range filter."""
    total = snapshot.count()
    if total == 0:
        return snapshot, 0, 0
    cursor = cursor % total
    end = cursor + batch_size
    w = Window.orderBy(F.col(col).asc())
    numbered = snapshot.withColumn("_rn", F.row_number().over(w) - 1)
    if end <= total:
        batch = numbered.filter((F.col("_rn") >= cursor) & (F.col("_rn") < end))
        new_cursor = end % total
    else:  # wrap
        batch = numbered.filter(
            (F.col("_rn") >= cursor) | (F.col("_rn") < end - total)
        )
        new_cursor = end - total
    return batch.drop("_rn"), new_cursor, total


def order_key() -> list[Column]:
    return [
        F.col("priority").desc(),
        F.col("depth").asc(),
        F.col("discovered_round").asc(),
        F.col("url_canon").asc(),
    ]


def host_budget_col(base_budget: int) -> Column:
    """Politeness budget from the robots crawl_delay column (null → base)."""
    return F.when(
        F.col("crawl_delay").isNotNull() & (F.col("crawl_delay") > 0),
        F.greatest(F.lit(1), F.floor(F.lit(base_budget) / F.col("crawl_delay"))),
    ).otherwise(F.lit(base_budget)).cast("int")


def dequeue(
    eligible: DataFrame,
    base_budget: int,
    round_size: int,
    salt_buckets: int = 8,
) -> DataFrame:
    """Select this round's fetch set with a 1-based global ``rank``.

    ``eligible`` needs (url_canon, host, depth, priority, discovered_round,
    crawl_delay). Returns the same columns + rank, ≤ round_size rows.
    """
    budget = host_budget_col(base_budget)
    df = eligible.withColumn("_budget", budget)

    if salt_buckets > 1:
        w1 = Window.partitionBy(
            "host", F.pmod(F.xxhash64("url_canon"), F.lit(salt_buckets))
        ).orderBy(*order_key())
        df = (
            df.withColumn("_r1", F.row_number().over(w1))
            .filter(F.col("_r1") <= F.col("_budget"))
            .drop("_r1")
        )

    w2 = Window.partitionBy("host").orderBy(*order_key())
    survivors = (
        df.withColumn("_r2", F.row_number().over(w2))
        .filter(F.col("_r2") <= F.col("_budget"))
        .drop("_r2", "_budget")
    )

    # Global rank + cap WITHOUT a single-partition merge (the naive
    # Window.orderBy(global) funnels every survivor through ONE task):
    # 1. range-repartition on the order key (parallel total sort),
    # 2. per-range-bucket row_number (parallel windows),
    # 3. global rank = local rank + broadcast cumulative bucket offsets
    #    (one tiny count job) — contiguous, deterministic, never serial.
    spark = survivors.sparkSession
    n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    bucketed = survivors.repartitionByRange(n_buckets, *order_key()).withColumn(
        "_bucket", F.spark_partition_id()
    )
    bucketed = bucketed.persist()
    sizes = {
        r._bucket: r["count"]
        for r in bucketed.groupBy("_bucket").count().collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for b in sorted(sizes):
        offsets[b] = acc
        acc += sizes[b]
    offset_expr = (
        F.element_at(
            F.create_map(
                *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
            ),
            F.col("_bucket"),
        )
        if offsets
        else F.lit(0)
    )
    w_local = Window.partitionBy("_bucket").orderBy(*order_key())
    ranked = (
        bucketed.withColumn(
            "rank", (F.row_number().over(w_local) + offset_expr).cast("int")
        )
        .filter(F.col("rank") <= round_size)
        .drop("_bucket")
    )
    # expose the cached intermediate so the caller can unpersist after
    # materializing (at most one round's survivors ever sit in cache)
    ranked._ssc_persisted = bucketed
    return ranked
