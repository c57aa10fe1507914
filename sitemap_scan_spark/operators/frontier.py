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

    # Global cap: TakeOrdered (partial per-partition sort + merge of the
    # top round_size), then rank over the ≤ round_size taken rows — the
    # single-partition window is bounded by round_size, never by frontier
    # size, so it stays O(round_size) at any scale.
    taken = survivors.orderBy(*order_key()).limit(round_size)
    w_rank = Window.orderBy(*order_key())
    return taken.withColumn("rank", F.row_number().over(w_rank))
