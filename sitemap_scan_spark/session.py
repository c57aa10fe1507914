"""SparkSession builder tuned for the crawl engine.

Local testing runs on ``local[N]`` but every setting is chosen for a
multi-executor cluster at 100 TB scale:

- AQE on (runtime coalesce + skew-join splitting for hot hosts),
- Arrow on (every Python crossing is a vectorized pandas UDF),
- shuffle partitions sized to cores locally; on a real cluster leave the
  default high (or rely on AQE coalescing) so 100 TB shuffles don't produce
  multi-GB partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "sitemap-scan-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or local[*]) so the
    bench harness can pin parallelism; on a cluster pass None and let
    spark-submit decide.
    """
    # Make the package importable by Python workers regardless of the
    # consumer's cwd — the local-mode analog of spark-submit --py-files.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{existing}" if existing else pkg_root
        )

    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        if master.startswith("local["):
            inner = master[len("local[") : -1]
            shuffle_partitions = 32 if inner == "*" else max(8, int(inner))
        else:
            shuffle_partitions = 200

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let the planner pick shuffled-hash over sort-merge when the
        # per-partition build side is ESTIMATED to fit (guide §3.1/§9) —
        # avoids sorting both sides of the per-round anti-joins. Caveat:
        # the decision is plan-time size estimation and SHJ's build side
        # cannot spill, so badly underestimated build sides (stale stats
        # after selective filters) can OOM where sort-merge would have
        # spilled; revisit per-join with SHUFFLE_MERGE hints if that bites.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # pages.html is a wide binary column; keep scan splits modest so a
        # single task never holds multi-GB row groups at 100 TB scale.
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
