"""Hot-host skew evidence (north rule): the two-phase salted dequeue vs the
naive per-host window on a frontier where ONE host owns ~half of all URLs.

Builds the full pending frontier from the scale corpus (hot host included),
times dequeue(salt=1) vs dequeue(salt=16) at the same core count, verifies
the outputs are IDENTICAL (salting is semantics-preserving pruning), and
appends the numbers to BENCH/BASELINE.md.

Also measures the FETCH JOIN under a 50%-skew *taken* set (round-3 VERDICT
item 8): the engine broadcasts the round-sized taken side and streams the
pages scan past it, so output partitioning follows the (uniform) scan
splits, not hosts — a skewed taken set must cost the same as a uniform one
and leave no straggler partition. Reported: skew/uniform wall ratio +
max/median output-partition balance.

Usage: python tools/skew_bench.py [--cores 16] [--budget 500]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = os.environ.get("SPARK_GRAFT_SCALE_CORPUS", "/tmp/ssc_scale_corpus")


def main() -> None:
    cores, budget = 16, 500
    for i, a in enumerate(sys.argv):
        if a == "--cores" and i + 1 < len(sys.argv):
            cores = int(sys.argv[i + 1])
        if a == "--budget" and i + 1 < len(sys.argv):
            budget = int(sys.argv[i + 1])

    from pyspark.sql import functions as F

    from sitemap_scan_spark.functions.canonicalize import canonicalize_udf
    from sitemap_scan_spark.operators.frontier import dequeue
    from sitemap_scan_spark.session import get_spark

    s = get_spark(f"skew{cores}", master=f"local[{cores}]", shuffle_partitions=cores)
    s.sparkContext.setLogLevel("ERROR")
    frontier = (
        s.read.parquet(os.path.join(CORPUS, "pages.parquet"))
        .select(canonicalize_udf("url").alias("url_canon"))
        .filter(F.col("url_canon").isNotNull())
        .select(
            "url_canon",
            F.regexp_extract("url_canon", r"^https?://([^/:?#]+)", 1).alias("host"),
            F.lit(1).alias("depth"),
            F.lit(0.5).alias("priority"),
            F.lit(0).alias("discovered_round"),
            F.lit(None).cast("int").alias("crawl_delay"),
        )
    )
    frontier = frontier.localCheckpoint(eager=True)  # isolate dequeue timing
    n = frontier.count()
    hot = frontier.groupBy("host").count().orderBy(F.col("count").desc()).first()
    print(f"frontier={n} rows, hottest host {hot.host} = {hot['count']} rows")

    results = {}
    outs = {}
    for salt in (1, 16):
        t0 = time.time()
        out = dequeue(frontier, budget, round_size=10**9, salt_buckets=salt)
        cnt = out.count()
        dt = round(time.time() - t0, 2)
        results[f"salt_{salt}"] = dt
        outs[salt] = out.select("url_canon", "rank")
        print(f"salt={salt}: {dt}s taken={cnt}")

    diff = outs[1].exceptAll(outs[16]).count() + outs[16].exceptAll(outs[1]).count()
    results["identical_output"] = diff == 0
    results["speedup"] = round(results["salt_1"] / results["salt_16"], 2)
    print(json.dumps(results))

    os.makedirs("BENCH", exist_ok=True)
    with open(os.path.join("BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n### Hot-host skew dequeue ({time.strftime('%Y-%m-%d %H:%M')}, "
            f"{n} frontier rows, hottest host {hot['count']} rows, "
            f"budget {budget}, cores {cores})\n\n"
            f"| naive window (salt=1) | salted two-phase (salt=16) | speedup | identical output |\n"
            f"|---|---|---|---|\n"
            f"| {results['salt_1']}s | {results['salt_16']}s "
            f"| {results['speedup']}× | {'yes' if diff == 0 else 'NO'} |\n"
        )

    # ---- fetch join under a 50%-skew taken set -----------------------------
    pages = (
        s.read.parquet(os.path.join(CORPUS, "pages.parquet"))
        .select(canonicalize_udf("url").alias("url_canon"), "html")
        .filter(F.col("url_canon").isNotNull())
    )
    take_n = budget * 64
    hot_rows = frontier.filter(F.col("host") == hot.host).limit(take_n // 2)
    cold_uniform = frontier.filter(F.col("host") != hot.host)
    skew_taken = hot_rows.unionByName(
        cold_uniform.limit(take_n - take_n // 2)
    ).select("url_canon").localCheckpoint(eager=True)
    uniform_taken = (
        cold_uniform.limit(take_n).select("url_canon").localCheckpoint(eager=True)
    )

    def fetch_join(taken):
        # the engine's fetch-join shape (rounds.py: broadcast inner) + a
        # content-dependent agg so the html column is actually decoded
        joined = pages.join(F.broadcast(taken), "url_canon", "inner")
        balance = (
            joined.groupBy(F.spark_partition_id().alias("p"))
            .agg(F.count("*").alias("rows"))
            .collect()
        )
        sizes = sorted(r.rows for r in balance)
        t0 = time.time()
        joined.agg(F.sum(F.length("html"))).collect()
        dt = round(time.time() - t0, 2)
        med = sizes[len(sizes) // 2] if sizes else 0
        return dt, round(max(sizes) / max(med, 1), 2) if sizes else 0.0

    t_uni, bal_uni = fetch_join(uniform_taken)
    t_skew, bal_skew = fetch_join(skew_taken)
    fj = {
        "taken_rows": take_n,
        "uniform_secs": t_uni,
        "skew_secs": t_skew,
        "skew_over_uniform": round(t_skew / max(t_uni, 1e-9), 2),
        "partition_max_over_median_uniform": bal_uni,
        "partition_max_over_median_skew": bal_skew,
    }
    print(json.dumps(fj))
    with open(os.path.join("BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n### Fetch join under 50%-skew taken set "
            f"({time.strftime('%Y-%m-%d %H:%M')}, {take_n} taken rows, cores {cores})\n\n"
            f"| uniform taken | 50%-hot-host taken | skew/uniform | "
            f"partition max/median (uniform) | (skew) |\n"
            f"|---|---|---|---|---|\n"
            f"| {t_uni}s | {t_skew}s | {fj['skew_over_uniform']}× "
            f"| {bal_uni} | {bal_skew} |\n"
        )
    s.stop()


if __name__ == "__main__":
    main()
