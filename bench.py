"""Benchmark harness. Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Two parts:
1. headline operator queries from __spark_entry__ at $SPARK_GRAFT_SF_DIR
   (default /root/testdata/sf0.1) — per-query wall seconds;
2. the crawl-engine throughput benchmark: a cached deterministic synthetic
   corpus (200 hosts, hot-host skew) crawled for 3 rounds — reported as
   frontier URLs processed/sec (the BASELINE.json metric).

Multi-trial (round-3 VERDICT item 4): the sandbox is a shared box with
±2x tenant noise run-to-run, so every number is min-of-N trials
($SPARK_GRAFT_BENCH_TRIALS, default 3) with the median reported alongside
— "value"/"queries" carry the mins (the least-noise estimate of true
cost), "queries_median"/"value_median" the medians, "trials" the count.

Scaling-efficiency evidence (local[8] vs local[32]) lives in
tools/scaling_bench.py → BENCH/BASELINE.md; this per-round bench keeps to a
single parallelism level for runtime.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "frontier_dequeue",
    "url_seen_anti",
    "lag_change_flag",
    "run_counters",
    "overview_join",
    "text_norm_hash",
    "minhash",
    "simhash",
    "embedding_topk",
    "ngram_jaccard",
]

BENCH_CORPUS = os.environ.get("SPARK_GRAFT_BENCH_CORPUS", "/tmp/ssc_bench_corpus")
CRAWL_ROUNDS = 3


def ensure_corpus() -> str:
    marker = os.path.join(BENCH_CORPUS, "pages.parquet")
    if not os.path.exists(marker):
        from sim.genpages import generate

        os.makedirs(BENCH_CORPUS, exist_ok=True)
        generate(
            BENCH_CORPUS, n_hosts=200, mean_pages=120, n_seeds=24, hot_host=True, seed=42
        )
    return BENCH_CORPUS


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    trials = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3")))

    import __spark_entry__ as entrymod
    from sitemap_scan_spark.config import CrawlConfig
    from sitemap_scan_spark.plans.rounds import CrawlEngine
    from sitemap_scan_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    runs: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _t in range(trials):
        for name in HEADLINE:
            fn = qs[name]
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.count()
            runs[name].append(time.time() - t0)

    # crawl throughput — fresh workdir per trial, discovery outside timing
    # (engine construction + sitemap expansion are one-time costs; the
    # metric is per-round dequeue→fetch→dedup throughput)
    corpus = ensure_corpus()
    pages = spark.read.parquet(os.path.join(corpus, "pages.parquet"))
    seeds = spark.read.parquet(os.path.join(corpus, "seeds.parquet"))
    cfg = CrawlConfig(base_host_budget=400, round_size=50_000, max_depth=6, max_rounds=CRAWL_ROUNDS)
    crawl_runs: list[float] = []
    n_processed = 0
    n_rounds = 0
    for _t in range(trials):
        workdir = "/tmp/ssc_bench_workdir"
        shutil.rmtree(workdir, ignore_errors=True)
        eng = CrawlEngine(spark, pages, cfg, workdir)
        eng.init_frontier(seeds)
        t0 = time.time()
        stats = eng.run(seeds)
        crawl_runs.append(time.time() - t0)
        n_processed = sum(s["n_taken"] for s in stats)
        n_rounds = len(stats)
    runs["crawl_3rounds"] = crawl_runs

    mins = {name: round(min(v), 3) for name, v in runs.items()}
    medians = {name: round(statistics.median(v), 3) for name, v in runs.items()}
    spreads = {
        name: round(max(v) / max(min(v), 1e-9), 2) for name, v in runs.items()
    }
    out = {
        "metric": "headline suite wall time + frontier throughput",
        "value": round(sum(mins.values()), 3),
        "unit": "sec",
        "queries": mins,
        "queries_median": medians,
        "value_median": round(sum(medians.values()), 3),
        "trials": trials,
        "max_over_min_spread": spreads,
        "sf": sf_dir.rstrip("/").split("sf")[-1],
        "crawl": {
            "rounds": n_rounds,
            "urls_processed": n_processed,
            "urls_per_sec": round(n_processed / max(min(crawl_runs), 1e-9), 1),
            "corpus_pages": pages.count(),
        },
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
