"""Benchmark harness. Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Two parts:
1. headline operator queries from __spark_entry__ at $SPARK_GRAFT_SF_DIR
   (default /root/testdata/sf0.1) — per-query wall seconds;
2. the crawl-engine throughput benchmark: a cached deterministic synthetic
   corpus (200 hosts, hot-host skew) crawled for 3 rounds — reported as
   frontier URLs processed/sec (the BASELINE.json metric).

Scaling-efficiency evidence (local[8] vs local[32]) lives in
tools/scaling_bench.py → BENCH/BASELINE.md; this per-round bench keeps to a
single parallelism level for runtime.
"""

from __future__ import annotations

import json
import os
import shutil
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

    import __spark_entry__ as entrymod
    from sitemap_scan_spark.config import CrawlConfig
    from sitemap_scan_spark.plans.rounds import CrawlEngine
    from sitemap_scan_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    times: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        dt = time.time() - t0
        times[name] = round(dt, 3)
        total += dt

    # crawl throughput
    corpus = ensure_corpus()
    workdir = "/tmp/ssc_bench_workdir"
    shutil.rmtree(workdir, ignore_errors=True)
    cfg = CrawlConfig(base_host_budget=400, round_size=50_000, max_depth=6, max_rounds=CRAWL_ROUNDS)
    pages = spark.read.parquet(os.path.join(corpus, "pages.parquet"))
    seeds = spark.read.parquet(os.path.join(corpus, "seeds.parquet"))
    # engine construction + discovery = one-time costs (the Iceberg
    # materialized-view analog + sitemap expansion) — the metric is
    # per-round dequeue→fetch→dedup throughput
    eng = CrawlEngine(spark, pages, cfg, workdir)
    eng.init_frontier(seeds)
    t0 = time.time()
    stats = eng.run(seeds)
    crawl_secs = time.time() - t0
    n_processed = sum(s["n_taken"] for s in stats)
    times["crawl_3rounds"] = round(crawl_secs, 3)
    total += crawl_secs

    out = {
        "metric": "headline suite wall time + frontier throughput",
        "value": round(total, 3),
        "unit": "sec",
        "queries": times,
        "sf": sf_dir.rstrip("/").split("sf")[-1],
        "crawl": {
            "rounds": len(stats),
            "urls_processed": n_processed,
            "urls_per_sec": round(n_processed / max(crawl_secs, 1e-9), 1),
            "corpus_pages": pages.count(),
        },
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
