"""Crawl-only profile: the bench.py crawl_3rounds leg with SSC_TIMING stage
marks, N trials. Usage: python tools/crawl_prof.py [trials]."""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    os.environ.setdefault("SSC_TIMING", "1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from bench import BENCH_CORPUS, CRAWL_ROUNDS, ensure_corpus
    from sitemap_scan_spark.config import CrawlConfig
    from sitemap_scan_spark.plans.rounds import CrawlEngine
    from sitemap_scan_spark.session import get_spark

    spark = get_spark("crawl_prof", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    # experiment hook: SSC_CONF="k=v;k2=v2" sets runtime SQL confs
    for kv in filter(None, os.environ.get("SSC_CONF", "").split(";")):
        k, _, v = kv.partition("=")
        spark.conf.set(k, v)
        print(f"conf {k}={v}", flush=True)
    corpus = ensure_corpus()
    pages = spark.read.parquet(os.path.join(corpus, "pages.parquet"))
    seeds = spark.read.parquet(os.path.join(corpus, "seeds.parquet"))
    cfg = CrawlConfig(base_host_budget=400, round_size=50_000, max_depth=6, max_rounds=CRAWL_ROUNDS)
    times = []
    for t in range(trials):
        workdir = "/tmp/ssc_bench_workdir"
        shutil.rmtree(workdir, ignore_errors=True)
        eng = CrawlEngine(spark, pages, cfg, workdir)
        eng.init_frontier(seeds)
        t0 = time.time()
        stats = eng.run(seeds)
        dt = time.time() - t0
        times.append(dt)
        print(f"trial {t}: {dt:.2f}s  rounds={[round(s['secs'],2) for s in stats]}", flush=True)
    print(f"min={min(times):.2f} med={sorted(times)[len(times)//2]:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
