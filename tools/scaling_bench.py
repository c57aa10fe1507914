"""Scaling-efficiency evidence for the north rule: the SAME crawl job on the
SAME input at two parallelism levels (local[8] vs local[32] — the sandbox
stand-in for N vs 4N executors). Reports throughput at both and
efficiency = (T_32 / T_8) / 4, appending a row to BENCH/BASELINE.md.

Each level runs in a fresh SparkSession (stop + rebuild) so executor-thread
count, shuffle partitions, and scheduler state don't leak between runs.
Usage: python tools/scaling_bench.py [--quick]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# big corpus: ~1M pages, one hot host owning ~half — large enough that
# compute (parse/extract/shuffle) dominates scheduler overhead, so the
# N-vs-4N comparison measures the engine, not fixed job latency
CORPUS = os.environ.get("SPARK_GRAFT_SCALE_CORPUS", "/tmp/ssc_scale_corpus")
CORPUS_KNOBS = dict(n_hosts=600, mean_pages=800, n_seeds=60, hot_host=True, seed=42)


def run_crawl(cores: int, rounds: int, tag: str) -> dict:
    from sitemap_scan_spark.config import CrawlConfig
    from sitemap_scan_spark.plans.rounds import CrawlEngine
    from sitemap_scan_spark.session import get_spark

    spark = get_spark(f"scaling-{cores}", master=f"local[{cores}]", shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    workdir = f"/tmp/ssc_scaling_{tag}_{cores}"
    shutil.rmtree(workdir, ignore_errors=True)
    cfg = CrawlConfig(
        base_host_budget=300, round_size=200_000, max_depth=6, max_rounds=rounds
    )
    pages = spark.read.parquet(os.path.join(CORPUS, "pages.parquet"))
    # seed EVERY host so round 1 is a full-width dequeue (~budget × hosts
    # URLs) — steady-state throughput, not discovery ramp-up
    from pyspark.sql import functions as F

    seeds = (
        pages.select(
            F.regexp_extract("url", r"^https?://([^/:?#]+)", 1).alias("h")
        )
        .distinct()
        .select(
            F.concat(F.lit("https://"), F.lower("h"), F.lit("/")).alias("seed_url"),
            F.lit(0.7).alias("priority"),
        )
    )
    eng = CrawlEngine(spark, pages, cfg, workdir)  # prep outside timing
    eng.init_frontier(seeds)  # one-time discovery — also outside: the
    # metric is round throughput (dequeue→fetch→dedup), per BASELINE.json
    t0 = time.time()
    stats = eng.run(seeds)
    secs = time.time() - t0
    n = sum(s["n_taken"] for s in stats)
    # determinism evidence: the crawl order must be identical across levels
    order = [
        (r.round, r.rank, r.url_canon)
        for r in eng.crawl_order().orderBy("round", "rank").collect()
    ]
    spark.stop()
    return {
        "cores": cores,
        "rounds": len(stats),
        "urls": n,
        "secs": round(secs, 2),
        "urls_per_sec": round(n / secs, 1),
        "order": order,
    }


def main() -> None:
    rounds = 2 if "--quick" in sys.argv else 3
    if not os.path.exists(os.path.join(CORPUS, "pages.parquet")):
        from sim.genpages import generate

        generate(CORPUS, **CORPUS_KNOBS)

    r8 = run_crawl(8, rounds, "n")
    r32 = run_crawl(32, rounds, "4n")
    same_order = r8["order"] == r32["order"]
    eff = (r32["urls_per_sec"] / r8["urls_per_sec"]) / 4
    out = {
        "local8": {k: v for k, v in r8.items() if k != "order"},
        "local32": {k: v for k, v in r32.items() if k != "order"},
        "scaling_efficiency": round(eff, 3),
        "crawl_order_identical": same_order,
    }
    print(json.dumps(out, indent=1))

    line = (
        f"| {time.strftime('%Y-%m-%d %H:%M')} | {r8['urls']} URLs / {r8['rounds']} rounds "
        f"| {r8['urls_per_sec']} | {r32['urls_per_sec']} | {out['scaling_efficiency']} "
        f"| {'yes' if same_order else 'NO'} |\n"
    )
    os.makedirs("BENCH", exist_ok=True)
    path = os.path.join("BENCH", "BASELINE.md")
    if not os.path.exists(path):
        with open(path, "w") as f:
            f.write(
                "# BENCH/BASELINE — scaling-efficiency evidence (north rule)\n\n"
                "Same crawl job, same input corpus (200 hosts, hot-host skew, seed=42),\n"
                "run at local[8] (N) and local[32] (4N). Efficiency = "
                "(throughput_32/throughput_8)/4. The north rule requires ≥ 0.8;\n"
                "crawl order must be bit-identical across levels.\n\n"
                "| when | work | URLs/s @8 | URLs/s @32 | efficiency | order identical |\n"
                "|---|---|---|---|---|---|\n"
            )
    with open(path, "a") as f:
        f.write(line)


if __name__ == "__main__":
    main()
