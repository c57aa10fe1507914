"""spark-submit --py-files launch demo (north_star: 'launched with
spark-submit --py-files on multi-executor clusters').

Packages the engine as a zip, then this script — submitted with
``spark-submit --py-files sitemap_scan_spark.zip,sim.zip tools/submit_demo.py`` —
runs a small crawl end-to-end importing ONLY from the shipped zips.

Build + run (tools/submit.sh does exactly this):
    python tools/make_pyfiles.py
    $SPARK_HOME/bin/spark-submit --master 'local[8]' \
        --py-files /tmp/ssc_pyfiles/sitemap_scan_spark.zip,/tmp/ssc_pyfiles/sim.zip \
        tools/submit_demo.py
"""

from __future__ import annotations

import json
import shutil
import sys

from pyspark.sql import SparkSession


def main() -> None:
    spark = SparkSession.builder.appName("ssc-submit-demo").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # imports resolve from --py-files zips (no repo on sys.path)
    from sim.genpages import generate
    from sitemap_scan_spark.config import CrawlConfig
    from sitemap_scan_spark.plans.metrics import summarize
    from sitemap_scan_spark.plans.rounds import CrawlEngine

    corpus = "/tmp/ssc_submit_corpus"
    generate(corpus, n_hosts=15, mean_pages=30, n_seeds=3, seed=11)
    pages = spark.read.parquet(f"{corpus}/pages.parquet")
    seeds = spark.read.parquet(f"{corpus}/seeds.parquet")
    wd = "/tmp/ssc_submit_wd"
    shutil.rmtree(wd, ignore_errors=True)
    eng = CrawlEngine(
        spark, pages, CrawlConfig(base_host_budget=5, round_size=100, max_rounds=3), wd
    )
    eng.run(seeds)
    out = summarize(eng.store)
    print("SUBMIT_DEMO_RESULT " + json.dumps(out))
    assert out["n_taken"] > 0 and out["n_fetched"] > 0
    spark.stop()


if __name__ == "__main__":
    main()
