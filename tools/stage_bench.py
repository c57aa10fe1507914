"""Data-stage scaling: times the engine's four heavy data paths in
isolation at N vs 4N cores, so the scaling story separates the parts that
grow with data (these) from fixed driver orchestration (~constant per
round, amortized away at cluster scale where rounds are 10^7-10^8 URLs).

Stages measured over the full scale corpus (~1-2.5M pages):
  scan+extract : parquet scan → JVM regex text extraction → agg
  parse-links  : scan → regexp_extract_all links → explode → count
  shuffle-agg  : host groupBy count (the dequeue's shuffle shape)
  py-canon     : pandas-UDF canonicalization of every URL

Appends a table to BENCH/BASELINE.md. Usage: python tools/stage_bench.py [--cores 4,16]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = os.environ.get("SPARK_GRAFT_SCALE_CORPUS", "/tmp/ssc_scale_corpus")


def run(cores: int) -> dict[str, float]:
    from pyspark.sql import functions as F

    from sitemap_scan_spark.functions.canonicalize import canonicalize_udf
    from sitemap_scan_spark.functions.extract import (
        extract_links_col,
        extract_text_col,
    )
    from sitemap_scan_spark.session import get_spark

    s = get_spark(f"stage{cores}", master=f"local[{cores}]", shuffle_partitions=cores)
    s.sparkContext.setLogLevel("ERROR")
    df = s.read.parquet(os.path.join(CORPUS, "pages.parquet"))
    out: dict[str, float] = {}

    t0 = time.time()
    df.select(F.length(extract_text_col("html")).alias("l")).agg(F.sum("l")).collect()
    out["scan_extract"] = round(time.time() - t0, 2)

    t0 = time.time()
    df.select(F.explode(extract_links_col("html")).alias("x")).count()
    out["parse_links"] = round(time.time() - t0, 2)

    t0 = time.time()
    df.select(
        F.regexp_extract("url", r"^https?://([^/:?#]+)", 1).alias("h")
    ).groupBy("h").count().count()
    out["shuffle_agg"] = round(time.time() - t0, 2)

    t0 = time.time()
    df.select(canonicalize_udf("url").alias("c")).filter(
        F.col("c").isNotNull()
    ).count()
    out["py_canon"] = round(time.time() - t0, 2)

    s.stop()
    return out


def main() -> None:
    n, n4 = 4, 16
    for i, a in enumerate(sys.argv):
        if a == "--cores" and i + 1 < len(sys.argv):
            n, n4 = (int(x) for x in sys.argv[i + 1].split(","))
    rn = run(n)
    r4 = run(n4)
    eff = {k: round(rn[k] / r4[k] / 4, 3) for k in rn}
    print(json.dumps({f"local{n}": rn, f"local{n4}": r4, "efficiency": eff}, indent=1))

    os.makedirs("BENCH", exist_ok=True)
    with open(os.path.join("BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n### Data-stage scaling ({time.strftime('%Y-%m-%d %H:%M')}, cores {n}→{n4})\n\n"
            "| stage | secs @N | secs @4N | efficiency |\n|---|---|---|---|\n"
        )
        for k in rn:
            f.write(f"| {k} | {rn[k]} | {r4[k]} | {eff[k]} |\n")


if __name__ == "__main__":
    main()
