"""Per-query isolation bench (guide §1.4) — NOT the driver's bench.

Times each declared query two ways, min-of-N:
  count  — the frozen bench.py methodology (df.count(), planning included);
  noop   — full-column materialization via the noop sink.

Usage: python bench_extra.py [trials] [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0), SPARK_GRAFT_CPUS.
Prints one JSON line with per-query seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import HEADLINE  # single source of truth for the timed set


def main() -> None:
    args = sys.argv[1:]
    if args and args[0].isdigit():
        trials, names = int(args[0]), args[1:]
    else:
        trials, names = 3, args
    names = names or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import __spark_entry__ as entrymod
    from sitemap_scan_spark.session import get_spark

    spark = get_spark("bench_extra", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    # experiment hook: SSC_CONF="k=v;k2=v2" sets runtime SQL confs
    for kv in filter(None, os.environ.get("SSC_CONF", "").split(";")):
        k, _, v = kv.partition("=")
        spark.conf.set(k, v)
        print(f"conf {k}={v}", file=sys.stderr)
    qs = entrymod.queries()

    out: dict[str, dict[str, float]] = {}
    for name in names:
        fn = qs[name]
        counts, noops = [], []
        for _ in range(trials):
            spark.sparkContext.setJobDescription(f"{name}: count")
            t0 = time.time()
            fn(spark, sf_dir).count()
            counts.append(time.time() - t0)
            spark.sparkContext.setJobDescription(f"{name}: noop")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            noops.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        out[name] = {
            "count": round(min(counts), 3),
            "noop": round(min(noops), 3),
            "count_med": round(sorted(counts)[len(counts) // 2], 3),
        }
        print(f"{name}: count={out[name]['count']} noop={out[name]['noop']}", file=sys.stderr)
    print(json.dumps({"sf": sf_dir, "trials": trials, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
