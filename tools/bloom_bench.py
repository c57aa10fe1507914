"""Bloom-per-bucket evidence (VERDICT r1 #3): measure how much of the
exact anti-join's input the routed ShardedBloom prefilter removes, and the
wall-time effect, on a synthetic URL-seen workload.

Prints one JSON line:
  {"seen": N, "candidates": M, "truly_new": K,
   "exact_join_input_sharded": rows that still hit the left_anti backstop,
   "skip_fraction": 1 - input/M, "secs_plain_anti": s, "secs_sharded": s}

The sharded prefilter's value at 10^10 keys is structural (no 12 GB
broadcast, per-shard build/ship); this local run documents the join-input
reduction — bloom-negative candidates (the common case for genuinely new
URLs) never enter the shuffle.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from sitemap_scan_spark.operators.urlseen import ShardedBloom, exact_anti_join
    from sitemap_scan_spark.session import get_spark

    n_seen = int(os.environ.get("SSC_BLOOM_SEEN", "2000000"))
    n_cand = int(os.environ.get("SSC_BLOOM_CANDS", "500000"))
    overlap = float(os.environ.get("SSC_BLOOM_OVERLAP", "0.3"))

    spark = get_spark("bloombench", master="local[16]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    seen = (
        spark.range(0, n_seen)
        .select(F.concat(F.lit("https://b.test/p"), F.col("id")).alias("url_canon"))
        .persist()
    )
    n_old = int(n_cand * overlap)
    cands = (
        spark.range(n_seen - n_old, n_seen - n_old + n_cand)
        .select(F.concat(F.lit("https://b.test/p"), F.col("id")).alias("url_canon"))
        .persist()
    )
    seen.count()
    cands.count()

    t0 = time.time()
    n_plain = exact_anti_join(cands, seen).count()
    secs_plain = time.time() - t0

    bloom = ShardedBloom(expected_total=n_seen * 2, n_shards=16)
    t0 = time.time()
    bloom.update(seen)
    secs_build = time.time() - t0

    t0 = time.time()
    definite_new, needs_check = bloom.split(cands)
    n_join_input = needs_check.count()
    n_sharded = n_join_input and needs_check.join(
        seen, "url_canon", "left_anti"
    ).count()
    n_new_total = definite_new.count() + (n_sharded or 0)
    secs_sharded = time.time() - t0

    assert n_new_total == n_plain, (n_new_total, n_plain)  # exactness
    out = {
        "seen": n_seen,
        "candidates": n_cand,
        "truly_new": n_plain,
        "exact_join_input_sharded": n_join_input,
        "skip_fraction": round(1 - n_join_input / n_cand, 4),
        "secs_plain_anti": round(secs_plain, 2),
        "secs_bloom_build_once": round(secs_build, 2),
        "secs_sharded_probe_plus_backstop": round(secs_sharded, 2),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
