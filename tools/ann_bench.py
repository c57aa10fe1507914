"""IVF ANN recall curve — recall@k vs nprobe, documented evidence for the
quality/cost trade-off of the IVF path (operators/similarity.py:ivf_topk).

The corpus is a deterministic mixture-of-Gaussians (doc/image embeddings
cluster in practice — the regime IVF is built for; on isotropic noise NO
inverted-file method can beat brute force). Ground truth is exact cosine
top-k computed in numpy; the measured path is the REAL Spark pipeline:
ivf_pivots (hash-ordered) → ivf_assign (JVM argmax list_id) → ivf_topk
probing nprobe lists.

Usage: python tools/ann_bench.py [--n 20000] [--queries 25] [--md]
  --md appends the result table to BENCH/ANN_RECALL.md.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_LISTS = 16
K = 10
NPROBES = (1, 2, 4, 8, 16)
DIM = 32
CLUSTERS = 64
SEED = 7


def make_corpus(n: int, dim: int = DIM, clusters: int = CLUSTERS, seed: int = SEED):
    rng = np.random.RandomState(seed)
    centers = rng.normal(size=(clusters, dim)) * 3.0
    assign = rng.randint(0, clusters, n)
    vecs = (centers[assign] + rng.normal(size=(n, dim))).astype(np.float64)
    return vecs, centers, rng


def brute_topk_ids(vecs: np.ndarray, q: np.ndarray, k: int) -> set[int]:
    cos = (vecs @ q) / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(q) + 1e-12)
    return set(np.argsort(-cos, kind="stable")[:k].tolist())


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--queries", type=int, default=25)
    ap.add_argument("--md", action="store_true")
    args = ap.parse_args()

    from sitemap_scan_spark.operators.similarity import (
        ivf_assign,
        ivf_pivots,
        ivf_topk,
    )
    from sitemap_scan_spark.session import get_spark

    spark = get_spark("ann-bench", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    vecs, centers, rng = make_corpus(args.n)
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(args.n, dtype=np.int64),
            "embedding": [v.tolist() for v in vecs],
        }
    )
    df = spark.createDataFrame(pdf).repartition(32).persist()
    df.count()
    pivots = ivf_pivots(df, N_LISTS)
    assigned = ivf_assign(df, pivots).persist()
    assigned.count()

    # held-out queries: a cluster center + noise each (realistic probes)
    queries = [
        centers[rng.randint(0, CLUSTERS)] + rng.normal(size=DIM)
        for _ in range(args.queries)
    ]

    rows = []
    for nprobe in NPROBES:
        hits = total = 0
        t0 = time.time()
        for q in queries:
            got = {
                r.vec_id
                for r in ivf_topk(
                    df, q.tolist(), k=K, n_lists=N_LISTS, nprobe=nprobe,
                    assigned=assigned, pivots=pivots,
                ).collect()
            }
            want = brute_topk_ids(vecs, q, K)
            hits += len(got & want)
            total += len(want)
        secs = time.time() - t0
        rows.append(
            {
                "nprobe": nprobe,
                "recall@10": round(hits / total, 4),
                "lists_scanned_frac": round(nprobe / N_LISTS, 3),
                "sec/query": round(secs / len(queries), 3),
            }
        )
        print(rows[-1], flush=True)

    table = pd.DataFrame(rows)
    print(table.to_string(index=False))
    if args.md:
        from datetime import datetime, timezone

        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BENCH",
            "ANN_RECALL.md",
        )
        hdr = not os.path.exists(path)
        with open(path, "a") as f:
            if hdr:
                f.write(
                    "# IVF ANN recall@10 vs nprobe (tools/ann_bench.py)\n\n"
                    "Mixture-of-Gaussians corpus (64 clusters, dim 32, seed 7), "
                    "hash-ordered pivots, n_lists=16; ground truth = exact "
                    "numpy cosine top-10; measured path = the real Spark "
                    "ivf_assign/ivf_topk pipeline.\n\n"
                )
            f.write(
                f"## {datetime.now(timezone.utc).strftime('%Y-%m-%d %H:%M')}Z — "
                f"n={args.n}, queries={args.queries}\n\n"
            )
            f.write("| nprobe | recall@10 | lists scanned | sec/query |\n")
            f.write("|---|---|---|---|\n")
            for r in rows:
                f.write(
                    f"| {r['nprobe']} | {r['recall@10']} | "
                    f"{r['lists_scanned_frac']} | {r['sec/query']} |\n"
                )
            f.write("\n")
        print(f"appended to {path}")
    spark.stop()


if __name__ == "__main__":
    main()
