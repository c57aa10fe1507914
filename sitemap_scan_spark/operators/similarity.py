"""Similarity search over embedding columns (array<float>).

Two paths, both over the ``embeddings(vec_id, embedding, label)`` shape:

- **brute-force cosine top-k** — the exactness baseline: JVM-side
  ``zip_with``/``aggregate`` dot products against a broadcast query vector,
  TakeOrdered top-k. O(N·d) per query but embarrassingly parallel and
  shuffle-free until the final top-k merge.
- **LSH-bucketed ANN** — the 100 TB path: random-hyperplane sign bits
  (deterministic seeded planes, Arrow-batched numpy matmul — one vectorized
  pandas UDF, no per-row Python) bucket the corpus; queries probe only
  their bucket (+ Hamming-1 neighbors), then exact cosine on candidates.
  Bucketing is precomputable and storable as a partition column, so probe
  cost is independent of corpus size.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


def cosine_col(vec_col, query: Sequence[float]):
    """JVM-side cosine similarity of an array<float|double> column against a
    literal query vector (no Python in the plan)."""
    q = [float(x) for x in query]
    qnorm = float(np.sqrt(sum(x * x for x in q))) or 1.0
    qarr = F.array(*[F.lit(x) for x in q])
    dot = F.aggregate(
        F.zip_with(vec_col, qarr, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    vnorm = F.sqrt(
        F.aggregate(
            F.transform(vec_col, lambda a: a.cast("double") * a.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return dot / (F.greatest(vnorm, F.lit(1e-12)) * qnorm)


def cosine_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force top-k: (id, cos) ordered desc, deterministic
    tie-break on id. TakeOrderedAndProject — no full sort."""
    scored = df.select(
        F.col(id_col), F.round(cosine_col(F.col(vec_col), query), 6).alias("cos")
    )
    return scored.orderBy(F.col("cos").desc(), F.col(id_col).asc()).limit(k)


def hyperplane_buckets(
    df: DataFrame,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Append ``bucket: long`` — packed sign bits of dot products with
    ``n_planes`` seeded random hyperplanes. numpy matmul over Arrow batches."""
    planes = np.random.RandomState(seed).standard_normal((dim, n_planes))

    @F.pandas_udf(LongType())
    def bucket_of(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (batch, dim)
        signs = (m @ planes) > 0  # (batch, n_planes)
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series(signs @ weights)

    return df.withColumn("bucket", bucket_of(F.col(vec_col)))


def ann_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    probe_hamming: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bucketed: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k: probe the query's bucket plus all buckets within
    ``probe_hamming`` bit flips, exact cosine on the candidates only.

    Pass ``bucketed`` (a DF already carrying the ``bucket`` column from
    :func:`hyperplane_buckets`, persisted/partitioned on it) to skip the
    per-query bucket recomputation — the scale path: buckets are a write-
    once partition column, so each probe touches only the ≤ |probes|
    matching partitions and its cost is independent of corpus size."""
    q = np.asarray(list(query), dtype=np.float64)
    planes = np.random.RandomState(seed).standard_normal((len(q), n_planes))
    qbits = int(((q @ planes) > 0) @ (1 << np.arange(n_planes)))
    probes = {qbits}
    if probe_hamming >= 1:
        probes |= {qbits ^ (1 << i) for i in range(n_planes)}
    if probe_hamming >= 2:
        probes |= {
            qbits ^ (1 << i) ^ (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        }
    if bucketed is None:
        bucketed = hyperplane_buckets(df, len(q), n_planes, seed, vec_col)
    cands = bucketed.filter(F.col("bucket").isin([int(p) for p in probes]))
    return cosine_topk(cands, query, k, vec_col, id_col)


def ivf_pivots(
    df: DataFrame,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Deterministic IVF coarse quantizer: ``n_lists`` pivot vectors chosen
    by hash order (the rows minimizing ``md5(str(id))``, ties on id) — a
    seeded random sample that any SQL engine reproduces exactly, unlike
    Lloyd iterations whose float reductions are engine-specific. Random
    pivots are a legitimate coarse quantizer (quality below k-means but
    unbiased); swap refined centroids in via :func:`ivf_assign`'s
    ``pivots`` argument without touching the plumbing. Returns
    [(list_id, vector)] with list_id = rank in hash order. Driver-side
    but tiny: n_lists × dim floats."""
    rows = (
        df.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(n_lists)
        .collect()
    )
    return [(i, [float(x) for x in r[vec_col]]) for i, r in enumerate(rows)]


def ivf_assign(
    df: DataFrame,
    pivots: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Append ``list_id: int`` — the index of the nearest pivot by cosine
    (first index on exact ties). Pure JVM expressions: one literal-vector
    cosine per pivot, argmax via array_position(array_max) — no Python in
    the plan. At corpus scale this is the WRITE-ONCE pass: persist the
    output partitioned by list_id and every probe prunes to
    nprobe/n_lists of the files (partition pruning, plan-asserted in
    tests)."""
    cos_arr = F.array(*[cosine_col(F.col(vec_col), p) for _, p in pivots])
    return df.withColumn(
        "list_id",
        (F.array_position(cos_arr, F.array_max(cos_arr)) - 1).cast("int"),
    )


def _seq_cosine(a: Sequence[float], b: Sequence[float]) -> float:
    """Sequential-fold cosine in plain python — bit-matches the JVM
    ``F.aggregate`` fold and DuckDB's list_dot_product (numpy's pairwise/
    BLAS summation rounds differently and could flip near-tie argmax)."""
    dot = nrm_a = nrm_b = 0.0
    for x, y in zip(a, b):
        dot += float(x) * float(y)
        nrm_a += float(x) * float(x)
        nrm_b += float(y) * float(y)
    import math

    return dot / (max(math.sqrt(nrm_a), 1e-12) * max(math.sqrt(nrm_b), 1e-12))


def ivf_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    n_lists: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    assigned: DataFrame | None = None,
    pivots: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: rank the pivots by cosine to the query
    (driver-side, n_lists tiny), probe the ``nprobe`` nearest inverted
    lists, exact cosine on those candidates only.

    Pass ``assigned`` (a DF already carrying ``list_id`` from
    :func:`ivf_assign`, persisted/partitioned on it) to make probe cost
    independent of corpus size — the IVF analog of the precomputed-bucket
    path in :func:`ann_topk`."""
    if pivots is None:
        pivots = ivf_pivots(df, n_lists, id_col, vec_col)
    ranked = sorted(
        ((_seq_cosine(v, query), -lid) for lid, v in pivots), reverse=True
    )
    probes = [-neg for _, neg in ranked[:nprobe]]
    if assigned is None:
        assigned = ivf_assign(df, pivots, vec_col)
    cands = assigned.filter(F.col("list_id").isin([int(p) for p in probes]))
    return cosine_topk(cands, query, k, vec_col, id_col)


def cosine_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 10,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding near-dup pairs: bucket self-join (same sign signature) →
    exact cosine ≥ threshold. The self-join key is the bucket, so only
    collisions shuffle — the all-pairs product never materializes."""
    b = hyperplane_buckets(df, _dim_of(df, vec_col), n_planes, seed, vec_col)
    a_ = b.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "bucket")
    b_ = b.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "bucket")
    pairs = a_.join(b_, ["bucket"]).filter(F.col("id_a") < F.col("id_b"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(
        F.aggregate(
            F.transform(c, lambda a: a.cast("double") * a.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return (
        pairs.select(
            "id_a",
            "id_b",
            F.round(
                dot / (F.greatest(norm(F.col("va")), F.lit(1e-12)) * F.greatest(norm(F.col("vb")), F.lit(1e-12))),
                6,
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def _dim_of(df: DataFrame, vec_col: str) -> int:
    row = df.select(F.size(vec_col).alias("d")).first()
    return int(row.d)
