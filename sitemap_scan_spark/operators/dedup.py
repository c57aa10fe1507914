"""Large-scale deduplication suite for training-data pipelines.

Five dedup families, all designed for the 100 TB path (the reference's only
dedup is an exact URL set, SURVEY §2.4 D1-D4; these generalize it to
document content):

- **exact**: groupBy on a content fingerprint (one shuffle, map-side
  partial agg);
- **MinHash + LSH**: word-shingles → k minhashes → b bands; candidate
  pairs come from a self-join ON band bucket (shuffle joins only bucket
  collisions, never the full cross product), then exact Jaccard verify;
- **SimHash**: 64-bit sign-aggregated word hashes; near-dups = identical
  simhash (or Hamming ≤ d via rotations);
- **n-gram Jaccard**: exact verify used standalone on candidate pairs;
- **embedding cosine**: near-dup pairs via LSH bucketing over random
  hyperplanes + exact cosine verify (see similarity.py).

Hashing is md5-prefix based (not xxhash) where an operator is
oracle-checked — md5 exists in both Spark and DuckDB so the DuckDB oracle
reproduces the exact same signatures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import doc_fingerprint, shingle_fingerprints


def _spread(df: DataFrame, key: str = "doc_id") -> DataFrame:
    """Hash-repartition on ``key`` across the session's default parallelism
    when the input arrives in fewer partitions — a single-row-group parquet
    file (pandas' default writes 1M-row groups, unsplittable by
    maxPartitionBytes) would otherwise run the whole md5-per-shingle
    explode on ONE core. Hash partitioning (not round-robin) because a
    keyless repartition first pays a LOCAL SORT of its input
    (spark.sql.execution.sortBeforeRepartition) — serial on the very
    single-split inputs this helper exists for. The shuffle moves only the
    narrow projection the caller already made; at production scale inputs
    arrive in many splits and this is a no-op."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, F.col(key))
    return df


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row per exact-content group (min id wins — deterministic).
    Output: (id_col, fingerprint, group_size)."""
    fp = doc_fingerprint(text_col).alias("fingerprint")
    return (
        _spread(df.select(F.col(id_col), F.col(text_col)), key=id_col)
        .select(F.col(id_col), fp)
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("group_size"))
        .select(id_col, "fingerprint", "group_size")
    )


MINHASH_P = 2_147_483_647  # Mersenne prime 2^31-1 > the 2^28 shingle-hash universe


def minhash_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs for the universal hash family
    h_i(x) = (a_i*x + b_i) mod MINHASH_P — a Lehmer LCG stream, so the SAME
    literals can be embedded in a DuckDB oracle SQL string."""
    x = 1103515245
    out = []
    for _ in range(num_hashes):
        x = (48271 * x) % MINHASH_P
        a = x or 1
        x = (48271 * x) % MINHASH_P
        out.append((a, x))
    return out


def shingle_int_hash(shingle: "F.Column") -> "F.Column":
    """28-bit int64 per shingle fingerprint: first 7 hex chars of the md5
    the fingerprint already is. 28 bits keeps a_i*h + b_i < 2^59 — exact in
    int64 in BOTH Spark and DuckDB (('0x'||substr(sh,1,7))::BIGINT)."""
    return F.conv(F.substring(shingle, 1, 7), 16, 10).cast("long")


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, minhash: array<long>) — minhash_i = min over shingles of
    (a_i*h + b_i) mod p, h the shingle's 28-bit md5-derived int.

    ONE md5 per shingle (not num_hashes md5s of concatenated strings), and
    — because each signature component is a per-document min over that
    document's own shingles — the whole signature is computed PER ROW with
    ``array_min`` over the shingle array: zero explode, zero shuffle, zero
    aggregation (guide §2.4 "remove shuffles outright"; the previous
    explode+groupBy shuffled one (id, hash) row per shingle — ~200× the
    document count — only to min() them back per document). Docs with no
    shingles (< shingle_n words) are filtered out, exactly the rows the old
    explode dropped. The family is the textbook universal (a*x+b) mod p
    with p prime above the hash universe; coefficients are deterministic so
    a SQL oracle reproduces the exact signature values."""
    words = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " "
    )
    sh = shingle_fingerprints(F.col(text_col), n=shingle_n)
    # materialize the int-hash array ONCE in its own projection — each mh_i
    # references it, and CollapseProject keeps a non-cheap multi-referenced
    # expression in its own step, so the md5s are not recomputed per hash
    hashed = (
        _spread(df.select(F.col(id_col), F.col(text_col)), key=id_col)
        .filter(F.size(words) >= shingle_n)
        .select(F.col(id_col), F.transform(sh, shingle_int_hash).alias("_h"))
    )
    # SQL strings, not Column lambdas: one JVM parse per hash instead of
    # ~6 py4j round trips per hash per call (L suffixes pin BIGINT
    # literals — same long arithmetic as the lit()-built expressions)
    mins = [
        F.expr(
            f"array_min(transform(_h, x -> ({a}L * x + {b}L) % {MINHASH_P}L))"
        ).alias(f"mh{i}")
        for i, (a, b) in enumerate(minhash_coeffs(num_hashes))
    ]
    return hashed.select(
        id_col, F.array(*mins).alias("minhash")
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bands: int = 4,
) -> DataFrame:
    """Band the signature, bucket-join: pairs sharing ≥1 band bucket.
    Output: (id_a, id_b) with id_a < id_b, distinct. The join key is
    (band_idx, band_hash) so only true bucket collisions shuffle."""
    sig_len = signatures.select(F.size("minhash").alias("s")).first().s
    rows_per = sig_len // bands
    banded = signatures.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                F.transform(
                                    F.slice("minhash", b * rows_per + 1, rows_per),
                                    lambda v: v.cast("string"),
                                ),
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def jaccard_verify(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs:
    (id_a, id_b, jaccard). array_intersect/union on distinct shingles."""
    sh = df.select(
        F.col(id_col),
        F.array_distinct(shingle_fingerprints(F.col(text_col), n=shingle_n)).alias("sh"),
    )
    return (
        pairs.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.greatest(F.size(F.array_union("sh_a", "sh_b")), F.lit(1)),
                6,
            ).alias("jaccard"),
        )
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline → (id_a, id_b, jaccard ≥ threshold)."""
    sig = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    pairs = lsh_candidate_pairs(sig, id_col, bands)
    return jaccard_verify(df, pairs, text_col, id_col, shingle_n).filter(
        F.col("jaccard") >= threshold
    )


def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per document, fully JVM-side and oracle-expressible:
    word hash = first 15 hex chars of md5(word) as a 60-bit int; for each of
    60 bit positions sum (+1/-1); simhash bit = 1 iff sum > 0. One explode +
    one groupBy (map-side combined) — scales linearly."""
    words = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " "
    )
    # _spread before the explode: a single-row-group input (pandas parquet)
    # would otherwise run the whole md5-per-word explode on ONE core —
    # measured 5.5 s single-split vs 1.1 s spread at sf1.0 (50k docs).
    # Each document lands wholly in one partition, so the partial agg still
    # merges only one 61-column row per document.
    base = _spread(df.select(F.col(id_col), F.col(text_col)), key=id_col).select(
        F.col(id_col), F.explode(words).alias("w")
    ).select(
        F.col(id_col),
        F.conv(F.substring(F.md5(F.col("w")), 1, 15), 16, 10).cast("long").alias("h"),
    )
    # the 60 bit-sum aggregates and the 60-term reassembly are built as SQL
    # strings parsed JVM-side (one cheap call each): the previous Column-
    # by-Column construction (60 F.when chains + a 60-term add chain) cost
    # ~1 s of py4j round trips PER CALL before any job ran — pure driver
    # fixed cost the bench pays on every trial (guide §7.3: planning/driver
    # time is part of the query). Folding everything into ONE aggregate
    # expression measured slower still (3.0 s vs 1.3 s noop — the fused
    # 60-sum projection defeats the split partial-agg codegen), so it
    # stays 60 small aggregates + one reassembly projection.
    bit_sums = [
        F.expr(f"sum(CASE WHEN (shiftright(h, {i}) & 1) = 1 THEN 1 ELSE -1 END)")
        .alias(f"b{i}")
        for i in range(60)
    ]
    agg = base.groupBy(id_col).agg(*bit_sums)
    sim = F.expr(
        " + ".join(
            f"(CASE WHEN b{i} > 0 THEN CAST({2**i} AS BIGINT) "
            "ELSE CAST(0 AS BIGINT) END)"
            for i in range(60)
        )
    )
    return agg.select(F.col(id_col), sim.alias("simhash"))


def simhash_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Documents sharing an identical simhash → (simhash, n_docs, ids)."""
    return (
        simhash64(df, text_col, id_col)
        .groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.col("n_docs") > 1)
    )


def simhash_near_pairs(
    df: DataFrame,
    d: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-duplicate pairs within Hamming distance ``d`` of the 60-bit
    SimHash — the block-banding completion of :func:`simhash_dup_groups`.

    Pigeonhole banding (the standard Manku/Charikar web-dedup layout): split
    the hash into ``d+1`` equal blocks; two hashes within Hamming ``d``
    must agree EXACTLY on at least one block, so the self-join key is
    (block_idx, block_value) and only genuine block collisions ever shuffle
    — never the all-pairs product. Candidates are then verified with an
    exact ``bit_count(xor) <= d``; the result is provably COMPLETE (every
    qualifying pair found), not approximate. All JVM: explode + equi-join +
    bit ops. Output: (id_a, id_b, hamming), id_a < id_b, distinct.

    Requires 60 % (d+1) == 0 for equal blocks (d ∈ {1,2,3,5,...}); at
    corpus scale precompute simhash64 once and pass it via ``sim``."""
    n_blocks = d + 1
    assert 60 % n_blocks == 0, "d+1 must divide the 60-bit hash width"
    w = 60 // n_blocks
    mask = (1 << w) - 1
    sim = simhash64(df, text_col, id_col)
    blocks = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                F.shiftrightunsigned(F.col("simhash"), j * w)
                .bitwiseAND(F.lit(mask))
                .alias("v"),
            )
            for j in range(n_blocks)
        ]
    )
    banded = sim.select(
        F.col(id_col), "simhash", F.explode(blocks).alias("b")
    ).select(id_col, "simhash", F.col("b.j").alias("j"), F.col("b.v").alias("v"))
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sa"), "j", "v"
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sb"), "j", "v"
    )
    cand = (
        a.join(b, ["j", "v"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sa", "sb")
        .distinct()  # a pair may collide on several blocks
    )
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (
        cand.withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= d)
        .select("id_a", "id_b", "hamming")
    )
