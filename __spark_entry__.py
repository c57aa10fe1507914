"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship frontier-dequeue pipeline on sf0.001;
``queries()`` maps every implemented operator class from SURVEY.md §2 (plus
the training-data suites) onto the driver testdata tables; ``oracle_sql()``
gives the DuckDB-equivalent ANSI SQL for each. Column names and rounding are
aligned on both sides so the driver's order-insensitive value-hash matches.

Oracle-dialect notes: DuckDB regexps are RE2 (no lookaheads), hex→int is
``('0x'||h)::bigint`` vs Spark ``conv(h,16,10)``, struct-max replaces
arg_max-with-tiebreak; both engines round HALF_UP on doubles and share
md5/sha256. Non-SQL-expressible ops (LSH-bucketed ANN, the crawl loop
itself, streaming state) are exercised in tests/ and by entry() instead.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sitemap_scan_spark.functions.canonicalize import url_hash_col  # noqa: E402
from sitemap_scan_spark.functions.textstats import (  # noqa: E402
    BPE_TOKEN_RE,
    STOPWORDS,
    doc_fingerprint,
    lang_id,
    quality_features,
    token_count_bpe,
    token_count_ws,
)
from sitemap_scan_spark.operators.dedup import (  # noqa: E402
    MINHASH_P,
    exact_dedup,
    minhash_coeffs,
    minhash_signatures,
    simhash64,
)
from sitemap_scan_spark.operators.frontier import order_key  # noqa: E402


_SCHEMAS: dict[str, object] = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a testdata table, declaring the schema after the first read of
    a path: re-inference costs a footer read + py4j round trips per call,
    which the bench pays on every trial (same pattern as RoundStore's
    schema-declared re-reads — a catalog-backed table would come with its
    schema attached). Metadata only; every call still scans the parquet."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    schema = _SCHEMAS.get(path)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMAS[path] = df.schema
        return df
    return spark.read.schema(schema).parquet(path)


def _spread_on(df: DataFrame, key: str) -> DataFrame:
    """Hash-repartition to the session's default parallelism when the input
    arrives in fewer splits — the testdata tables are single-row-group
    parquet files (unsplittable by maxPartitionBytes), which would otherwise
    run sort/compute-heavy operators on 1-2 cores. One shared policy:
    delegates to operators.dedup._spread (hash on a real key, no-op on
    well-split production inputs)."""
    from sitemap_scan_spark.operators.dedup import _spread

    return _spread(df, key=key)


# --------------------------------------------------------------------------
# entry — flagship: the frontier-dequeue→fetch→dedup round shape over testdata
# --------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: politeness-budget window dequeue (SURVEY W1/P7) over
    ``orders`` as the frontier (o_orderpriority = host, o_totalprice =
    priority), anti-join 'URL-seen' dedup against prior 'crawled' set,
    and per-host counters — the crawl round's plan shape on sf0.001."""
    sf_dir = "/root/testdata/sf0.001"
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")

    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    dequeued = (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .drop("rn")
    )
    seen = lineitem.filter(F.col("l_quantity") > 45).select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    fresh = dequeued.join(seen, "o_orderkey", "left_anti")
    return (
        fresh.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_dequeued"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.min("o_orderkey").alias("first_key"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# queries + oracles
# --------------------------------------------------------------------------

_I18N_ORACLE = "fr|es|de|it|pt|zh|ja|ko|ar|ru"
_STOP_PATS = {
    lg: r"(?i)\b(" + "|".join(ws) + r")\b" for lg, ws in STOPWORDS.items()
}


def q_frontier_dequeue(spark, sf):
    """W1/P7: per-'host' window rank ≤ 5 (frontier dequeue)."""
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    # spread first: the partial WindowGroupLimit sorts each input split in
    # full, and the single-file input arrives in only 1-2 splits
    return (
        _spread_on(_t(spark, sf, "orders"), "o_orderkey")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rn")
    )


def q_frontier_budget(spark, sf):
    """W1 variable politeness budget per 'host' (crawl-delay analog)."""
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    budget = F.when(F.col("o_orderpriority").startswith("1"), 3).otherwise(7)
    return (
        _spread_on(_t(spark, sf, "orders"), "o_orderkey")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= budget)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_taken"), F.round(F.sum("o_totalprice"), 2).alias("sum_price"))
    )


def q_url_seen_anti(spark, sf):
    """D3: anti-join URL-seen dedup (orders with no lineitem)."""
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem").select(F.col("l_orderkey").alias("o_orderkey"))
    # SHUFFLE_HASH instead of the auto-picked broadcast: building one hash
    # relation over every lineitem key serializes 6M-row relation
    # construction on the driver; the shuffled hash join builds 32 small
    # maps in parallel (guide §3.1), and neither side is sorted.
    return (
        o.join(li.hint("SHUFFLE_HASH"), "o_orderkey", "left_anti")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_new"))
    )


def q_new_discovery_anti(spark, sf):
    """D3 variant: lineitems whose part is NOT in the small-part set."""
    li = _t(spark, sf, "lineitem")
    small = _t(spark, sf, "part").filter(F.col("p_size") <= 20).select(
        F.col("p_partkey").alias("l_partkey")
    )
    return (
        li.join(small, "l_partkey", "left_anti")
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
    )


def q_dedup_sort(spark, sf):
    """D1/D2: canonical dedup + sort."""
    return (
        _t(spark, sf, "events")
        .select("event_type", "user_id")
        .dropDuplicates()
        .orderBy("event_type", "user_id")
    )


def q_lag_change_flag(spark, sf):
    """W7/W8: lag() change detection per key."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = _t(spark, sf, "events").withColumn("prev", F.lag("value").over(w))
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(
            F.when(F.col("prev").isNotNull() & (F.col("value") != F.col("prev")), 1).otherwise(0)
        ).alias("n_changes"),
    )


def q_top_k(spark, sf):
    """W3/W4: top-k by sort key."""
    return (
        _t(spark, sf, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


def q_pagination(spark, sf):
    """W5: multi-key sort + cursor slice."""
    w = Window.orderBy("o_orderdate", "o_orderkey")
    return (
        _t(spark, sf, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") >= 101) & (F.col("rn") <= 120))
        .select("rn", "o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("od"))
    )


def q_run_counters(spark, sf):
    """A1/A2: run counters with conditional sums."""
    return (
        _t(spark, sf, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("value") > 150, 1).otherwise(0)).alias("n_big"),
            F.round(F.avg("value"), 4).alias("avg_val"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def q_semantic_hash(spark, sf):
    """F21: semantic set hash (sorted-distinct join + sha256)."""
    return (
        _t(spark, sf, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.sha2(
                F.concat_ws("\n", F.array_sort(F.collect_set("o_orderstatus"))), 256
            ).alias("sem_hash"),
            F.countDistinct("o_orderstatus").alias("n_states"),
        )
    )


def q_url_hash(spark, sf):
    """F1/F2: sha256 16-hex URL key."""
    return _t(spark, sf, "documents").select(
        "doc_id", url_hash_col(F.col("source")).alias("url_key")
    )


def q_retention(spark, sf):
    """F18/K5: retention cutoff by date."""
    li = _t(spark, sf, "lineitem").filter(F.col("l_shipdate") < F.lit("1995-06-01"))
    return li.agg(
        F.count("*").alias("n_expired"),
        F.date_format(F.min("l_shipdate"), "yyyy-MM-dd").alias("min_d"),
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd").alias("max_d"),
    )


def q_i18n_exclude(spark, sf):
    """P1: default i18n exclude battery as one alternation rlike."""
    return (
        _t(spark, sf, "documents")
        .filter(~F.col("lang").rlike(f"(?i)^({_I18N_ORACLE})$"))
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
    )


def q_storage_stats(spark, sf):
    """A4: storage stats aggregate."""
    return _t(spark, sf, "lineitem").agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        F.date_format(F.min("l_shipdate"), "yyyy-MM-dd").alias("min_d"),
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd").alias("max_d"),
    )


def q_overview_join(spark, sf):
    """J4: N-way broadcast dim join."""
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_cust"), F.round(F.avg("c_acctbal"), 4).alias("avg_bal"))
    )


def q_prev_state_lookup(spark, sf):
    """J1: fetched ⋈ url_seen left-outer lookup (null ⇒ brand new)."""
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders").filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").alias("l_orderkey"), F.lit(1).alias("hit")
    )
    return (
        li.join(o, "l_orderkey", "left")
        .groupBy("l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("hit").isNull(), 1).otherwise(0)).alias("n_new"),
        )
    )


def q_argmax(spark, sf):
    """W10: argmax (max_by with deterministic tie-break)."""
    ev = _t(spark, sf, "events")
    return ev.groupBy("event_type").agg(
        F.max(F.struct(F.col("value"), F.col("event_id"))).alias("_m")
    ).select(
        "event_type",
        F.col("_m.value").alias("max_val"),
        F.col("_m.event_id").alias("argmax_event"),
    )


def q_date_buckets(spark, sf):
    """W6: distinct date buckets sorted desc."""
    return (
        _t(spark, sf, "orders")
        .select(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .distinct()
        .orderBy(F.col("month").desc())
    )


def q_word_set_diff(spark, sf):
    """D5/D6: word-set difference between two documents."""
    d = _t(spark, sf, "documents")
    words = lambda id_: (
        d.filter(F.col("doc_id") == id_)
        .select(F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w"))
        .distinct()
    )
    return words(0).exceptAll(words(1)).orderBy("w")


def q_changed_projection(spark, sf):
    """P4/P6: filtered changed-rows projection."""
    return (
        _t(spark, sf, "events")
        .filter((F.col("event_type") == "error") & (F.col("value") > 180))
        .select("event_id", "user_id", F.round("value", 2).alias("value"))
    )


# --- training-data / text suites ------------------------------------------


def q_text_norm_hash(spark, sf):
    """F12/F13: normalize-whitespace + content hash."""
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return _t(spark, sf, "documents").select(
        "doc_id", F.sha2(norm, 256).alias("norm_hash")
    )


def q_token_counts(spark, sf):
    """Token counting: whitespace + BPE-ish regex."""
    return _spread_on(_t(spark, sf, "documents"), "doc_id").select(
        "doc_id",
        token_count_ws("text").alias("n_ws"),
        token_count_bpe("text").alias("n_bpe"),
    )


def q_lang_id(spark, sf):
    """Language-ID n-gram/stopword heuristic, distribution."""
    # the 4-language stopword regex battery is the single most expensive
    # per-row scan in the suite (3.7 s serial on the 1-row-group file)
    return (
        _spread_on(_t(spark, sf, "documents"), "doc_id")
        .select(lang_id("text").alias("lid"))
        .groupBy("lid")
        .agg(F.count("*").alias("n"))
    )


def q_quality(spark, sf):
    """Quality scoring features."""
    return _spread_on(_t(spark, sf, "documents"), "doc_id").select(
        "doc_id", *quality_features("text")
    )


def q_fingerprint_dedup(spark, sf):
    """Exact dedup by content fingerprint."""
    return exact_dedup(_t(spark, sf, "documents")).select(
        "doc_id", "fingerprint", "group_size"
    )


def q_minhash(spark, sf):
    """MinHash signatures (md5-based, 4 hashes) — LSH substrate."""
    sig = minhash_signatures(_t(spark, sf, "documents"), num_hashes=4)
    return sig.select(
        "doc_id",
        *[F.col("minhash")[i].alias(f"mh{i}") for i in range(4)],
    )


def q_simhash(spark, sf):
    """SimHash-64 (60-bit md5-derived) document hash."""
    return simhash64(_t(spark, sf, "documents"))


def q_ngram_jaccard(spark, sf):
    """n-gram Jaccard similarity for aligned doc pairs (i, i+250)."""
    from sitemap_scan_spark.functions.textstats import shingle_fingerprints

    d = _t(spark, sf, "documents")
    sh = d.select(
        "doc_id", F.array_distinct(shingle_fingerprints(F.col("text"), 3)).alias("sh")
    )
    a = sh.filter(F.col("doc_id") < 250).select(
        F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a")
    )
    b = sh.select((F.col("doc_id") - 250).alias("id_a"), F.col("sh").alias("sh_b"))
    return (
        a.join(b, "id_a")
        .select(
            "id_a",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.greatest(F.size(F.array_union("sh_a", "sh_b")), F.lit(1)),
                6,
            ).alias("jaccard"),
        )
    )


def q_embedding_topk(spark, sf):
    """Similarity search: brute-force cosine top-10 vs vec_id=0."""
    emb = _t(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    dot = F.aggregate(
        F.zip_with("embedding", "qv", lambda a, b: a.cast("double") * b.cast("double")),
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
        _spread_on(emb, "vec_id")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(dot / (norm(F.col("embedding")) * norm(F.col("qv"))), 6).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), F.col("vec_id"))
        .limit(10)
    )


def q_embedding_near_pairs(spark, sf):
    """Embedding near-dup pairs (brute force over vec_id<100, cos ≥ 0.3)."""
    emb = _t(spark, sf, "embeddings").filter(F.col("vec_id") < 100)
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("_raw", dot / (norm(F.col("va")) * norm(F.col("vb"))))
        .filter(F.col("_raw") >= 0.3)
        .select("id_a", "id_b", F.round("_raw", 6).alias("cos"))
    )


def q_redact_dynamic(spark, sf):
    """F7/F8 subset battery (RE2-safe) → redacted hash."""
    c = F.col("text")
    for pat, repl in [
        (r"\b\d{4}-\d{2}-\d{2}\b", "[DATE]"),
        (r"\b\d{2}:\d{2}:\d{2}\b", "[TIME]"),
        (r"(?i)\b[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}\b", "[UUID]"),
        (r"\b\d{10,13}\b", "[TIMESTAMP]"),
    ]:
        c = F.regexp_replace(c, pat, repl)
    return _spread_on(_t(spark, sf, "documents"), "doc_id").select(
        "doc_id", F.sha2(F.trim(F.regexp_replace(c, r"\s+", " ")), 256).alias("red_hash")
    )


def q_pattern_counts(spark, sf):
    """A7/A8 analog: per-row regex-occurrence counts (regexp_count)."""
    return _spread_on(_t(spark, sf, "documents"), "doc_id").select(
        "doc_id",
        F.regexp_count("text", F.lit(r"(?i)\bthe\b")).alias("n_the"),
        F.regexp_count("text", F.lit(r"[aeiou]{2}")).alias("n_vowel_pairs"),
        F.regexp_count("text", F.lit(r"\d")).alias("n_digits"),
    )


def q_include_glob(spark, sf):
    """P2: include-pattern filter with glob → regex (sitemap.ts:186-197)."""
    from sitemap_scan_spark.operators.frontier import include_filter

    return (
        include_filter(_t(spark, sf, "documents"), ["src1*"], col="source")
        .groupBy("source")
        .agg(F.count("*").alias("n"))
    )


def q_quality_score(spark, sf):
    """Composite quality heuristic (textstats.quality_score)."""
    from sitemap_scan_spark.functions.textstats import quality_score

    return _spread_on(_t(spark, sf, "documents"), "doc_id").select(
        "doc_id", quality_score("text").alias("q")
    )


def q_tiered_topk(spark, sf):
    """W11: per-tier quota'd top-k (limitChanges, generator.ts:248-273)."""
    ev = _t(spark, sf, "events")
    tier = (
        F.when(F.col("value") >= 150, "large")
        .when(F.col("value") >= 50, "medium")
        .otherwise("small")
    )
    quota = (
        F.when(F.col("tier") == "large", 30)
        .when(F.col("tier") == "medium", 10)
        .otherwise(10)
    )
    w = Window.partitionBy("tier").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        ev.withColumn("tier", tier)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= quota)
        .select("tier", "rn", "event_id", F.round("value", 2).alias("value"))
    )


def q_hourly_counters(spark, sf):
    """T1/A1 streaming-analog batch equivalence: event-time hourly windows."""
    return (
        _t(spark, sf, "events")
        .groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm").alias("hour"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_val"))
    )


def q_sessionize(spark, sf):
    """Stateful sessionization: 30-min-gap sessions per user (lag + cumsum)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.unix_timestamp(F.col("ts").cast("timestamp"))
    gap = F.when(epoch - F.lag(epoch).over(w) > 1800, 1).otherwise(0)
    ev = _t(spark, sf, "events").withColumn("new_sess", gap)
    return ev.groupBy("user_id").agg(
        (F.sum("new_sess") + 1).alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


def q_change_magnitude(spark, sf):
    """F14 change magnitude over aligned doc pairs — pandas-UDF operator,
    not SQL-expressible (rows-only check)."""
    from sitemap_scan_spark.plans.diffing import change_magnitude_udf

    d = _t(spark, sf, "documents")
    a = d.filter(F.col("doc_id") < 250).select(
        F.col("doc_id").alias("id_a"), F.col("text").alias("text_a")
    )
    b = d.select((F.col("doc_id") - 250).alias("id_a"), F.col("text").alias("text_b"))
    return (
        a.join(b, "id_a")
        .withColumn("m", change_magnitude_udf("text_a", "text_b"))
        .select("id_a", F.col("m.added_chars").alias("added"), F.col("m.removed_chars").alias("removed"))
    )


def q_embedding_ann_topk(spark, sf):
    """LSH-bucketed approximate top-k (the scale path next to the brute
    oracle-checked embedding_topk). Approximate by design — rows-only
    check; recall vs brute force is asserted in tests/test_operators.py."""
    from sitemap_scan_spark.operators.similarity import ann_topk

    emb = _t(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).first().embedding
    return ann_topk(emb, q, k=10, n_planes=8, probe_hamming=2)


def q_embedding_ivf_topk(spark, sf):
    """IVF ANN top-k, FULLY oracle-checked (unlike the rows-only LSH
    variant): deterministic hash-ordered pivots → JVM argmax list
    assignment → nprobe nearest lists → exact cosine top-k. Every step is
    double-precision sequential-fold arithmetic that DuckDB reproduces
    bit-exactly, so the oracle checks values, not just shape."""
    from sitemap_scan_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).first().embedding
    return ivf_topk(emb, q, k=10, n_lists=16, nprobe=4)


def q_simhash_groups(spark, sf):
    """SimHash identical-hash dup groups (dedup rollup over q:simhash)."""
    from sitemap_scan_spark.operators.dedup import simhash64

    sim = simhash64(_t(spark, sf, "documents"))
    return (
        sim.groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc"))
        .filter(F.col("n_docs") > 1)
    )


def q_simhash_near(spark, sf):
    """SimHash Hamming-≤3 near-dup pairs via pigeonhole block banding —
    provably complete, so the brute all-pairs DuckDB scan is an exact
    oracle (operators/dedup.py:simhash_near_pairs)."""
    from sitemap_scan_spark.operators.dedup import simhash_near_pairs

    return simhash_near_pairs(_t(spark, sf, "documents"), d=3)


def q_rendered_diff(spark, sf):
    """F20 rendered diff (comparer.ts:221-256) over aligned doc pairs,
    through the real pandas render UDF. The testdata texts are single-line
    and non-empty (asserted in the oracle's semantics): equal pair →
    '  <text>' context row, changed pair → '- old\\n+ new' — so DuckDB can
    state the expected rendered string exactly."""
    from sitemap_scan_spark.plans.diffing import with_rendered_diff

    d = _t(spark, sf, "documents")
    a = d.filter(F.col("doc_id") < 250).select(
        F.col("doc_id").alias("id_a"), F.col("text").alias("text_1")
    )
    b = d.select((F.col("doc_id") - 250).alias("id_a"), F.col("text").alias("text_2"))
    return with_rendered_diff(a.join(b, "id_a")).select(
        "id_a", F.sha2(F.col("diff"), 256).alias("diff_hash")
    )


def q_progressive_diff(spark, sf):
    """F20 progressive variant (generator.ts:220-246) through the real
    pandas UDF at chunk_size=200: pairs whose 200-char PREFIXES match render
    as one context row even when the full texts differ (the chunk-boundary
    behavior), and is_partial flags sides longer than the chunk. Single-line
    non-empty testdata texts keep the expected string SQL-expressible."""
    from sitemap_scan_spark.plans.diffing import with_progressive_diff

    d = _t(spark, sf, "documents")
    # NO doc_id<250 cap — the oracle pairs EVERY (a, a+250); at sf<=0.01
    # the join itself caps at 250 pairs so results there are identical,
    # but a filter here diverged from the oracle at sf>=0.1 (latent
    # mismatch found in round 6's full-sf selfcheck sweep)
    a = d.select(F.col("doc_id").alias("id_a"), F.col("text").alias("text_1"))
    b = d.select((F.col("doc_id") - 250).alias("id_a"), F.col("text").alias("text_2"))
    return with_progressive_diff(a.join(b, "id_a"), chunk_size=200).select(
        "id_a", F.sha2(F.col("diff"), 256).alias("diff_hash"), "is_partial"
    )


def q_json_extract_agg(spark, sf):
    """F16 surface: JSON field extraction + aggregation over events.props."""
    ev = _t(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.round(F.avg(k), 4).alias("avg_k"),
        F.max(k).alias("max_k"),
        F.sum(F.when(k.isNull(), 1).otherwise(0)).alias("n_null"),
    )


def q_json_normalize(spark, sf):
    """F16 full normalize (drop dynamic keys, mask dynamic values, stable
    key order — normalizer.ts:118-141,192-249) — pandas-UDF operator.

    Two columns exercise the semantics end-to-end against the DuckDB
    oracle: ``norm_hash`` normalizes the corpus ``props`` (trivial flat
    JSON), ``synth_hash`` normalizes a synthetic nested document built
    deterministically from event columns that hits every rule at once:
    case-insensitive dynamic-key drop (Token/NONCE), UUID + long-hex +
    unix-timestamp value masking, nested object/list recursion, and
    compact sorted re-serialization. The oracle states the expected
    normalized string directly in SQL."""
    from sitemap_scan_spark.functions.jsonnorm import normalize_json_udf

    ev = _t(spark, sf, "events")
    synth = F.format_string(
        '{"z": %s, "Token": "drop-me", "a": "u%s",'
        ' "id": "123e4567-e89b-12d3-a456-426614174000", "h": "%s",'
        ' "nested": {"NONCE": "n", "b": [%s, "1700000000"]}}',
        F.col("event_id"),
        F.col("user_id"),
        F.md5(F.col("user_id").cast("string")),
        F.col("event_id") % 7,
    )
    return ev.select(
        "event_id",
        F.sha2(normalize_json_udf(F.col("props")), 256).alias("norm_hash"),
        F.sha2(normalize_json_udf(synth), 256).alias("synth_hash"),
    )


def q_frame_features(spark, sf):
    """Multimodal frame features, ORACLE-CHECKED (round-3 VERDICT task 5):
    deterministic MJV1 videos (synth_media_numpy) → frame_sample_plan
    explode → REAL per-frame decode in mapInPandas (extract_frame →
    _image_features' block-mean grid over actual pixels) → integer block
    sums (feat · 255 · blockpx — exact in float32, so no float fragility).
    The synthetic pixel function pixel(x, y) = ((x + y + 7f + i)·9) mod 256
    is closed-form, so DuckDB recomputes the identical sums from
    generate_series arithmetic: the decode path is verified value-exact
    end-to-end, not just shape-checked."""
    from sitemap_scan_spark.operators.multimodal import (
        _image_features,
        extract_frame,
        frame_sample_plan,
        synth_media_numpy,
    )

    frames = frame_sample_plan(synth_media_numpy(spark, n=48), every_ms=1000)

    def feats(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, tss, idxs, sums = [], [], [], []
            for mid, ts, payload in zip(
                pdf["media_id"], pdf["frame_ts_ms"], pdf["payload"]
            ):
                f = _image_features(extract_frame(bytes(payload), int(ts)), 16)
                s = np.rint(f * 255.0 * 16.0).astype(np.int64)  # 4×4 block sums
                ids.extend([int(mid)] * 16)
                tss.extend([int(ts)] * 16)
                idxs.extend(range(16))
                sums.extend(s.tolist())
            yield pd.DataFrame(
                {"media_id": ids, "frame_ts_ms": tss, "feat_idx": idxs,
                 "block_sum": sums}
            )

    return frames.mapInPandas(
        feats, "media_id long, frame_ts_ms int, feat_idx int, block_sum long"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "frontier_dequeue": q_frontier_dequeue,
        "frontier_budget": q_frontier_budget,
        "url_seen_anti": q_url_seen_anti,
        "new_discovery_anti": q_new_discovery_anti,
        "dedup_sort": q_dedup_sort,
        "lag_change_flag": q_lag_change_flag,
        "top_k": q_top_k,
        "pagination": q_pagination,
        "run_counters": q_run_counters,
        "semantic_hash": q_semantic_hash,
        "url_hash": q_url_hash,
        "retention": q_retention,
        "i18n_exclude": q_i18n_exclude,
        "storage_stats": q_storage_stats,
        "overview_join": q_overview_join,
        "prev_state_lookup": q_prev_state_lookup,
        "argmax": q_argmax,
        "date_buckets": q_date_buckets,
        "word_set_diff": q_word_set_diff,
        "changed_projection": q_changed_projection,
        "text_norm_hash": q_text_norm_hash,
        "token_counts": q_token_counts,
        "lang_id": q_lang_id,
        "quality": q_quality,
        "fingerprint_dedup": q_fingerprint_dedup,
        "minhash": q_minhash,
        "simhash": q_simhash,
        "ngram_jaccard": q_ngram_jaccard,
        "embedding_topk": q_embedding_topk,
        "embedding_near_pairs": q_embedding_near_pairs,
        "redact_dynamic": q_redact_dynamic,
        "pattern_counts": q_pattern_counts,
        "include_glob": q_include_glob,
        "quality_score": q_quality_score,
        "tiered_topk": q_tiered_topk,
        "hourly_counters": q_hourly_counters,
        "sessionize": q_sessionize,
        "change_magnitude": q_change_magnitude,
        "embedding_ann_topk": q_embedding_ann_topk,
        "embedding_ivf_topk": q_embedding_ivf_topk,
        "simhash_groups": q_simhash_groups,
        "simhash_near": q_simhash_near,
        "rendered_diff": q_rendered_diff,
        "progressive_diff": q_progressive_diff,
        "json_extract_agg": q_json_extract_agg,
        "json_normalize": q_json_normalize,
        "frame_features": q_frame_features,
    }


# --------------------------------------------------------------------------
# DuckDB oracles
# --------------------------------------------------------------------------

_WS = r"\s+"
_SHINGLES_CTE = """
words AS (
    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
    FROM documents WHERE trim(text) <> ''
),
shingles AS (
    SELECT doc_id, substr(md5(array_to_string(w[i:i+2], ' ')), 1, 8) AS sh
    FROM words, unnest(generate_series(1, len(w) - 2)) t(i)
    WHERE len(w) >= 3
)
"""


def _ann_topk_oracle_sql(dim: int = 64, n_planes: int = 8, seed: int = 42) -> str:
    """Exact DuckDB oracle for q_embedding_ann_topk: the seeded hyperplane
    matrix (numpy RandomState — deterministic across machines) is emitted as
    literal DOUBLE[] vectors so DuckDB computes the identical sign-bit
    buckets, probes hamming<=2 around the query's bucket, and ranks the
    candidates by exact cosine. dim is pinned to the testdata embeddings."""
    import numpy as np

    planes = np.random.RandomState(seed).standard_normal((dim, n_planes))
    bucket_terms = []
    for j in range(n_planes):
        lit = "[" + ", ".join(repr(float(x)) for x in planes[:, j]) + "]"
        bucket_terms.append(
            f"(CASE WHEN list_dot_product(e, {lit}) > 0 THEN {1 << j} ELSE 0 END)"
        )
    bucket_expr = "\n                 + ".join(bucket_terms)
    return f"""
        WITH b AS (
          SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        bb AS (
          SELECT vec_id, e,
                 {bucket_expr} AS bucket
          FROM b),
        q AS (SELECT e AS qe, bucket AS qb FROM bb WHERE vec_id = 0)
        SELECT bb.vec_id,
               round(list_dot_product(bb.e, q.qe) /
                     (sqrt(list_dot_product(bb.e, bb.e)) *
                      sqrt(list_dot_product(q.qe, q.qe))), 6) AS cos
        FROM bb, q
        WHERE bit_count(xor(bb.bucket::BIGINT, q.qb::BIGINT)) <= 2
        ORDER BY cos DESC, bb.vec_id LIMIT 10
    """


def oracle_sql() -> dict[str, str]:
    stop_sql = {
        lg: pat.replace("(?i)", "") for lg, pat in _STOP_PATS.items()
    }
    lang_hits = " UNION ALL ".join(
        f"SELECT doc_id, '{lg}' AS lang, "
        f"len(regexp_extract_all(lower(text), '{stop_sql[lg]}')) AS h FROM documents"
        for lg in STOPWORDS
    )
    return {
        "frontier_dequeue": """
            SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
              SELECT o_orderpriority, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_orderpriority
                                        ORDER BY o_totalprice DESC, o_orderkey) AS rn
              FROM orders) WHERE rn <= 5
        """,
        "frontier_budget": """
            SELECT o_orderpriority, count(*) AS n_taken,
                   round(sum(o_totalprice), 2) AS sum_price FROM (
              SELECT *, row_number() OVER (PARTITION BY o_orderpriority
                        ORDER BY o_totalprice DESC, o_orderkey) AS rn
              FROM orders)
            WHERE rn <= CASE WHEN o_orderpriority LIKE '1%' THEN 3 ELSE 7 END
            GROUP BY o_orderpriority
        """,
        "url_seen_anti": """
            SELECT o_orderstatus, count(*) AS n_new FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
            GROUP BY o_orderstatus
        """,
        "new_discovery_anti": """
            SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS qty
            FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM part p
                              WHERE p.p_partkey = l.l_partkey AND p.p_size <= 20)
            GROUP BY l_returnflag
        """,
        "dedup_sort": """
            SELECT DISTINCT event_type, user_id FROM events
            ORDER BY event_type, user_id
        """,
        "lag_change_flag": """
            SELECT user_id, count(*) AS n_events,
                   CAST(sum(CASE WHEN prev IS NOT NULL AND value <> prev THEN 1 ELSE 0 END) AS BIGINT) AS n_changes
            FROM (SELECT user_id, value,
                         lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
                  FROM events)
            GROUP BY user_id
        """,
        "top_k": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
        """,
        "pagination": """
            SELECT rn, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS od FROM (
              SELECT o_orderkey, o_orderdate,
                     row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS rn
              FROM orders) WHERE rn BETWEEN 101 AND 120
        """,
        "run_counters": """
            SELECT event_type, count(*) AS n,
                   CAST(sum(CASE WHEN value > 150 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
                   round(avg(value), 4) AS avg_val,
                   count(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type
        """,
        "semantic_hash": """
            SELECT o_orderpriority,
                   sha256(string_agg(DISTINCT o_orderstatus, chr(10) ORDER BY o_orderstatus)) AS sem_hash,
                   count(DISTINCT o_orderstatus) AS n_states
            FROM orders GROUP BY o_orderpriority
        """,
        "url_hash": """
            SELECT doc_id, substr(sha256(source), 1, 16) AS url_key FROM documents
        """,
        "retention": """
            SELECT count(*) AS n_expired,
                   strftime(min(l_shipdate), '%Y-%m-%d') AS min_d,
                   strftime(max(l_shipdate), '%Y-%m-%d') AS max_d
            FROM lineitem WHERE l_shipdate < TIMESTAMP '1995-06-01'
        """,
        "i18n_exclude": f"""
            SELECT lang, count(*) AS n FROM documents
            WHERE NOT regexp_matches(lower(lang), '^({_I18N_ORACLE})$')
            GROUP BY lang
        """,
        "storage_stats": """
            SELECT count(*) AS n, round(sum(l_extendedprice), 2) AS total_price,
                   strftime(min(l_shipdate), '%Y-%m-%d') AS min_d,
                   strftime(max(l_shipdate), '%Y-%m-%d') AS max_d
            FROM lineitem
        """,
        "overview_join": """
            SELECT r_name, count(*) AS n_cust, round(avg(c_acctbal), 4) AS avg_bal
            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
                            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r_name
        """,
        "prev_state_lookup": """
            SELECT l_linestatus, count(*) AS n,
                   CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new
            FROM lineitem l LEFT JOIN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F') o
                 ON l.l_orderkey = o.o_orderkey
            GROUP BY l_linestatus
        """,
        "argmax": """
            SELECT event_type,
                   (max({'v': value, 'e': event_id})).v AS max_val,
                   (max({'v': value, 'e': event_id})).e AS argmax_event
            FROM events GROUP BY event_type
        """,
        "date_buckets": """
            SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS month FROM orders
            ORDER BY month DESC
        """,
        "word_set_diff": """
            SELECT w FROM (
              SELECT DISTINCT unnest(string_split_regex(trim(text), '\\s+')) AS w
              FROM documents WHERE doc_id = 0)
            WHERE w NOT IN (
              SELECT DISTINCT unnest(string_split_regex(trim(text), '\\s+'))
              FROM documents WHERE doc_id = 1)
            ORDER BY w
        """,
        "changed_projection": """
            SELECT event_id, user_id, round(value, 2) AS value FROM events
            WHERE event_type = 'error' AND value > 180
        """,
        "text_norm_hash": """
            SELECT doc_id,
                   sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS norm_hash
            FROM documents
        """,
        "token_counts": f"""
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_ws,
                   len(regexp_extract_all(text, '{BPE_TOKEN_RE}')) AS n_bpe
            FROM documents
        """,
        "lang_id": f"""
            WITH hits AS ({lang_hits}),
            best AS (
              SELECT doc_id,
                     CASE WHEN max(h) = 0 THEN 'und'
                          ELSE (max({{'h': h, 'l': lang}})).l END AS lid
              FROM hits GROUP BY doc_id)
            SELECT lid, count(*) AS n FROM best GROUP BY lid
        """,
        "quality": """
            SELECT doc_id,
                   length(text) AS n_chars,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
                   round((length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')))
                         / greatest(length(text), 1), 6) AS punct_ratio,
                   round((length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')))
                         / greatest(length(text), 1), 6) AS upper_ratio,
                   round(len(regexp_extract_all(lower(text),
                         '\\b(the|and|of|to|in|is|that|for|with|was)\\b'))
                         / greatest(CASE WHEN trim(text) = '' THEN 0
                              ELSE len(string_split_regex(trim(text), '\\s+')) END, 1), 6)
                         AS stopword_ratio,
                   round(length(text) / greatest(CASE WHEN trim(text) = '' THEN 0
                              ELSE len(string_split_regex(trim(text), '\\s+')) END, 1), 6)
                         AS mean_token_len
            FROM documents
        """,
        "fingerprint_dedup": """
            SELECT min(doc_id) AS doc_id,
                   sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint,
                   count(*) AS group_size
            FROM documents GROUP BY fingerprint
        """,
        "minhash": f"""
            WITH {_SHINGLES_CTE},
            hs AS (SELECT doc_id, ('0x' || substr(sh, 1, 7))::BIGINT AS h FROM shingles)
            SELECT doc_id,
                   {", ".join(f"min(({a}*h + {b}) % {MINHASH_P}) AS mh{i}"
                              for i, (a, b) in enumerate(minhash_coeffs(4)))}
            FROM hs GROUP BY doc_id
        """,
        "simhash": """
            WITH wh AS (
              SELECT doc_id,
                     ('0x' || substr(md5(unnest(string_split_regex(
                        trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '))), 1, 15))::BIGINT AS h
              FROM documents),
            bits AS (
              SELECT doc_id, i,
                     sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS s
              FROM wh, unnest(generate_series(0, 59)) t(i)
              GROUP BY doc_id, i)
            SELECT doc_id,
                   sum(CASE WHEN s > 0 THEN (1::BIGINT << i) ELSE 0 END)::BIGINT AS simhash
            FROM bits GROUP BY doc_id
        """,
        "ngram_jaccard": f"""
            WITH {_SHINGLES_CTE},
            sets AS (SELECT doc_id, list_distinct(list(sh)) AS shs FROM shingles GROUP BY doc_id)
            SELECT a.doc_id AS id_a,
                   round(len(list_intersect(a.shs, b.shs))::DOUBLE /
                         greatest(len(list_distinct(a.shs || b.shs)), 1), 6) AS jaccard
            FROM sets a JOIN sets b ON b.doc_id = a.doc_id + 250
            WHERE a.doc_id < 250
        """,
        "embedding_topk": """
            SELECT e.vec_id,
                   round(list_dot_product(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) /
                         (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
                          sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))), 6) AS cos
            FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
            ORDER BY cos DESC, e.vec_id LIMIT 10
        """,
        "embedding_near_pairs": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
                         (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
                          sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) AS cos
            FROM embeddings a, embeddings b
            WHERE a.vec_id < 100 AND b.vec_id < 100 AND a.vec_id < b.vec_id
              AND list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
                  (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
                   sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) >= 0.3
        """,
        "redact_dynamic": """
            SELECT doc_id, sha256(trim(regexp_replace(
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(
                           regexp_replace(text, '\\b\\d{4}-\\d{2}-\\d{2}\\b', '[DATE]', 'g'),
                         '\\b\\d{2}:\\d{2}:\\d{2}\\b', '[TIME]', 'g'),
                       '(?i)\\b[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}\\b', '[UUID]', 'g'),
                     '\\b\\d{10,13}\\b', '[TIMESTAMP]', 'g'),
                   '\\s+', ' ', 'g'))) AS red_hash
            FROM documents
        """,
        "pattern_counts": """
            SELECT doc_id,
                   len(regexp_extract_all(text, '(?i)\\bthe\\b')) AS n_the,
                   len(regexp_extract_all(text, '[aeiou]{2}')) AS n_vowel_pairs,
                   len(regexp_extract_all(text, '\\d')) AS n_digits
            FROM documents
        """,
        "include_glob": """
            SELECT source, count(*) AS n FROM documents
            WHERE regexp_matches(source, '(?i)(src1.*)')
            GROUP BY source
        """,
        "quality_score": """
            SELECT doc_id, round(
              0.4 * least(length(text) / 500.0, 1.0)
            + 0.2 * least(round((length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')))
                          / greatest(length(text), 1), 6) * 50, 1.0)
            + 0.2 * (1 - least(round((length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')))
                          / greatest(length(text), 1), 6) * 5, 1.0))
            + 0.2 * least(round(len(regexp_extract_all(lower(text),
                          '\\b(the|and|of|to|in|is|that|for|with|was)\\b'))
                          / greatest(CASE WHEN trim(text) = '' THEN 0
                               ELSE len(string_split_regex(trim(text), '\\s+')) END, 1), 6) * 4, 1.0)
            , 6) AS q FROM documents
        """,
        "tiered_topk": """
            SELECT tier, rn, event_id, round(value, 2) AS value FROM (
              SELECT tier, event_id, value,
                     row_number() OVER (PARTITION BY tier
                                        ORDER BY value DESC, event_id) AS rn
              FROM (SELECT event_id, value,
                           CASE WHEN value >= 150 THEN 'large'
                                WHEN value >= 50 THEN 'medium'
                                ELSE 'small' END AS tier
                    FROM events))
            WHERE rn <= CASE WHEN tier = 'large' THEN 30 ELSE 10 END
        """,
        "hourly_counters": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
                   event_type, count(*) AS n, round(sum(value), 2) AS sum_val
            FROM events GROUP BY 1, 2
        """,
        "sessionize": """
            SELECT user_id, CAST(sum(new_sess) + 1 AS BIGINT) AS n_sessions, count(*) AS n_events
            FROM (
              SELECT user_id,
                     CASE WHEN epoch(ts) - lag(epoch(ts)) OVER (
                            PARTITION BY user_id ORDER BY ts, event_id) > 1800
                          THEN 1 ELSE 0 END AS new_sess
              FROM events)
            GROUP BY user_id
        """,
        # F14 shared-prefix/suffix magnitudes, char-wise in SQL: prefix len =
        # first mismatching position - 1 (min over a position unnest), suffix
        # scanned over the remaining window from both string ends — the exact
        # loop semantics of plans/diffing.py:change_magnitude_udf.
        "change_magnitude": """
            WITH pairs AS (
              SELECT a.doc_id AS id_a, a.text AS p, b.text AS c,
                     least(length(a.text), length(b.text)) AS n
              FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 250
              WHERE a.doc_id < 250),
            pre AS (
              SELECT id_a,
                     coalesce(min(CASE WHEN substr(p, i, 1) <> substr(c, i, 1)
                                       THEN i END) - 1,
                              any_value(n)) AS pre
              FROM pairs, unnest(generate_series(1, n)) t(i)
              GROUP BY id_a),
            suf AS (
              SELECT pairs.id_a,
                     coalesce(min(CASE WHEN substr(p, length(p) - j + 1, 1)
                                         <> substr(c, length(c) - j + 1, 1)
                                       THEN j END) - 1,
                              any_value(n - pre)) AS suf
              FROM pairs JOIN pre USING (id_a),
                   unnest(generate_series(1, n - pre)) t(j)
              GROUP BY pairs.id_a)
            SELECT pairs.id_a,
                   CAST(length(c) - coalesce(pre, 0) - coalesce(suf, 0) AS INT) AS added,
                   CAST(length(p) - coalesce(pre, 0) - coalesce(suf, 0) AS INT) AS removed
            FROM pairs LEFT JOIN pre USING (id_a) LEFT JOIN suf USING (id_a)
        """,
        # Exact oracle of the LSH-ANN path: the 8 seeded hyperplanes are a
        # deterministic numpy matrix, embedded below as literal DOUBLE[]s, so
        # DuckDB reproduces bucketing, hamming<=2 probing, and the exact
        # cosine over candidates (operators/similarity.py:ann_topk).
        "embedding_ann_topk": _ann_topk_oracle_sql(),
        "simhash_groups": """
            WITH wh AS (
              SELECT doc_id,
                     ('0x' || substr(md5(unnest(string_split_regex(
                        trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '))), 1, 15))::BIGINT AS h
              FROM documents),
            bits AS (
              SELECT doc_id, i,
                     sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS s
              FROM wh, unnest(generate_series(0, 59)) t(i)
              GROUP BY doc_id, i),
            sims AS (
              SELECT doc_id,
                     sum(CASE WHEN s > 0 THEN (1::BIGINT << i) ELSE 0 END)::BIGINT AS simhash
              FROM bits GROUP BY doc_id)
            SELECT simhash, count(*) AS n_docs, min(doc_id) AS min_doc
            FROM sims GROUP BY simhash HAVING count(*) > 1
        """,
        # banding is exact-complete for hamming <= d, so brute all-pairs IS
        # the oracle (500 docs at sf0.01 → 125k pairs, trivial in DuckDB)
        "simhash_near": """
            WITH wh AS (
              SELECT doc_id,
                     ('0x' || substr(md5(unnest(string_split_regex(
                        trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '))), 1, 15))::BIGINT AS h
              FROM documents),
            bits AS (
              SELECT doc_id, i,
                     sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS s
              FROM wh, unnest(generate_series(0, 59)) t(i)
              GROUP BY doc_id, i),
            sims AS (
              SELECT doc_id,
                     sum(CASE WHEN s > 0 THEN (1::BIGINT << i) ELSE 0 END)::BIGINT AS simhash
              FROM bits GROUP BY doc_id)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
            FROM sims a JOIN sims b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        """,
        # single-line non-empty texts (true of the testdata at every sf):
        # the reference's line renderer reduces to one context row when
        # equal, else a '- old\n+ new' pair
        # chunked prefixes: equal 200-char prefixes render as ONE context
        # row even when the full texts differ (the chunk boundary), and
        # is_partial = either side longer than the chunk
        "progressive_diff": """
            SELECT a.doc_id AS id_a,
                   sha256(CASE WHEN substr(a.text, 1, 200) = substr(b.text, 1, 200)
                               THEN '  ' || substr(b.text, 1, 200)
                               ELSE '- ' || substr(a.text, 1, 200)
                                    || chr(10) || '+ ' || substr(b.text, 1, 200)
                          END) AS diff_hash,
                   greatest(length(a.text), length(b.text)) > 200 AS is_partial
            FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 250
        """,
        "rendered_diff": """
            SELECT a.doc_id AS id_a,
                   sha256(CASE WHEN a.text = b.text THEN '  ' || b.text
                               ELSE '- ' || a.text || chr(10) || '+ ' || b.text
                          END) AS diff_hash
            FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 250
            WHERE a.doc_id < 250
        """,
        "json_extract_agg": """
            SELECT event_type,
                   round(avg(k), 4) AS avg_k,
                   max(k) AS max_k,
                   CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null
            FROM (SELECT event_type,
                         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
                  FROM events)
            GROUP BY event_type
        """,
        # F16 full normalize: props is flat {"k": N}; synth exercises
        # key-drop / masking / nesting / sorted compact re-serialization, and
        # the oracle states the expected normalized strings directly.
        "json_normalize": """
            SELECT event_id,
                   sha256('{"k":' || json_extract_string(props, '$.k') || '}')
                     AS norm_hash,
                   sha256('{"a":"u' || user_id || '","h":"[HEX]","id":"[UUID]",'
                          || '"nested":{"b":[' || (event_id % 7)
                          || ',"[TIMESTAMP]"]},"z":' || event_id || '}')
                     AS synth_hash
            FROM events
        """,
        # multimodal frame features: the Spark side REALLY decodes MJV1 →
        # PPM pixels and block-means them (operators/multimodal.py); the
        # oracle recomputes the same integer block sums from the synthetic
        # pixel closed form pixel(x,y) = ((x + y + 7f + i)·9) mod 256 on
        # 16×16 frames, 4×4 blocks, feat_idx = yblock·4 + xblock
        # (generate_series bounds are INCLUSIVE in DuckDB)
        # IVF ANN: pivots = 16 rows minimizing md5(str(vec_id)) (list_id =
        # rank in that order), assignment = argmax cosine over pivots (min
        # list_id on exact ties — matches array_position-of-max), probes =
        # 4 nearest lists to the query, then exact cosine top-10. All
        # double sequential folds — bit-identical to the JVM side.
        "embedding_ivf_topk": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            piv AS (
              SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
                       AS list_id, v
              FROM e ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
            qv AS (SELECT v AS q, greatest(sqrt(list_dot_product(v, v)), 1e-12) AS qn
                   FROM e WHERE vec_id = 0),
            probes AS (
              SELECT p.list_id
              FROM piv p, qv
              ORDER BY list_dot_product(p.v, qv.q)
                       / (greatest(sqrt(list_dot_product(p.v, p.v)), 1e-12) * qv.qn)
                       DESC, p.list_id
              LIMIT 4),
            assign AS (
              SELECT e.vec_id, e.v,
                     (SELECT p.list_id FROM piv p
                      ORDER BY list_dot_product(e.v, p.v)
                               / (greatest(sqrt(list_dot_product(e.v, e.v)), 1e-12)
                                  * greatest(sqrt(list_dot_product(p.v, p.v)), 1e-12))
                               DESC, p.list_id ASC
                      LIMIT 1) AS list_id
              FROM e)
            SELECT a.vec_id,
                   round(list_dot_product(a.v, qv.q)
                         / (greatest(sqrt(list_dot_product(a.v, a.v)), 1e-12) * qv.qn),
                         6) AS cos
            FROM assign a, qv
            WHERE a.list_id IN (SELECT list_id FROM probes)
            ORDER BY cos DESC, a.vec_id LIMIT 10
        """,
        "frame_features": """
            SELECT v.i AS media_id,
                   CAST(f.f * 1000 AS INTEGER) AS frame_ts_ms,
                   CAST(g.yb * 4 + g.xb AS INTEGER) AS feat_idx,
                   CAST(SUM(((g.xb * 4 + c.dx + g.yb * 4 + c.dy
                              + f.f * 7 + v.i) * 9) % 256) AS BIGINT)
                     AS block_sum
            FROM (SELECT i FROM generate_series(0, 47) t(i) WHERE i % 3 = 2) v,
                 generate_series(0, 2) f(f),
                 (SELECT yb, xb
                  FROM generate_series(0, 3) a(yb), generate_series(0, 3) b(xb)) g,
                 (SELECT dy, dx
                  FROM generate_series(0, 3) cc(dy), generate_series(0, 3) d(dx)) c
            GROUP BY v.i, f.f, g.yb, g.xb
        """,
    }
