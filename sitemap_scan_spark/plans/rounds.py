"""The crawl engine: discover → per-round dequeue→fetch→parse→dedup loop.

Distributed implementation of CRAWL_SPEC.md (the reference's
``performSiteBackup`` lifecycle, SURVEY §3.1, /root/reference/src/backup/
fetcher.ts:101-294) where every round is ONE DataFrame job:

    pending ─robots gate (broadcast dim)─► eligible
            ─two-phase salted window dequeue─► taken (≤ round_size)
            ─left join pages (fetch sim)─► fetched/miss/redirect
            ─mapInPandas link+redirect extraction─► candidates
            ─canonicalize → exclude rlike → groupBy dedup─►
            ─Bloom-prefiltered anti-join vs frontier─► new pending rows
            ─frontier snapshot + deltas committed via RoundStore─► next round

Scale notes (10^10 frontier, 100 TB pages):
- the frontier snapshot is the only full-size table rewritten per round; it
  is written hash-distributed on url_canon (stable joins) and reloaded,
  which also truncates lineage (no unbounded plan growth across rounds);
- the fetch join broadcasts ``taken`` (≤ round_size) against the pages scan;
  with an Iceberg pages table, bloom-filter column metrics on url prune
  almost all files — locally it's one scan per round;
- robots rules are a per-host dim — broadcast, never shuffled;
- everything Python-side is Arrow-batched pandas (canonicalize, link
  extraction, bloom probe); hashing/filtering/windows are JVM codegen.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import CrawlConfig
from ..functions.canonicalize import canonicalize_udf
from ..functions.extract import extract_links, extract_text_udf
from ..operators.frontier import dequeue
from ..operators.urlseen import IncrementalBloom, exact_anti_join
from ..sources.robots import parse_robots_one
from ..sources.sitemap import expand_sitemaps
from .checkpoint import RoundStore

FRONTIER_SCHEMA = (
    "url_canon string, host string, depth int, priority double, "
    "discovered_round int, status string"
)


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        pages: DataFrame,
        cfg: CrawlConfig,
        workdir: str,
        use_bloom: bool = True,
    ):
        self.spark = spark
        self.cfg = cfg
        self.workdir = workdir
        self.store = RoundStore(os.path.join(workdir, "rounds"))
        self.use_bloom = use_bloom
        self._bloom: IncrementalBloom | None = None
        self._prepare_pages(pages)

    # ------------------------------------------------------------------ setup
    def _prepare_pages(self, pages: DataFrame) -> None:
        """One-time canonicalized scan of the pages table, persisted to the
        workdir (the 100 TB analog: a canonical-url-keyed Iceberg copy or a
        materialized view — paid once, reused every round). Duplicate
        canonical URLs keep the (max warc_ts, max url) row, deterministically."""
        path = os.path.join(self.workdir, "pages_canon")
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            w = Window.partitionBy("url_canon").orderBy(
                F.col("warc_ts").desc(), F.col("url").desc()
            )
            (
                pages.withColumn("url_canon", canonicalize_udf("url"))
                .filter(F.col("url_canon").isNotNull())
                .withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
                .select("url_canon", "url", "warc_ts", "html", "lang")
                .write.mode("overwrite")
                .parquet(path)
            )
        self.pages_canon = self.spark.read.parquet(path)
        self.robots_dim = self._build_robots_dim()

    def _build_robots_dim(self) -> DataFrame:
        """Parse every /robots.txt row in the corpus into the per-host rules
        dim (host, disallow array, crawl_delay, sitemaps array). Hosts are
        ≪ URLs, so this collects to the driver once and broadcasts."""
        rows = (
            self.pages_canon.filter(F.col("url_canon").rlike(r"^https?://[^/]+/robots\.txt$"))
            .select("url_canon", "html")
            .collect()
        )
        parsed = []
        for r in rows:
            host = r.url_canon.split("/")[2]
            rules = parse_robots_one(
                r.html.decode("utf-8", "replace") if isinstance(r.html, (bytes, bytearray)) else r.html
            )
            parsed.append((host, rules.disallow, rules.crawl_delay, rules.sitemaps))
        if not parsed:
            return self.spark.createDataFrame(
                [], "host string, disallow array<string>, crawl_delay int, sitemaps array<string>"
            )
        return self.spark.createDataFrame(
            parsed,
            "host string, disallow array<string>, crawl_delay int, sitemaps array<string>",
        )

    def _exclude_filter(self, df: DataFrame, col: str = "url_canon") -> DataFrame:
        """P1 default i18n excludes as ONE alternation rlike (single regex
        pass, JVM-side; fetcher.ts:809-840)."""
        if not self.cfg.exclude_patterns:
            return df
        alternation = "(?i)(" + "|".join(self.cfg.exclude_patterns) + ")"
        return df.filter(~F.col(col).rlike(alternation))

    # ------------------------------------------------------------- discovery
    def init_frontier(self, seeds: DataFrame) -> dict:
        """Round 0: seeds + robots-declared sitemap expansion (CRAWL_SPEC
        'Discovery'). Commits the round-0 frontier snapshot."""
        cfg = self.cfg
        seed_canon = (
            seeds.withColumn("url_canon", canonicalize_udf("seed_url"))
            .filter(F.col("url_canon").isNotNull())
            .groupBy("url_canon")
            .agg(F.max("priority").cast("double").alias("priority"))
        )
        seed_hosts = sorted(
            r.host
            for r in seed_canon.select(
                F.regexp_extract("url_canon", r"^https?://([^/:?#]+)", 1).alias("host")
            )
            .distinct()
            .collect()
        )
        robots = {
            r.host: r
            for r in self.robots_dim.filter(F.col("host").isin(seed_hosts)).collect()
        }
        roots: list[str] = []
        for h in seed_hosts:
            rr = robots.get(h)
            roots.extend(
                (rr.sitemaps if rr and rr.sitemaps else [f"https://{h}/sitemap.xml"])
            )
        locs = expand_sitemaps(self.spark, self.pages_canon, roots, cfg)

        seeds_f = seed_canon.select(
            "url_canon",
            F.lit(0).alias("depth"),
            F.col("priority"),
        )
        locs_f = locs.select(
            "url_canon", F.lit(1).alias("depth"), F.col("priority")
        )
        frontier = (
            self._exclude_filter(seeds_f.unionByName(locs_f))
            .groupBy("url_canon")
            .agg(F.max("priority").alias("priority"), F.min("depth").alias("depth"))
            .select(
                "url_canon",
                F.regexp_extract("url_canon", r"^https?://([^/:?#]+)", 1).alias("host"),
                "depth",
                "priority",
                F.lit(0).alias("discovered_round"),
                F.lit("pending").alias("status"),
            )
        )
        n = frontier.count()
        self.store.commit_round(0, {"frontier": frontier}, {"frontier_size": n})
        return {"frontier_size": n}

    # ----------------------------------------------------------------- round
    def run_round(self, rnd: int) -> dict:
        cfg = self.cfg
        t0 = time.time()
        frontier = self.store.read_table(self.spark, rnd - 1, "frontier")
        pending = frontier.filter(F.col("status") == "pending")

        # 1. robots gate (broadcast per-host dim, JVM exists() on prefixes)
        from ..sources.robots import robots_gate

        gated = robots_gate(
            pending, self.robots_dim.select("host", "disallow", "crawl_delay")
        )
        blocked = (
            gated.filter(F.col("blocked")).select("url_canon").localCheckpoint(eager=True)
        )
        eligible = gated.filter(~F.col("blocked")).drop("blocked")

        # 2-3. politeness dequeue (two-phase salted window + TakeOrdered cap)
        taken = dequeue(
            eligible, cfg.base_host_budget, cfg.round_size, cfg.salt_buckets
        ).select("url_canon", "host", "depth", "priority", "rank")
        taken = taken.localCheckpoint(eager=True)  # reused 4×; ≤ round_size rows

        # 4. fetch simulation. A plain left join would shuffle the whole
        # pages table (a left-outer can't use the big side as broadcast
        # build), so: broadcast-hash inner join (pages scan streams past the
        # tiny taken set, no shuffle) + broadcast anti-join to recover
        # misses. On Iceberg, url bloom metadata prunes the scan itself.
        hits = self.pages_canon.select("url_canon", "html").join(
            F.broadcast(taken.select("url_canon")), "url_canon", "inner"
        )
        # second join is tiny-vs-tiny (≤ round_size each); AQE picks the
        # strategy — no broadcast hint, the html payload may be wide
        fetched = taken.join(hits, "url_canon", "left")
        have_html = fetched.filter(F.col("html").isNotNull())
        parsed = extract_links(have_html)  # (url_canon, links, redirect_to)
        enriched = (
            fetched.join(parsed, "url_canon", "left")
            .withColumn(
                "status",
                F.when(F.col("html").isNull(), "miss")
                .when(F.col("redirect_to").isNotNull(), "redirect")
                .otherwise("fetched"),
            )
            .withColumn(
                "text_extracted",
                F.when(F.col("status") == "fetched", extract_text_udf("html")),
            )
        )
        enriched = enriched.localCheckpoint(eager=True)

        # 5. candidate links: explode + redirect targets, canonicalize,
        #    exclude, per-round dedup, anti-join vs the whole frontier
        links = enriched.filter(F.col("status") == "fetched").select(
            F.explode("links").alias("raw"),
            (F.col("depth") + 1).alias("cand_depth"),
            F.lit(cfg.link_priority).alias("cand_priority"),
        )
        redirects = enriched.filter(F.col("status") == "redirect").select(
            F.col("redirect_to").alias("raw"),
            (F.col("depth") + 1).alias("cand_depth"),
            F.col("priority").alias("cand_priority"),
        )
        cands = (
            links.unionByName(redirects)
            .withColumn("url_canon", canonicalize_udf("raw"))
            .filter(F.col("url_canon").isNotNull())
        )
        cands = (
            self._exclude_filter(cands)
            .groupBy("url_canon")
            .agg(
                F.max("cand_priority").alias("priority"),
                F.min("cand_depth").alias("depth"),
            )
            .filter(F.col("depth") <= cfg.max_depth)
        )
        if self.use_bloom:
            if self._bloom is None:
                # first round of this process (fresh run OR resume): one
                # full-frontier pass seeds the filter; afterwards it is
                # OR-updated with each round's small insert set only.
                est = max(self.pages_canon.count() * 2, 1 << 16)
                self._bloom = IncrementalBloom(expected_total=est)
                self._bloom.update(frontier.select("url_canon"))
            fresh = self._bloom.prefiltered_anti_join(
                cands, frontier.select("url_canon")
            )
        else:
            fresh = exact_anti_join(cands, frontier.select("url_canon"))
        new_rows = fresh.select(
            "url_canon",
            F.regexp_extract("url_canon", r"^https?://([^/:?#]+)", 1).alias("host"),
            "depth",
            "priority",
            F.lit(rnd).alias("discovered_round"),
            F.lit("pending").alias("status"),
        ).localCheckpoint(eager=True)
        if self._bloom is not None:
            self._bloom.update(new_rows.select("url_canon"))

        # 6. frontier update: status transitions + inserts
        updates = blocked.select(
            "url_canon", F.lit("robots_blocked").alias("new_status")
        ).unionByName(enriched.select("url_canon", F.col("status").alias("new_status")))
        frontier_next = (
            frontier.join(updates, "url_canon", "left")
            .withColumn("status", F.coalesce("new_status", "status"))
            .drop("new_status")
            .unionByName(new_rows)
        )

        # deltas for this round
        crawl_order = taken.select(
            F.lit(rnd).alias("round"), F.col("rank"), F.col("url_canon")
        )
        url_seen_delta = updates.select(
            "url_canon",
            F.lit(rnd).alias("first_seen_round"),
            F.col("new_status").alias("last_status"),
        )
        fetch_log = enriched.select(
            F.lit(rnd).alias("round"), "url_canon", "status", "text_extracted"
        )

        # counters over localCheckpointed (already materialized) data — these
        # jobs scan cached blocks, not the lineage
        by_status = {
            r.status: r["count"] for r in enriched.groupBy("status").count().collect()
        }
        counters = {
            "round": rnd,
            "n_blocked": blocked.count(),
            "n_taken": sum(by_status.values()),
            "n_fetched": by_status.get("fetched", 0),
            "n_miss": by_status.get("miss", 0),
            "n_redirect": by_status.get("redirect", 0),
            "n_new": new_rows.count(),
        }
        counters["secs"] = round(time.time() - t0, 3)
        counters["urls_per_sec"] = round(
            counters["n_taken"] / max(counters["secs"], 1e-9), 1
        )
        self.store.commit_round(
            rnd,
            {
                "frontier": frontier_next,
                "crawl_order": crawl_order,
                "url_seen": url_seen_delta,
                "fetch_log": fetch_log,
            },
            counters,
        )
        return counters

    # ------------------------------------------------------------------- run
    def run(self, seeds: DataFrame, max_rounds: int | None = None) -> list[dict]:
        """Full crawl (or resume: skips discovery + committed rounds)."""
        max_rounds = max_rounds or self.cfg.max_rounds
        latest = self.store.latest_round()
        stats: list[dict] = []
        if latest is None:
            self.init_frontier(seeds)
            latest = 0
        for rnd in range(latest + 1, max_rounds + 1):
            frontier = self.store.read_table(self.spark, rnd - 1, "frontier")
            if frontier.filter(F.col("status") == "pending").isEmpty():
                break
            stats.append(self.run_round(rnd))
        return stats

    # --------------------------------------------------------------- outputs
    def crawl_order(self) -> DataFrame:
        df = self.store.read_deltas(self.spark, "crawl_order")
        assert df is not None
        return df.orderBy("round", "rank")

    def url_seen(self) -> DataFrame:
        df = self.store.read_deltas(self.spark, "url_seen")
        assert df is not None
        # a URL is seen once; keep the earliest round (dedup is a safety net)
        w = Window.partitionBy("url_canon").orderBy("first_seen_round")
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def fetch_log(self) -> DataFrame:
        df = self.store.read_deltas(self.spark, "fetch_log")
        assert df is not None
        return df
