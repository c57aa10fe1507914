"""Unit tests for crawl-engine operators (SURVEY §2 / reference spec tests).

Mirrors the reference behavioral tests (src/backup/fetcher.spec.ts):
cycle termination, listener-style incremental discovery (anti-join), robots
parsing, politeness budgets, hot-host salted dequeue equivalence, bloom
prefilter exactness.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sitemap_scan_spark.config import CrawlConfig
from sitemap_scan_spark.functions.canonicalize import canonicalize_udf
from sitemap_scan_spark.operators.frontier import dequeue
from sitemap_scan_spark.operators.urlseen import (
    IncrementalBloom,
    anti_join_with_bloom,
    exact_anti_join,
)
from sitemap_scan_spark.sources.robots import parse_robots_one, robots_gate
from sitemap_scan_spark.sources.sitemap import expand_sitemaps, parse_sitemap_one


class TestRobots:
    TXT = """# comment
User-agent: Googlebot
Disallow: /google-only/

User-agent: *
Disallow: /private/
Disallow: /tmp/
Crawl-delay: 2.5

Sitemap: https://x.test/sm.xml
Sitemap: https://x.test/sm2.xml
"""

    def test_parse(self):
        r = parse_robots_one(self.TXT)
        assert r.disallow == ["/private/", "/tmp/"]  # star group only
        assert r.crawl_delay == 2
        assert r.sitemaps == ["https://x.test/sm.xml", "https://x.test/sm2.xml"]
        assert r.allows("/public/a") and not r.allows("/private/x")

    def test_empty_and_malformed(self):
        assert parse_robots_one("").disallow == []
        r = parse_robots_one("User-agent: *\nDisallow:\nCrawl-delay: abc")
        assert r.disallow == [] and r.crawl_delay is None

    def test_robots_dim_https_only_port_stripped_unique(self, spark, tmp_path):
        """The rules dim is keyed by port-stripped host with exactly one row
        per host: https wins over http (CRAWL_SPEC Discovery 2 — rules come
        from https://{host}/robots.txt), ported robots rows key to the same
        host the gate extracts, and the gate's left join never fans out."""
        from sitemap_scan_spark.plans.rounds import CrawlEngine

        rows = [
            ("http://a.test/robots.txt", "1", "User-agent: *\nDisallow: /http-only/", "en"),
            ("https://a.test/robots.txt", "1", "User-agent: *\nDisallow: /secret/\nCrawl-delay: 4", "en"),
            ("https://b.test:8080/robots.txt", "1", "User-agent: *\nDisallow: /blocked/", "en"),
        ]
        pages = spark.createDataFrame(
            rows, "url string, warc_ts string, html string, lang string"
        )
        eng = CrawlEngine(spark, pages, CrawlConfig(), str(tmp_path / "wd"))
        dim = {r.host: r for r in eng.robots_dim.collect()}
        assert set(dim) == {"a.test", "b.test"}
        assert dim["a.test"].disallow == ["/secret/"]  # https row won
        assert dim["a.test"].crawl_delay == 4
        assert dim["b.test"].disallow == ["/blocked/"]  # port stripped

        cands = spark.createDataFrame(
            [
                ("https://a.test/secret/x", 1, 0.5),
                ("https://a.test/http-only/x", 1, 0.5),
                ("https://b.test:8080/blocked/x", 1, 0.5),
            ],
            "url_canon string, depth int, priority double",
        )
        gated = eng._gate_inserts(cands, rnd=1).collect()
        assert len(gated) == 3  # one dim row per host → no join fan-out
        st = {r.url_canon: r.status for r in gated}
        assert st["https://a.test/secret/x"] == "robots_blocked"
        assert st["https://a.test/http-only/x"] == "pending"  # http rules ignored
        assert st["https://b.test:8080/blocked/x"] == "robots_blocked"

    def test_gate_jvm_side(self, spark):
        frontier = spark.createDataFrame(
            [
                ("https://a.test/private/x", "a.test"),
                ("https://a.test/ok", "a.test"),
                ("https://b.test/private/x", "b.test"),  # no rules → allowed
            ],
            "url_canon string, host string",
        )
        rules = spark.createDataFrame(
            [("a.test", ["/private/"], None)],
            "host string, disallow array<string>, crawl_delay int",
        )
        got = {r.url_canon: r.blocked for r in robots_gate(frontier, rules).collect()}
        assert got["https://a.test/private/x"] is True
        assert got["https://a.test/ok"] is False
        assert got["https://b.test/private/x"] is False


class TestSitemapParse:
    def test_urlset_with_priority(self):
        xml = (
            "<urlset><url><loc>https://a/1</loc><priority>0.8</priority></url>"
            "<url><loc>https://a/2</loc></url></urlset>"
        )
        kind, entries = parse_sitemap_one(xml)
        assert kind == "urlset"
        assert entries == [("https://a/1", 0.8), ("https://a/2", 0.5)]

    def test_index(self):
        xml = "<sitemapindex><sitemap><loc>https://a/s1.xml</loc></sitemap></sitemapindex>"
        kind, entries = parse_sitemap_one(xml)
        assert kind == "index" and entries[0][0] == "https://a/s1.xml"

    def test_garbage(self):
        assert parse_sitemap_one("<html>not a sitemap</html>")[0] == "other"

    def test_cycle_terminates(self, spark):
        """Mirrors fetcher.spec.ts:65-99 — A→B→A must terminate."""
        rows = [
            ("https://c.test/sitemap.xml", "<sitemapindex><sitemap><loc>https://c.test/a.xml</loc></sitemap></sitemapindex>"),
            ("https://c.test/a.xml", "<sitemapindex><sitemap><loc>https://c.test/b.xml</loc></sitemap></sitemapindex>"),
            ("https://c.test/b.xml", "<sitemapindex><sitemap><loc>https://c.test/a.xml</loc></sitemap>"
             "<sitemap><loc>https://c.test/c.xml</loc></sitemap></sitemapindex>"),
            ("https://c.test/c.xml", "<urlset><url><loc>https://c.test/p1</loc></url></urlset>"),
        ]
        pages = spark.createDataFrame(
            [(u, x.encode()) for u, x in rows], "url_canon string, html binary"
        )
        locs = expand_sitemaps(
            spark, pages, ["https://c.test/sitemap.xml"], CrawlConfig()
        ).collect()
        assert [r.url_canon for r in locs] == ["https://c.test/p1"]

    def test_visited_cap(self, spark):
        """≤ max_visited sitemaps per host (fetcher.ts:82)."""
        rows = [
            (
                "https://d.test/sitemap.xml",
                "<sitemapindex>"
                + "".join(
                    f"<sitemap><loc>https://d.test/s{i}.xml</loc></sitemap>"
                    for i in range(10)
                )
                + "</sitemapindex>",
            )
        ] + [
            (
                f"https://d.test/s{i}.xml",
                f"<urlset><url><loc>https://d.test/p{i}</loc></url></urlset>",
            )
            for i in range(10)
        ]
        pages = spark.createDataFrame(
            [(u, x.encode()) for u, x in rows], "url_canon string, html binary"
        )
        cfg = CrawlConfig(sitemap_max_visited=4)  # root + 3 children
        locs = expand_sitemaps(spark, pages, ["https://d.test/sitemap.xml"], cfg)
        assert locs.count() == 3


class TestDequeue:
    def _frontier(self, spark, n_hot=500, n_cold=20):
        rows = []
        for i in range(n_hot):
            rows.append((f"https://hot.test/p{i:04d}", "hot.test", 1, 0.5, 0, None))
        for i in range(n_cold):
            rows.append((f"https://cold.test/p{i:04d}", "cold.test", 1, 0.9, 0, 5))
        return spark.createDataFrame(
            rows,
            "url_canon string, host string, depth int, priority double, "
            "discovered_round int, crawl_delay int",
        )

    def test_budget_and_order(self, spark):
        f = self._frontier(spark)
        taken = dequeue(f, base_budget=10, round_size=1000, salt_buckets=1).collect()
        by_host = {}
        for r in taken:
            by_host.setdefault(r.host, []).append(r)
        assert len(by_host["hot.test"]) == 10
        # crawl_delay 5 → budget max(1, 10//5) = 2
        assert len(by_host["cold.test"]) == 2
        # global rank follows (priority desc, ...): cold (0.9) before hot (0.5)
        ranks = {r.url_canon: r.rank for r in taken}
        assert ranks["https://cold.test/p0000"] == 1
        assert ranks["https://hot.test/p0000"] == 3

    def test_salted_equals_unsalted(self, spark):
        """Two-phase salted dequeue is semantics-preserving (SURVEY §4.1)."""
        f = self._frontier(spark, n_hot=2000)
        a = dequeue(f, 25, 500, salt_buckets=1).select("url_canon", "rank")
        b = dequeue(f, 25, 500, salt_buckets=16).select("url_canon", "rank")
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    def test_round_size_cap(self, spark):
        f = self._frontier(spark, n_hot=300, n_cold=5)
        taken = dequeue(f, base_budget=1000, round_size=50, salt_buckets=4)
        assert taken.count() == 50
        ranks = sorted(r.rank for r in taken.collect())
        assert ranks == list(range(1, 51))

    def test_parts_dequeue_equals_union_dequeue(self, spark):
        """Split-input dequeue (partitioned base + tail, the engine's
        O(round) cache layout) must produce bit-identical output to a
        single-part dequeue of the union: phase-1 pruning per subset only
        keeps MORE rows, and phase 2 is exact."""
        from sitemap_scan_spark.operators.frontier import SALT_COL, salt_col

        f = self._frontier(spark, n_hot=2000, n_cold=30)
        base_rows = f.filter(~F.col("url_canon").rlike("p00[0-4]"))
        tail_rows = f.filter(F.col("url_canon").rlike("p00[0-4]"))
        base = (
            base_rows.withColumn(SALT_COL, salt_col(8))
            .repartition(8, "host", SALT_COL)
            .persist()
        )
        base.count()
        tail = tail_rows.withColumn(SALT_COL, salt_col(8))
        got = dequeue([base, tail], 25, 500, salt_buckets=8).select("url_canon", "rank")
        want = dequeue(f, 25, 500, salt_buckets=8).select("url_canon", "rank")
        assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
        base.unpersist()

    def test_phase1_reuses_base_partitioning(self, spark):
        """THE O(round) phase-2 plan assertion (round-3 VERDICT task 1): on
        a pending base hash-partitioned on (host, _salt) — including after
        the per-round broadcast anti-join advance — the phase-1 window must
        plan ZERO shuffle Exchanges (the O(pending) cache is ranked in
        place); the same window over an unpartitioned input must plan one.
        At 10^10 pending rows that Exchange was the last per-round
        O(pending) shuffle."""
        from sitemap_scan_spark.operators.frontier import (
            SALT_COL,
            host_budget_col,
            phase1_prune,
            salt_col,
        )

        f = self._frontier(spark, n_hot=3000, n_cold=50)
        base = (
            f.withColumn(SALT_COL, salt_col(8))
            .repartition(8, "host", SALT_COL)
            .persist()
        )
        base.count()
        taken = f.limit(40).select("url_canon")
        advanced = base.join(F.broadcast(taken), "url_canon", "left_anti")
        budget = host_budget_col(10)

        def n_shuffles(df):
            # the cached plan's own build-time exchange prints inside
            # InMemoryRelation — only exchanges OUTSIDE it run per-round
            plan = df._jdf.queryExecution().executedPlan().toString()
            return plan.split("InMemoryRelation")[0].count("Exchange hashpartitioning")

        pruned = phase1_prune(advanced.withColumn("_budget", budget), 8, 10)
        assert n_shuffles(pruned) == 0
        cold = phase1_prune(
            f.withColumn("_budget", budget), 8, 10
        )  # no _salt column, no pre-partitioning → one real shuffle
        assert n_shuffles(cold) == 1
        # the literal-budget conjunct must engage map-side top-k pruning
        # (InferWindowGroupLimit) so the cold shuffle moves ≤ budget rows
        # per (host, salt) group per map partition
        cold_plan = cold._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in cold_plan and "Partial" in cold_plan
        # and the pruning itself is correct on the advanced base
        got = {r.url_canon for r in pruned.collect()}
        assert got and got.isdisjoint({r.url_canon for r in taken.collect()})
        base.unpersist()


class TestBloom:
    def test_prefilter_exact(self, spark):
        seen = spark.range(0, 5000).select(
            F.concat(F.lit("https://s.test/p"), F.col("id")).alias("url_canon")
        )
        cands = spark.range(4000, 9000).select(
            F.concat(F.lit("https://s.test/p"), F.col("id")).alias("url_canon")
        )
        got = anti_join_with_bloom(cands, seen).collect()
        assert sorted(r.url_canon for r in got) == sorted(
            f"https://s.test/p{i}" for i in range(5000, 9000)
        )

    def test_incremental_matches_exact(self, spark):
        seen1 = spark.range(0, 1000).select(
            F.concat(F.lit("u"), F.col("id")).alias("url_canon")
        )
        seen2 = spark.range(1000, 2000).select(
            F.concat(F.lit("u"), F.col("id")).alias("url_canon")
        )
        bloom = IncrementalBloom(expected_total=10000)
        bloom.update(seen1)
        bloom.update(seen2)
        all_seen = seen1.union(seen2)
        cands = spark.range(1500, 3000).select(
            F.concat(F.lit("u"), F.col("id")).alias("url_canon")
        )
        got = bloom.prefiltered_anti_join(cands, all_seen)
        want = exact_anti_join(cands, all_seen)
        assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0

    def test_sharded_identical_to_single_bitmap(self, spark):
        """Bloom-per-bucket == single bitmap == exact join, bit-for-bit, and
        incrementally updated the same way (SCALE_DESIGN.md D3)."""
        from sitemap_scan_spark.operators.urlseen import ShardedBloom

        seen1 = spark.range(0, 1500).select(
            F.concat(F.lit("https://sh.test/"), F.col("id")).alias("url_canon")
        )
        seen2 = spark.range(1500, 2500).select(
            F.concat(F.lit("https://sh.test/"), F.col("id")).alias("url_canon")
        )
        single = IncrementalBloom(expected_total=20000)
        sharded = ShardedBloom(expected_total=20000, n_shards=8)
        for b in (single, sharded):
            b.update(seen1)
            b.update(seen2)
        all_seen = seen1.union(seen2)
        cands = spark.range(2000, 4000).select(
            F.concat(F.lit("https://sh.test/"), F.col("id")).alias("url_canon")
        )
        got_sharded = sorted(
            r.url_canon
            for r in sharded.prefiltered_anti_join(cands, all_seen).collect()
        )
        got_single = sorted(
            r.url_canon
            for r in single.prefiltered_anti_join(cands, all_seen).collect()
        )
        want = sorted(
            r.url_canon for r in exact_anti_join(cands, all_seen).collect()
        )
        assert got_sharded == want
        assert got_single == want

    def test_sharded_split_skips_negative_candidates(self, spark):
        """The routed split keeps bloom-negative rows out of the exact join:
        needs_check must contain every truly-seen candidate (no false
        negatives ever) and at 1% fpp only a tiny false-positive overhang."""
        from sitemap_scan_spark.operators.urlseen import ShardedBloom

        seen = spark.range(0, 3000).select(
            F.concat(F.lit("https://sk.test/"), F.col("id")).alias("url_canon")
        )
        bloom = ShardedBloom(expected_total=30000, n_shards=8)
        bloom.update(seen)
        cands = spark.range(2500, 6000).select(
            F.concat(F.lit("https://sk.test/"), F.col("id")).alias("url_canon")
        )  # 500 seen + 3000 new
        definite_new, needs_check = bloom.split(cands)
        nc = {r.url_canon for r in needs_check.collect()}
        dn = {r.url_canon for r in definite_new.collect()}
        truly_seen = {f"https://sk.test/{i}" for i in range(2500, 3000)}
        assert truly_seen <= nc  # zero false negatives
        assert not (truly_seen & dn)
        assert len(nc) + len(dn) == 3500
        # the exact-join input is ~the seen overlap, not the candidate set:
        # the 3000 new URLs skip the shuffle (1% fpp → ~30 strays allowed)
        assert len(nc) <= 500 + 120

    def test_file_backed_shards_identical_and_driver_free(self, spark, tmp_path):
        """The 10^10-key lifecycle (round-3 VERDICT item 2): file-backed
        shards must (a) give bit-identical splits to the in-memory dict,
        (b) keep ZERO bitmaps on the driver — peak driver memory independent
        of P·m, (c) persist one independently-sized file per touched shard,
        (d) survive into a new instance with matching meta, and (e) wipe on
        layout mismatch (a half-compatible bloom would leak duplicates)."""
        import os

        from sitemap_scan_spark.operators.urlseen import ShardedBloom

        seen1 = spark.range(0, 1500).select(
            F.concat(F.lit("https://fb.test/"), F.col("id")).alias("url_canon")
        )
        seen2 = spark.range(1500, 2500).select(
            F.concat(F.lit("https://fb.test/"), F.col("id")).alias("url_canon")
        )
        d = str(tmp_path / "bloomdir")
        mem = ShardedBloom(expected_total=20000, n_shards=8)
        fb = ShardedBloom(expected_total=20000, n_shards=8, dir=d)
        for b in (mem, fb):
            b.update(seen1)
            b.update(seen2)  # incremental OR-merge into existing files

        # (b) no driver-resident bitmaps in file mode
        assert fb.shards is None
        # (c) one file per touched shard, each exactly m/8 bytes
        files = sorted(f for f in os.listdir(d) if f.endswith(".bloom"))
        assert 1 <= len(files) <= 8
        for f in files:
            assert os.path.getsize(os.path.join(d, f)) == fb.m // 8

        cands = spark.range(2000, 4000).select(
            F.concat(F.lit("https://fb.test/"), F.col("id")).alias("url_canon")
        )

        def flags(bloom):
            dn, nc = bloom.split(cands)
            return (
                sorted(r.url_canon for r in dn.collect()),
                sorted(r.url_canon for r in nc.collect()),
            )

        # (a) identical split decisions (same hashes, same bit layout)
        assert flags(fb) == flags(mem)

        # (d) a new instance over the same dir reuses the files
        fb2 = ShardedBloom(expected_total=20000, n_shards=8, dir=d)
        assert flags(fb2) == flags(mem)

        # (e) layout mismatch (different shard count) starts empty
        fb3 = ShardedBloom(expected_total=20000, n_shards=4, dir=d)
        dn3, nc3 = fb3.split(cands)
        assert nc3.count() == 0 and dn3.count() == 2000

    def test_file_backed_generations_and_loss_detection(self, spark, tmp_path):
        """ADVICE round-3 (urlseen cache staleness + silent shard loss):
        (a) every update writes each touched shard under a NEW
        generation-unique filename (executor caches key on path — identical
        content can never be served stale) and retires the old generation;
        (b) _meta.json records per-shard generations, so a recorded-but-
        missing shard file RAISES instead of silently classifying seen URLs
        as definite_new past the exact backstop."""
        import os
        import re

        from sitemap_scan_spark.operators.urlseen import ShardedBloom

        d = str(tmp_path / "bloomgen")
        fb = ShardedBloom(expected_total=20000, n_shards=4, dir=d)
        seen1 = spark.range(0, 800).select(
            F.concat(F.lit("https://gen.test/"), F.col("id")).alias("url_canon")
        )
        seen2 = spark.range(800, 1600).select(
            F.concat(F.lit("https://gen.test/"), F.col("id")).alias("url_canon")
        )
        fb.update(seen1)
        gen_of = lambda f: int(re.search(r"\.g(\d+)\.bloom$", f).group(1))
        files1 = sorted(f for f in os.listdir(d) if f.endswith(".bloom"))
        assert files1 and all(gen_of(f) == 1 for f in files1)
        fb.update(seen2)
        files2 = sorted(f for f in os.listdir(d) if f.endswith(".bloom"))
        # (a) superseded generations of re-touched shards are gone — exactly
        # one file per shard, and its generation matches the meta
        shard_of = lambda f: int(f.split("_")[1].split(".")[0])
        assert len({shard_of(f) for f in files2}) == len(files2)
        assert all(gen_of(f) == fb._gens[shard_of(f)] for f in files2)
        assert any(gen_of(f) == 2 for f in files2)  # some shard re-touched

        cands = spark.range(1500, 2000).select(
            F.concat(F.lit("https://gen.test/"), F.col("id")).alias("url_canon")
        )
        dn, nc = fb.split(cands)
        assert {r.url_canon for r in nc.collect()} >= {
            f"https://gen.test/{i}" for i in range(1500, 1600)
        }

        # (b) delete one touched shard file → the probe must fail loudly
        victim = next(f for f in os.listdir(d) if f.endswith(".bloom"))
        os.remove(os.path.join(d, victim))
        fb_lost = ShardedBloom(expected_total=20000, n_shards=4, dir=d)
        import pytest as _pytest

        dn_l, nc_l = fb_lost.split(cands)
        with _pytest.raises(Exception, match="(?i)bloom shard .* missing"):
            dn_l.unionByName(nc_l).count()

    def test_file_backed_uncommitted_update_refused(self, spark, tmp_path):
        """ADVICE round-4: a driver crash between the executors' g+1 shard
        writes and the meta commit leaves _update.intent in the dir; a NEW
        process attaching non-fresh must refuse to serve (its probes would
        silently miss that update's keys), while a completed update leaves
        no journal behind and re-attach works."""
        import os

        import pytest as _pytest

        from sitemap_scan_spark.operators.urlseen import ShardedBloom

        d = str(tmp_path / "bloomintent")
        fb = ShardedBloom(expected_total=20000, n_shards=4, dir=d)
        seen = spark.range(0, 500).select(
            F.concat(F.lit("https://intent.test/"), F.col("id")).alias("url_canon")
        )
        fb.update(seen)
        assert not os.path.exists(os.path.join(d, "_update.intent"))
        ShardedBloom(expected_total=20000, n_shards=4, dir=d)  # clean attach OK

        # simulate the crash window: journal open, meta never committed
        with open(os.path.join(d, "_update.intent"), "w") as f:
            f.write("{}")
        with _pytest.raises(RuntimeError, match="uncommitted update"):
            ShardedBloom(expected_total=20000, n_shards=4, dir=d)
        # fresh=True re-seeds from scratch and clears the journal
        fb2 = ShardedBloom(expected_total=20000, n_shards=4, dir=d, fresh=True)
        assert not os.path.exists(os.path.join(d, "_update.intent"))
        fb2.update(seen)
        dn, nc = fb2.split(seen.limit(10))
        assert dn.count() == 0 and nc.count() == 10


class TestBroadcastKeyCap:
    """ADVICE round-4 (medium): _broadcast_key_cap must accept every memory
    string Spark itself accepts — two-letter suffixes ('8gb'), bare numbers
    (MiB per JVM semantics) — and fall back to the 1g default rather than
    raise mid-round on anything unparseable."""

    def _cap(self, mem):
        from types import SimpleNamespace

        from sitemap_scan_spark.plans.rounds import CrawlEngine

        fake = SimpleNamespace(
            spark=SimpleNamespace(conf=SimpleNamespace(get=lambda k, d=None: mem))
        )
        return CrawlEngine._broadcast_key_cap(fake)

    def test_suffix_forms(self):
        base = self._cap("8g")
        assert self._cap("8gb") == base == self._cap("8G") == self._cap("8GB")
        assert self._cap("512m") == self._cap("512mb")

    def test_bare_number_is_mib(self):
        assert self._cap("8192") == self._cap("8g")

    def test_garbage_falls_back_to_1g_default(self):
        onegig = self._cap("1g")
        for bad in ("watermelon", "", None, "gb8", "1.2.3g"):
            assert self._cap(bad) == onegig

    def test_floor_and_ceiling(self):
        assert self._cap("64m") == 1_000_000       # floor
        assert self._cap("100t") == 32_000_000     # ceiling


class TestWallClockPoliteness:
    """CRAWL_SPEC Round 3a: a crawl_delay > round_period host is dequeued
    only every ceil(delay/period) rounds — and the distributed engine matches
    the sequential oracle exactly on such a corpus."""

    def _corpus(self, path, slow_paths=("a", "b", "c")):
        import os

        import pandas as pd

        os.makedirs(path, exist_ok=True)
        rows = [
            ("https://slow.test/robots.txt", "User-agent: *\nCrawl-delay: 25"),
            (
                "https://slow.test/sitemap.xml",
                "<urlset>"
                + "".join(
                    f"<url><loc>https://slow.test/{p}</loc></url>"
                    for p in slow_paths
                )
                + "</urlset>",
            ),
            ("https://fast.test/sitemap.xml",
             "<urlset><url><loc>https://fast.test/x</loc></url>"
             "<url><loc>https://fast.test/y</loc></url></urlset>"),
        ]
        for u in ("https://slow.test/",
                  *(f"https://slow.test/{p}" for p in slow_paths),
                  "https://fast.test/", "https://fast.test/x",
                  "https://fast.test/y"):
            rows.append((u, f"<html><body><p>page {u}</p></body></html>"))
        pdf = pd.DataFrame(
            {
                "url": [r[0] for r in rows],
                "warc_ts": pd.to_datetime(["2026-01-01"] * len(rows))
                .tz_localize("UTC")
                .astype("datetime64[us, UTC]"),
                "html": [r[1].encode() for r in rows],
                "lang": ["en"] * len(rows),
            }
        )
        pdf.to_parquet(os.path.join(path, "pages.parquet"), index=False)
        pd.DataFrame(
            {
                "seed_url": ["https://slow.test/", "https://fast.test/"],
                "priority": [0.8, 0.8],
            }
        ).to_parquet(os.path.join(path, "seeds.parquet"), index=False)

    def test_delay_host_skips_rounds_and_matches_oracle(self, spark, tmp_path):
        import pandas as pd

        from sim.oracle import OracleCrawler
        from sitemap_scan_spark.plans.rounds import CrawlEngine

        corpus = str(tmp_path / "corpus")
        self._corpus(corpus)
        # period = base_host_budget = 10; delay 25 → one fetch every
        # ceil(25/10) = 3 rounds: slow.test dequeued in rounds 1, 4, 7, 10
        cfg = CrawlConfig(base_host_budget=10, round_size=100, max_rounds=12)
        eng = CrawlEngine(
            spark,
            spark.read.parquet(f"{corpus}/pages.parquet"),
            cfg,
            str(tmp_path / "wd"),
        )
        eng.run(spark.read.parquet(f"{corpus}/seeds.parquet"))
        order = [
            (r.round, r.rank, r.url_canon) for r in eng.crawl_order().collect()
        ]
        slow_rounds = sorted(
            {rnd for rnd, _rk, u in order if u.startswith("https://slow")}
        )
        assert slow_rounds == [1, 4, 7, 10]
        # one slow fetch per eligible round, never more
        from collections import Counter

        per_round = Counter(
            rnd for rnd, _rk, u in order if u.startswith("https://slow")
        )
        assert set(per_round.values()) == {1}
        # fast host unaffected: fully crawled in round 1 + link round(s)
        fast_rounds = sorted(
            {rnd for rnd, _rk, u in order if u.startswith("https://fast")}
        )
        assert fast_rounds[0] == 1

        # exact parity with the sequential oracle under the same semantics
        oracle = OracleCrawler(pd.read_parquet(f"{corpus}/pages.parquet"), cfg)
        res = oracle.crawl(pd.read_parquet(f"{corpus}/seeds.parquet"))
        assert sorted(order) == sorted(res.crawl_order)
        got_seen = sorted(
            (r.url_canon, r.first_seen_round, r.last_status)
            for r in eng.url_seen().collect()
        )
        want_seen = sorted(
            (u, r, s) for u, (r, s) in res.url_seen.items()
        )
        assert got_seen == want_seen

    def test_oversized_sleeping_dim_falls_back_distributed(self, spark, tmp_path):
        """Round-5 VERDICT finding 2: above SLEEP_DICT_CAP the politeness
        dim must stay distributed (no driver dict / LocalRelation). Forcing
        the cap to 0 routes every round through the fallback — the crawl
        order must be IDENTICAL to the driver-dict path's oracle parity."""
        import pandas as pd

        from sim.oracle import OracleCrawler
        from sitemap_scan_spark.plans.rounds import CrawlEngine

        corpus = str(tmp_path / "corpus")
        self._corpus(corpus)
        cfg = CrawlConfig(base_host_budget=10, round_size=100, max_rounds=12)
        eng = CrawlEngine(
            spark,
            spark.read.parquet(f"{corpus}/pages.parquet"),
            cfg,
            str(tmp_path / "wd"),
        )
        eng.SLEEP_DICT_CAP = 0  # every host_state table counts as oversized
        eng.run(spark.read.parquet(f"{corpus}/seeds.parquet"))
        assert eng._sleeping_oversized_round is not None  # fallback engaged
        order = [
            (r.round, r.rank, r.url_canon) for r in eng.crawl_order().collect()
        ]
        slow_rounds = sorted(
            {rnd for rnd, _rk, u in order if u.startswith("https://slow")}
        )
        assert slow_rounds == [1, 4, 7, 10]
        oracle = OracleCrawler(pd.read_parquet(f"{corpus}/pages.parquet"), cfg)
        res = oracle.crawl(pd.read_parquet(f"{corpus}/seeds.parquet"))
        assert sorted(order) == sorted(res.crawl_order)

    def test_sleep_survives_discovery_refresh(self, spark, tmp_path):
        """Regression (round-3 ADVICE): discovery_refresh commits a round
        WITHOUT a host_state table; the next crawl round must walk back to
        the last round that has one, or hosts mid-sleep become dequeueable
        immediately (silent politeness violation)."""
        import pandas as pd

        from sitemap_scan_spark.plans.rounds import CrawlEngine

        corpus = str(tmp_path / "c1")
        self._corpus(corpus)
        cfg = CrawlConfig(base_host_budget=10, round_size=100, max_rounds=12)
        eng = CrawlEngine(
            spark,
            spark.read.parquet(f"{corpus}/pages.parquet"),
            cfg,
            str(tmp_path / "wd"),
        )
        # delay 25 / period 10: slow.test fetched round 1, then 4 (sleeps
        # 2,3), with next_eligible_round = 7 stamped at round 4
        eng.run(spark.read.parquet(f"{corpus}/seeds.parquet"), max_rounds=4)

        # sitemap gains a genuinely new loc → refresh commits round 5
        # (no host_state table on that round)
        corpus2 = str(tmp_path / "c2")
        self._corpus(corpus2, slow_paths=("a", "b", "c", "brandnew"))
        eng2 = CrawlEngine(
            spark,
            spark.read.parquet(f"{corpus2}/pages.parquet"),
            cfg,
            str(tmp_path / "wd"),
            refresh_pages=True,
        )
        r = eng2.refresh_discovery()
        assert r["re_expanded"] == 1 and r["n_new"] == 1
        refresh_round = eng2.store.latest_round()
        assert refresh_round == 5
        assert not eng2.store.has_table(refresh_round, "host_state")

        # resume: rounds 6,7,8 — slow.test must stay asleep through round 6
        # (next_eligible_round=7 from round 4's host_state), not wake early
        eng2.run(spark.read.parquet(f"{corpus2}/seeds.parquet"), max_rounds=8)
        slow_rounds = sorted(
            {
                r.round
                for r in eng2.crawl_order().collect()
                if r.url_canon.startswith("https://slow")
            }
        )
        assert slow_rounds == [1, 4, 7]


class TestCanonicalizeUdfNulls:
    def test_invalid_inputs_dropped(self, spark):
        df = spark.createDataFrame(
            [("https://ok.test/a",), ("::bad::",), (None,), ("mailto:x@y",)], ["u"]
        ).select(canonicalize_udf("u").alias("c"))
        vals = [r.c for r in df.collect()]
        assert sorted(v for v in vals if v) == ["https://ok.test/a"]


class TestPendingCacheLineage:
    def test_pending_lineage_bounded_by_compaction(self, spark, tmp_path):
        """ADVICE round-3 (unbounded pending-cache lineage): the advance
        chain must REBASE at every compaction — the base's logical plan
        holds at most ~compact_every anti-joins, and the join count must
        RESET after a compaction round instead of growing monotonically
        (previously O(rounds): O(R²) Catalyst analysis over a crawl and an
        eventual driver StackOverflowError)."""
        from sim.genpages import generate
        from sitemap_scan_spark.config import CrawlConfig
        from sitemap_scan_spark.plans.rounds import CrawlEngine

        corpus = str(tmp_path / "corpus")
        generate(corpus, n_hosts=10, mean_pages=30, n_seeds=3, seed=11)
        pages = spark.read.parquet(f"{corpus}/pages.parquet")
        seeds = spark.read.parquet(f"{corpus}/seeds.parquet")
        cfg = CrawlConfig(
            base_host_budget=4, round_size=60, max_rounds=8,
            frontier_compact_every=3,
        )
        eng = CrawlEngine(spark, pages, cfg, str(tmp_path / "wd"))
        eng.init_frontier(seeds)

        def joins_in_base():
            plan = eng._pending_base._jdf.queryExecution().optimizedPlan().toString()
            return plan.count("Join")

        depths = {}
        for rnd in range(1, 9):
            if eng.run(seeds, max_rounds=rnd) == []:
                break
            depths[rnd] = joins_in_base()
        assert depths, "crawl never ran"
        k = cfg.frontier_compact_every
        # the invariant: plan complexity is a function of the POSITION in
        # the compaction cycle only — round 4 must look like round 1, round
        # 5 like round 2, … (the old design grew monotonically with rnd)
        by_pos: dict[int, set[int]] = {}
        for rnd, d in depths.items():
            by_pos.setdefault(rnd % k, set()).add(d)
        for pos, ds in by_pos.items():
            assert len(ds) == 1, (pos, depths)
        compacted = by_pos.get(0)
        if compacted and len(by_pos) > 1:
            assert min(compacted) <= min(min(v) for p, v in by_pos.items() if p != 0), depths


class TestFailurePathRobustness:
    """Round-5 VERDICT findings 2+3: the overlapped bloom-update thread must
    be joined on the FAILURE path too, and an oversized sleeping-hosts dim
    must fall back to the distributed join instead of a driver dict."""

    def _corpus(self, path):
        import os

        import pandas as pd

        os.makedirs(path, exist_ok=True)
        rows = [
            (
                "https://h.test/sitemap.xml",
                "<urlset><url><loc>https://h.test/a</loc></url>"
                "<url><loc>https://h.test/b</loc></url></urlset>",
            ),
            ("https://h.test/a",
             '<html><a href="/c1">x</a><a href="/c2">y</a></html>'),
            ("https://h.test/b", '<html><a href="/c3">z</a></html>'),
            ("https://h.test/c1", "<html>leaf</html>"),
            ("https://h.test/c2", "<html>leaf</html>"),
            ("https://h.test/c3", "<html>leaf</html>"),
        ]
        pdf = pd.DataFrame(
            {
                "url": [r[0] for r in rows],
                "warc_ts": pd.to_datetime(["2026-01-01"] * len(rows))
                .tz_localize("UTC")
                .astype("datetime64[us, UTC]"),
                "html": [r[1].encode() for r in rows],
                "lang": ["en"] * len(rows),
            }
        )
        pdf.to_parquet(os.path.join(path, "pages.parquet"), index=False)
        pd.DataFrame(
            {"seed_url": ["https://h.test/a"], "priority": [0.8]}
        ).to_parquet(os.path.join(path, "seeds.parquet"), index=False)

    def test_bloom_thread_joined_when_compaction_raises(self, spark, tmp_path):
        """Make the compaction raise MID-OVERLAP: the exception must
        propagate only after the update thread is joined (no orphan racing
        a later fresh=True rebuild), and the bloom dir must be attachable
        afterwards (intent journal committed, not dangling)."""
        import threading

        from sitemap_scan_spark.operators.urlseen import ShardedBloom
        from sitemap_scan_spark.plans.rounds import CrawlEngine

        corpus = str(tmp_path / "corpus")
        self._corpus(corpus)
        # bloom forced on; every round compacts
        cfg = CrawlConfig(
            base_host_budget=10,
            round_size=100,
            max_rounds=3,
            bloom_min_frontier=0,
            frontier_compact_every=1,
        )
        eng = CrawlEngine(
            spark,
            spark.read.parquet(f"{corpus}/pages.parquet"),
            cfg,
            str(tmp_path / "wd"),
        )
        eng.init_frontier(spark.read.parquet(f"{corpus}/seeds.parquet"))

        def boom(*a, **k):
            raise RuntimeError("compaction boom")

        eng._rebase_pending = boom
        with pytest.raises(RuntimeError, match="compaction boom"):
            eng.run_round(1)
        assert not any(
            t.name == "bloom-update" and t.is_alive()
            for t in threading.enumerate()
        ), "bloom update thread orphaned past the failure"
        # the dir is attachable by a new process: no uncommitted intent
        ShardedBloom(
            expected_total=1 << 16,
            n_shards=cfg.bloom_shards,
            dir=str(tmp_path / "wd" / "rounds" / "_urlseen_bloom"),
            fresh=False,
        )
