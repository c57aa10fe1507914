"""The crawl engine: discover → per-round dequeue→fetch→parse→dedup loop.

Distributed implementation of CRAWL_SPEC.md (the reference's
``performSiteBackup`` lifecycle, SURVEY §3.1, /root/reference/src/backup/
fetcher.ts:101-294) where every round is ONE DataFrame job:

    pending ─robots gate (broadcast dim)─► eligible
            ─two-phase salted window dequeue + parallel global rank─► taken
            ─broadcast fetch join vs pages─► fetched/miss/redirect
            ─JVM regex parse (text/links/redirect)─► fetch_log delta
            ─vectorized resolve+canonicalize → exclude rlike → dedup─►
            ─(adaptive Bloom-prefiltered) anti-join vs frontier─► inserts
            ─frontier snapshot + deltas committed via RoundStore─► next round

Scale notes (10^10 frontier, 100 TB pages):
- WRITE-FIRST: each stage materializes its delta once and re-reads it (no
  heap-resident checkpoints, lineage truncated every round; counters come
  from parquet footers, not extra jobs);
- the fetch join broadcasts ``taken`` (≤ round_size) against the pages scan;
  with an Iceberg pages table, bloom-filter column metrics on url prune
  almost all files — locally it's one scan per round;
- robots rules are a per-host dim — broadcast, never shuffled;
- parse/extract/dedup keys are JVM whole-stage codegen; Python appears only
  in Arrow-vectorized canonicalization and the Bloom probe — never per-row.
"""

from __future__ import annotations

import os
import re
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import CrawlConfig
from ..functions.canonicalize import canonicalize_udf, with_resolved_canonical
from ..functions.extract import (
    extract_links_col,
    extract_redirect_col,
    extract_text_col,
)
from ..operators.frontier import dequeue
from ..operators.urlseen import ShardedBloom, exact_anti_join
from ..sources.robots import parse_robots_one
from ..sources.sitemap import expand_sitemaps
from .checkpoint import RoundStore

FRONTIER_SCHEMA = (
    "url_canon string, host string, depth int, priority double, "
    "discovered_round int, status string, crawl_delay int"
)


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        pages: DataFrame,
        cfg: CrawlConfig,
        workdir: str,
        use_bloom: bool = True,
        refresh_pages: bool = False,
    ):
        self.spark = spark
        self.cfg = cfg
        self.workdir = workdir
        self.store = RoundStore(os.path.join(workdir, "rounds"))
        self.use_bloom = use_bloom
        self._bloom: ShardedBloom | None = None
        self._bloom_decision: dict | None = None  # measured gray-zone crossover
        # O(round)-per-round caches (round 3; SCALE_DESIGN.md). The old
        # design re-shuffled + re-persisted the FULL latest-wins frontier
        # view every round — O(frontier) work per round that dominates at
        # 10^10 rows. Split instead into:
        #  - seen-keys BASE: url_canon only, hash-partitioned + persisted,
        #    append-only so it is UNCHANGED between compactions (zero
        #    per-round cost; anti-joins against it shuffle only the probe
        #    side) — the in-memory analog of an Iceberg table bucketed by
        #    url_canon;
        #  - seen-keys TAIL: the insert deltas since the base (≤
        #    compact_every round-sized parquet reads), anti-joined after
        #    the base (cands ∖ (A∪B) = (cands ∖ A) ∖ B);
        #  - PENDING cache, split BASE + TAIL (round 4): the base carries a
        #    materialized _salt column and is hash-partitioned + persisted
        #    on (host, _salt) — the dequeue's phase-1 window ranks it IN
        #    PLACE (zero Exchange; the last per-round O(pending) shuffle is
        #    gone). Advanced each round by a broadcast anti-join of the
        #    round's taken keys (narrow — BroadcastHashJoin preserves the
        #    streamed side's partitioning). The tail holds the pending
        #    inserts since the last rebase (round-sized); both are rebased
        #    from the disk snapshot at every compaction, so cache lineage
        #    never exceeds frontier_compact_every joins (ADVICE round 3:
        #    unbounded plan growth risked O(R²) analysis + driver stack
        #    overflow on very long crawls).
        self._pending_base: DataFrame | None = None
        self._pending_tail: DataFrame | None = None
        self._pending_round: int | None = None
        self._seen_base: DataFrame | None = None
        self._seen_tail_rounds: list[int] = []
        self._seen_through: int | None = None
        # wall-clock politeness dim cache: host → next_eligible_round
        # (sleeping hosts only — broadcast-sized by construction, so a
        # driver dict is the right home; persisted per round via pyarrow)
        self._sleeping: dict[str, int] | None = None
        self._sleeping_round: int | None = None
        self._sleeping_oversized_round: int | None = None
        if refresh_pages:
            # the pages table changed underneath (new crawl epoch) —
            # rebuild the canonicalized materialization
            import shutil

            shutil.rmtree(os.path.join(workdir, "pages_canon"), ignore_errors=True)
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
        # persist the per-host rules dim: it is broadcast into the insert
        # gate EVERY round, and without the persist each broadcast rebuild
        # re-ran the robots mapInPandas parse over the pages scan (~0.35 s
        # of per-round fixed cost; the dim is one row per robots host —
        # cache-resident by construction)
        self.robots_dim = self._build_robots_dim().persist()
        self._any_delayed: bool | None = None  # lazily probed once

    def _wallclock_politeness_on(self) -> bool:
        """True iff some host's crawl_delay exceeds the round period — only
        then is the per-round host_state dim maintained (zero extra jobs per
        round otherwise). Probed once per engine instance."""
        if self._any_delayed is None:
            self._any_delayed = not self.robots_dim.filter(
                F.col("crawl_delay") > self.cfg.round_period()
            ).isEmpty()
        return self._any_delayed

    # sleeping-hosts dicts beyond this row count stay DISTRIBUTED: the
    # driver-dict politeness dim is broadcast-sized for any sane config,
    # but a pathological one (millions of hosts all slower than the round
    # period) must degrade to the old distributed-dim path instead of
    # serializing a giant LocalRelation through py4j every round.
    SLEEP_DICT_CAP = 1_000_000

    def _host_state(self, rnd: int) -> dict[str, int] | None:
        """The wall-clock politeness dim as of round ``rnd``:
        {host: next_eligible_round} for hosts still sleeping off a
        crawl_delay > round_period. Tiny by construction (delayed hosts
        only — the engine broadcasts it into the dequeue anyway, so it is
        broadcast-sized by definition): it lives as a DRIVER DICT, is
        persisted per round via a zero-job pyarrow write, and its per-round
        maintenance costs zero Spark job launches (it used to be a
        groupBy+union+write job plus a read-back — pure fixed cost in the
        small-round regime).

        Walks BACK to the most recent committed round <= rnd that carries
        the table: discovery_refresh commits a round without host_state,
        and a crawl round resuming after it must not forget hosts mid-sleep
        (next_eligible_round is an absolute round number, exactly like the
        oracle's run-scoped ``next_eligible`` dict, so the comparison stays
        correct across intervening refresh rounds)."""
        if self._sleeping_round == rnd:
            return self._sleeping
        state: dict[str, int] | None = None
        self._sleeping_oversized_round = None
        for r in range(rnd, -1, -1):
            if self.store.has_table(r, "host_state"):
                if self.store.table_rows(r, "host_state") > self.SLEEP_DICT_CAP:
                    # footer row count only — the oversized dim never
                    # reaches the driver; run_round joins it distributed
                    import logging

                    logging.getLogger(__name__).warning(
                        "host_state round %d exceeds SLEEP_DICT_CAP=%d; "
                        "falling back to the distributed politeness dim",
                        r,
                        self.SLEEP_DICT_CAP,
                    )
                    self._sleeping_oversized_round = r
                    break
                t = self.store.read_local_table(r, "host_state")
                state = dict(
                    zip(
                        t.column("host").to_pylist(),
                        t.column("next_eligible_round").to_pylist(),
                    )
                )
                break
        self._sleeping, self._sleeping_round = state, rnd
        return state

    def _build_robots_dim(self) -> DataFrame:
        """Parse robots.txt rows into the per-host rules dim
        (host, disallow array, crawl_delay, sitemaps array).

        DISTRIBUTED: parsing runs in ``mapInPandas`` over the robots subset —
        at corpus scale hosts number in the millions, so nothing proportional
        to host count ever reaches the driver (the dim stays a DataFrame;
        the gate join broadcasts it only while it is actually small).

        Spec-faithful keying (CRAWL_SPEC Discovery 2): rules come from
        ``https://{host}/robots.txt``; host is extracted with the same
        port-stripping regex as ``_gate_inserts`` so ported hosts match their
        rules, and the dim is deduplicated to ONE row per host (the portless
        https row wins) so the gate's left join can never fan out inserts."""
        robots = self.pages_canon.filter(
            F.col("url_canon").rlike(r"^https://[^/?#]+/robots\.txt$")
        ).select("url_canon", "html")

        def parse_batches(batches):
            import pandas as pd

            from ..functions.canonicalize import host_of_one

            for pdf in batches:
                hosts, dis, cds, sms = [], [], [], []
                for u, h in zip(pdf["url_canon"], pdf["html"]):
                    text = (
                        h.decode("utf-8", "replace")
                        if isinstance(h, (bytes, bytearray))
                        else (h or "")
                    )
                    rules = parse_robots_one(text)
                    hosts.append(host_of_one(u))
                    dis.append(rules.disallow)
                    cds.append(rules.crawl_delay)
                    sms.append(rules.sitemaps)
                yield pd.DataFrame(
                    {
                        "host": hosts,
                        "url_canon": pdf["url_canon"],
                        "disallow": dis,
                        "crawl_delay": cds,
                        "sitemaps": sms,
                    }
                )

        parsed = robots.mapInPandas(
            parse_batches,
            "host string, url_canon string, disallow array<string>, "
            "crawl_delay int, sitemaps array<string>",
        )
        portless = F.col("url_canon") == F.concat(
            F.lit("https://"), F.col("host"), F.lit("/robots.txt")
        )
        rn = F.row_number().over(
            Window.partitionBy("host").orderBy(portless.desc(), "url_canon")
        )
        return (
            parsed.withColumn("_rn", rn)
            .filter(F.col("_rn") == 1)
            .select("host", "disallow", "crawl_delay", "sitemaps")
        )

    def _gate_inserts(self, cands: DataFrame, rnd: int) -> DataFrame:
        """Robots gate AT INSERT (CRAWL_SPEC Discovery 4 / Round 5): join the
        per-host rules dim (broadcast — only the small insert set is gated,
        never the full pending frontier), mark disallowed rows
        ``robots_blocked``, attach the host's crawl_delay to allowed rows.

        ``cands`` needs (url_canon, depth, priority); returns full frontier
        rows (status + crawl_delay + discovered_round)."""
        from ..sources.robots import robots_gate

        with_host = cands.withColumn(
            "host", F.regexp_extract("url_canon", r"^https?://([^/:?#]+)", 1)
        )
        gated = robots_gate(
            with_host, self.robots_dim.select("host", "disallow", "crawl_delay")
        )
        return gated.select(
            "url_canon",
            "host",
            "depth",
            "priority",
            F.lit(rnd).alias("discovered_round"),
            F.when(F.col("blocked"), "robots_blocked").otherwise("pending").alias("status"),
            F.col("crawl_delay"),
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
        frontier = self._gate_inserts(
            self._exclude_filter(seeds_f.unionByName(locs_f))
            .groupBy("url_canon")
            .agg(F.max("priority").alias("priority"), F.min("depth").alias("depth"))
            .select("url_canon", "depth", "priority"),
            rnd=0,
        )
        frontier = frontier.localCheckpoint(eager=True)
        n = frontier.count()
        n_blocked = frontier.filter(F.col("status") == "robots_blocked").count()
        self.store.commit_round(
            0,
            {"frontier": frontier},
            {
                "frontier_size": n,
                "n_blocked": n_blocked,
                "n_pending_after": n - n_blocked,
            },
        )
        # record discovery watermarks (root list + content/semantic hashes)
        # for refresh_discovery()'s no-rescan logic (T3/T5)
        from ..functions.canonicalize import canonicalize_one

        canon_roots = sorted(
            {c for c in (canonicalize_one(r) for r in roots) if c}
        )
        self._save_discovery_state(
            {"roots": canon_roots, "root_hashes": self._root_sitemap_hashes(canon_roots)}
        )
        return {"frontier_size": n}

    def frontier_at(self, rnd: int) -> DataFrame:
        """The frontier STATE as of round ``rnd``.

        Rounds commit deltas, not snapshots (SCALE_DESIGN.md: a per-round
        full rewrite is O(frontier) — ~1.2 TB/round at 10^10 rows; the delta
        commit is O(round)). A full snapshot exists every
        ``cfg.frontier_compact_every`` rounds (plus round 0 and refresh
        rounds); in between the view is reconstructed latest-wins:

            base snapshot (newest ≤ rnd)
            ∪ frontier_inserts deltas (base, rnd]
            ← status updates from fetch_log deltas (base, rnd]

        A url_canon is dequeued at most once, so the per-URL update is
        unique; max(round) keeps the semantics safe if that ever changes."""
        store = self.store
        if store.has_table(rnd, "frontier"):
            return store.read_table(self.spark, rnd, "frontier")
        bases = [
            r for r in store.committed_rounds()
            if r <= rnd and store.has_table(r, "frontier")
        ]
        if not bases:
            raise RuntimeError(f"no frontier snapshot at or before round {rnd}")
        base = bases[-1]
        rows = store.read_table(self.spark, base, "frontier")
        upd_parts = []
        for r in range(base + 1, rnd + 1):
            if store.has_table(r, "frontier_inserts"):
                rows = rows.unionByName(
                    store.read_table(self.spark, r, "frontier_inserts")
                )
            if store.has_table(r, "fetch_log"):
                upd_parts.append(
                    store.read_table(self.spark, r, "fetch_log").select(
                        "url_canon", F.col("status").alias("_new_status"), "round"
                    )
                )
        if upd_parts:
            upd = upd_parts[0]
            for p in upd_parts[1:]:
                upd = upd.unionByName(p)
            latest_w = Window.partitionBy("url_canon").orderBy(F.col("round").desc())
            upd = (
                upd.withColumn("_rn", F.row_number().over(latest_w))
                .filter(F.col("_rn") == 1)
                .select("url_canon", "_new_status")
            )
            rows = (
                rows.join(upd, "url_canon", "left")
                .withColumn("status", F.coalesce("_new_status", "status"))
                .drop("_new_status")
            )
        return rows

    def _broadcast_key_cap(self) -> int:
        """Max key count the per-round broadcast anti-joins may ship.

        Sizing rationale (replaces the old 4M magic number): a broadcast
        hash relation over string URL keys costs ~120 bytes/key (≤~80-byte
        canonical URL + UnsafeRow + hash-map slot overhead); budget at most
        ~3 % of the driver heap for it (the relation exists once on the
        driver and once per executor while the round's jobs run), floored
        at 1M keys so small-heap dev sessions still broadcast round-sized
        sets, capped at 32M where torrent-broadcast latency dominates
        regardless of heap."""
        mem = (self.spark.conf.get("spark.driver.memory", "1g") or "1g").strip().lower()
        units = {"": 1 << 20, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}
        m = re.match(r"^([\d.]+)\s*([kmgt]?)b?$", mem)
        try:
            # Spark accepts '8g', '8gb', '512m', '512mb', and bare numbers
            # (bare = MiB, matching JVM -Xmx semantics Spark documents).
            driver_bytes = int(float(m.group(1)) * units[m.group(2)]) if m else 1 << 30
        except (ValueError, OverflowError):
            driver_bytes = 1 << 30
        return max(1_000_000, min(32_000_000, int(driver_bytes * 0.03 / 120)))

    def _pending_parts(self, rnd: int) -> tuple[DataFrame, DataFrame | None]:
        """The PENDING frontier rows as of round ``rnd`` — the dequeue
        input — as (BASE, TAIL-or-None).

        BASE carries a materialized ``_salt`` column, hash-partitioned +
        persisted on (host, _salt): the dequeue's phase-1 window ranks it
        with ZERO Exchange (plan-asserted in tests), so the per-round cost
        of the O(pending) cache is one in-memory scan, never a shuffle.
        TAIL is the pending inserts since the last rebase (≤ compact_every
        round-sized sets). Both advance narrowly per round via
        :meth:`_advance_pending`; cold path (process start, post-refresh,
        compaction) rebuilds from the latest-wins view / disk snapshot —
        the one O(frontier) shuffle, amortized."""
        if self._pending_base is not None and self._pending_round == rnd:
            return self._pending_base, self._pending_tail
        self._rebase_pending(
            self.frontier_at(rnd).filter(F.col("status") == "pending"), rnd
        )
        return self._pending_base, self._pending_tail

    def _rebase_pending(self, pending: DataFrame, rnd: int) -> None:
        """(Re)build the partitioned pending base from ``pending`` and clear
        the tail — called cold and at every compaction, which also truncates
        the cache lineage (ADVICE round 3: the advance chain must not grow
        unboundedly).

        ``pending`` must derive from DISK (the snapshot / latest-wins
        reconstruction), never from the caches being replaced: the old
        caches are dropped BEFORE the new base materializes, so the
        frontier is never memory-resident twice (the transient doubling
        OOMed a 16-thread local JVM at 6.4M pending rows on an 8g heap)."""
        from ..operators.frontier import SALT_COL, salt_col

        self._drop_pending_caches()
        n = int(self.spark.conf.get("spark.sql.shuffle.partitions", "32"))
        base = (
            pending.withColumn(SALT_COL, salt_col(self.cfg.salt_buckets))
            .repartition(n, "host", SALT_COL)
            .persist()
        )
        base.count()
        self._pending_base = base
        self._pending_tail = None
        self._pending_round = rnd

    def _drop_pending_caches(self) -> None:
        for c in (self._pending_base, self._pending_tail):
            if c is not None:
                c.unpersist()
        self._pending_base = None
        self._pending_tail = None
        self._pending_round = None

    def _advance_pending(
        self, rnd: int, taken_keys: DataFrame, new_rows: DataFrame, n_taken: int
    ) -> None:
        """pending(rnd) = pending(rnd-1) ∖ taken(rnd) ∪ new-pending(rnd).

        Both deltas are round-sized and disk-backed. The base side drops
        its taken rows via a BROADCAST anti-join — narrow, so the persisted
        (host, _salt) partitioning survives and the next dequeue's phase-1
        window still runs Exchange-free. New pending rows go to the TAIL
        (a union onto the base would destroy its reported partitioning);
        the tail stays round-sized because compaction folds it back into
        the base. Rounds too large to broadcast (cap derived from the
        driver heap, :meth:`_broadcast_key_cap`) invalidate the cache
        instead — a shuffle anti-join would shuffle the base AND lose its
        partitioning, strictly worse than the cold rebuild it falls back
        to."""
        if self._pending_base is None or self._pending_round != rnd - 1:
            return  # no valid parent — next _pending_parts() rebuilds cold
        if n_taken > self._broadcast_key_cap():
            self._drop_pending_caches()
            return
        from ..operators.frontier import SALT_COL, salt_col

        keys = F.broadcast(taken_keys.select("url_canon"))
        base_nxt = self._pending_base.join(keys, "url_canon", "left_anti").persist()
        new_pending = new_rows.filter(F.col("status") == "pending").withColumn(
            SALT_COL, salt_col(self.cfg.salt_buckets)
        )
        tail_nxt = new_pending.select(*self._pending_base.columns)
        if self._pending_tail is not None:
            tail_nxt = (
                self._pending_tail.join(keys, "url_canon", "left_anti")
                .unionByName(tail_nxt)
            )
        tail_nxt = tail_nxt.persist()
        # materialize BEFORE dropping the parents — ONE job scans both
        # persisted frames (a count per frame would pay a second job launch
        # per round for no extra information)
        base_nxt.unionByName(tail_nxt).count()
        self._pending_base.unpersist()
        if self._pending_tail is not None:
            self._pending_tail.unpersist()
        self._pending_base = base_nxt
        self._pending_tail = tail_nxt
        self._pending_round = rnd

    def _seen_parts(self, rnd: int) -> tuple[DataFrame, DataFrame | None]:
        """URL-seen keys through round ``rnd`` as (BASE, TAIL-or-None).

        BASE is url_canon-only, hash-partitioned + persisted, and — because
        the seen set is append-only — UNCHANGED between compactions: the
        per-round anti-join against it shuffles only the probe side. TAIL
        is the union of the insert deltas not yet folded in (≤
        compact_every round-sized parquet reads). Cold path (process
        start, post-refresh): one full-view key scan rebuilds the base."""
        if self._seen_base is None or self._seen_through != rnd:
            self._set_seen_base(self.frontier_at(rnd).select("url_canon"))
            self._seen_tail_rounds = []
            self._seen_through = rnd
        tail = None
        if self._seen_tail_rounds:
            paths = [
                os.path.join(self.store._dir(r), "frontier_inserts")
                for r in self._seen_tail_rounds
            ]
            tail = self.store.read_paths(
                self.spark, "frontier_inserts", paths
            ).select("url_canon")
        return self._seen_base, tail

    def _set_seen_base(self, keys: DataFrame) -> None:
        """``keys`` always derives from disk (snapshot / latest-wins view),
        so the old base is dropped FIRST — the seen set is never cached
        twice (see :meth:`_rebase_pending` on why the transient doubling
        matters)."""
        if self._seen_base is not None:
            self._seen_base.unpersist()
            self._seen_base = None
        n = int(self.spark.conf.get("spark.sql.shuffle.partitions", "32"))
        df = keys.repartition(n, "url_canon").persist()
        df.count()
        self._seen_base = df

    def _anti_seen(self, df: DataFrame, seen_base: DataFrame, seen_tail: DataFrame | None) -> DataFrame:
        """df ∖ seen, distributed over the base/tail split:
        df ∖ (A ∪ B) = (df ∖ A) ∖ B — the base side reuses its persisted
        partitioning (only df shuffles), the tail join is round-sized."""
        out = exact_anti_join(df, seen_base)
        if seen_tail is not None:
            out = exact_anti_join(out, seen_tail)
        return out

    # ---------------------------------------------------------- re-discovery
    def _discovery_state_path(self) -> str:
        return os.path.join(self.workdir, "discovery_state.json")

    def _save_discovery_state(self, state: dict) -> None:
        import json

        tmp = self._discovery_state_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f, indent=1)
        os.rename(tmp, self._discovery_state_path())

    def _load_discovery_state(self) -> dict:
        import json

        p = self._discovery_state_path()
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return {}

    def _root_sitemap_hashes(self, roots: list[str]) -> dict[str, dict]:
        """Per root sitemap URL: content hash + semantic hash (F21 — sha256
        of the sorted distinct canonical loc set, fetcher.ts:901-914) of the
        CURRENT body in pages. One mapInPandas job over the small sitemap
        subset; only the (url, hash, hash) TRIPLES reach the driver — never
        the bodies (root sitemaps run to tens of MB each, so collecting
        bodies would OOM the driver at ~10^4 discovery roots)."""
        default_priority = self.cfg.sitemap_default_priority

        def hash_batches(batches):
            import hashlib

            import pandas as pd

            from ..functions.canonicalize import canonicalize_one
            from ..sources.sitemap import parse_sitemap_one

            for pdf in batches:
                chs, shs = [], []
                for h in pdf["html"]:
                    body = (
                        h.decode("utf-8", "replace")
                        if isinstance(h, (bytes, bytearray))
                        else (h or "")
                    )
                    _kind, entries = parse_sitemap_one(body, default_priority)
                    locs = sorted(
                        {
                            c
                            for c in (canonicalize_one(u) for u, _ in entries)
                            if c is not None
                        }
                    )
                    chs.append(hashlib.sha256(body.encode()).hexdigest())
                    shs.append(hashlib.sha256("\n".join(locs).encode()).hexdigest())
                yield pd.DataFrame(
                    {"url_canon": pdf["url_canon"], "content_hash": chs,
                     "semantic_hash": shs}
                )

        rows = (
            self.pages_canon.filter(F.col("url_canon").isin(roots))
            .select("url_canon", "html")
            .mapInPandas(
                hash_batches,
                "url_canon string, content_hash string, semantic_hash string",
            )
            .collect()
        )
        return {
            r.url_canon: {
                "content_hash": r.content_hash,
                "semantic_hash": r.semantic_hash,
            }
            for r in rows
        }

    def refresh_discovery(self) -> dict:
        """T3/T5/S9 analog of the reference's no-rescan logic
        (fetcher.ts:995-1090): re-hash each root sitemap's body; unchanged →
        skip; content changed but semantic hash (loc set) unchanged —
        ``<lastmod>``-only churn — → skip but refresh the stored content
        hash; semantically changed → re-expand that root and insert the
        genuinely new URLs as pending (listener-mode incremental discovery,
        fetcher.ts:482-505). Requires a committed crawl state."""
        latest = self.store.latest_round()
        if latest is None:
            raise RuntimeError("refresh_discovery needs an initialized crawl")
        state = self._load_discovery_state()
        roots = sorted(state.get("roots", []))
        stored = state.get("root_hashes", {})
        current = self._root_sitemap_hashes(roots)

        changed_roots = []
        skipped, lastmod_only = [], []
        for root in roots:
            cur = current.get(root)
            old = stored.get(root)
            if cur is None or (old and cur["content_hash"] == old["content_hash"]):
                skipped.append(root)
                continue
            if old and cur["semantic_hash"] == old["semantic_hash"]:
                lastmod_only.append(root)  # volatile <lastmod>, stable locs
                continue
            changed_roots.append(root)

        n_new = 0
        if changed_roots:
            locs = expand_sitemaps(self.spark, self.pages_canon, changed_roots, self.cfg)
            frontier = self.frontier_at(latest)
            cands = self._exclude_filter(
                locs.select(
                    "url_canon",
                    F.lit(1).alias("depth"),
                    "priority",
                )
            )
            fresh = exact_anti_join(cands, frontier.select("url_canon"))
            # commit as a fresh round so resume semantics stay append-only;
            # inserts are stamped with the round they are COMMITTED in, so
            # first_seen_round and the dequeue tie-break (discovered_round
            # asc) rank them after genuine round-`latest` inserts
            new_round = latest + 1
            new_rows = self._gate_inserts(
                fresh.select("url_canon", "depth", "priority"), new_round
            )
            self.store.begin_round(new_round)
            new_rows = self.store.write_table(
                self.spark, new_round, "frontier_inserts", new_rows
            )
            merged = frontier.unionByName(new_rows)
            self.store.write_table(self.spark, new_round, "frontier", merged)
            n_new = self.store.table_rows(new_round, "frontier_inserts")
            # blocked inserts are seen-but-never-pending: count them from the
            # delta's parquet footer (same pattern as run_round) so the
            # arithmetic pending counter can't inflate and stall run()'s
            # early-termination
            import collections

            import pyarrow.parquet as pq

            ins_status = collections.Counter(
                pq.read_table(
                    os.path.join(self.store._dir(new_round), "frontier_inserts"),
                    columns=["status"],
                )["status"].to_pylist()
            )
            n_blocked_new = ins_status.get("robots_blocked", 0)
            prev_pending = self.store.read_manifest(latest)["counters"].get(
                "n_pending_after", 0
            )
            self.store.commit_manifest(
                new_round,
                {
                    "round": new_round,
                    "kind": "discovery_refresh",
                    "n_taken": 0,
                    "n_new": n_new,
                    "n_blocked": n_blocked_new,
                    "n_pending_after": (prev_pending or 0) + n_new - n_blocked_new,
                    "frontier_size": self.store.table_rows(new_round, "frontier"),
                },
            )
            if self._bloom is not None and n_new > 0:
                # feed exactly this refresh's insert delta (blocked included —
                # they are url_seen), never re-filtered from the merged
                # frontier where old round-`latest` rows would leak in
                self._bloom.update(new_rows.select("url_canon"))

        state["root_hashes"] = {**stored, **current}
        self._save_discovery_state(state)
        return {
            "skipped": len(skipped),
            "lastmod_only": len(lastmod_only),
            "re_expanded": len(changed_roots),
            "n_new": n_new,
        }

    # ------------------------------------------------------------ url-seen
    def _ensure_bloom(self, seen_base: DataFrame, seen_tail: DataFrame | None) -> None:
        """Seed the URL-seen filter once per process (fresh run OR resume):
        one pass over the seen-key set; afterwards it is OR-updated with
        each round's insert delta only."""
        if self._bloom is not None:
            return
        est = max(self.pages_canon.count() * 2, 1 << 16)
        # file-backed shard lifecycle: bitmaps live one-file-per-shard under
        # the workdir; the driver holds none of them (fresh=True — the
        # full seed below rebuilds state, so stale files from a prior
        # process must not linger)
        self._bloom = ShardedBloom(
            expected_total=est,
            n_shards=self.cfg.bloom_shards,
            dir=os.path.join(self.store.root, "_urlseen_bloom"),
            fresh=True,
        )
        seen = seen_base if seen_tail is None else seen_base.unionByName(seen_tail)
        self._bloom.update(seen)

    def _decide_urlseen_mode(
        self,
        frontier_size: int,
        cands: DataFrame,
        seen_base: DataFrame,
        seen_tail: DataFrame | None,
    ) -> tuple[bool, dict | None, DataFrame]:
        """Bloom pays for itself once the frontier outgrows what a plain
        shuffle anti-join handles cheaply; below that its extra jobs/round
        are pure overhead (SURVEY §4.3 — the exact anti-join is always the
        correctness backstop either way, so BOTH modes give identical
        output and the flip is purely a plan choice).

        Far from ``cfg.bloom_min_frontier`` the static decision stands. In
        the gray zone [min/2, 2·min] the crossover is MEASURED on this
        round's real inputs — both paths timed once, result cached on the
        engine until the frontier doubles/halves — and the measurement is
        recorded in the round's manifest (``bloom_crossover``), so the
        threshold is evidence in the crawl's own lineage, not a guess.

        Returns (use_bloom, measurement-or-None, cands) — when a
        measurement ran, the returned ``cands`` is the PERSISTED handle the
        measurement already computed; the caller reuses it for the real
        write (the candidate pipeline is never recomputed) and unpersists
        it after the insert delta lands on disk."""
        if not self.use_bloom:
            return False, None, cands
        lo, hi = self.cfg.bloom_min_frontier // 2, self.cfg.bloom_min_frontier * 2
        if frontier_size < lo:
            return False, None, cands
        if frontier_size > hi:
            return True, None, cands
        d = self._bloom_decision
        if d is not None and d["frontier_size"] / 2 <= frontier_size <= d["frontier_size"] * 2:
            return d["use_bloom"], None, cands
        cands_m = cands.persist()
        try:
            cands_m.count()  # materialize BEFORE either timer: otherwise the
            # first-timed path (exact) also pays the full candidate-pipeline
            # compute while the second reads from cache — a systematic bias
            # toward bloom that could flip the recorded crossover the wrong way
            t0 = time.time()
            n_exact = self._anti_seen(cands_m, seen_base, seen_tail).count()
            secs_exact = time.time() - t0
            # seeding amortizes across rounds — untimed
            self._ensure_bloom(seen_base, seen_tail)
            t0 = time.time()
            definite_new, needs_check = self._bloom.split(cands_m)
            n_bloom = (
                definite_new.unionByName(
                    self._anti_seen(needs_check, seen_base, seen_tail)
                ).count()
            )
            secs_bloom = time.time() - t0
            if n_exact != n_bloom:  # both paths are exact by construction — a
                # mismatch means the bloom state is corrupt (must survive -O)
                raise RuntimeError(
                    f"urlseen self-check failed: exact={n_exact} bloom={n_bloom}"
                )
        except BaseException:
            # the caller only unpersists the handle it receives after the
            # insert delta lands — on a failed measurement nobody would, so
            # release the cached candidate set before propagating
            cands_m.unpersist()
            raise
        d = {
            "frontier_size": frontier_size,
            "secs_exact": round(secs_exact, 3),
            "secs_bloom": round(secs_bloom, 3),
            "use_bloom": secs_bloom < secs_exact,
        }
        self._bloom_decision = d
        return d["use_bloom"], d, cands_m

    # ----------------------------------------------------------------- round
    def run_round(self, rnd: int) -> dict:
        """One crawl round, WRITE-FIRST: each stage materializes its delta to
        the round directory once and continues from the re-read — ~6 Spark
        jobs per round, no heap-resident checkpoints, counters from parquet
        footers. The manifest commit (last) makes the round visible."""
        cfg = self.cfg
        t0 = time.time()
        _tm = [time.time()]
        _timing = os.environ.get("SSC_TIMING") == "1"

        def _mark(label: str) -> None:
            if _timing:
                now = time.time()
                print(f"[timing r{rnd}] {label}: {now - _tm[0]:.2f}s", flush=True)
                _tm[0] = now

        store = self.store
        store.begin_round(rnd)
        # 1. robots gating happened at insert (status + crawl_delay live in
        # the frontier row), so every pending row is eligible by construction
        # — except hosts sleeping off a crawl_delay > round_period (CRAWL_SPEC
        # Round 3a: wall-clock politeness), gated by the tiny host_state dim
        pend_base, pend_tail = self._pending_parts(rnd - 1)
        eligible_parts = [pend_base] + ([pend_tail] if pend_tail is not None else [])
        period = cfg.round_period()
        wallclock = self._wallclock_politeness_on()
        prev_host_state = self._host_state(rnd - 1) if wallclock else None
        big_sleep_round = self._sleeping_oversized_round if wallclock else None
        sleeping_now = {
            h: nr for h, nr in (prev_host_state or {}).items() if nr > rnd
        }
        if big_sleep_round is not None:
            # distributed fallback (SLEEP_DICT_CAP exceeded — logged in
            # _host_state): the dim is joined as a table; the base part
            # loses its cached partitioning for this round, which is the
            # graceful degradation the driver-dict path replaced
            sleeping_df = (
                store.read_table(self.spark, big_sleep_round, "host_state")
                .filter(F.col("next_eligible_round") > rnd)
                .select("host")
            )
            eligible_parts = [
                p.join(sleeping_df, "host", "left_anti") for p in eligible_parts
            ]
        elif sleeping_now:
            sleeping = self.spark.createDataFrame(
                [(h,) for h in sorted(sleeping_now)], "host string"
            )
            # broadcast anti over a LocalRelation — narrow (no job to
            # materialize the build side), so the base part keeps its
            # (host, _salt) partitioning into the phase-1 window
            eligible_parts = [
                p.join(F.broadcast(sleeping), "host", "left_anti")
                for p in eligible_parts
            ]

        # 2-3. politeness dequeue (two-phase salted window + TakeOrdered
        # cap). The dequeue's range-buckets stay cached, so ``taken`` is
        # cheap to re-evaluate for both sides of the fetch join; the crawl
        # order is persisted as columns OF the fetch_log delta (one write
        # per round for dequeue+fetch instead of two — the rank/host/delay
        # columns are round-sized, and manifest-last keeps the commit
        # atomic either way).
        prev_counters = store.read_manifest(rnd - 1)["counters"]
        prev_pending = prev_counters.get("n_pending_after")
        dq = dequeue(
            eligible_parts,
            cfg.base_host_budget,
            cfg.round_size,
            cfg.salt_buckets,
            period,
            small_input=(
                prev_pending is not None
                and prev_pending <= cfg.dequeue_small_max_pending
            ),
        )
        taken = dq.select(
            F.lit(rnd).alias("round"),
            "rank",
            "url_canon",
            "host",
            "depth",
            "priority",
            "crawl_delay",
        )

        # 4. fetch simulation. A plain left join would shuffle the whole
        # pages table (a left-outer can't use the big side as broadcast
        # build), so: broadcast-hash inner join (pages scan streams past the
        # tiny taken set, no shuffle) + small left join to recover misses.
        # On Iceberg, url bloom metadata prunes the scan itself.
        hits = self.pages_canon.select("url_canon", "html").join(
            F.broadcast(taken.select("url_canon")), "url_canon", "inner"
        )
        # parse entirely JVM-side (extract_text_col/extract_links_col are
        # whole-stage-codegen regex twins of the pandas extractors — in
        # local mode a pandas-UDF here would oversubscribe every core with
        # a python worker; byte-identity is covered by the parity suite).
        # The extraction runs HERE, in the pages-scan stage, so the second
        # join moves (and at round scale broadcasts) only the extracted
        # columns — never the raw html payload (guide §2.3/§8: decide and
        # move the heavy bytes once; previously the hit rows' html was
        # carried through the taken⋈hits join and parsed there).
        redirect = extract_redirect_col("html")
        parsed = hits.select(
            "url_canon",
            F.when(F.col("html").isNotNull(), extract_links_col("html")).alias(
                "links"
            ),
            redirect.alias("redirect_to"),
            F.when(
                F.col("html").isNotNull() & redirect.isNull(),
                extract_text_col("html"),
            ).alias("text_extracted"),
            F.col("html").isNotNull().alias("_hit"),
        )
        fetched = taken.join(parsed, "url_canon", "left")
        enriched = fetched.withColumn(
            "status",
            F.when(F.col("_hit").isNull() | ~F.col("_hit"), "miss")
            .when(F.col("redirect_to").isNotNull(), "redirect")
            .otherwise("fetched"),
        ).drop("_hit")
        # round counters ride the WRITE job as observed metrics — zero extra
        # passes (at 10^8-URL cluster rounds a per-round status-column rescan
        # is real money; Observation aggregates map-side during the write)
        from pyspark.sql import Observation

        obs_fetch = Observation()
        to_write = enriched.select(
            "round",
            "rank",
            "url_canon",
            "host",
            "depth",
            "priority",
            "crawl_delay",
            "status",
            "text_extracted",
            "links",
            "redirect_to",
        ).observe(
            obs_fetch,
            F.count(F.lit(1)).alias("n_taken"),
            F.sum((F.col("status") == "fetched").cast("long")).alias("n_fetched"),
            F.sum((F.col("status") == "miss").cast("long")).alias("n_miss"),
            F.sum((F.col("status") == "redirect").cast("long")).alias("n_redirect"),
        )
        fetch_log = store.write_table(self.spark, rnd, "fetch_log", to_write)
        fetch_counts = obs_fetch.get  # populated by the write job
        if hasattr(dq, "_ssc_persisted"):
            dq._ssc_persisted.unpersist()
        if wallclock and big_sleep_round is not None:
            # distributed carry-forward twin of the driver-dict path below:
            # still-sleeping rows ∪ this round's hits (nr = rnd +
            # ceil(min_delay/period)), newest round wins per host
            hit_df = (
                fetch_log.filter(F.col("crawl_delay") > period)
                .groupBy("host")
                .agg(F.min("crawl_delay").alias("_d"))
                .select(
                    "host",
                    (F.lit(rnd) + F.ceil(F.col("_d") / F.lit(period)))
                    .cast("int")
                    .alias("next_eligible_round"),
                )
            )
            still = (
                store.read_table(self.spark, big_sleep_round, "host_state")
                .filter(F.col("next_eligible_round") > rnd)
            )
            store.write_table(
                self.spark,
                rnd,
                "host_state",
                still.unionByName(hit_df)
                .groupBy("host")
                .agg(F.max("next_eligible_round").alias("next_eligible_round")),
            )
            # footer row count (metadata only): if the dim shrank back
            # under the cap, the next round returns to the zero-job
            # driver-dict path instead of staying distributed forever
            if store.table_rows(rnd, "host_state") > self.SLEEP_DICT_CAP:
                self._sleeping, self._sleeping_round = None, rnd
                self._sleeping_oversized_round = rnd
            else:
                t = store.read_local_table(rnd, "host_state")
                self._sleeping = dict(
                    zip(
                        t.column("host").to_pylist(),
                        t.column("next_eligible_round").to_pylist(),
                    )
                )
                self._sleeping_round = rnd
                self._sleeping_oversized_round = None
        elif wallclock:
            # hosts hit this round with delay > period sleep ceil(d/T)-1
            # rounds; carry forward still-sleeping hosts, newest round wins.
            # Computed DRIVER-side from the just-written fetch_log delta:
            # a column-pruned pyarrow read of (host, crawl_delay) — the
            # delta is round-sized and local — replaces a per-round
            # groupBy+union+write Spark job with zero launches; the dim
            # stays bounded by delayed hosts (broadcast-sized).
            import math

            import pyarrow as pa

            fl = store.read_local_table(
                rnd, "fetch_log", columns=["host", "crawl_delay"]
            )
            hit: dict[str, int] = {}
            for h, d in zip(
                fl.column("host").to_pylist(), fl.column("crawl_delay").to_pylist()
            ):
                if d is not None and d > period:
                    hit[h] = min(hit.get(h, d), d)
            new_state = dict(sleeping_now)  # hosts still mid-sleep
            for h, d in hit.items():
                nr = rnd + math.ceil(d / period)
                new_state[h] = max(new_state.get(h, 0), nr)
            store.write_local_table(
                rnd,
                "host_state",
                pa.table(
                    {
                        "host": pa.array(sorted(new_state), type=pa.string()),
                        "next_eligible_round": pa.array(
                            [new_state[h] for h in sorted(new_state)],
                            type=pa.int32(),
                        ),
                    }
                ),
            )
            if len(new_state) > self.SLEEP_DICT_CAP:
                # grew past the cap in-process: drop the dict so the next
                # round gates distributed (the pyarrow write above is fine
                # at any size — only the py4j LocalRelation is not)
                self._sleeping, self._sleeping_round = None, rnd
                self._sleeping_oversized_round = rnd
            else:
                self._sleeping, self._sleeping_round = new_state, rnd
                self._sleeping_oversized_round = None
        _mark("dequeue+fetch+parse+write fetch_log")

        # 5/6. candidate links from the fetch_log delta: explode + redirect
        # targets, canonicalize, exclude, per-round dedup, Bloom-prefiltered
        # anti-join vs the whole frontier → this round's inserts
        links = fetch_log.filter(F.col("status") == "fetched").select(
            F.col("url_canon").alias("base"),
            F.explode("links").alias("raw"),
            (F.col("depth") + 1).alias("cand_depth"),
            F.lit(cfg.link_priority).alias("cand_priority"),
        )
        redirects = fetch_log.filter(F.col("status") == "redirect").select(
            F.col("url_canon").alias("base"),
            F.col("redirect_to").alias("raw"),
            (F.col("depth") + 1).alias("cand_depth"),
            F.col("priority").alias("cand_priority"),
        )
        # resolve+canonicalize: JVM fast path for the common href shapes,
        # pandas UDF only for the exotic remainder (split+union)
        cands = with_resolved_canonical(
            links.unionByName(redirects), "base", "raw", "url_canon"
        ).select("url_canon", "cand_depth", "cand_priority")
        cands = (
            self._exclude_filter(cands)
            .groupBy("url_canon")
            .agg(
                F.max("cand_priority").alias("priority"),
                F.min("cand_depth").alias("depth"),
            )
            .filter(F.col("depth") <= cfg.max_depth)
        )
        # Bloom pays for itself once the frontier outgrows what a plain
        # shuffle anti-join handles cheaply; below the threshold its two
        # extra jobs/round are pure overhead (SURVEY §4.3 — the exact
        # anti-join is always the correctness backstop either way).
        # tracked arithmetically in the manifest (no frontier scan). Every
        # writer in this repo records it (init_frontier, refresh_discovery,
        # run_round), so a missing key means a foreign/corrupt store — fail
        # loudly rather than quietly re-counting (there is no legacy format
        # to be compatible with; crawl_order()/url_seen() make the same
        # single-format assumption).
        frontier_size = prev_counters["frontier_size"]
        seen_base, seen_tail = self._seen_parts(rnd - 1)
        use_bloom_now, bloom_decision, cands = self._decide_urlseen_mode(
            frontier_size, cands, seen_base, seen_tail
        )
        if use_bloom_now:
            self._ensure_bloom(seen_base, seen_tail)
            # bloom prefilter + the base/tail exact backstop: the persisted
            # base side never re-shuffles; only the (small) bloom-positive
            # set and the round-sized tail move. The definite-new /
            # checked-new split rides the insert write as an Observation
            # (zero extra jobs) so the bloom's measured value — how many
            # inserts skipped the exact join — is evidence in the crawl's
            # own lineage, not just an offline bench.
            from pyspark.sql import Observation as _Obs

            definite_new, needs_check = self._bloom.split(cands)
            obs_bloom = _Obs()
            fresh = (
                definite_new.withColumn("_definite", F.lit(True))
                .unionByName(
                    self._anti_seen(needs_check, seen_base, seen_tail)
                    .withColumn("_definite", F.lit(False))
                )
                .observe(
                    obs_bloom,
                    F.sum(F.col("_definite").cast("long")).alias("n_definite"),
                    F.sum((~F.col("_definite")).cast("long")).alias("n_checked"),
                )
            )
        else:
            obs_bloom = None
            fresh = self._anti_seen(cands, seen_base, seen_tail)
        # robots gate AT INSERT — only the (small) fresh set is joined
        # against the rules dim; blocked rows enter the frontier terminally
        obs_ins = Observation()
        new_rows = store.write_table(
            self.spark,
            rnd,
            "frontier_inserts",
            self._gate_inserts(
                fresh.select("url_canon", "depth", "priority"), rnd
            ).observe(
                obs_ins,
                F.count(F.lit(1)).alias("n_new"),
                F.sum((F.col("status") == "robots_blocked").cast("long")).alias(
                    "n_blocked"
                ),
            ),
        )
        ins_counts = obs_ins.get
        if bloom_decision is not None:
            cands.unpersist()  # the measurement's persisted candidate set
        bloom_thread = None
        if self._bloom is not None:
            # OVERLAP the bloom update with the pending-cache advance /
            # compaction below: both consume the disk-backed insert delta
            # and are independent of each other, so their jobs interleave
            # in the scheduler instead of paying two serial launches —
            # shaving a parallelism-independent per-round fixed cost.
            import threading

            bloom_err: list[BaseException] = []

            def _upd() -> None:
                try:
                    self._bloom.update(new_rows.select("url_canon"))
                except BaseException as e:  # surfaced at join below
                    bloom_err.append(e)

            bloom_thread = threading.Thread(target=_upd, name="bloom-update")
            bloom_thread.start()
        _mark("candidates+anti-join+write inserts")

        # (url_seen is DERIVED from fetch_log + frontier_inserts at read
        # time — see url_seen(); no separate per-round write)

        # advance the O(round) caches: the pending base loses this round's
        # taken keys (broadcast anti — its (host, _salt) partitioning
        # survives), the tail gains the round's pending inserts; the seen
        # tail grows by one round's insert delta (the partitioned seen base
        # stays untouched). Skipped on compaction rounds — the rebase from
        # the fresh snapshot below replaces it (and truncates lineage).
        k = max(1, self.cfg.frontier_compact_every)
        compacting = rnd % k == 0
        try:
            if not compacting:
                self._advance_pending(
                    rnd, fetch_log, new_rows, int(fetch_counts["n_taken"] or 0)
                )
            self._seen_tail_rounds.append(rnd)
            self._seen_through = rnd

        # 7. frontier commit: the round's deltas (fetch_log status updates +
        # frontier_inserts) ARE the commit — per-round bytes written scale
        # with the round, not the frontier. Every cfg.frontier_compact_every
        # rounds the latest-wins view is compacted into a full snapshot so
        # reconstruction depth stays bounded (and old deltas become
        # expirable) — the seen-keys BASE is refolded from it and the
        # pending base+tail are rebased from it (the only O(frontier)
        # shuffles in the cycle, amortized over k rounds; the rebase also
        # bounds the pending cache's plan lineage at k joins).
            if compacting:
                snapshot = store.write_table(
                    self.spark, rnd, "frontier", self.frontier_at(rnd)
                )
                self._set_seen_base(snapshot.select("url_canon"))
                self._seen_tail_rounds = []
                self._rebase_pending(
                    snapshot.filter(F.col("status") == "pending"), rnd
                )
                _mark("compact frontier snapshot + refold seen base + rebase pending")
        finally:
            # join the update thread on EVERY exit: if the advance or the
            # compaction raised, the orphaned thread would otherwise race a
            # subsequent _ensure_bloom(fresh=True) rmtree of the bloom dir
            # (its shard writes + meta commit interleaving with the rebuild
            # could silently lose keys); the intent journal protects state
            # on disk, but the thread's own error was also silently lost.
            if bloom_thread is not None:
                bloom_thread.join()
        if bloom_thread is not None:
            if bloom_err:
                raise bloom_err[0]
            _mark("bloom update (overlapped)")

        # counters were observed during the two writes above — no rescans
        counters = {
            "round": rnd,
            "urlseen_mode": "bloom" if use_bloom_now else "exact",
            **({"bloom_crossover": bloom_decision} if bloom_decision else {}),
            "n_blocked": int(ins_counts["n_blocked"] or 0),
            "n_taken": int(fetch_counts["n_taken"] or 0),
            "n_fetched": int(fetch_counts["n_fetched"] or 0),
            "n_miss": int(fetch_counts["n_miss"] or 0),
            "n_redirect": int(fetch_counts["n_redirect"] or 0),
            "n_new": int(ins_counts["n_new"] or 0),
        }
        if obs_bloom is not None:
            bm = obs_bloom.get  # populated by the insert write job
            nd = int(bm["n_definite"] or 0)
            nchk = int(bm["n_checked"] or 0)
            counters["bloom_definite_new"] = nd
            counters["bloom_checked_new"] = nchk
            counters["bloom_skip_frac"] = round(nd / max(nd + nchk, 1), 4)
        counters["frontier_size"] = frontier_size + counters["n_new"]
        # pending is tracked arithmetically so run() never rescans the
        # frontier just to decide termination (prev_pending read above)
        if prev_pending is not None:
            counters["n_pending_after"] = (
                prev_pending - counters["n_taken"] - counters["n_blocked"] + counters["n_new"]
            )
        counters["secs"] = round(time.time() - t0, 3)
        counters["urls_per_sec"] = round(
            counters["n_taken"] / max(counters["secs"], 1e-9), 1
        )
        store.commit_manifest(rnd, counters)
        _mark("counters+manifest")
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
            prev = self.store.read_manifest(rnd - 1)["counters"].get("n_pending_after")
            if prev is not None:
                if prev <= 0:
                    break
            elif (
                self.frontier_at(rnd - 1)
                .filter(F.col("status") == "pending")
                .isEmpty()
            ):
                break
            stats.append(self.run_round(rnd))
        return stats

    # ------------------------------------------------------------------- api
    def progress(self) -> dict:
        """3.2 analog of POST /api/backup/progress (index.ts:330-335):
        latest committed round's counters + totals."""
        latest = self.store.latest_round()
        if latest is None:
            return {"round": None, "status": "not_started"}
        m = self.store.read_manifest(latest)
        # every writer records n_pending_after, so an API call costs a
        # manifest read, not an O(frontier) reconstruction; the scan stays
        # as the fallback for stores written before the counter existed
        pending = m["counters"].get("n_pending_after")
        if pending is None:
            pending = (
                self.frontier_at(latest).filter(F.col("status") == "pending").count()
            )
        return {
            "round": latest,
            "counters": m["counters"],
            "pending": pending,
            "has_more": pending > 0,
        }

    def reset(self) -> None:
        """3.2 analog of POST /api/backup/reset (fetcher.ts:729-745)."""
        from .maintenance import reset as _reset

        _reset(self.store)
        self._bloom = None
        self._bloom_decision = None
        self._drop_pending_caches()
        if self._seen_base is not None:
            self._seen_base.unpersist()
        self._seen_base = None
        self._seen_tail_rounds = []
        self._seen_through = None

    def overview(self) -> DataFrame:
        """3.3 analog of GET /api/sites/overview (index.ts:399-425): one row
        per host — frontier status breakdown + first/last activity — a
        left-join enrich over the latest frontier snapshot."""
        latest = self.store.latest_round()
        if latest is None:
            raise RuntimeError("overview needs an initialized crawl")
        frontier = self.frontier_at(latest)
        return (
            frontier.groupBy("host")
            .agg(
                F.count("*").alias("n_urls"),
                F.sum(F.when(F.col("status") == "pending", 1).otherwise(0)).alias("n_pending"),
                F.sum(F.when(F.col("status") == "fetched", 1).otherwise(0)).alias("n_fetched"),
                F.sum(F.when(F.col("status") == "miss", 1).otherwise(0)).alias("n_miss"),
                F.sum(F.when(F.col("status") == "redirect", 1).otherwise(0)).alias("n_redirect"),
                F.sum(F.when(F.col("status") == "robots_blocked", 1).otherwise(0)).alias("n_blocked"),
                F.min("discovered_round").alias("first_discovered_round"),
                F.max("discovered_round").alias("last_discovered_round"),
            )
            .orderBy("host")
        )

    # --------------------------------------------------------------- outputs
    def crawl_order(self) -> DataFrame:
        """Dequeue positions — a projection of the fetch_log deltas (the
        rank/host columns ride in fetch_log; no separate table)."""
        df = self.store.read_deltas(self.spark, "fetch_log")
        assert df is not None
        return df.select("round", "rank", "url_canon").orderBy("round", "rank")

    def url_seen(self) -> DataFrame:
        """Derived from the per-round deltas (no dedicated table): dequeued
        URLs from fetch_log, robots-blocked URLs from their insert delta
        (round 0's inserts ARE its frontier snapshot). A URL appears in
        exactly one source by construction."""
        dequeued = self.store.read_deltas(self.spark, "fetch_log")
        assert dequeued is not None
        seen = dequeued.select(
            "url_canon",
            F.col("round").alias("first_seen_round"),
            F.col("status").alias("last_status"),
        )
        blocked0 = (
            self.store.read_table(self.spark, 0, "frontier")
            .filter(F.col("status") == "robots_blocked")
            .select(
                "url_canon",
                F.lit(0).alias("first_seen_round"),
                F.lit("robots_blocked").alias("last_status"),
            )
        )
        seen = seen.unionByName(blocked0)
        inserts = self.store.read_deltas(self.spark, "frontier_inserts")
        if inserts is not None:
            seen = seen.unionByName(
                inserts.filter(F.col("status") == "robots_blocked").select(
                    "url_canon",
                    F.col("discovered_round").alias("first_seen_round"),
                    F.lit("robots_blocked").alias("last_status"),
                )
            )
        return seen

    def fetch_log(self) -> DataFrame:
        df = self.store.read_deltas(self.spark, "fetch_log")
        assert df is not None
        return df.select("round", "url_canon", "status", "text_extracted")
