"""Sequential pure-Python reference crawler — the parity oracle.

Implements CRAWL_SPEC.md exactly (same scalar canonicalize / extract /
robots / sitemap functions as the engine — those are shared single sources
of truth; the CRAWL LOGIC here is an independent sequential implementation
of the spec, against which the distributed engine is asserted equal).

Reference semantics mirrored: discover→fetch→dedup loop (SURVEY.md §3.1),
sitemap recursion guards (fetcher.ts:81-82,916-993), exclude filters
(fetcher.ts:809-840), URL-seen dedup (fetcher.ts:497-505), batch slicing →
deterministic priority/politeness dequeue.
"""

from __future__ import annotations

import os
import re
import sys
from dataclasses import dataclass, field

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sitemap_scan_spark.config import CrawlConfig  # noqa: E402
from sitemap_scan_spark.functions.canonicalize import (  # noqa: E402
    canonicalize_one,
    host_of_one,
)
from sitemap_scan_spark.functions.extract import (  # noqa: E402
    extract_links_one,
    extract_redirect_one,
    extract_text_one,
)
from sitemap_scan_spark.sources.robots import RobotsRules, parse_robots_one  # noqa: E402
from sitemap_scan_spark.sources.sitemap import parse_sitemap_one  # noqa: E402


@dataclass
class FrontierRow:
    url_canon: str
    host: str
    depth: int
    priority: float
    discovered_round: int
    status: str = "pending"


@dataclass
class OracleResult:
    crawl_order: list[tuple[int, int, str]] = field(default_factory=list)
    url_seen: dict[str, tuple[int, str]] = field(default_factory=dict)
    fetch_log: list[tuple[int, str, str, str | None]] = field(default_factory=list)
    rounds_run: int = 0

    def order_df(self) -> pd.DataFrame:
        return pd.DataFrame(self.crawl_order, columns=["round", "rank", "url_canon"])

    def seen_df(self) -> pd.DataFrame:
        return pd.DataFrame(
            [(u, r, s) for u, (r, s) in sorted(self.url_seen.items())],
            columns=["url_canon", "first_seen_round", "last_status"],
        )


class OracleCrawler:
    def __init__(self, pages: pd.DataFrame, cfg: CrawlConfig):
        self.cfg = cfg
        self.pages: dict[str, str] = {}
        for url, html in zip(pages["url"], pages["html"]):
            c = canonicalize_one(url)
            if c is not None:
                body = html.decode("utf-8", "replace") if isinstance(html, (bytes, bytearray)) else html
                self.pages[c] = body
        self.exclude = [re.compile(p, re.I) for p in cfg.exclude_patterns]

    def _excluded(self, url: str) -> bool:
        return any(p.search(url) for p in self.exclude)

    def _robots(self, host: str) -> RobotsRules:
        body = self.pages.get(f"https://{host}/robots.txt")
        return parse_robots_one(body) if body is not None else RobotsRules()

    def _expand_sitemaps(self, roots: list[str]) -> dict[str, float]:
        """BFS with cycle set, depth ≤ 10, ≤ 500 visited per host."""
        cfg = self.cfg
        out: dict[str, float] = {}
        visited: set[str] = set()
        per_host: dict[str, int] = {}
        level = sorted({c for c in (canonicalize_one(r) for r in roots) if c})
        for _depth in range(cfg.sitemap_max_depth):
            if not level:
                break
            next_level: set[str] = set()
            for sm in level:
                host = host_of_one(sm)
                if sm in visited or per_host.get(host, 0) >= cfg.sitemap_max_visited:
                    continue
                visited.add(sm)
                per_host[host] = per_host.get(host, 0) + 1
                body = self.pages.get(sm)
                if body is None:
                    continue
                kind, entries = parse_sitemap_one(body, cfg.sitemap_default_priority)
                if kind == "urlset":
                    for loc, pr in entries:
                        c = canonicalize_one(loc)
                        if c is not None:
                            out[c] = max(out.get(c, float("-inf")), pr)
                elif kind == "index":
                    for loc, _ in entries:
                        c = canonicalize_one(loc)
                        if c is not None and c not in visited:
                            next_level.add(c)
            level = sorted(next_level)
        return out

    def crawl(self, seeds: pd.DataFrame) -> OracleResult:
        cfg = self.cfg
        res = OracleResult()
        frontier: dict[str, FrontierRow] = {}

        # --- round 0: discovery (CRAWL_SPEC "Discovery") ---------------------
        seed_rows: dict[str, float] = {}
        for u, p in zip(seeds["seed_url"], seeds["priority"]):
            c = canonicalize_one(u)
            if c is not None:
                seed_rows[c] = max(seed_rows.get(c, float("-inf")), float(p))
        hosts = sorted({host_of_one(u) for u in seed_rows})
        robots = {h: self._robots(h) for h in hosts}
        roots: list[str] = []
        for h in hosts:
            roots.extend(robots[h].sitemaps or [f"https://{h}/sitemap.xml"])
        sitemap_locs = self._expand_sitemaps(roots)

        def gate_insert(u: str, host: str, depth: int, pr: float, rnd: int) -> None:
            """Robots gate at insert (CRAWL_SPEC Discovery 4 / Round 5)."""
            ru = robots.get(host)
            if ru is None:
                ru = robots[host] = self._robots(host)
            path = re.sub(r"^https?://[^/]+", "", u)
            if not ru.allows(path):
                frontier[u] = FrontierRow(u, host, depth, pr, rnd, "robots_blocked")
                res.url_seen.setdefault(u, (rnd, "robots_blocked"))
            else:
                frontier[u] = FrontierRow(u, host, depth, pr, rnd)

        for u, p in seed_rows.items():
            if not self._excluded(u):
                gate_insert(u, host_of_one(u), 0, p, 0)
        for u, p in sitemap_locs.items():
            if self._excluded(u):
                continue
            if u in frontier:
                r = frontier[u]
                r.priority = max(r.priority, p)
                r.depth = min(r.depth, 1)
            else:
                gate_insert(u, host_of_one(u), 1, p, 0)

        # --- rounds ----------------------------------------------------------
        import math

        period = cfg.round_period()
        next_eligible: dict[str, int] = {}  # wall-clock sleep (Round 3a)
        for rnd in range(1, cfg.max_rounds + 1):
            pending = [r for r in frontier.values() if r.status == "pending"]
            if not pending:
                break
            res.rounds_run = rnd

            # robots gating happened at insert; hosts sleeping off a
            # crawl_delay > period are skipped whole rounds (CRAWL_SPEC 3a)
            eligible = [
                r for r in pending if next_eligible.get(r.host, 0) <= rnd
            ]

            key = lambda r: (-r.priority, r.depth, r.discovered_round, r.url_canon)
            eligible.sort(key=key)
            taken: list[FrontierRow] = []
            per_host_taken: dict[str, int] = {}
            for r in eligible:
                ru = robots[r.host]
                budget = (
                    max(1, min(cfg.base_host_budget, period // ru.crawl_delay))
                    if ru.crawl_delay
                    else cfg.base_host_budget
                )
                if per_host_taken.get(r.host, 0) < budget:
                    per_host_taken[r.host] = per_host_taken.get(r.host, 0) + 1
                    taken.append(r)
            taken = taken[: cfg.round_size]  # already in total order
            for r in taken:
                d = robots[r.host].crawl_delay
                if d and d > period:
                    next_eligible[r.host] = rnd + math.ceil(d / period)

            candidates: dict[str, tuple[float, int]] = {}
            for rank, r in enumerate(taken, start=1):
                res.crawl_order.append((rnd, rank, r.url_canon))
                body = self.pages.get(r.url_canon)
                if body is None:
                    r.status = "miss"
                    res.fetch_log.append((rnd, r.url_canon, "miss", None))
                else:
                    redirect = extract_redirect_one(body)
                    if redirect is not None:
                        r.status = "redirect"
                        res.fetch_log.append((rnd, r.url_canon, "redirect", None))
                        from urllib.parse import urljoin

                        tc = canonicalize_one(urljoin(r.url_canon, redirect))
                        if tc is not None and not self._excluded(tc):
                            pr, dp = candidates.get(tc, (float("-inf"), 10**9))
                            candidates[tc] = (max(pr, r.priority), min(dp, r.depth + 1))
                    else:
                        r.status = "fetched"
                        res.fetch_log.append(
                            (rnd, r.url_canon, "fetched", extract_text_one(body))
                        )
                        for link in extract_links_one(body, r.url_canon):
                            c = canonicalize_one(link)
                            if c is None or self._excluded(c):
                                continue
                            pr, dp = candidates.get(c, (float("-inf"), 10**9))
                            candidates[c] = (
                                max(pr, cfg.link_priority),
                                min(dp, r.depth + 1),
                            )
                res.url_seen.setdefault(r.url_canon, (rnd, r.status))

            # insert new URLs (anti-join vs all frontier states), robots
            # gate applied at insert (CRAWL_SPEC Round 5)
            for c, (pr, dp) in sorted(candidates.items()):
                if dp > cfg.max_depth:
                    continue
                if c not in frontier:
                    h = host_of_one(c)
                    ru = robots.get(h)
                    if ru is None:
                        ru = robots[h] = self._robots(h)
                    path = re.sub(r"^https?://[^/]+", "", c)
                    if not ru.allows(path):
                        frontier[c] = FrontierRow(c, h, dp, pr, rnd, "robots_blocked")
                        res.url_seen.setdefault(c, (rnd, "robots_blocked"))
                    else:
                        frontier[c] = FrontierRow(c, h, dp, pr, rnd)

        return res


def run_oracle(corpus_dir: str, cfg: CrawlConfig | None = None) -> OracleResult:
    pages = pd.read_parquet(os.path.join(corpus_dir, "pages.parquet"))
    seeds = pd.read_parquet(os.path.join(corpus_dir, "seeds.parquet"))
    return OracleCrawler(pages, cfg or CrawlConfig()).crawl(seeds)


if __name__ == "__main__":
    import time

    d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/corpus_tiny"
    t0 = time.time()
    r = run_oracle(d)
    print(
        f"rounds={r.rounds_run} dequeued={len(r.crawl_order)} "
        f"seen={len(r.url_seen)} secs={time.time()-t0:.2f}"
    )
