"""Deterministic synthetic Common-Crawl-style corpus generator (seed=42).

Produces the exact ``input_hint`` shape from BASELINE.json:
``pages(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``
plus ``seeds(seed_url, priority)``. Pure pandas/pyarrow — no Spark, no
network, no external data (FIXTURES.md §A).

Corpus features exercised (with the reference behavior each mirrors):

- robots.txt rows with Disallow subtrees / Crawl-delay / Sitemap pointers;
  some hosts have no robots row (default allow).
- sitemap.xml: flat <urlset> for small hosts, <sitemapindex> → children for
  large ones; one crafted A↔B sitemap cycle (must terminate — reference test
  src/backup/fetcher.spec.ts:65-99); volatile <lastmod> with stable <loc>
  (semantic-hash no-rescan, fetcher.ts:901-914).
- pages with <script>/<style>/comments (text-extraction battery,
  comparer.ts:208-219), relative + absolute + fragment + duplicate links,
  ~20 % cross-host links, ~5 % dangling, ~3 % meta-refresh redirect pages
  (manual-redirect parity, fetcher.ts:1191-1217), /fr/ etc. i18n paths
  (default exclude filters, fetcher.ts:809-821), uppercase-host serving URLs
  (canonical collapse, fetcher.ts:860-880).
- optional hot host owning ~50 % of all pages (skew stress per north rule).
"""

from __future__ import annotations

import os
import random
import sys
from datetime import datetime, timedelta, timezone

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sitemap_scan_spark.functions.extract import extract_text_one  # noqa: E402

WORDS = (
    "spark frontier crawl sitemap page query data host link index batch "
    "filter merge join scan shuffle window priority budget robots delay "
    "depth canonical hash bloom dedup round snapshot manifest resume"
).split()

I18N = ["fr", "es", "de", "it", "pt", "zh", "ja", "ko", "ar", "ru"]
BASE_TS = datetime(2026, 1, 1, tzinfo=timezone.utc)


def _para(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(n))


def _page_html(
    rng: random.Random,
    title: str,
    hrefs: list[str],
    lang: str,
) -> str:
    links = "".join(f'<a href="{h}">{_para(rng, 2)}</a> ' for h in hrefs)
    comment_tail = " keeps > tail" if rng.random() < 0.1 else ""
    return (
        f'<html lang="{lang}"><head><title>{title}</title>'
        f"<script>var x = {rng.randint(0, 9)}; // <p>{_para(rng, 3)}</p>\n"
        f"console.log('{_para(rng, 2)}');</script>"
        f"<style>.c{rng.randint(0, 99)} {{ color: #{rng.randint(0, 0xFFFFFF):06x}; }}</style>"
        f"</head><body><!-- {_para(rng, 4)}{comment_tail} -->"
        f"<h1>{title}</h1><p>{_para(rng, rng.randint(20, 120))}</p>"
        f"<div>{links}</div>"
        f"<p>{_para(rng, rng.randint(10, 60))}</p></body></html>"
    )


def _redirect_html(target: str) -> str:
    return (
        f'<html><head><meta http-equiv="refresh" content="0; url={target}">'
        f"</head><body>Moved</body></html>"
    )


def _urlset(entries: list[tuple[str, float, str]]) -> str:
    body = "".join(
        f"<url><loc>{u}</loc><lastmod>{lm}</lastmod><priority>{p:.1f}</priority></url>"
        for u, p, lm in entries
    )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        f"{body}</urlset>"
    )


def _sitemapindex(children: list[str]) -> str:
    body = "".join(f"<sitemap><loc>{c}</loc></sitemap>" for c in children)
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        f"{body}</sitemapindex>"
    )


def _paths_for_host(
    hi: int, n_hosts: int, mean_pages: int, hot_host: bool, seed: int
) -> list[str]:
    """Deterministic per-host path list (its own RNG → parallelizable)."""
    rng = random.Random(f"{seed}|paths|{hi}")
    n = max(3, int(rng.gauss(mean_pages, mean_pages / 3)))
    if hot_host and hi == 1:
        # hot host owns ~ as many pages as all others combined (skew stress)
        n = mean_pages * n_hosts
    paths = ["/"]
    for j in range(n - 1):
        r = rng.random()
        if r < 0.06:
            paths.append(f"/private0/secret{j}.html")
        elif r < 0.16:
            paths.append(f"/{rng.choice(I18N)}/page{j}.html")
        else:
            paths.append(f"/page{j}.html")
    return paths


_PATHS_MEMO: dict[tuple, list[str]] = {}


def _paths_cached(
    hi: int, n_hosts: int, mean_pages: int, hot_host: bool, seed: int
) -> list[str]:
    """Worker-local memo of :func:`_paths_for_host` — tasks ship only the
    corpus KNOBS (a 5-int tuple), never the multi-million-string path dict;
    each worker recomputes (identical RNG → identical paths) the hosts it
    actually links to, once."""
    key = (hi, n_hosts, mean_pages, hot_host, seed)
    got = _PATHS_MEMO.get(key)
    if got is None:
        got = _PATHS_MEMO[key] = _paths_for_host(hi, n_hosts, mean_pages, hot_host, seed)
    return got


def _gen_host(
    args: tuple[int, int, int, bool, int]
) -> tuple[list[tuple[str, datetime, bytes, str, str]], dict[str, int]]:
    """Generate all rows for one host — deterministic per-host RNG, so the
    corpus is identical whether generated serially or in a process pool."""
    hi, n_hosts, mean_pages, hot_host, seed = args
    hosts = [f"host{i:04d}.test" for i in range(n_hosts)]

    class _LazyPaths:
        def __getitem__(self, host: str) -> list[str]:
            return _paths_cached(
                int(host[4:8]), n_hosts, mean_pages, hot_host, seed
            )

    host_paths = _LazyPaths()
    h = hosts[hi]
    rng = random.Random(f"{seed}|host|{hi}")
    rows: list[tuple[str, datetime, bytes, str, str]] = []
    counters = {"pages": 0, "robots": 0, "sitemaps": 0, "redirects": 0}

    def add_row(url: str, html: str, lang: str = "en") -> None:
        ts = BASE_TS + timedelta(seconds=rng.randint(0, 30 * 86400))
        rows.append((url, ts, html.encode("utf-8"), extract_text_one(html), lang))

    if True:  # (kept flat for diff clarity)
        paths = host_paths[h]
        public = [p for p in paths if not p.startswith("/private")]

        # --- robots.txt (80 % of hosts) ------------------------------------
        has_robots = rng.random() < 0.8
        crawl_delay = rng.choice([2, 4]) if has_robots and rng.random() < 0.3 else None
        if has_robots:
            lines = ["User-agent: *", "Disallow: /private0/"]
            if rng.random() < 0.3:
                lines.append("Disallow: /tmp/")
            if crawl_delay:
                lines.append(f"Crawl-delay: {crawl_delay}")
            lines.append(f"Sitemap: https://{h}/sitemap.xml")
            add_row(f"https://{h}/robots.txt", "\n".join(lines))
            counters["robots"] += 1

        # --- sitemaps -------------------------------------------------------
        lastmod = f"2026-01-{rng.randint(1, 28):02d}"
        listed = [p for p in public if rng.random() < 0.7]
        entries = [
            (f"https://{h}{p}", round(rng.choice([0.3, 0.5, 0.8, 1.0]), 1), lastmod)
            for p in listed
        ]
        if hi == 0:
            # crafted cycle: index → a → b → a (cycle guard test)
            add_row(
                f"https://{h}/sitemap.xml",
                _sitemapindex([f"https://{h}/sitemap-a.xml", f"https://{h}/sitemap-b.xml"]),
            )
            half = len(entries) // 2
            # sitemap-a is a urlset; sitemap-b is an index pointing back at a
            add_row(f"https://{h}/sitemap-a.xml", _urlset(entries[:half]))
            add_row(
                f"https://{h}/sitemap-b.xml",
                _sitemapindex([f"https://{h}/sitemap-a.xml", f"https://{h}/sitemap-c.xml"]),
            )
            add_row(f"https://{h}/sitemap-c.xml", _urlset(entries[half:]))
            counters["sitemaps"] += 4
        elif len(entries) > 40:
            chunks = [entries[i : i + 40] for i in range(0, len(entries), 40)]
            children = [f"https://{h}/sitemap-{ci}.xml" for ci in range(len(chunks))]
            add_row(f"https://{h}/sitemap.xml", _sitemapindex(children))
            for c_url, chunk in zip(children, chunks):
                add_row(c_url, _urlset(chunk))
            counters["sitemaps"] += 1 + len(chunks)
        else:
            add_row(f"https://{h}/sitemap.xml", _urlset(entries))
            counters["sitemaps"] += 1

        # --- pages ------------------------------------------------------------
        for p in paths:
            url = f"https://{h}{p}"
            lang = p.split("/")[1] if p.split("/")[1:2] and p.split("/")[1] in I18N else "en"
            if rng.random() < 0.03 and p != "/":
                target = f"https://{h}{rng.choice(public)}"
                add_row(url, _redirect_html(target), lang)
                counters["redirects"] += 1
                counters["pages"] += 1
                continue
            deg = rng.randint(3, 12)
            hrefs: list[str] = []
            for _ in range(deg):
                r = rng.random()
                if r < 0.20 and len(hosts) > 1:
                    oh = rng.choice(hosts)
                    op = rng.choice(host_paths[oh])
                    href = f"https://{oh}{op}"
                    if rng.random() < 0.1:
                        # uppercase-host variant — canonical collapse
                        href = href.replace(oh, oh.upper())
                elif r < 0.25:
                    href = f"/missing{rng.randint(0, 999)}.html"  # dangling
                else:
                    tp = rng.choice(public)
                    href = tp if rng.random() < 0.5 else tp.lstrip("/") or "."
                    if rng.random() < 0.15:
                        href += "#frag" + str(rng.randint(0, 9))
                hrefs.append(href)
            # serving-URL variant: a few pages are stored under an
            # uppercase-host URL (engine must canonicalize pages.url too)
            surl = url if rng.random() > 0.02 else url.replace(h, h.upper())
            add_row(surl, _page_html(rng, f"{h}{p}", hrefs, lang), lang)
            counters["pages"] += 1

    return rows, counters


def generate(
    out_dir: str,
    n_hosts: int = 50,
    mean_pages: int = 100,
    n_seeds: int = 5,
    hot_host: bool = False,
    seed: int = 42,
    workers: int | None = None,
) -> dict[str, int]:
    """Write pages.parquet + seeds.parquet into out_dir; return counters.

    Per-host RNGs make the corpus byte-identical whether generated serially
    or across a process pool (workers defaults to cpu_count for big runs)."""
    os.makedirs(out_dir, exist_ok=True)
    hosts = [f"host{i:04d}.test" for i in range(n_hosts)]
    tasks = [(hi, n_hosts, mean_pages, hot_host, seed) for hi in range(n_hosts)]
    # page count per host without materializing the paths (first gauss draw
    # of the per-host paths RNG — must mirror _paths_for_host)
    total_pages = 0
    for hi in range(n_hosts):
        rng0 = random.Random(f"{seed}|paths|{hi}")
        n = max(3, int(rng0.gauss(mean_pages, mean_pages / 3)))
        if hot_host and hi == 1:
            n = mean_pages * n_hosts
        total_pages += n
    if workers is None:
        workers = min(os.cpu_count() or 1, 16) if total_pages > 20_000 else 1

    # pages.parquet is a DIRECTORY of part files written incrementally —
    # memory stays bounded at ~one chunk regardless of corpus size, and both
    # Spark and pandas/pyarrow read the directory transparently.
    pages_dir = os.path.join(out_dir, "pages.parquet")
    if os.path.isdir(pages_dir):
        import shutil as _shutil

        _shutil.rmtree(pages_dir)
    elif os.path.exists(pages_dir):
        os.remove(pages_dir)
    os.makedirs(pages_dir, exist_ok=True)

    counters = {"pages": 0, "robots": 0, "sitemaps": 0, "redirects": 0}
    n_rows = 0
    part = 0
    buf: list = []

    def flush() -> None:
        nonlocal part, buf
        if not buf:
            return
        pdf = pd.DataFrame(buf, columns=["url", "warc_ts", "html", "text", "lang"])
        # microsecond precision — Spark cannot read parquet TIMESTAMP(NANOS);
        # small row groups → splittable scans
        pdf["warc_ts"] = pdf["warc_ts"].astype("datetime64[us, UTC]")
        pdf.to_parquet(
            os.path.join(pages_dir, f"part-{part:04d}.parquet"),
            index=False,
            row_group_size=8192,
        )
        part += 1
        buf = []

    def consume(result) -> None:
        nonlocal n_rows
        r, c = result
        buf.extend(r)
        n_rows += len(r)
        for k in c:
            counters[k] += c[k]
        if len(buf) >= 200_000:
            flush()

    if workers > 1:
        from multiprocessing import Pool

        with Pool(workers) as pool:
            for result in pool.imap(
                _gen_host, tasks, chunksize=max(1, n_hosts // (workers * 4))
            ):
                consume(result)
    else:
        for t in tasks:
            consume(_gen_host(t))
    flush()

    rng = random.Random(f"{seed}|seeds")
    seed_hosts = [hosts[i] for i in sorted(rng.sample(range(n_hosts), min(n_seeds, n_hosts)))]
    seeds = pd.DataFrame(
        {
            "seed_url": [f"https://{h}/" for h in seed_hosts],
            "priority": [round(0.5 + 0.1 * (i % 5), 1) for i in range(len(seed_hosts))],
        }
    )
    seeds.to_parquet(os.path.join(out_dir, "seeds.parquet"), index=False)
    counters["hosts"] = n_hosts
    counters["rows"] = n_rows
    counters["seeds"] = len(seeds)
    return counters


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/corpus_tiny"
    size = sys.argv[2] if len(sys.argv) > 2 else "tiny"
    knobs = {
        "tiny": dict(n_hosts=50, mean_pages=100, n_seeds=5),
        "small": dict(n_hosts=200, mean_pages=300, n_seeds=12),
        "bench": dict(n_hosts=1000, mean_pages=600, n_seeds=40, hot_host=True),
    }[size]
    print(generate(out, **knobs))
