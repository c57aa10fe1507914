"""JVM regex twins must byte-match the Python extractors (the engine hot
path runs the JVM versions; the spec/oracle run Python re)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sitemap_scan_spark.functions.extract import (
    extract_links_col,
    extract_links_one,
    extract_redirect_col,
    extract_redirect_one,
    extract_text_col,
    extract_text_one,
)

CASES = [
    "<html><head><script>var a='<p>x</p>';\nmore</script><style>.a{}</style>"
    "</head><body><!-- c --><!-- keeps > tail --><h1>T</h1><p>a  b</p></body></html>",
    "",
    "plain text no tags",
    "<SCRIPT TYPE='x'>UPPER</SCRIPT>visible<STYLE>s</STYLE>",
    "<p>a</p>\n\t<p>b</p>  trailing  ",
    '<a href="/x">l</a><a class="c" HREF=\'y.html\'>m</a><a href="https://e.com/z#f">n</a>',
    '<meta http-equiv="refresh" content="0; url=/new"><p>moved</p>',
    "<div>unclosed <span>tag",
    "<!--[if IE]>cond<![endif]-->after",
    "a < b > c & d",
    "<script>nested <script> weird</script>tail",
]


def test_text_extraction_jvm_matches_python(spark):
    df = spark.createDataFrame([(c.encode(),) for c in CASES], "html binary")
    got = [r.t for r in df.select(extract_text_col("html").alias("t")).collect()]
    want = [extract_text_one(c) for c in CASES]
    assert sorted(got) == sorted(want)


def test_links_jvm_matches_python(spark):
    df = spark.createDataFrame([(c.encode(),) for c in CASES], "html binary")
    got = sorted(
        tuple(r.l or []) for r in df.select(extract_links_col("html").alias("l")).collect()
    )
    # python extractor resolves against base; compare raw hrefs instead
    import re

    raw = re.compile(r"""<a\s[^>]*?href\s*=\s*["']([^"']+)["']""", re.I)
    want = sorted(tuple(raw.findall(c)) for c in CASES)
    assert got == want


def test_redirect_jvm_matches_python(spark):
    df = spark.createDataFrame([(c.encode(),) for c in CASES], "html binary")
    got = sorted(
        (r.r or "") for r in df.select(extract_redirect_col("html").alias("r")).collect()
    )
    want = sorted((extract_redirect_one(c) or "") for c in CASES)
    assert got == want


def test_resolve_canonicalize_udf(spark):
    from sitemap_scan_spark.functions.canonicalize import (
        canonicalize_one,
        resolve_canonicalize_udf,
    )
    from urllib.parse import urljoin

    rows = [
        ("https://a.test/dir/page", "other.html"),
        ("https://a.test/dir/page", "/root.html"),
        ("https://a.test/dir/page", "HTTPS://B.TEST/x#f"),
        ("https://a.test/dir/page", "../up.html"),
        ("https://a.test/dir/page", "mailto:x@y"),
    ]
    df = spark.createDataFrame(rows, "base string, href string").select(
        "base", "href", resolve_canonicalize_udf("base", "href").alias("c")
    )
    got = {(r.base, r.href): r.c for r in df.collect()}
    for b, h in rows:
        assert got[(b, h)] == canonicalize_one(urljoin(b, h)), (b, h)


def test_resolve_fast_paths_match_urljoin(spark):
    """The vectorized resolve shapes must agree with urljoin everywhere."""
    from urllib.parse import urljoin

    from sitemap_scan_spark.functions.canonicalize import (
        canonicalize_one,
        resolve_canonicalize_udf,
    )

    bases = [
        "https://h.test/",
        "https://h.test/dir/page.html",
        "https://h.test:8443/a/b/",
    ]
    hrefs = [
        "x.html", "x.html#f", "/root.html", "//other.test/p", "?q=1",
        "../up.html", "./same.html", "a/../b", "", "#frag",
        "https://abs.test/x", "HTTP://CASE.TEST/Y", "sub/dir/deep.html",
        "x%20y.html", "p?b=2&a=1",
    ]
    rows = [(b, h) for b in bases for h in hrefs]
    df = spark.createDataFrame(rows, "base string, href string").select(
        "base", "href", resolve_canonicalize_udf("base", "href").alias("c")
    )
    got = {(r.base, r.href): r.c for r in df.collect()}
    for b, h in rows:
        assert got[(b, h)] == canonicalize_one(urljoin(b, h)), (b, h)


def test_with_resolved_canonical_matches_udf(spark):
    """The split JVM-fast/python-slow resolver must equal the pure-UDF path
    (and therefore urljoin ∘ canonicalize_one) on a dense shape grid."""
    from urllib.parse import urljoin

    from sitemap_scan_spark.functions.canonicalize import (
        canonicalize_one,
        with_resolved_canonical,
    )

    bases = [
        "https://h.test/",
        "https://h.test/dir/page.html",
        "https://h.test/dir/sub/",
        "https://h.test:8443/a/b",
        "https://UPPER.test/Mixed/Case.html",
    ]
    hrefs = [
        "x.html", "X.HTML", "x.html#f", "/root.html", "/", "//other.test/p",
        "?q=1", "../up.html", "./same.html", "a/../b", "", "#frag",
        "https://abs.test/x", "HTTPS://CASE.TEST/Y#z", "sub/dir/deep.html",
        "x%20y.html", "p?b=2&a=1", "x.html?", "mailto:a@b", "javascript:void(0)",
        "page7.html", "a_b~c-d.html", "a.b.c/d", "x//y.html", "/a//b",
        "/fr/page.html", "UPPER/Path.html", "with space.html",
    ]
    rows = [(b, h) for b in bases for h in hrefs]
    df = spark.createDataFrame(rows, "base string, raw string")
    got = {
        (r.base, r.raw): r.url_canon
        for r in with_resolved_canonical(df, "base", "raw").collect()
    }
    for b, h in rows:
        want = canonicalize_one(urljoin(b, h))
        if want is None:
            assert (b, h) not in got, (b, h, got.get((b, h)))
        else:
            assert got.get((b, h)) == want, (b, h, got.get((b, h)), want)
