"""Unit tests for scalar/string/URL functions (SURVEY.md §2.8)."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sitemap_scan_spark.functions.canonicalize import (
    canonicalize_one,
    canonicalize_series,
    canonicalize_udf,
    host_of_col,
    host_of_one,
    url_hash_col,
    url_hash_one,
)
from sitemap_scan_spark.functions.extract import (
    extract_links_one,
    extract_redirect_one,
    extract_text_one,
    extract_text_series,
)
from sitemap_scan_spark.functions.normalize import (
    normalize_content,
    redact_default,
)


class TestCanonicalize:
    CASES = [
        # host/scheme case, fragment strip (fetcher.ts:860-866)
        ("HTTPS://ExAmPle.COM/Path#frag", "https://example.com/Path"),
        # default port removal
        ("http://example.com:80/a", "http://example.com/a"),
        ("https://example.com:443/a", "https://example.com/a"),
        ("https://example.com:8443/a", "https://example.com:8443/a"),
        # empty path → /
        ("https://example.com", "https://example.com/"),
        # query param sort preserving duplicates (fetcher.ts:867-874)
        ("https://a.com/?b=2&a=1&b=1", "https://a.com/?a=1&b=1&b=2"),
        ("https://a.com/p?z=&y=3", "https://a.com/p?y=3&z="),
        # dot segments
        ("https://a.com/x/../y/./z", "https://a.com/y/z"),
        # percent-decode unreserved, uppercase remaining escapes
        ("https://a.com/%7Euser/%2fesc", "https://a.com/~user/%2Fesc"),
        # invalid
        ("ftp://a.com/x", None),
        ("not a url", None),
        ("", None),
    ]

    def test_scalar(self):
        for raw, want in self.CASES:
            assert canonicalize_one(raw) == want, raw

    def test_series_matches_scalar(self):
        raw = [c[0] for c in self.CASES]
        got = canonicalize_series(pd.Series(raw, dtype="object")).tolist()
        assert got == [c[1] for c in self.CASES]

    @settings(max_examples=200, deadline=None)
    @given(
        st.text(
            alphabet="abcDE019/.-_~%?&=:#",
            min_size=0,
            max_size=30,
        )
    )
    def test_series_scalar_agree(self, suffix: str):
        url = "https://Example.com/" + suffix
        got = canonicalize_series(pd.Series([url], dtype="object")).tolist()[0]
        assert got == canonicalize_one(url)

    def test_idempotent(self):
        for raw, want in self.CASES:
            if want is not None:
                assert canonicalize_one(want) == want

    def test_spark_udf(self, spark):
        df = spark.createDataFrame(
            [(c[0],) for c in self.CASES], ["url"]
        ).withColumn("canon", canonicalize_udf("url"))
        got = [r.canon for r in df.orderBy(F.monotonically_increasing_id()).collect()]
        # order by original insertion isn't guaranteed post-shuffle; compare as multiset
        assert sorted(x or "" for x in got) == sorted(
            (c[1] or "") for c in self.CASES
        )

    def test_url_hash_parity(self, spark):
        urls = ["https://example.com/", "https://a.com/p?x=1"]
        df = spark.createDataFrame([(u,) for u in urls], ["u"]).select(
            "u", url_hash_col("u").alias("h")
        )
        got = {r.u: r.h for r in df.collect()}
        for u in urls:
            assert got[u] == hashlib.sha256(u.encode()).hexdigest()[:16]
            assert got[u] == url_hash_one(u)

    def test_host_of(self, spark):
        u = "https://sub.example.com:8443/p?q=1"
        assert host_of_one("https://sub.example.com/p") == "sub.example.com"
        df = spark.range(1).select(host_of_col(F.lit(u)).alias("h"))
        assert df.collect()[0].h == "sub.example.com"


class TestExtractText:
    HTML = (
        "<html><head><title>T</title>"
        "<script type='x'>var a = '<p>no</p>';\n more</script>"
        "<style>.a { color: red; }</style></head>"
        "<body><!-- gone --><!-- keeps > stays --><h1>Hello</h1>\n"
        "<p>world  &amp; peace</p></body></html>"
    )

    def test_scalar_quirks(self):
        t = extract_text_one(self.HTML)
        # script/style stripped, tags → space, whitespace collapsed
        assert "color" not in t and "var a" not in t
        assert t.startswith("T")
        # the <!--[^>]*--> quirk: a comment containing '>' is NOT removed as
        # a comment — its tail text survives tag-stripping (SURVEY §7.3.1)
        assert "stays" in t
        assert "gone" not in t
        assert "Hello" in t and "world &amp; peace" in t

    def test_series_matches_scalar(self):
        htmls = [self.HTML, "", "plain text", "<p>a</p><p>b</p>", "<script>x</script>y"]
        got = extract_text_series(pd.Series(htmls, dtype="object")).tolist()
        assert got == [extract_text_one(h) for h in htmls]

    @settings(max_examples=150, deadline=None)
    @given(st.text(alphabet="<>ab c/!-\nscriptyle=\"'", max_size=60))
    def test_series_scalar_agree_fuzz(self, html: str):
        got = extract_text_series(pd.Series([html], dtype="object")).tolist()[0]
        assert got == extract_text_one(html)

    def test_spark_udf_byte_identical(self, spark):
        from sitemap_scan_spark.functions.extract import with_extracted_text

        rows = [(self.HTML.encode(),), ("<p>x</p>".encode(),)]
        df = spark.createDataFrame(rows, "html binary")
        got = [r.text_extracted for r in with_extracted_text(df).collect()]
        assert sorted(got) == sorted(
            extract_text_one(r[0].decode()) for r in rows
        )

    def test_links_and_redirect(self):
        html = (
            '<a href="/rel">r</a> <A HREF="https://other.com/x#f">abs</A>'
            '<a class="c" href="page2">p2</a>'
        )
        links = extract_links_one(html, "https://ex.com/dir/page")
        assert links == [
            "https://ex.com/rel",
            "https://other.com/x#f",
            "https://ex.com/dir/page2",
        ]
        red = extract_redirect_one(
            '<meta http-equiv="refresh" content="0; url=/new">'
        )
        assert red == "/new"
        assert extract_redirect_one("<p>no</p>") is None


class TestNormalize:
    def test_redact_default(self, spark):
        s = 'built 2024-01-02 at 10:11:12 v1.2.3 nonce="abc" id 1234567890123'
        df = spark.range(1).select(redact_default(F.lit(s)).alias("t"))
        out = df.collect()[0].t
        assert "[DATE]" in out and "[TIME]" in out and "[VERSION]" in out
        assert 'nonce="[NONCE]"' in out and "[TIMESTAMP]" in out

    def test_normalize_equal_hash_across_date_churn(self, spark):
        # mirrors comparer.spec.ts:5-42 — two snapshots differing only by
        # dynamic dates/times normalize to identical strings
        a = "<p>Updated: 2024-01-02 10:11:12</p>  <p>Body</p>"
        b = "<p>Updated: 2025-12-31 23:59:59</p>  <p>Body</p>"
        df = spark.createDataFrame([(a,), (b,)], ["c"]).select(
            normalize_content("c").alias("n")
        )
        vals = [r.n for r in df.collect()]
        assert vals[0] == vals[1]

    def test_custom_ignore_patterns(self, spark):
        df = spark.range(1).select(
            normalize_content(F.lit("hello ad-slot-99 x"), ["ad-slot-\\d+"]).alias("n")
        )
        assert "[CUSTOM_IGNORE]" in df.collect()[0].n

    def test_sniff(self, spark):
        from sitemap_scan_spark.functions.normalize import sniff_content_type

        df = spark.createDataFrame(
            [("<!DOCTYPE html><html>",), ('{"a":1}',), ("hello",)], ["c"]
        ).select("c", sniff_content_type("c").alias("t"))
        got = {r.c[:5]: r.t for r in df.collect()}
        assert got["<!DOC"] == "html" and got['{"a":'] == "json" and got["hello"] == "text"


class TestJsonNorm:
    def test_normalize_json_scalar(self):
        from sitemap_scan_spark.functions.jsonnorm import normalize_json_one

        a = '{"b": 1, "csrf": "secret123", "id": "123e4567-e89b-12d3-a456-426614174000", "a": 2}'
        out = normalize_json_one(a)
        assert out == '{"a":2,"b":1,"id":"[UUID]"}'
        # nonce-only difference → identical normalized form
        b = '{"a": 2, "csrf": "OTHER", "id": "00000000-1111-2222-3333-444444444444", "b": 1}'
        assert normalize_json_one(b) == out
        assert normalize_json_one("not json") == "not json"
        # 'ts' is a dynamic KEY (dropped); a non-dynamic key gets its
        # timestamp VALUE masked instead
        assert normalize_json_one('{"ts": "1700000000000"}') == "{}"
        assert normalize_json_one('{"created": "1700000000000"}') == '{"created":"[TIMESTAMP]"}'
        assert normalize_json_one('{"nested": {"token": "x", "keep": "y"}}') == '{"nested":{"keep":"y"}}'

    def test_framework_detect_and_patterns(self, spark):
        from sitemap_scan_spark.functions.jsonnorm import (
            apply_framework_patterns,
            detect_framework,
        )

        rows = [
            ('<link href="/wp-content/a.css?ver=6.1">',),
            ('<div data-reactroot=""></div>',),
            ('<div data-v-1a2b3c4d class="x"></div>',),
            ("<p>plain</p>",),
        ]
        df = spark.createDataFrame(rows, ["html"]).select(
            "html", detect_framework("html").alias("fw")
        )
        got = [r.fw for r in df.collect()]
        assert sorted(got) == sorted(["wordpress", "react", "vue", "unknown"])
        red = spark.createDataFrame(rows[:1], ["html"]).select(
            apply_framework_patterns("html", "wordpress").alias("t")
        ).collect()[0].t
        assert "[FW_DYNAMIC]" in red and "?ver=6.1" not in red
