"""Sitemap parsing (sitemaps.org subset): pycore golden cases, the
robots.txt Sitemap: discovery hook, Spark UDF parity, and distributed
seed admission into the frontier with sitemap priorities as scores."""

from __future__ import annotations

import shutil

from searchengine_spark.functions.sitemap import sitemap_entries, sitemap_seeds
from searchengine_spark.pycore.robots import sitemap_urls
from searchengine_spark.pycore.sitemap import parse_sitemap

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://h0.test/a?x=1&amp;y=2</loc>
    <lastmod>2024-01-05</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.9</priority>
  </url>
  <url><loc><![CDATA[https://h0.test/cdata]]></loc></url>
  <url><loc>https://h0.test/bad-priority</loc><priority>7</priority></url>
  <url><lastmod>2024-01-01</lastmod></url>
  <url><loc>https://h0.test/nonnum</loc><priority>soon</priority></url>
</urlset>"""

INDEX = """<sitemapindex>
  <sitemap><loc>https://h0.test/sitemap-a.xml</loc></sitemap>
  <sitemap><loc>https://h0.test/sitemap-b.xml</loc></sitemap>
</sitemapindex>"""


def test_parse_urlset_golden():
    entries, nested = parse_sitemap(URLSET)
    assert nested == []
    assert [e.loc for e in entries] == [
        "https://h0.test/a?x=1&y=2",  # entity unescaped
        "https://h0.test/cdata",  # CDATA unwrapped
        "https://h0.test/bad-priority",
        "https://h0.test/nonnum",  # loc-less entry dropped
    ]
    assert entries[0].lastmod == "2024-01-05"
    assert entries[0].changefreq == "daily"
    assert entries[0].priority == 0.9
    # out-of-range and non-numeric priorities drop to None
    assert entries[2].priority is None and entries[3].priority is None


def test_parse_index_and_junk():
    entries, nested = parse_sitemap(INDEX)
    assert entries == [] and nested == [
        "https://h0.test/sitemap-a.xml",
        "https://h0.test/sitemap-b.xml",
    ]
    assert parse_sitemap(None) == ([], [])
    assert parse_sitemap("not xml at all") == ([], [])


def test_robots_sitemap_discovery():
    txt = """User-agent: *
Disallow: /x
Sitemap: https://h0.test/sitemap.xml
User-agent: bot
Sitemap: https://h0.test/sitemap.xml
Sitemap: https://h0.test/other.xml
"""
    # group-independent, ordered, de-duplicated
    assert sitemap_urls(txt) == [
        "https://h0.test/sitemap.xml",
        "https://h0.test/other.xml",
    ]
    assert sitemap_urls(None) == []


def test_spark_parity_and_seeds(spark):
    raw = spark.createDataFrame(
        [("s1", URLSET), ("s2", INDEX), ("s3", None)],
        "sid string, sitemap_xml string",
    )
    rows = sitemap_entries(raw).collect()
    by_sid: dict = {}
    for r in rows:
        by_sid.setdefault(r["sid"], []).append(r)
    # parity with pycore per document
    entries, _ = parse_sitemap(URLSET)
    got = [r for r in by_sid["s1"] if not r["nested"]]
    assert [(r["loc"], r["lastmod"], r["changefreq"], r["priority"]) for r in got] == [
        (e.loc, e.lastmod, e.changefreq, e.priority) for e in entries
    ]
    assert [r["loc"] for r in by_sid["s2"] if r["nested"]] == parse_sitemap(INDEX)[1]
    assert "s3" not in by_sid  # empty doc explodes to nothing

    seeds = {
        r["canon_url"]: r["score"] for r in sitemap_seeds(raw).collect()
    }
    assert seeds["https://h0.test/a?x=1&y=2"] == 0.9
    assert seeds["https://h0.test/cdata"] == 0.5  # spec default priority
    assert "https://h0.test/sitemap-a.xml" not in seeds  # index refs excluded


def test_sitemap_seeds_admit_with_priority(spark, tmp_path):
    """End-to-end: seeds_df flows into init_crawl — sitemap urls enter
    the round-0 frontier QUEUED at their priority, config seeds at the
    depth-0 prior, overlap keeps the max score."""
    from searchengine_spark.crawler import frontier as FR
    from searchengine_spark.crawler.config import CrawlConfig
    from searchengine_spark.crawler.synth import ALLOWED_HOST_RE, pages_df
    from searchengine_spark.crawler.tableio import TableIO

    pdf, rdf, seeds = pages_df(spark, 60, 5)
    xml = (
        "<urlset>"
        + f"<url><loc>{seeds[0]}</loc><priority>0.3</priority></url>"
        + "<url><loc>https://h1.test/sec0/p0</loc><priority>0.8</priority></url>"
        + "</urlset>"
    )
    raw = spark.createDataFrame([(xml,)], "sitemap_xml string")
    cfg = CrawlConfig(seeds=seeds, allowed_host_re=ALLOWED_HOST_RE)
    io = TableIO(spark, str(tmp_path / "wh"))
    try:
        FR.init_crawl(spark, io, cfg, rdf, seeds_df=sitemap_seeds(raw))
        front = {
            r["canon_url"]: r for r in io.read("frontier").collect()
        }
        # overlap: config depth-0 prior (1.0) beats the 0.3 priority
        assert front[seeds[0]]["score"] == 1.0
        sm = front["https://h1.test/sec0/p0"]
        assert sm["status"] == "QUEUED" and sm["score"] == 0.8
        # seen set covers both seed sources; crawl proceeds normally
        seen = {r["canon_url"] for r in io.read("url_seen").collect()}
        assert "https://h1.test/sec0/p0" in seen and set(seeds) <= seen
        FR.crawl(spark, io, cfg, pdf, rdf, max_rounds=2)
        assert io.latest_round() >= 1
    finally:
        shutil.rmtree(str(tmp_path / "wh"), ignore_errors=True)


def test_sitemap_fixture_roundtrip(spark, sf_dir):
    """The generative fixture and the parser invert each other: the
    spec-default 0.5 path, the stated-priority path, and the
    max-priority dedup rule are all present in the output."""
    import os

    from searchengine_spark.functions.sitemap import (
        sitemap_fixture,
        sitemap_seeds,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    fix = sitemap_fixture(docs)
    assert fix.count() == 16  # one urlset per host
    seeds = {r.canon_url: r.score for r in sitemap_seeds(fix).collect()}
    n_docs = docs.count()
    assert len(seeds) == n_docs  # dup entries collapse
    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    by_host_min = {}
    for i in ids:
        by_host_min[i % 16] = min(by_host_min.get(i % 16, i), i)
    for i in ids:
        url = f"https://h{i % 16}.test/article/{i}"
        if i == by_host_min[i % 16]:
            expect = max(0.9, (i % 10) / 10.0 if i % 3 else 0.5)
        else:
            expect = (i % 10) / 10.0 if i % 3 else 0.5
        assert seeds[url] == expect, url
