"""Anchor-text extraction + aggregation: pycore golden cases and the
Spark postings aggregate (self-link exclusion, multi-edge weighting)."""

from __future__ import annotations

from searchengine_spark.operators.anchortext import anchor_postings
from searchengine_spark.pycore.textextract import extract_anchors, extract_links

HTML = (
    "<html><body>"
    '<a href="/b">Go to <b>Page B</b> now</a>'
    "<a href='https://x.test/c'>c &amp; d</a>"
    '<a href="#frag">self fragment</a>'
    '<a href="mailto:x@y">mail me</a>'
    '<a href="/unclosed">never closed'
    "</body></html>"
)


def test_extract_anchors_golden():
    got = extract_anchors(HTML.encode(), "https://x.test/a")
    assert got == [
        ("https://x.test/b", "go to page b now"),  # nested <b> stripped
        ("https://x.test/c", "c & d"),  # entity unescaped
        ("https://x.test/a", "self fragment"),  # #frag defrags to self
        ("https://x.test/unclosed", ""),  # unclosed tag → empty text
    ]
    # target resolution is identical to extract_links
    assert [t for t, _ in got] == extract_links(HTML.encode(), "https://x.test/a")
    assert extract_anchors(None, "https://x.test/") == []


def test_anchor_postings_aggregate(spark):
    pages = spark.createDataFrame(
        [
            (
                "https://x.test/a",
                '<a href="/b">spark spark engine</a><a href="/a">self nav</a>',
            ),
            ("https://x.test/c", '<a href="/b">spark index</a>'),
            ("https://x.test/b", '<a href="/a">back home</a>'),
        ],
        "url string, html string",
    )
    got = {
        (r["target_url"], r["token"]): r["weight"]
        for r in anchor_postings(pages).collect()
    }
    # multi-occurrence within one anchor + cross-page aggregation
    assert got[("https://x.test/b", "spark")] == 3
    assert got[("https://x.test/b", "engine")] == 1
    assert got[("https://x.test/b", "index")] == 1
    assert got[("https://x.test/a", "back")] == 1
    # self-links excluded by default
    assert ("https://x.test/a", "self") not in got
    kept = {
        (r["target_url"], r["token"])
        for r in anchor_postings(pages, self_links=True).collect()
    }
    assert ("https://x.test/a", "self") in kept


def test_anchor_entropy_diversity_signal(spark):
    import math

    from searchengine_spark.operators.anchortext import anchor_entropy

    postings = spark.createDataFrame(
        [
            # organically cited: four distinct anchor words, equal weight
            ("https://a.test/", "great", 1),
            ("https://a.test/", "useful", 1),
            ("https://a.test/", "reference", 1),
            ("https://a.test/", "guide", 1),
            # link farm: one phrase repeated
            ("https://spam.test/", "cheap", 40),
        ],
        "target_url string, token string, weight long",
    )
    got = {r.target_url: r for r in anchor_entropy(postings).collect()}
    a = got["https://a.test/"]
    assert a.n_terms == 4 and a.n_anchors == 4
    assert abs(a.entropy - math.log(4)) < 1e-12  # uniform -> ln(k)
    s = got["https://spam.test/"]
    assert s.n_terms == 1 and s.n_anchors == 40
    assert abs(s.entropy) < 1e-12  # single phrase -> zero entropy
