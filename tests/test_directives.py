"""Page-level crawl directives (operators/directives.py): meta-robots
flags, rel=canonical extraction (both attribute orders), canonical
consolidation census."""

from __future__ import annotations

from searchengine_spark.operators.directives import (
    canonical_census,
    page_directives,
)


def test_page_directives_golden(spark):
    rows = [
        (0, '<html><head><meta name="robots" content="noindex,nofollow">'
            "</head><body>x</body></html>", "https://a.test/0"),
        (1, '<html><head><META NAME="robots" CONTENT="NOINDEX">'
            "</head></html>", "https://a.test/1"),  # case-insensitive
        (2, '<html><head><link rel="canonical" '
            'href="https://a.test/canon"></head></html>', "https://a.test/2"),
        (3, '<html><head><link href="https://a.test/canon" '
            'rel="canonical"></head></html>', "https://a.test/3"),  # attr order
        (4, "<html><head><title>plain</title></head></html>",
            "https://a.test/4"),
        (5, '<html><body>robots content="noindex" outside a meta tag'
            "</body></html>", "https://a.test/5"),  # must NOT match
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string, url string")
    got = {r.doc_id: (r.noindex, r.nofollow, r.canonical_url)
           for r in page_directives(df).collect()}
    assert got[0] == (True, True, None)
    assert got[1] == (True, False, None)
    assert got[2] == (False, False, "https://a.test/canon")
    assert got[3] == (False, False, "https://a.test/canon")
    assert got[4] == (False, False, None)
    assert got[5] == (False, False, None)


def test_canonical_census_collapses_family(spark):
    canon = '<link rel="canonical" href="https://a.test/one">'
    rows = [
        (0, f"<html><head>{canon}</head></html>", "https://a.test/one?p=1"),
        (1, f"<html><head>{canon}</head></html>", "https://a.test/one?p=2"),
        (2, "<html></html>", "https://a.test/two"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string, url string")
    got = {r.target_url: r.n_pages for r in canonical_census(df).collect()}
    assert got == {"https://a.test/one": 2, "https://a.test/two": 1}


def test_stopword_census_ordering_and_coverage(spark):
    from searchengine_spark.operators.textstats import stopword_census

    df = spark.createDataFrame(
        [(0, "the the the cat"), (1, "the cat dog")],
        "doc_id long, text string",
    )
    out = stopword_census(df, k=2).collect()
    assert [r.token for r in out] == ["the", "cat"]
    assert out[0].cf == 4 and out[0].df == 2
    assert abs(out[0].coverage - 4 / 7) < 1e-12
    assert out[1].cf == 2
