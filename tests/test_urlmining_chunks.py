"""url_templates / trap_templates, chunk_text, containment_pairs.

Golden-case tests for the round-3 additions: URL pattern census
(crawl-trap mining), overlapping token chunking, and directed shingle
containment — the oracle-parity path is covered by driver_sim; these
pin the operator semantics on hand-computable fixtures.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from searchengine_spark.operators.dedup import containment_pairs
from searchengine_spark.operators.traindata import chunk_text
from searchengine_spark.operators.urlmining import (
    trap_templates,
    url_fixture,
    url_templates,
)


# ------------------------------------------------------------ url mining


def test_url_templates_collapse(spark):
    urls = spark.createDataFrame(
        [
            ("https://a.test/item/123",),
            ("https://a.test/item/99999",),
            ("https://a.test/item/123",),  # recrawl: raw count 3, distinct 2
            ("https://a.test/s/deadbeef0badc0de",),  # hex run -> {H}
            ("https://b.test/item/5",),  # same template, other host
            ("https://a.test/static/about",),
        ],
        "url string",
    )
    out = {
        (r["host"], r["template"]): r
        for r in url_templates(urls).collect()
    }
    item = out[("a.test", "/item/{N}")]
    assert item["n_urls"] == 3 and item["n_distinct_urls"] == 2
    assert item["example_url"] == "https://a.test/item/123"
    assert ("a.test", "/s/{H}") in out
    assert ("b.test", "/item/{N}") in out
    assert ("a.test", "/static/about") in out
    assert len(out) == 4


def test_trap_templates_threshold(spark):
    # 12 distinct /p/N urls on one host, 2 on another: min_urls=10 keeps
    # exactly the heavy template
    rows = [(f"https://trap.test/p/{i}",) for i in range(12)]
    rows += [(f"https://ok.test/p/{i}",) for i in range(2)]
    census = url_templates(spark.createDataFrame(rows, "url string"))
    heavy = trap_templates(census, min_urls=10).collect()
    assert [(r["host"], r["template"]) for r in heavy] == [
        ("trap.test", "/p/{N}")
    ]


def test_url_fixture_deterministic(spark):
    docs = spark.createDataFrame(
        [(0, "en"), (1, "en"), (2, "de"), (3, "en"), (4, "en")],
        "doc_id long, lang string",
    )
    got = {r["doc_id"]: r["url"] for r in url_fixture(docs).collect()}
    assert got[0] == "https://h0.test/article/0"
    assert got[1] == "https://h1.test/product/1?ref=1"
    assert got[2] == "https://h2.test/tag/de/page/2"
    assert got[3].startswith("https://h3.test/s/") and len(got[3]) == 18 + 12
    assert got[4] == "https://h4.test/static/about"


# ------------------------------------------------------------ chunk_text


def _chunks(spark, text, win=8, stride=6):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return sorted(
        (r["start_tok"], r["n_tok"])
        for r in chunk_text(df, win=win, stride=stride).collect()
    )


def test_chunk_short_doc_single_chunk(spark):
    # 5 tokens < win=8 -> one chunk covering the whole doc
    assert _chunks(spark, "a b c d e") == [(0, 5)]


def test_chunk_exact_win(spark):
    assert _chunks(spark, " ".join(f"t{i}" for i in range(8))) == [(0, 8)]


def test_chunk_aligned_stride(spark):
    # n=20, win=8, stride=6: starts 0,6,12 and tail 20-8=12 (aligned,
    # deduped) -> 3 chunks, all full width
    assert _chunks(spark, " ".join(f"t{i}" for i in range(20))) == [
        (0, 8),
        (6, 8),
        (12, 8),
    ]


def test_chunk_tail_window(spark):
    # n=17: full starts 0,6 then exact-tail start 9 -> last chunk ends
    # at token 17, full width, nothing dropped
    assert _chunks(spark, " ".join(f"t{i}" for i in range(17))) == [
        (0, 8),
        (6, 8),
        (9, 8),
    ]


def test_chunk_empty_doc_no_rows(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "one")], "doc_id long, text string"
    )
    got = chunk_text(df, win=8, stride=6).collect()
    assert [(r["doc_id"], r["start_tok"], r["n_tok"]) for r in got] == [
        (3, 0, 1)
    ]


def test_chunk_hash_is_window_md5(spark):
    import hashlib

    df = spark.createDataFrame(
        [(1, "alpha beta gamma")], "doc_id long, text string"
    )
    [row] = chunk_text(df, win=8, stride=6).collect()
    assert row["chunk_hash"] == hashlib.md5(b"alpha beta gamma").hexdigest()


# ----------------------------------------------------- containment_pairs


def test_containment_catches_what_jaccard_misses(spark):
    # doc 1 = 9 tokens (3 grams), doc 2 = same 9 tokens + 21 more
    # (10 grams): containment(1->2) = 3/3 = 1.0 while Jaccard = 3/10 —
    # far under any dedup threshold
    short = "a b c d e f g h i"
    long = short + " " + " ".join(f"x{i}" for i in range(21))
    docs = spark.createDataFrame(
        [(1, short), (2, long), (3, "zzz completely different text")],
        "doc_id long, text string",
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in containment_pairs(docs, threshold=0.75).collect()
    }
    assert got == {(1, 2): 1.0}


def test_containment_directed_and_thresholded(spark):
    # identical docs: both directions at 1.0; sub-threshold overlap
    # (1 of 3 grams) emits nothing
    t = "a b c d e f g h i"
    docs = spark.createDataFrame(
        [(1, t), (2, t), (3, "a b c q r s t u v")],
        "doc_id long, text string",
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in containment_pairs(docs, threshold=0.75).collect()
    }
    assert got == {(1, 2): 1.0, (2, 1): 1.0}


def test_containment_empty_docs_dropped(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, None), (3, "a b c")], "doc_id long, text string"
    )
    assert containment_pairs(docs, threshold=0.5).collect() == []


def test_path_prefix_census(spark):
    from searchengine_spark.operators.urlmining import path_prefix_census

    urls = spark.createDataFrame(
        [
            ("https://a.test/forum/t/1?x=1",),
            ("https://a.test/forum/t/2",),
            ("https://a.test/about",),
            ("https://A.test/forum/news/3/deep/deeper",),  # case-folds
            ("https://b.test/",),  # no path segments -> contributes none
        ],
        "url string",
    )
    got = {(r.host, r.prefix, r.depth): r.n_urls
           for r in path_prefix_census(urls, max_depth=3).collect()}
    assert got[("a.test", "/forum", 1)] == 3
    assert got[("a.test", "/forum/t", 2)] == 2
    assert got[("a.test", "/forum/t/1", 3)] == 1
    assert got[("a.test", "/about", 1)] == 1
    # depth capped at 3: no /forum/news/3/deep entries
    assert all(d <= 3 for (_, _, d) in got)
    assert not any(h == "b.test" for (h, _, _) in got)
