"""RFC 9309 longest-match allow/deny gate (functions/robots.py:
apply_robots_rules) — precedence golden cases + broadcast plan shape."""

from __future__ import annotations

from searchengine_spark.functions.robots import (
    apply_robots_rules,
    rules_fixture,
)


def _gate(spark, urls, rules):
    u = spark.createDataFrame(
        [(i, x) for i, x in enumerate(urls)], "doc_id long, url string"
    )
    r = spark.createDataFrame(rules, "host string, allow int, prefix string")
    rows = apply_robots_rules(u, r).collect()
    return {x.url: (x.allowed, x.matched_prefix) for x in rows}


def test_precedence_golden(spark):
    rules = [
        ("a.test", 0, "/tag/"),
        ("a.test", 1, "/tag/en/"),  # longer allow overrides blanket deny
        ("a.test", 0, "/p/"),
        ("a.test", 1, "/p/"),  # equal length -> allow wins the tie
        ("a.test", 0, "/s/"),
    ]
    got = _gate(
        spark,
        [
            "https://a.test/tag/fr/page/1",  # deny /tag/
            "https://a.test/tag/en/page/1",  # allow /tag/en/ (longest)
            "https://a.test/p/1",  # tie -> allow
            "https://a.test/s/abc",  # deny, no allow
            "https://a.test/other",  # no rule -> default allow
            "https://b.test/s/abc",  # other host: no rules at all
            "https://a.test",  # empty path -> '/' -> no match
        ],
        rules,
    )
    assert got["https://a.test/tag/fr/page/1"] == (False, "/tag/")
    assert got["https://a.test/tag/en/page/1"] == (True, "/tag/en/")
    assert got["https://a.test/p/1"] == (True, "/p/")
    assert got["https://a.test/s/abc"] == (False, "/s/")
    assert got["https://a.test/other"] == (True, None)
    assert got["https://b.test/s/abc"] == (True, None)
    assert got["https://a.test"] == (True, None)


def test_fixture_covers_every_precedence_case(spark, sf_dir):
    import os

    from searchengine_spark.operators.urlmining import url_fixture

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    urls = url_fixture(docs)
    out = apply_robots_rules(urls, rules_fixture(urls))
    by_prefix = {
        r.matched_prefix: r.allowed
        for r in out.filter("matched_prefix IS NOT NULL").collect()
    }
    assert by_prefix.get("/tag/") is False
    assert by_prefix.get("/s/") is False
    # the equal-length product tie resolves to allow on h1/h5/h9/h13
    assert any(
        r.allowed and "/product/" == r.matched_prefix
        for r in out.collect()
    )
    assert out.count() == docs.count()  # every URL gets a verdict


def test_rules_broadcast_in_plan(spark, sf_dir):
    import os

    from searchengine_spark.operators.urlmining import url_fixture

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    urls = url_fixture(docs)
    plan = (
        apply_robots_rules(urls, rules_fixture(urls))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
