"""robots.txt parser (RFC 9309 subset): pycore golden cases, Spark UDF
parity, and round-trip into the crawler's robots-cache schema."""

from __future__ import annotations

from searchengine_spark.functions.robots import robots_table
from searchengine_spark.pycore.robots import parse_robots

SAMPLE = """
# global rules
User-agent: *
Disallow: /tmp
Disallow: /private
Crawl-delay: 2

User-agent: fastbot
User-agent: quickbot
Disallow: /only-fast
Crawl-delay: 0.25

User-agent: greedybot
Disallow:
"""


def test_group_selection_and_rules():
    deny, delay = parse_robots(SAMPLE, agent="*")
    assert deny == ["/tmp", "/private"] and delay == 2.0
    # specific token beats *, case-insensitive substring of the agent
    deny, delay = parse_robots(SAMPLE, agent="FastBot/1.0")
    assert deny == ["/only-fast"] and delay == 0.25
    # stacked user-agent lines share one group
    deny, delay = parse_robots(SAMPLE, agent="quickbot")
    assert deny == ["/only-fast"] and delay == 0.25
    # empty Disallow = allow-all; no delay
    deny, delay = parse_robots(SAMPLE, agent="greedybot")
    assert deny == [] and delay is None
    # unknown agent falls back to *
    deny, delay = parse_robots(SAMPLE, agent="nobody")
    assert deny == ["/tmp", "/private"] and delay == 2.0


def test_longest_token_wins_and_merging():
    txt = """
User-agent: bot
Disallow: /a

User-agent: bigbot
Disallow: /b

User-agent: bot
Disallow: /c
Disallow: /a
Crawl-delay: 9
"""
    # both 'bot' and 'bigbot' are substrings of 'bigbot/2'; longest wins
    assert parse_robots(txt, agent="bigbot/2") == (["/b"], None)
    # same-token groups merge, prefixes de-duplicate in order
    assert parse_robots(txt, agent="bot") == (["/a", "/c"], 9.0)


def test_edge_cases():
    assert parse_robots(None) == ([], None)
    assert parse_robots("") == ([], None)
    # rules before any user-agent line are ignored; comments stripped;
    # non-numeric crawl-delay ignored
    txt = """
Disallow: /orphan
User-agent: * # trailing comment
Disallow: /x  # deny x
Crawl-delay: fast
"""
    assert parse_robots(txt) == (["/x"], None)


def test_spark_parity_and_cache_schema(spark):
    rows = [
        ("a.test", SAMPLE),
        ("b.test", "User-agent: *\nDisallow: /private\nCrawl-delay: 0.5"),
        ("c.test", None),
    ]
    raw = spark.createDataFrame(rows, "host string, robots_txt string")
    got = {
        r["host"]: (r["deny_prefixes"], r["crawl_delay"])
        for r in robots_table(raw, agent="fastbot").collect()
    }
    for host, txt in rows:
        assert got[host] == parse_robots(txt, agent="fastbot")
    # the output is exactly the crawler's broadcast robots-cache shape
    df = robots_table(raw)
    assert [f.simpleString() for f in df.schema.fields] == [
        "host:string",
        "deny_prefixes:array<string>",
        "crawl_delay:double",
    ]
