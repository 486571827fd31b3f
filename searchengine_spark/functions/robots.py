"""Spark surface for robots.txt parsing (J8 input path).

Turns a raw (host, robots_txt) table into the crawler's robots cache
schema (host, deny_prefixes, crawl_delay — frontier.py joins it
broadcast, ROBOTS_SCHEMA in crawler/synth.py). One Arrow-batched pandas
UDF over pycore.robots.parse_robots — the normative parser; no per-row
Python at the API surface (input_hint mandate)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_robots_udf(agent: str = "*"):
    """Factory (the user agent is a closure constant, not a column):
    robots_txt → struct<deny_prefixes array<string>, crawl_delay double>."""
    from searchengine_spark.pycore.robots import parse_robots

    @F.pandas_udf("deny_prefixes array<string>, crawl_delay double")
    def _parse(txt: pd.Series) -> pd.DataFrame:
        deny, delay = [], []
        for t in txt:
            d, c = parse_robots(t, agent)
            deny.append(d)
            delay.append(c)
        return pd.DataFrame({"deny_prefixes": deny, "crawl_delay": delay})

    return _parse


def robots_table(
    raw: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """(host, robots_txt) → (host, deny_prefixes, crawl_delay), the
    crawler's broadcast robots-cache shape. Null crawl_delay rows fall
    back to CrawlConfig.default_crawl_delay inside the round loop."""
    parsed = raw.select(
        F.col(host_col).alias("host"),
        parse_robots_udf(agent)(F.col(text_col)).alias("_r"),
    )
    return parsed.select(
        "host",
        F.col("_r.deny_prefixes").alias("deny_prefixes"),
        F.col("_r.crawl_delay").alias("crawl_delay"),
    )


# ---- longest-match allow/deny gate (RFC 9309 / Google semantics) ----
#
# The crawler's frontier uses deny-prefix-only robots rules (the
# reference's shape); real robots.txt files mix Allow and Disallow and
# the normative rule (RFC 9309 §2.2.2) is LONGEST MATCH WINS, with
# Allow winning length ties. `apply_robots_rules` is that evaluation as
# a pure relational plan: rules are a tiny dimension (one site's rule
# set is KBs) so they BROADCAST; the only shuffle is the per-URL
# winner aggregation, keyed by the URL row itself and map-side
# combinable (max of a (len, allow, prefix) struct). At 10^10 URLs the
# plan is one broadcast nested-loop prefix probe + one combine — no
# all-rules-per-url fan-out survives past the map side.


def _host_expr(url_col: str):
    return F.regexp_extract(F.col(url_col), r"^[a-z][a-z0-9+.-]*://([^/]+)", 1)


def _path_expr(url_col: str):
    # robots matching operates on path + query (RFC 9309 matches the
    # percent-decoded path; the fixture carries no percent-escapes)
    p = F.regexp_extract(F.col(url_col), r"^[a-z][a-z0-9+.-]*://[^/]+(/.*)?$", 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def apply_robots_rules(
    urls: DataFrame,
    rules: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
) -> DataFrame:
    """(doc_id, url, allowed, matched_prefix) — RFC 9309 longest-match
    evaluation of an (host, allow:int, prefix) rule table against a URL
    table.

    Winner per URL = the matching rule with the longest prefix; on a
    length tie the Allow rule wins; URLs with no matching rule are
    allowed (the RFC default). Implemented as a single broadcast join
    with the prefix test in the ON clause (non-matching URLs survive as
    left rows) followed by max(struct(len, allow, prefix)) — struct
    ordering IS the precedence rule, so the aggregation needs no window
    and combines map-side."""
    u = urls.select(
        F.col(id_col).alias("doc_id"),
        F.col(url_col).alias("url"),
        _host_expr(url_col).alias("host"),
        _path_expr(url_col).alias("path"),
    )
    r = rules.select(
        F.col("host").alias("r_host"),
        F.col("allow").cast("int").alias("allow"),
        F.col("prefix").alias("prefix"),
    )
    cand = u.join(
        F.broadcast(r),
        (F.col("host") == F.col("r_host"))
        & F.col("path").startswith(F.col("prefix")),
        "left",
    )
    win = (
        cand.groupBy("doc_id", "url")
        .agg(
            F.max(
                F.when(
                    F.col("prefix").isNotNull(),
                    F.struct(
                        F.length("prefix").alias("len"),
                        F.col("allow").alias("allow"),
                        F.col("prefix").alias("prefix"),
                    ),
                )
            ).alias("w")
        )
    )
    return win.select(
        "doc_id",
        "url",
        (F.col("w").isNull() | (F.col("w.allow") == 1)).alias("allowed"),
        F.col("w.prefix").alias("matched_prefix"),
    )


def rules_fixture(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """Deterministic (host, allow, prefix) rule table over the
    url_fixture's h0..h15 hosts, built to exercise every precedence
    case: a blanket deny overridden by a longer allow (/tag/ vs
    /tag/en/), an equal-length allow+deny tie (/product/, allow wins),
    a deny with no allow (/s/), and hosts with no matching rule at all
    (the default-allow path)."""
    hosts = (
        urls.select(_host_expr(url_col).alias("host"))
        .distinct()
        .selectExpr(
            "host",
            "CAST(regexp_extract(host, '^h([0-9]+)', 1) AS INT) AS hn",
        )
    )
    rule = "named_struct('allow', {a}, 'prefix', '{p}')"
    rules_arr = (
        "filter(array("
        + ", ".join(
            [
                rule.format(a=0, p="/tag/"),
                rule.format(a=0, p="/s/"),
                "IF(hn % 3 = 0, " + rule.format(a=1, p="/tag/en/") + ", NULL)",
                "IF(hn % 2 = 0, " + rule.format(a=0, p="/product/") + ", NULL)",
                "IF(hn % 4 = 1, " + rule.format(a=1, p="/product/") + ", NULL)",
                "IF(hn % 4 = 1, " + rule.format(a=0, p="/product/") + ", NULL)",
            ]
        )
        + "), x -> x IS NOT NULL)"
    )
    return hosts.selectExpr("host", f"explode({rules_arr}) AS r").selectExpr(
        "host", "r.allow AS allow", "r.prefix AS prefix"
    )


def crawl_delay_census(robots_txt: DataFrame, host_col: str = "host",
                       body_col: str = "body") -> DataFrame:
    """(host, crawl_delay_s, max_qps) — the de-facto Crawl-delay
    directive (not in RFC 9309, honored by most polite crawlers; the
    politeness scheduler's per-host token-bucket rate input) extracted
    from raw robots.txt bodies: the FIRST 'Crawl-delay: <seconds>'
    line wins (integer seconds; malformed or absent values report the
    1-second default), and max_qps = 1/delay is the token-bucket
    refill rate windows.fetch_schedule consumes.

    One regexp projection + the division — zero shuffle; parsing runs
    where the fetch landed the body.
    """
    d = (
        "coalesce(try_cast(regexp_extract(" + body_col + ", "
        "'(?i)crawl-delay:\\\\s*([0-9]+)', 1) AS BIGINT), 1L)"
    )
    return robots_txt.selectExpr(
        f"{host_col} AS host",
        f"greatest({d}, 1L) AS crawl_delay_s",
        f"round(1.0D / CAST(greatest({d}, 1L) AS DOUBLE), 9) AS max_qps",
    )
