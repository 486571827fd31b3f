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
