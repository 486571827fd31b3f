"""Registrable-domain (PLD) extraction (functions/urls.pld_sql)."""

from __future__ import annotations

from pyspark.sql import functions as F

from searchengine_spark.functions.urls import pld_col

CASES = [
    ("www.example.com", "example.com"),
    ("example.com", "example.com"),
    ("a.b.c.example.com", "example.com"),
    ("www.example.co.uk", "example.co.uk"),
    ("example.co.uk", "example.co.uk"),
    ("deep.sub.example.co.uk", "example.co.uk"),
    ("alice.github.io", "alice.github.io"),  # user-platform suffix
    ("www.alice.github.io", "alice.github.io"),
    ("myblog.blogspot.com", "myblog.blogspot.com"),
    ("localhost", "localhost"),
    ("192.168.10.1", "192.168.10.1"),  # IPv4 passes through
    ("WWW.Example.COM", "example.com"),  # case folds
    (None, None),
]


def test_golden_cases(spark):
    df = spark.createDataFrame(
        [(h,) for h, _ in CASES], "host string"
    ).select("host", pld_col("host").alias("pld"))
    got = {r["host"]: r["pld"] for r in df.collect()}
    for host, want in CASES:
        key = host if host is not None else None
        assert got[key] == want, (host, got[key], want)


def test_groups_subdomain_shards_together(spark):
    hosts = spark.createDataFrame(
        [(f"{sub}.site.com",) for sub in ("www", "cdn", "blog", "m")],
        "host string",
    )
    n = (
        hosts.select(pld_col("host").alias("pld"))
        .agg(F.countDistinct("pld").alias("n"))
        .collect()[0]["n"]
    )
    assert n == 1


def test_platform_users_stay_separate(spark):
    hosts = spark.createDataFrame(
        [(f"user{i}.github.io",) for i in range(10)], "host string"
    )
    n = (
        hosts.select(pld_col("host").alias("pld"))
        .agg(F.countDistinct("pld").alias("n"))
        .collect()[0]["n"]
    )
    assert n == 10
