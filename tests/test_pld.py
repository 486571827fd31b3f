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


# ---- full-PSL cases (wildcards, exceptions, deep suffixes, punycode) --
PSL_CASES = [
    # multi-part ccTLDs absent from the old round-3 embedded subset
    ("cdn.site.yamanashi.jp", "site.yamanashi.jp"),
    ("example.gov.scot", "example.gov.scot"),
    ("www.example.gov.scot", "example.gov.scot"),
    # wildcard rule *.ck: any label under ck is a public suffix
    ("foo.ck", "foo.ck"),
    ("a.foo.ck", "a.foo.ck"),
    ("b.a.foo.ck", "a.foo.ck"),
    # exception rule !www.ck beats the wildcard
    ("www.ck", "www.ck"),
    ("x.www.ck", "www.ck"),
    # wildcard *.kawasaki.jp + exception !city.kawasaki.jp
    ("a.b.kawasaki.jp", "a.b.kawasaki.jp"),
    ("x.city.kawasaki.jp", "city.kawasaki.jp"),
    # 4-label exact suffix
    ("example.pvt.k12.ma.us", "example.pvt.k12.ma.us"),
    ("x.example.pvt.k12.ma.us", "example.pvt.k12.ma.us"),
    # a host that IS a public suffix passes through
    ("pvt.k12.ma.us", "pvt.k12.ma.us"),
    ("yamanashi.jp", "yamanashi.jp"),
    # punycode twin of a unicode rule (公司.cn)
    ("a.xn--55qx5d.cn", "a.xn--55qx5d.cn"),
    ("b.a.xn--55qx5d.cn", "a.xn--55qx5d.cn"),
    # unknown TLD: implicit '*' rule keeps two labels
    ("a.b.unknowntld", "b.unknowntld"),
]


def test_full_psl_golden_cases(spark):
    df = spark.createDataFrame(
        [(h,) for h, _ in PSL_CASES], "host string"
    ).select("host", pld_col("host").alias("pld"))
    got = {r["host"]: r["pld"] for r in df.collect()}
    for host, want in PSL_CASES:
        assert got[host] == want, (host, got[host], want)


def test_spark_python_psl_parity(spark):
    """Property check: the generated SQL CASE and pycore.psl.pld agree
    on a broad synthetic host mix — every rule-shape class (exact at
    each depth, wildcard, exception, platform, IPv4, unknown TLD) plus
    hosts sampled from the PSL itself with 0-3 extra labels."""
    from searchengine_spark.pycore.psl import pld, rules

    exact, wild, exc = rules()
    hosts: list[str] = []
    for d, rs in sorted(exact.items()):
        for r in sorted(rs)[:40]:  # a slice of each depth class
            hosts += [r, f"site.{r}", f"www.site.{r}", f"a.b.site.{r}"]
    for d, rs in sorted(wild.items()):
        for r in sorted(rs)[:20]:
            hosts += [r, f"x.{r}", f"site.x.{r}", f"www.site.x.{r}"]
    for d, rs in sorted(exc.items()):
        for r in sorted(rs):
            hosts += [r, f"sub.{r}"]
    hosts += ["10.0.0.1", "localhost", "a.b.c.d.e.nosuchtld"]
    df = spark.createDataFrame(
        [(h,) for h in hosts], "host string"
    ).select("host", pld_col("host").alias("pld"))
    for r in df.collect():
        assert r["pld"] == pld(r["host"]), (
            r["host"], r["pld"], pld(r["host"])
        )
