"""F6/F7/F8 + xxhash64 Spark-parity tests."""

from __future__ import annotations

from hashlib import sha256
from urllib.parse import urlparse

from pyspark.sql import functions as F

from searchengine_spark.pycore.urltools import (
    canonicalize,
    is_valid_url,
    url_host,
    urlhash_sha256,
    xxhash64,
)

URLS = [
    "",
    "a",
    "hello world",
    "https://www.ics.uci.edu/~lopes/",
    "https://wics.ics.uci.edu/events/category/wics-bonding/day/2013-08-22",
    "x" * 31,
    "y" * 32,
    "z" * 1000,
    "héllo-ünicode-☃",
]


def test_xxhash64_matches_spark(spark):
    df = spark.createDataFrame([(u,) for u in URLS], ["s"])
    got = {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for u in URLS:
        assert got[u] == xxhash64(u), f"xxhash64 mismatch for {u!r}"


def test_urlhash_sha256_faithful():
    # hand-check the reference formula (utils/__init__.py:25-30)
    u = "https://www.ics.uci.edu/~lopes/page?q=1#frag"
    p = urlparse(u)
    expected = sha256(
        f"{p.netloc}/{p.path}/{p.params}/{p.query}/{p.fragment}".encode()
    ).hexdigest()
    assert urlhash_sha256(u) == expected
    # scheme excluded: http vs https hash equal (faithful quirk)
    assert urlhash_sha256("http://a.b/c") == urlhash_sha256("https://a.b/c")
    # fragment included: different fragments hash differently
    assert urlhash_sha256("https://a.b/c#x") != urlhash_sha256("https://a.b/c#y")


def test_canonicalize():
    assert canonicalize("HTTPS://WWW.Ics.uci.EDU/Path/") == "https://www.ics.uci.edu/Path"
    assert canonicalize("https://a.b/c#frag") == "https://a.b/c"
    assert canonicalize("https://a.b/c///") == "https://a.b/c"
    # relative resolution against base (scraper contract README.md:105-111)
    assert canonicalize("../x", "https://a.b/c/d/page") == "https://a.b/c/x"
    assert canonicalize("/abs", "https://a.b/c/d") == "https://a.b/abs"
    assert canonicalize("https://a.b") == "https://a.b"


def test_is_valid():
    assert is_valid_url("https://a.b/page.html")
    assert not is_valid_url("ftp://a.b/x")
    assert not is_valid_url("https://a.b/doc.pdf")
    assert not is_valid_url("https://a.b/pic.JPEG")
    assert not is_valid_url("https://a.b/x.tar")
    assert is_valid_url("https://sub.ics.uci.edu/x", allowed_host_re=r"\.ics\.uci\.edu$")
    assert not is_valid_url("https://evil.com/x", allowed_host_re=r"\.ics\.uci\.edu$")
    assert url_host("https://A.B.C/path") == "a.b.c"


def test_canonicalize_udf_parity(spark):
    from searchengine_spark.functions.urls import canonicalize_udf

    raw = [
        "HTTPS://WWW.Ics.uci.EDU/Path/",
        "https://a.b/c#frag",
        "https://a.b/c///",
        "https://a.b",
    ]
    df = spark.createDataFrame([(u,) for u in raw], ["url"])
    got = [r["c"] for r in df.select(canonicalize_udf("url").alias("c")).collect()]
    assert got == [canonicalize(u) for u in raw]


def test_is_valid_sql_parity(spark):
    from searchengine_spark.functions.urls import is_valid_sql

    raw = [
        "https://a.b/page.html",
        "ftp://a.b/x",
        "https://a.b/doc.pdf",
        "https://a.b/pic.JPEG",
        "https://sub.ics.uci.edu/x",
        "https://evil.com/x",
    ]
    df = spark.createDataFrame([(u,) for u in raw], ["url"])
    got = [
        r["v"]
        for r in df.select(
            # same plain regex string as the Python side — is_valid_sql
            # handles the SQL string-literal escaping itself
            F.expr(is_valid_sql("url", r"\.ics\.uci\.edu$")).alias("v")
        ).collect()
    ]
    assert got == [is_valid_url(u, r"\.ics\.uci\.edu$") for u in raw]
