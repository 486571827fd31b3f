"""SURT keys + CDX range lookup (functions/urls.py:surt_col,
operators/cdx.py) — golden canonicalization cases, range semantics,
and the parquet-stats pushdown the sorted layout exists for."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from searchengine_spark.functions.urls import surt_col
from searchengine_spark.operators.cdx import cdx_index, cdx_range


def _surts(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r.s for r in df.select(surt_col(F.col("url")).alias("s")).collect()]


def test_surt_golden_cases(spark):
    got = _surts(
        spark,
        [
            "https://example.org/a/b",
            "https://www.example.org/a/b",  # www strips -> same key
            "http://WWW2.Example.ORG/A/B",  # wwwN + case fold too
            "https://sub.example.co.uk/x",  # multi-label reversal
            "https://example.org/p?b=2&a=1",  # query args sort
            "https://example.org/p?a=1&b=2",  # ... to the same key
            "https://example.org/",  # bare root path
        ],
    )
    assert got[0] == "org,example)/a/b"
    assert got[1] == got[0]
    assert got[2] == got[0]
    assert got[3] == "uk,co,example,sub)/x"
    assert got[4] == "org,example)/p?a=1&b=2"
    assert got[5] == got[4]
    assert got[6] == "org,example)/"


def test_surt_host_prefix_cannot_bleed(spark):
    # ')' (0x29) sorts below every path/host char in use, so the range
    # for host "example.org" never captures "example.organic.com"-style
    # longer reversed-host keys
    keys = _surts(
        spark,
        ["https://example.org/z", "https://example.organ.test/a"],
    )
    lo, hi = "org,example)", "org,example*"  # chr(ord(')')+1) == '*'
    assert lo <= keys[0] < hi
    assert not (lo <= keys[1] < hi)


def test_cdx_range_semantics(spark):
    rows = [
        (0, "https://h3.test/article/3"),
        (1, "https://www.h3.test/article/9"),  # www variant, same subtree
        (2, "https://h30.test/article/1"),  # longer host, must NOT match
        (3, "https://h4.test/article/2"),
    ]
    idx = cdx_index(spark.createDataFrame(rows, "doc_id long, url string"))
    got = {r.doc_id for r in cdx_range(idx, "test,h3)/").collect()}
    assert got == {0, 1}
    out = cdx_range(idx, "test,h3)/article/9")
    assert [r.doc_id for r in out.collect()] == [1]


def test_cdx_range_pushes_to_parquet_stats(spark, tmp_path):
    rows = [(i, f"https://h{i % 16}.test/article/{i}") for i in range(200)]
    idx = cdx_index(spark.createDataFrame(rows, "doc_id long, url string"))
    path = str(tmp_path / "cdx")
    # the sorted CDX layout: repartitionByRange + sortWithinPartitions
    # on surt (the write-side half of the T4 idiom)
    idx.repartitionByRange(4, "surt").sortWithinPartitions("surt").write.parquet(
        path
    )
    q = cdx_range(spark.read.parquet(path), "test,h3)/")
    buf = io.StringIO()
    with redirect_stdout(buf):
        q.explain(mode="formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(surt" in plan and "LessThan(surt" in plan
    assert {r.doc_id for r in q.collect()} == {i for i in range(200) if i % 16 == 3}
