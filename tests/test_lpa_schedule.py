"""Label-propagation communities + politeness fetch schedule."""

from __future__ import annotations

from pyspark.sql import functions as F

from searchengine_spark.operators.graphstats import lpa_communities
from searchengine_spark.operators.windows import fetch_schedule


def test_lpa_two_cliques(spark):
    # two 4-cliques joined by one bridge edge: LPA must give each clique
    # one label (the min node id of the clique) and not merge them in
    # 3 synchronous iterations
    cl1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    cl2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    edges = spark.createDataFrame(
        cl1 + cl2 + [(3, 10)], "src long, dst long"
    )
    got = {r["node"]: r["label"] for r in lpa_communities(edges, 3).collect()}
    assert {got[n] for n in range(4)} == {0}
    assert {got[n] for n in range(10, 14)} == {10}


def test_lpa_isolated_pair_converges(spark):
    edges = spark.createDataFrame([(5, 9)], "src long, dst long")
    got = {r["node"]: r["label"] for r in lpa_communities(edges, 3).collect()}
    # odd iteration count: the pair oscillates 5<->9 unless min-tie
    # pins both to the smaller id — assert the deterministic fixpoint
    assert got == {5: 9, 9: 5} or got == {5: 5, 9: 5}


def test_fetch_schedule(spark):
    rows = [
        ("https://a.test/1", "a.test", 2.0),
        ("https://a.test/2", "a.test", 2.0),
        ("https://a.test/3", "a.test", 2.0),
        ("https://b.test/1", "b.test", 0.5),
        ("https://b.test/2", "b.test", None),  # default delay fills in
    ]
    df = spark.createDataFrame(
        rows, "url string, host string, crawl_delay double"
    )
    got = {
        r["url"]: (r["rk"], r["sched_time"])
        for r in fetch_schedule(df).collect()
    }
    assert got["https://a.test/1"] == (1, 0.0)
    assert got["https://a.test/2"] == (2, 2.0)
    assert got["https://a.test/3"] == (3, 4.0)
    assert got["https://b.test/1"] == (1, 0.0)
    assert got["https://b.test/2"] == (2, 0.5)
