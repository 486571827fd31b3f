"""rank_correlation (operators/rankeval.py) golden cases."""

from __future__ import annotations

from searchengine_spark.operators.rankeval import rank_correlation


def _pages(spark, sa, sb):
    a = spark.createDataFrame(
        [(i, s) for i, s in sa.items()], "doc_id long, score double"
    )
    b = spark.createDataFrame(
        [(i, s) for i, s in sb.items()], "doc_id long, score double"
    )
    return a, b


def test_identical_rankings(spark):
    a, b = _pages(spark, {1: 3.0, 2: 2.0, 3: 1.0}, {1: 9.0, 2: 8.0, 3: 7.0})
    r = rank_correlation(a, b).collect()[0]
    assert r["n_common"] == 3
    assert r["kendall_tau"] == 1.0
    assert r["spearman_rho"] == 1.0
    assert r["discordant"] == 0


def test_reversed_rankings(spark):
    a, b = _pages(spark, {1: 3.0, 2: 2.0, 3: 1.0}, {1: 1.0, 2: 2.0, 3: 3.0})
    r = rank_correlation(a, b).collect()[0]
    assert r["kendall_tau"] == -1.0
    assert r["spearman_rho"] == -1.0
    assert r["concordant"] == 0


def test_partial_overlap_and_known_tau(spark):
    # common = {1,2,3}; doc 9 / doc 8 are unique to one side each.
    # a-order: 1,2,3 ; b-order: 2,1,3 -> one discordant pair of three
    a, b = _pages(
        spark,
        {1: 3.0, 2: 2.0, 3: 1.0, 9: 0.5},
        {2: 9.0, 1: 8.0, 3: 7.0, 8: 6.0},
    )
    r = rank_correlation(a, b).collect()[0]
    assert r["n_common"] == 3
    assert (r["concordant"], r["discordant"]) == (2, 1)
    assert abs(r["kendall_tau"] - (1 / 3)) < 1e-9
    assert r["sum_d2"] == 2  # d = (-1, 1, 0)
    assert abs(r["spearman_rho"] - 0.5) < 1e-9


def test_degenerate_singleton(spark):
    a, b = _pages(spark, {1: 1.0}, {1: 1.0})
    r = rank_correlation(a, b).collect()[0]
    assert r["n_common"] == 1
    assert r["kendall_tau"] is None and r["spearman_rho"] is None
