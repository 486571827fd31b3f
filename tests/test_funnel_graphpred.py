"""Funnel analysis, Adamic-Adar link prediction, k-core peeling."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from searchengine_spark.operators.funnel import funnel
from searchengine_spark.operators.graphstats import adamic_adar, k_core


def _ts(m):
    return dt.datetime(2026, 1, 1, 0, m)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string"
    )


# -------------------------------------------------------------------- funnel
def test_funnel_strict_ordering(spark):
    ev = _events(
        spark,
        [
            # u1 completes the whole funnel in order
            (1, _ts(0), "view"), (1, _ts(1), "click"), (1, _ts(2), "buy"),
            # u2 clicked BEFORE viewing: click must not count
            (2, _ts(5), "click"), (2, _ts(6), "view"),
            # u3 views only
            (3, _ts(0), "view"),
            # u4 never enters the funnel (no view) — excluded everywhere
            (4, _ts(0), "click"), (4, _ts(1), "buy"),
        ],
    )
    got = {
        r.step: (r.n_users, r.conversion)
        for r in funnel(ev, ["view", "click", "buy"]).collect()
    }
    assert got["view"] == (3, 1.0)
    assert got["click"] == (1, pytest.approx(1 / 3))
    assert got["buy"] == (1, pytest.approx(1 / 3))


def test_funnel_equal_timestamps_do_not_advance(spark):
    # strictly-after semantics: a click at the SAME instant as the view
    # does not count as a later step
    ev = _events(spark, [(1, _ts(0), "view"), (1, _ts(0), "click")])
    got = {r.step: r.n_users for r in funnel(ev, ["view", "click"]).collect()}
    assert got == {"view": 1, "click": 0} or got == {"view": 1}


def test_funnel_earliest_completion(spark):
    # u1 has two clicks after the view; step time must be the EARLIEST,
    # so a buy between the clicks still counts
    ev = _events(
        spark,
        [
            (1, _ts(0), "view"), (1, _ts(1), "click"),
            (1, _ts(2), "buy"), (1, _ts(3), "click"),
        ],
    )
    got = {r.step: r.n_users for r in funnel(ev, ["view", "click", "buy"]).collect()}
    assert got["buy"] == 1


# --------------------------------------------------------------- adamic-adar
def test_adamic_adar_path_graph(spark):
    # path 1-2-3: the only non-adjacent pair (1,3) shares neighbor 2
    # with degree 2 -> score 1/ln(2)
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src int, dst int")
    rows = adamic_adar(edges).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.node_a, r.node_b, r.n_common) == (1, 3, 1)
    assert r.score == pytest.approx(1 / math.log(2))


def test_adamic_adar_excludes_adjacent_pairs_by_default(spark):
    # triangle: every pair is adjacent -> no predictions
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "src int, dst int")
    assert adamic_adar(edges).count() == 0
    assert adamic_adar(edges, include_adjacent=True).count() == 3


def test_adamic_adar_degree_cut_drops_hub_centers(spark):
    # star: hub 0 connects 5 leaves; with the hub cut below its degree
    # no wedge survives
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src int, dst int"
    )
    assert adamic_adar(edges, max_common_degree=4).count() == 0
    assert adamic_adar(edges, max_common_degree=None).count() == 10


# -------------------------------------------------------------------- k-core
def test_k_core_peels_tail(spark):
    # K4 core with a pendant path hanging off it: 3-core = exactly K4
    edges = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges += [(3, 4), (4, 5)]
    e = spark.createDataFrame(edges, "src int, dst int")
    got = {r.node: r.core_degree for r in k_core(e, k=3).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_k_core_cascade(spark):
    # path graph: 2-core is empty, and the peel needs several rounds
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "src int, dst int"
    )
    assert k_core(e, k=2).count() == 0
    # 1-core of a path is the whole path
    assert k_core(e, k=1).count() == 9


def test_k_core_raises_on_truncation(spark):
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "src int, dst int"
    )
    with pytest.raises(RuntimeError, match="did not stabilize"):
        k_core(e, k=2, max_iters=2)


# ----------------------------------------------------------------------- ltr
def test_ltr_features_candidates_and_priors(spark):
    from searchengine_spark.operators.ltr import ltr_features

    docs = spark.createDataFrame(
        [
            (0, "spark window spark"),
            (1, "window dup things"),
            (2, "nothing relevant here"),
        ],
        "doc_id bigint, text string",
    )
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "src bigint, dst bigint"
    )
    rows = {
        r.doc_id: r
        for r in ltr_features(docs, ["spark", "window"], edges).collect()
    }
    # doc 2 matches no term -> not a candidate
    assert set(rows) == {0, 1}
    assert rows[0].n_matched == 2 and rows[1].n_matched == 1
    assert rows[0].doc_len == 3 and rows[1].doc_len == 3
    assert rows[0].bm25 > rows[1].bm25  # two matched terms beat one
    # symmetric ring graph -> equal pageranks
    assert rows[0].rank == rows[1].rank
    assert 0.0 < rows[0].quality <= 1.0


def test_ltr_features_accepts_precomputed_priors(spark):
    from searchengine_spark.operators.ltr import ltr_features
    from searchengine_spark.operators.ranking import bm25_table

    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "beta gamma")], "doc_id bigint, text string"
    )
    edges = spark.createDataFrame([(0, 1)], "src bigint, dst bigint")
    pre = ltr_features(
        docs,
        ["beta"],
        edges,
        weights=bm25_table(docs),
        lengths=spark.createDataFrame(
            [(0, 2), (1, 2)], "doc_id bigint, doc_len int"
        ),
        quality=spark.createDataFrame(
            [(0, 0.5), (1, 0.6)], "doc_id bigint, quality double"
        ),
        ranks=spark.createDataFrame(
            [(0, 0.5), (1, 0.5)], "doc_id bigint, rank double"
        ),
    ).collect()
    assert {r.doc_id for r in pre} == {0, 1}
    assert all(r.doc_len == 2 for r in pre)


def test_degree_tail_hand_computed(spark):
    import math

    from searchengine_spark.operators.graphstats import degree_tail_stats

    # out-degrees: node0 -> 4 edges, node1 -> 2, node2 -> 1 (below d_min)
    edges = [(0, d) for d in (10, 11, 12, 13)] + [(1, 10), (1, 11), (2, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.side: (r.n_tail, r.alpha) for r in
           degree_tail_stats(df, d_min=2).collect()}
    # out tail: degrees {4:1, 2:1}
    s_out = 1 * math.log(2 / 2) + 1 * math.log(4 / 2)
    assert got["out"][0] == 2
    assert abs(got["out"][1] - (1 + 2 / s_out)) < 1e-12
    # in-degrees: 10 -> 3, 11 -> 2, 12 -> 1, 13 -> 1; tail {3:1, 2:1}
    s_in = 1 * math.log(2 / 2) + 1 * math.log(3 / 2)
    assert got["in"][0] == 2
    assert abs(got["in"][1] - (1 + 2 / s_in)) < 1e-12


def test_degree_tail_empty_tail(spark):
    from searchengine_spark.operators.graphstats import degree_tail_stats

    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    got = {r.side: (r.n_tail, r.alpha) for r in
           degree_tail_stats(df, d_min=5).collect()}
    assert got["in"] == (0, 0.0) and got["out"] == (0, 0.0)


def test_reciprocity_counts(spark):
    from searchengine_spark.operators.graphstats import reciprocity

    edges = spark.createDataFrame(
        [(0, 1), (1, 0),          # reciprocal pair
         (1, 2),                  # one-way
         (2, 2),                  # self-loop: excluded
         (0, 1)],                 # duplicate: collapsed
        "src long, dst long",
    )
    r = reciprocity(edges).collect()[0]
    assert (r.n_edges, r.n_reciprocal) == (3, 2)
    assert abs(r.reciprocity - 2 / 3) < 1e-12
    empty = spark.createDataFrame([], "src long, dst long")
    z = reciprocity(empty).collect()[0]
    assert (z.n_edges, z.n_reciprocal, z.reciprocity) == (0, 0, 0.0)
