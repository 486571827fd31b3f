"""MaxScore-pruned exact BM25 top-k (operators/ranking.maxscore_search)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators import ranking as RK


@pytest.fixture(scope="module")
def corpus(spark):
    # 'the' is a near-stopword (every doc); 'zebra'/'quark' are rare;
    # 'graph' mid-frequency — the classic MaxScore-friendly skew
    rows = []
    for i in range(120):
        words = ["the", "common", "filler"]
        if i % 3 == 0:
            words += ["graph", "walk"]
        if i % 40 == 0:
            words += ["zebra"]
        if i == 7:
            words += ["quark", "zebra", "zebra"]
        rows.append((i, " ".join(words * (1 + i % 4))))
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def weights(corpus):
    return RK.bm25_table(corpus).localCheckpoint()


@pytest.mark.parametrize(
    "terms,k",
    [
        (["zebra", "the"], 5),
        (["graph", "zebra", "quark"], 10),
        (["the"], 3),
        (["THE", "the", "Graph"], 7),  # dedupe + case fold
        (["nosuchtoken", "zebra"], 5),
        (["nosuchtoken"], 5),  # no matches at all
        (["the", "common", "filler", "graph", "zebra"], 120),  # k > hits
    ],
)
def test_equals_brute_force(weights, terms, k):
    brute = RK.bm25_search(weights, terms, k=k).collect()
    pruned = RK.maxscore_search(weights, terms, k=k).collect()
    assert [
        (r["doc_id"], round(r["score"], 9)) for r in pruned
    ] == [(r["doc_id"], round(r["score"], 9)) for r in brute]


def test_pruning_actually_prunes(weights):
    # 'zebra' is rare with a big UB; 'the' matches everything with a
    # tiny UB -> 'the' must go non-essential and candidates collapse
    # to ~the zebra postings, far below the 120 any-term matches
    out, stats = RK.maxscore_search(
        weights, ["zebra", "the"], k=3, return_stats=True
    )
    assert len(out.collect()) == 3
    assert stats["n_essential"] < stats["n_terms"]
    assert stats["n_candidates"] < stats["n_matching"] / 3


def test_empty_query(weights):
    assert RK.maxscore_search(weights, [], k=5).count() == 0


def test_ties_break_by_doc_id(spark):
    # identical docs -> identical scores; top-k must take lowest ids
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma") for i in range(20)],
        "doc_id long, text string",
    )
    w = RK.bm25_table(docs)
    got = [r["doc_id"] for r in RK.maxscore_search(w, ["alpha"], k=4).collect()]
    assert got == [0, 1, 2, 3]
