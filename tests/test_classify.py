"""Naive Bayes classifier tests (hand-computable micro-corpora; the
corpus-scale oracle row runs via tools/driver_sim.py)."""

from __future__ import annotations

import math

from searchengine_spark.operators.classify import nb_accuracy, nb_classify


def _run(spark, rows, **kw):
    df = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    out = nb_classify(df, label_col="source", **kw)
    return {r["doc_id"]: r for r in out.collect()}, out


def test_nb_separable_vocab(spark):
    # disjoint vocabularies → every test doc classified correctly
    rows = [
        (0, "a", "apple apple banana"),
        (2, "a", "apple banana banana"),
        (4, "b", "zebra yak zebra"),
        (6, "b", "yak yak zebra"),
        (1, "a", "apple banana"),
        (3, "b", "zebra yak"),
    ]
    got, out = _run(spark, rows)
    assert set(got) == {1, 3}
    assert got[1]["predicted"] == "a" and got[1]["correct"]
    assert got[3]["predicted"] == "b" and got[3]["correct"]
    acc = {r["label"]: r for r in nb_accuracy(out).collect()}
    assert acc["a"]["accuracy"] == 1.0 and acc["b"]["n"] == 1


def test_nb_hand_computed_score(spark):
    # train: doc0 class a = "x x y", doc2 class b = "z". V = 3.
    # priors: ln(1/2) each. tokens_a = 3, tokens_b = 1.
    # test doc1 = "x":
    #   score_a = ln(1/2) + ln((2+1)/(3+3))
    #   score_b = ln(1/2) + ln((0+1)/(1+3))
    rows = [(0, "a", "x x y"), (2, "b", "z"), (1, "a", "x")]
    got, _ = _run(spark, rows)
    r = got[1]
    want_a = math.log(0.5) + math.log(3.0 / 6.0)
    want_b = math.log(0.5) + math.log(1.0 / 4.0)
    assert r["predicted"] == "a"
    assert abs(r["score"] - round(want_a, 9)) < 1e-12
    assert want_a > want_b


def test_nb_unseen_tokens_fall_to_smoothing(spark):
    # test doc entirely out-of-vocabulary: both classes score on the
    # smoothing floor; tie on likelihood → prior + label order decide;
    # must not error or drop the doc
    rows = [(0, "a", "x y"), (2, "b", "p q"), (1, "a", "unseen words")]
    got, _ = _run(spark, rows)
    assert 1 in got and got[1]["predicted"] in {"a", "b"}
    # equal priors, equal tokc, equal V → identical scores; the
    # documented tie-break is the lexicographically LARGEST label
    assert got[1]["predicted"] == "b"


def test_nb_empty_test_doc_scores_prior_only(spark):
    # doc with no tokens → prior-only; class 'a' has 2 train docs vs 1
    rows = [
        (0, "a", "x"), (2, "a", "y"), (4, "b", "z"),
        (1, "b", "..."),  # tokenizes to empty
    ]
    got, _ = _run(spark, rows)
    r = got[1]
    assert r["predicted"] == "a"  # larger prior wins
    assert abs(r["score"] - round(math.log(2.0 / 3.0), 9)) < 1e-12
