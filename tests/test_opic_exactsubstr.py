"""OPIC + ExactSubstr operator tests (hand-checkable micro-graphs; the
corpus-scale oracle rows run via tools/driver_sim.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators.opic import opic_scores
from searchengine_spark.operators.traindata import exact_substr


def _opic(spark, edges, nodes, **kw):
    e = spark.createDataFrame(edges, "src long, dst long")
    nd = spark.createDataFrame([(x,) for x in nodes], "id long")
    return {
        r["id"]: r for r in opic_scores(e, nd, **kw).collect()
    }


def test_opic_cycle_uniform(spark):
    # 3-cycle: cash circulates unchanged — uniform stays uniform,
    # history grows by cash0 per round, score sums to 1
    out = _opic(
        spark, [(0, 1), (1, 2), (2, 0)], [0, 1, 2], rounds=3,
        cash0=900, dense_ids=True,
    )
    for r in out.values():
        assert r["cash"] == 900
        assert r["history"] == 3 * 900
    assert abs(sum(r["score"] for r in out.values()) - 1.0) < 5e-9


def test_opic_star_concentrates(spark):
    # 0→1, 1→0, 2→1, 3→1: node 1 receives from three sources — its
    # banked history must dominate; total cash conserved to the unit
    out = _opic(
        spark, [(0, 1), (1, 0), (2, 1), (3, 1)], [0, 1, 2, 3],
        rounds=4, cash0=1000, dense_ids=True,
    )
    assert sum(r["cash"] for r in out.values()) == 4000
    assert out[1]["history"] > out[0]["history"] > 0
    assert out[1]["history"] > out[2]["history"]


def test_opic_remainder_apportionment(spark):
    # outdeg 3, cash 1000 = 333*3 + 1: the extra unit goes to the
    # SMALLEST dst; exactness means no unit is lost
    out = _opic(
        spark, [(0, 1), (0, 2), (0, 3), (1, 0), (2, 0), (3, 0)],
        [0, 1, 2, 3], rounds=1, cash0=1000, dense_ids=True,
    )
    assert out[1]["cash"] == 334 and out[2]["cash"] == 333
    assert out[3]["cash"] == 333
    assert sum(r["cash"] for r in out.values()) == 4000


def test_opic_dangling_redistributes(spark):
    # 1 is dangling: its cash spreads uniformly the same round
    # (100 // 4 = 25 each) on top of normal flows
    out = _opic(
        spark, [(0, 1), (2, 3), (3, 2)], [0, 1, 2, 3], rounds=1,
        cash0=100, dense_ids=True,
    )
    assert sum(r["cash"] for r in out.values()) == 400
    # node 1: inbound 100 from 0, plus 25 dangling share
    assert out[1]["cash"] == 125
    # node 0: nothing inbound, 25 dangling share
    assert out[0]["cash"] == 25


def test_opic_dense_vs_ranked_ids(spark):
    # non-dense ids (gaps) must produce the same result as the dense
    # fast path does on the re-labeled graph
    edges = [(10, 20), (20, 40), (40, 10)]
    sparse = _opic(spark, edges, [10, 20, 40], rounds=2, cash0=999)
    dense = _opic(
        spark, [(0, 1), (1, 2), (2, 0)], [0, 1, 2], rounds=2,
        cash0=999, dense_ids=True,
    )
    relabel = {10: 0, 20: 1, 40: 2}
    for sid, did in relabel.items():
        assert sparse[sid]["cash"] == dense[did]["cash"]
        assert sparse[sid]["history"] == dense[did]["history"]


def test_opic_rejects_zero_rounds(spark):
    with pytest.raises(ValueError):
        _opic(spark, [(0, 1)], [0, 1], rounds=0)


def _substr(spark, texts, w=4):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {r["doc_id"]: r for r in exact_substr(df, window_tokens=w).collect()}


def test_exact_substr_clean_corpus(spark):
    out = _substr(spark, ["a b c d e f", "g h i j k l"], w=4)
    for r in out.values():
        assert r["n_dup_windows"] == 0 and r["dup_frac"] == 0.0
        assert r["n_windows"] == 3


def test_exact_substr_full_duplicate(spark):
    # identical docs: every window duplicated, one maximal span
    # covering all tokens in each
    out = _substr(spark, ["a b c d e f", "a b c d e f"], w=4)
    for r in out.values():
        assert r["n_dup_windows"] == r["n_windows"] == 3
        assert r["n_dup_spans"] == 1
        assert r["dup_tokens"] == 6 and r["dup_frac"] == 1.0


def test_exact_substr_any_alignment(spark):
    # the shared 4-token run sits at DIFFERENT offsets — stride-k
    # segmentation misses this; stride-1 must catch exactly it
    out = _substr(
        spark, ["x1 x2 p q r s y1", "z1 z2 z3 p q r s"], w=4
    )
    for r in out.values():
        assert r["n_dup_windows"] == 1
        assert r["n_dup_spans"] == 1
        assert r["dup_tokens"] == 4
    # C4-style stride-k (span_dedup) on the same pair keeps everything:
    # no stride-4 span string repeats across the two docs
    from searchengine_spark.operators.traindata import span_dedup

    df = spark.createDataFrame(
        [(0, "x1 x2 p q r s y1"), (1, "z1 z2 z3 p q r s")],
        "doc_id long, text string",
    )
    sd = {r["doc_id"]: r for r in span_dedup(df, span_tokens=4).collect()}
    assert all(r["n_kept"] == r["n_spans"] for r in sd.values())


def test_exact_substr_interval_union(spark):
    # two dup windows in one doc, gap > W → two spans; within-doc
    # repetition also counts (corpus-global multiplicity)
    t = "p q r s m1 m2 m3 m4 m5 m6 m7 m8 m9 p q r s"
    out = _substr(spark, [t], w=4)
    r = out[0]
    assert r["n_dup_windows"] == 2
    assert r["n_dup_spans"] == 2
    assert r["dup_tokens"] == 8
    # overlapping dup windows merge into ONE span
    out2 = _substr(spark, ["a b c d e", "a b c d e z"], w=4)
    r2 = out2[0]
    assert r2["n_dup_windows"] == 2  # 'a b c d' and 'b c d e'
    assert r2["n_dup_spans"] == 1
    assert r2["dup_tokens"] == 5


def test_exact_substr_short_docs(spark):
    out = _substr(spark, ["a b", "a b"], w=4)
    for r in out.values():
        assert r["n_windows"] == 0 and r["dup_frac"] == 0.0
        assert r["n_tokens"] == 2
