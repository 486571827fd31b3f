"""Published web-text cleaning rules (Gopher, C4) + SemDedup pruning."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from searchengine_spark.operators import textstats as TS
from searchengine_spark.operators.dedup import semdedup

GOOD = (
    "the quick brown fox jumps over the lazy dog and then it runs to be "
    "of use with all that have come before it. another line follows here.\n"
    "this second line also ends with a proper full stop."
)


def _gopher(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = TS.gopher_rules(df, **kw).collect()
    return {r["doc_id"]: r for r in out}


def test_gopher_rules(spark):
    rows = [
        (1, GOOD),
        (2, "- item one\n- item two\n- item three"),  # all bullets
        (3, "short text."),  # too few words
        (4, "#### #### #### #### the be words"),  # symbol-heavy
        (5, "one two three...\nfour five six...\nseven eight nine..."),
    ]
    g = _gopher(spark, rows, min_words=8, min_mean_len=2.0)
    assert g[1]["keep"] is True
    assert g[2]["bullet_ratio"] == 1.0 and g[2]["keep"] is False
    assert g[3]["n_words"] < 8 and g[3]["keep"] is False
    assert g[4]["symbol_ratio"] > 0.1 and g[4]["keep"] is False
    assert g[5]["ellipsis_ratio"] == 1.0 and g[5]["keep"] is False
    # stop-hit rule: ≥2 distinct Gopher stopwords required
    only_one = " ".join(["the"] + ["zzz"] * 20) + "."
    g2 = _gopher(spark, [(9, only_one)], min_words=8, min_mean_len=2.0)
    assert g2[9]["stop_hits"] == 1 and g2[9]["keep"] is False


def test_c4_filters(spark):
    rows = [
        (1, "a good line with plenty of words here.\nanother full sentence "
            "line that also ends well!\na third one for the count?"),
        (2, "this page mentions lorem ipsum dolor sit amet. plus more. and more."),
        (3, "var x = {json: true}. it has braces. three sentences here."),
        (4, "enable javascript to view this.\nsecond sentence has words "
            "here.\nthird good line is here too."),
        (5, "no terminal punctuation lines here\nat all\nreally"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in TS.c4_filters(df, min_line_words=3).collect()}
    assert out[1]["keep"] is True and out[1]["kept_lines"] == 3
    assert out[2]["has_lorem"] is True and out[2]["keep"] is False
    assert out[3]["has_brace"] is True and out[3]["keep"] is False
    # line rule: javascript lines die, page may still keep via other lines
    assert out[4]["kept_lines"] == 2
    assert out[5]["kept_lines"] == 0 and out[5]["keep"] is False


def test_semdedup_matches_bruteforce(spark):
    # clustered fixture: 4 tight groups of 5 vectors in 8-d
    import random

    rnd = random.Random(3)
    rows = []
    vid = 0
    for g in range(4):
        center = [rnd.uniform(-1, 1) for _ in range(8)]
        for _ in range(5):
            vec = [c + rnd.uniform(-0.05, 0.05) for c in center]
            rows.append((vid, vec))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semdedup(df, threshold=0.9, n_centroids=4).collect()
    got = {r["vec_id"]: (r["cid"], r["pruned"]) for r in out}
    assert len(got) == 20

    # brute-force replay: same rule over the returned cluster assignment
    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return 0.0 if na == 0 or nb == 0 else dot / (na * nb)

    vecs = dict(rows)
    for b, (cid_b, pruned_b) in got.items():
        expect = any(
            a < b and got[a][0] == cid_b and cos(vecs[a], vecs[b]) >= 0.9
            for a in got
        )
        assert pruned_b == expect, (b, pruned_b, expect)
    # tight groups must actually collapse: ≥1 pruned vector exists
    assert any(p for _, p in got.values())


def test_soft404_gate(spark):
    from searchengine_spark.operators.textstats import soft404_scores

    rows = [
        (0, "404 Not Found - the page you requested does not exist"),
        (1, "long article about error handling " * 10
            + " it mentions page not found once"),   # cue but long
        (2, "tiny page"),                            # short but no cue
        (3, "an ordinary document with plenty of words " * 5),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_cues, r.is_soft404)
           for r in soft404_scores(df).collect()}
    assert got[0][0] >= 2 and got[0][1] is True
    assert got[1][0] == 1 and got[1][1] is False   # length guard holds
    assert got[2] == (0, False)
    assert got[3] == (0, False)


def test_semdedup_cluster_size_contract_raises(spark):
    # degenerate space: every vector identical -> the quantizer
    # collapses all N into one cluster; with n_centroids=32 the bound
    # factor*ceil(N/32) is far below N, so the quadratic-pair guard
    # must fail fast instead of silently joining N^2 rows
    import pytest

    rows = [(i, [1.0] * 8) for i in range(64)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="cluster-size contract"):
        semdedup(df, threshold=0.9, n_centroids=32).collect()
    # explicit opt-out restores the old unchecked behavior
    out = semdedup(
        df, threshold=0.9, n_centroids=32, max_cluster_factor=None
    ).collect()
    assert len(out) == 64
