"""Query-likelihood LM ranking + Rocchio PRF (operators/ranking.py) —
semantic golden cases and guard rails."""

from __future__ import annotations

import math

from searchengine_spark.operators.ranking import qlm_search, rocchio_expand


def test_qlm_golden_scores(spark):
    rows = [
        (0, "cat dog cat"),  # f(cat)=2, dl=3
        (1, "cat fish fish fish"),  # f(cat)=1, dl=4
        (2, "bird bird"),  # no query term -> excluded
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    mu = 10.0
    got = {r.doc_id: r.score for r in qlm_search(df, ["cat"], k=10, mu=mu).collect()}
    total, cf = 9, 3  # 9 tokens overall, 'cat' occurs 3 times
    exp0 = math.log((2 + mu * cf / total) / (3 + mu))
    exp1 = math.log((1 + mu * cf / total) / (4 + mu))
    assert set(got) == {0, 1}
    assert abs(got[0] - exp0) < 1e-12 and abs(got[1] - exp1) < 1e-12
    assert got[0] > got[1]  # higher tf, shorter doc ranks first


def test_qlm_multi_term_order_and_empty(spark):
    rows = [(0, "a b c"), (1, "a a b")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = qlm_search(df, ["a", "b"], k=1, mu=5.0).collect()
    assert out[0].doc_id == 1  # doc 1 has more query-term mass
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert qlm_search(empty, ["a"], k=5).count() == 0
    assert qlm_search(df, [], k=5).count() == 0


def test_rocchio_expands_from_feedback_docs(spark):
    # docs about "spark": consistently co-occur with "shuffle"; the
    # off-topic docs talk about "garden" — expansion must surface
    # shuffle-side vocabulary, never the query term itself
    rows = [
        (0, "spark shuffle partition spark shuffle"),
        (1, "spark shuffle executor spark"),
        (2, "spark partition shuffle core"),
        (3, "garden flower tree garden soil"),
        (4, "garden tree flower pond"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = rocchio_expand(df, ["spark"], k_fb=3, m=3).collect()
    toks = [r.token for r in out]
    assert "spark" not in toks
    assert "shuffle" in toks  # the dominant co-occurring term
    assert all(r.rocchio_weight > 0 for r in out)
    assert not {"garden", "flower", "tree", "soil", "pond"} & set(toks)


def test_rocchio_deterministic(spark, sf_dir):
    import os

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    a = [tuple(r) for r in rocchio_expand(docs, ["spark", "window"]).collect()]
    b = [tuple(r) for r in rocchio_expand(docs, ["spark", "window"]).collect()]
    assert a == b and len(a) == 5


def test_bm25f_field_weighting(spark):
    """A title hit outranks the same term buried in the body."""
    from searchengine_spark.operators.ranking import bm25f_search

    title_doc = "needle " + "filler " * 40          # needle in chars 1-64
    body_doc = "filler " * 40 + " needle"           # needle past char 128
    rows = [(0, title_doc), (1, body_doc), (2, "filler " * 30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25f_search(df, ["needle"], k=10).collect()
    assert [r.doc_id for r in out] == [0, 1]  # doc 2 has no hit
    assert out[0].score > out[1].score


def test_bm25f_empty_corpus(spark):
    from searchengine_spark.operators.ranking import bm25f_search

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert bm25f_search(empty, ["a"], k=5).count() == 0


def test_rrf_fuses_both_rankings(spark):
    from searchengine_spark.operators.ranking import (
        bm25_search, bm25_table, rrf_fuse,
    )

    rows = [
        (0, "cat dog cat dog cat"),
        (1, "cat fish fish fish fish fish"),
        (2, "dog dog dog bird"),
        (3, "bird bird bird"),  # matches nothing
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    terms = ["cat", "dog"]
    out = rrf_fuse(df, terms, k=10, k_rrf=60, n_cand=10).collect()
    got = {r.doc_id: r.score for r in out}
    # doc 3 matches neither ranking's candidate set
    assert set(got) == {0, 1, 2}
    # recompute expected RRF from the two component rankings
    bm = bm25_search(bm25_table(df), terms, k=10).collect()
    ql = qlm_search(df, terms, k=10, mu=2000.0).collect()
    exp: dict[int, float] = {}
    for ranking in (bm, ql):
        for rank, r in enumerate(ranking, start=1):
            exp[r.doc_id] = exp.get(r.doc_id, 0.0) + 1.0 / (60.0 + rank)
    for d, s in got.items():
        assert abs(s - exp[d]) < 1e-12
    # output is sorted by fused score desc
    scores = [r.score for r in out]
    assert scores == sorted(scores, reverse=True)


def test_rrf_single_list_membership(spark):
    # a doc present in only one ranking still gets that ranking's
    # contribution (outer-join semantics, coalesce 0 for the other)
    from searchengine_spark.operators.ranking import rrf_fuse

    from searchengine_spark.operators.ranking import bm25_search, bm25_table

    rows = [(0, "cat cat cat"), (1, "dog dog dog")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    terms = ["cat", "dog"]
    # n_cand=1 truncates each ranking to its single top doc; the fused
    # set is the union of the two singletons and each fused score is
    # exactly the sum of that doc's per-list 1/(60+rank) contributions
    out = {r.doc_id: r.score for r in rrf_fuse(df, terms, k=10,
                                               n_cand=1).collect()}
    tops = [
        bm25_search(bm25_table(df), terms, k=1).collect()[0].doc_id,
        qlm_search(df, terms, k=1, mu=2000.0).collect()[0].doc_id,
    ]
    exp: dict[int, float] = {}
    for d in tops:
        exp[d] = exp.get(d, 0.0) + 1.0 / 61.0
    assert set(out) == set(exp)
    for d, s in out.items():
        assert abs(s - exp[d]) < 1e-12


def test_clarity_specific_beats_ambiguous(spark):
    from searchengine_spark.operators.ranking import clarity_score

    # 'quark' only ever appears with a tight vocabulary; 'the' is
    # everywhere -> the quark query's feedback model diverges more
    # from the collection model
    rows = [
        (0, "quark gluon plasma quark lattice"),
        (1, "quark gluon confinement lattice"),
        (2, "the cat sat on the mat the"),
        (3, "the dog ran in the park the"),
        (4, "the fish swam under the bridge"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    hi = clarity_score(df, ["quark"], k_fb=2).collect()[0].clarity
    lo = clarity_score(df, ["the"], k_fb=3).collect()[0].clarity
    assert hi > lo > 0.0


def test_clarity_empty_candidates(spark):
    from searchengine_spark.operators.ranking import clarity_score

    df = spark.createDataFrame([(0, "alpha beta")], "doc_id long, text string")
    assert clarity_score(df, ["zzz"], k_fb=5).count() == 0


def test_clarity_matches_hand_computation(spark):
    import math

    from searchengine_spark.operators.ranking import clarity_score

    rows = [(0, "a a b"), (1, "a c c c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = clarity_score(df, ["a"], k_fb=2).collect()[0].clarity
    # both docs are feedback docs (both contain 'a'); |R| = 2, |C| = 7
    pwq = {
        "a": (2 / 3 + 1 / 4) / 2,
        "b": (1 / 3) / 2,
        "c": (3 / 4) / 2,
    }
    pwc = {"a": 3 / 7, "b": 1 / 7, "c": 3 / 7}
    exp = sum(
        pwq[w] * math.log(pwq[w] / pwc[w]) / math.log(2.0) for w in sorted(pwq)
    )
    assert abs(got - exp) < 1e-12


def test_blend_with_prior_reorders(spark):
    import math

    from searchengine_spark.operators.ranking import (
        blend_with_prior, bm25_search, bm25_table,
    )

    rows = [
        (0, "cat dog"),
        (1, "cat dog"),  # identical text: bm25 tie with doc 0
        (2, "bird"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # prior strongly favors doc 1
    prior = spark.createDataFrame(
        [(0, 0.01), (1, 0.9), (2, 0.09)], "doc_id long, rank double"
    )
    out = blend_with_prior(df, ["cat"], prior, k=3, lam=0.25).collect()
    assert [r.doc_id for r in out] == [1, 0]  # prior breaks the text tie
    base = {r.doc_id: r.score
            for r in bm25_search(bm25_table(df), ["cat"], k=3).collect()}
    exp1 = base[1] + 0.25 * math.log(0.9)
    assert abs(out[0].score - exp1) < 1e-12


def test_site_collapse_caps_per_host(spark):
    from searchengine_spark.operators.ranking import site_collapse

    ranked = spark.createDataFrame(
        [(i, 100.0 - i) for i in range(8)], "doc_id long, score double"
    )
    hosts = spark.createDataFrame(
        [(i, "a.test" if i < 5 else "b.test") for i in range(8)],
        "doc_id long, host string",
    )
    out = site_collapse(ranked, hosts, k=10, per_host=2).collect()
    got = [(r.doc_id, r.host) for r in out]
    # host a contributes only its 2 best (docs 0, 1); b its 2 best (5, 6)
    assert got == [(0, "a.test"), (1, "a.test"), (5, "b.test"),
                   (6, "b.test")]


def test_nqc_commitment_ordering(spark):
    from searchengine_spark.operators.ranking import nqc_score

    # query 'needle': one doc dominates -> high score variance; query
    # 'common': flat scores across docs -> low variance
    rows = [
        (0, "needle needle needle haystack"),
        (1, "haystack common filler one"),
        (2, "haystack common filler two"),
        (3, "haystack common filler three"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    hi = nqc_score(df, ["needle", "haystack"], k=4).collect()[0]
    lo = nqc_score(df, ["common"], k=4).collect()[0]
    assert hi.n_scored == 4 and lo.n_scored == 3
    assert hi.nqc > lo.nqc >= 0.0
    empty = nqc_score(df, ["absentterm"], k=4).collect()[0]
    assert empty.n_scored == 0 and empty.nqc == 0.0
