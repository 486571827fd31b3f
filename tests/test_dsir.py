"""DSIR importance resampling (operators/sampling.dsir_*)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators import sampling as SP
from searchengine_spark.operators import tfidf as TF

N_BUCKETS = 32


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    for i in range(60):
        if i % 3 == 0:  # wiki-like: the target style
            text = "science history atlas archive " * (1 + i % 2)
        elif i % 3 == 1:  # seo junk: source-only style
            text = "buy cheap pills casino jackpot " * (1 + i % 2)
        else:  # mixed
            text = "science casino atlas jackpot"
        rows.append((i, text))
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def occ(corpus):
    return (
        TF.doc_tokens(corpus)
        .select("doc_id", F.explode("tokens").alias("token"))
        .localCheckpoint()
    )


@pytest.fixture(scope="module")
def weights(spark, occ):
    target = spark.range(60).filter(F.col("id") % 3 == 0).selectExpr(
        "id AS doc_id"
    )
    return SP.dsir_log_weights(
        occ, target, n_buckets=N_BUCKETS
    ).localCheckpoint()


def test_target_style_outranks_junk(weights):
    rows = {r["doc_id"]: r["log_weight"] for r in weights.collect()}
    wiki = [rows[i] for i in range(60) if i % 3 == 0]
    junk = [rows[i] for i in range(60) if i % 3 == 1]
    mixed = [rows[i] for i in range(60) if i % 3 == 2]
    assert min(wiki) > max(mixed) > max(junk)


def test_matches_single_node_recompute(occ, weights):
    # exact parity with a driver-side recomputation of the same math,
    # folding per-bucket terms in bucket order like the operator does
    pairs = [(r["doc_id"], r["token"]) for r in occ.collect()]
    target = {d for d, _ in pairs if d % 3 == 0}
    bucket = {t: _h60(t) % N_BUCKETS for _, t in pairs}
    cs: dict[int, int] = {}
    ct: dict[int, int] = {}
    for d, t in pairs:
        b = bucket[t]
        cs[b] = cs.get(b, 0) + 1
        if d in target:
            ct[b] = ct.get(b, 0) + 1
    ts, tt = len(pairs), sum(ct.values())
    logr = {
        b: math.log((ct.get(b, 0) + 1.0) / (tt + float(N_BUCKETS)))
        - math.log((cs.get(b, 0) + 1.0) / (ts + float(N_BUCKETS)))
        for b in range(N_BUCKETS)
    }
    per_doc: dict[int, dict[int, int]] = {}
    for d, t in pairs:
        per_doc.setdefault(d, {})[bucket[t]] = (
            per_doc.setdefault(d, {}).get(bucket[t], 0) + 1
        )
    for r in weights.collect():
        d = r["doc_id"]
        acc = 0.0
        for b in sorted(per_doc[d]):
            acc += per_doc[d][b] * logr[b]
        assert r["log_weight"] == pytest.approx(acc, abs=0, rel=0), d
        assert r["n_tokens"] == sum(per_doc[d].values())


def test_sample_deterministic_and_biased(weights):
    a = SP.dsir_sample(weights, k=10).collect()
    b = SP.dsir_sample(weights, k=10).collect()
    assert [(r["doc_id"], r["key"]) for r in a] == [
        (r["doc_id"], r["key"]) for r in b
    ]
    # weights differ by many nats, so the sample should be mostly the
    # target-style docs despite the Gumbel noise
    frac_wiki = sum(1 for r in a if r["doc_id"] % 3 == 0) / len(a)
    assert frac_wiki >= 0.7


def test_sample_k_exceeds_n(weights):
    out = SP.dsir_sample(weights, k=1000).collect()
    assert len(out) == weights.count()


def test_no_target_rows_still_defined(spark, occ):
    # empty exemplar set: p_t is the uniform 1/(0+B) prior everywhere —
    # weights defined (no NaN/null), ranking collapses to doc length
    empty = spark.range(0).selectExpr("id AS doc_id")
    w = SP.dsir_log_weights(occ, empty, n_buckets=N_BUCKETS)
    assert w.filter(F.col("log_weight").isNull()).count() == 0


def test_paired_sign_test_separates_signal_from_noise(spark):
    from searchengine_spark.operators.rankeval import paired_sign_test

    # systematic winner: a beats b by 0.1 on every one of 12 queries
    win = spark.createDataFrame(
        [(q, 0.5 + 0.1, 0.5) for q in range(12)],
        "query_id long, metric_a double, metric_b double",
    )
    r = paired_sign_test(win, n_perm=400).collect()[0]
    assert r.n_queries == 12 and abs(r.mean_diff - 0.1) < 1e-12
    # all-same-sign diffs: only the all-heads/all-tails flips reach
    # |obs| -> p near 2/2^12; with add-one smoothing p stays tiny
    assert r.p_value < 0.02

    # pure noise: alternating +-0.1 diffs -> mean 0, p = 1
    noise = spark.createDataFrame(
        [(q, 0.5 + (0.1 if q % 2 == 0 else -0.1), 0.5) for q in range(12)],
        "query_id long, metric_a double, metric_b double",
    )
    n = paired_sign_test(noise, n_perm=400).collect()[0]
    assert abs(n.mean_diff) < 1e-12
    assert n.p_value > 0.9


def test_paired_sign_test_deterministic_and_empty(spark):
    from searchengine_spark.operators.rankeval import paired_sign_test

    m = spark.createDataFrame(
        [(q, 0.6, 0.5 + 0.01 * (q % 3)) for q in range(8)],
        "query_id long, metric_a double, metric_b double",
    )
    a = paired_sign_test(m, n_perm=100).collect()[0]
    b = paired_sign_test(m, n_perm=100).collect()[0]
    assert tuple(a) == tuple(b)  # h60 coins: no RNG anywhere
    empty = spark.createDataFrame(
        [], "query_id long, metric_a double, metric_b double"
    )
    assert paired_sign_test(empty).count() == 0
