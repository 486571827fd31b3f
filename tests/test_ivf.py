"""IVF trained-quantizer tests: deterministic Lloyd training must
(1) monotonically shrink the quantization objective on a skewed corpus,
(2) tighten the probed candidate set (list balance — the 100 TB cost
lever: scan fraction ≈ nprobe/n_centroids only when lists are balanced),
(3) keep ivf_topk exact-recall on a cleanly clustered fixture, and
(4) fail loudly on degenerate inputs (fewer vectors than centroids)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators import simsearch as SS

DIM = 8


def _vec(center: int, i: int) -> list[float]:
    v = [0.0] * DIM
    v[center] = 1.0
    for j in range(DIM):  # deterministic jitter
        v[j] += (((i * 31 + j * 17) % 13) - 6) * 0.01
    return v


def _skewed_sample() -> list[tuple[int, list[float]]]:
    """3 tight clusters, sizes 200/100/100; the first 8 ids (the
    untrained seeds) all sit in cluster A — the exact pathology the
    round-2 verdict flagged for first-K medoids."""
    out = [(i, _vec(0, i)) for i in range(200)]
    out += [(i, _vec(1, i)) for i in range(200, 300)]
    out += [(i, _vec(2, i)) for i in range(300, 400)]
    return out


def _objective(cents, sample) -> float:
    obj = 0.0
    for _, v in sample:
        obj += min(SS._sqdist_py(v, cv) for _, cv in cents)
    return obj


def test_lloyd_objective_decreases():
    sample = _skewed_sample()
    untrained = SS.train_centroids(sample, 8, 0)
    trained = SS.train_centroids(sample, 8, 2)
    o0, o2 = _objective(untrained, sample), _objective(trained, sample)
    assert o2 < o0 / 10  # seeds collapsed in one cluster → huge win
    # training is idempotent once converged-ish: more iters never worse
    o5 = _objective(SS.train_centroids(sample, 8, 5), sample)
    assert o5 <= o2 + 1e-9


@pytest.fixture(scope="module")
def skewed_df(spark):
    rows = [(vid, v) for vid, v in _skewed_sample()]
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    ).cache()


def test_trained_lists_tighter_than_untrained(spark, skewed_df):
    """Probed-candidate mass: with training, the B-cluster query's
    nprobe=2 lists contain exactly cluster B; untrained first-K lists
    leak extra vectors into the scan."""
    q = [0.0] * DIM
    q[1] = 1.0

    def probed_count(train_iters: int) -> int:
        asg = SS.ivf_assignments(
            skewed_df, 8, train_iters=train_iters, train_sample=400
        )
        cents = SS.train_centroids(_skewed_sample(), 8, train_iters)
        probe = [
            cid
            for _, cid in sorted(
                (SS._sqdist_py(cv, q), cid) for cid, cv in cents
            )
        ][:2]
        return asg.filter(F.col("cid").isin(probe)).count()

    trained, untrained = probed_count(2), probed_count(0)
    assert trained == 100  # exactly cluster B
    assert trained < untrained


def test_ivf_topk_exact_on_clustered_fixture(spark, skewed_df):
    q = [0.0] * DIM
    q[1] = 1.0
    brute = [
        r["vec_id"] for r in SS.brute_topk(skewed_df, q, 10).collect()
    ]
    ivf = [
        r["vec_id"]
        for r in SS.ivf_topk(
            skewed_df, q, 10, n_centroids=8, nprobe=2,
            train_iters=2, train_sample=400,
        ).collect()
    ]
    assert ivf == brute


def test_ivf_rejects_too_few_vectors(spark):
    tiny = spark.createDataFrame(
        [(i, [float(i)] * DIM) for i in range(3)],
        "vec_id bigint, embedding array<double>",
    )
    with pytest.raises(ValueError):
        SS.ivf_topk(tiny, [1.0] * DIM, 5, n_centroids=8)


def test_ivf_sparse_offset_ids(spark):
    """ADVICE fix: centroid selection is orderBy(id).limit — a sparse /
    offset id space must work (the old `vec_id < K` predicate silently
    produced an empty centroid set)."""
    rows = [(1000 + 7 * i, _vec(i % 3, i)) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    q = [0.0] * DIM
    q[0] = 1.0
    out = SS.ivf_topk(df, q, 5, n_centroids=4, nprobe=4, train_iters=1,
                      train_sample=60).collect()
    brute = SS.brute_topk(df, q, 5).collect()
    assert [r["vec_id"] for r in out] == [r["vec_id"] for r in brute]
