"""Round-3 additions: largest-remainder host budgets, count-min-sketch
estimates, and Cho-Garcia-Molina change-rate recrawl scheduling."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from searchengine_spark.operators.budget import host_budget
from searchengine_spark.operators.recrawl import change_rate
from searchengine_spark.operators.sketches import cms_estimates

# ---------------------------------------------------------------- budget


def _hosts(spark, scores):
    return spark.createDataFrame(
        [(f"h{i:03d}", s) for i, s in enumerate(scores)],
        "host string, score bigint",
    )


def _brute_lr(scores, budget):
    """Reference largest-remainder apportionment in plain Python."""
    s = sum(scores)
    if s == 0:
        return [0] * len(scores)
    base = [budget * x // s for x in scores]
    rem = [(budget * x % s, f"h{i:03d}") for i, x in enumerate(scores)]
    order = sorted(
        range(len(scores)), key=lambda i: (-rem[i][0], rem[i][1])
    )
    q = list(base)
    for i in order[: budget - sum(base)]:
        q[i] += 1
    return q


def test_host_budget_exact_total_and_brute_parity(spark):
    scores = [(i * 37 + 11) % 101 + 1 for i in range(23)]
    got = {
        r.host: r.quota
        for r in host_budget(_hosts(spark, scores), budget=97).collect()
    }
    want = _brute_lr(scores, 97)
    assert sum(got.values()) == 97
    assert got == {f"h{i:03d}": q for i, q in enumerate(want)}


def test_host_budget_equal_scores_degenerate_bucket(spark):
    # all remainders identical -> single bucket -> TakeOrdered fallback;
    # host-ascending tie-break hands the 5 extra seats to h000..h004
    got = {
        r.host: r.quota
        for r in host_budget(_hosts(spark, [7] * 10), budget=25).collect()
    }
    assert sum(got.values()) == 25
    assert all(
        got[f"h{i:03d}"] == (3 if i < 5 else 2) for i in range(10)
    )


def test_host_budget_zero_scores(spark):
    got = host_budget(_hosts(spark, [0, 0, 0]), budget=10).collect()
    assert [r.quota for r in got] == [0, 0, 0]


def test_host_budget_monotone_in_score(spark):
    scores = [1, 10, 100, 1000, 500, 50, 5, 999]
    rows = host_budget(_hosts(spark, scores), budget=321).collect()
    by_host = {r.host: r for r in rows}
    pairs = sorted(by_host.values(), key=lambda r: (r.score, r.host))
    for lo, hi in zip(pairs, pairs[1:]):
        if hi.score > lo.score:
            assert hi.quota >= lo.quota

# ------------------------------------------------------------------- cms


def test_cms_overestimates_never_under(spark):
    rows = [(f"tok{i % 13}",) for i in range(400)]
    df = spark.createDataFrame(rows, "token string")
    got = cms_estimates(df, "token", w=8, d=2).collect()
    assert len(got) == 13
    assert all(r.est_count >= r.exact_count for r in got)
    # w=8 over 13 keys forces at least one collision somewhere
    assert any(r.est_count > r.exact_count for r in got)


def test_cms_exact_when_wide(spark):
    rows = [(f"tok{i % 13}",) for i in range(400)]
    df = spark.createDataFrame(rows, "token string")
    got = cms_estimates(df, "token", w=4096, d=4).collect()
    assert all(r.est_count == r.exact_count for r in got)

# ----------------------------------------------------------- change_rate


def _caps(spark, rows):
    return spark.createDataFrame(
        rows, "url string, ts timestamp, fp string, cap_id bigint"
    )


def test_change_rate_counts_and_estimate(spark):
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1)
    day = dt.timedelta(days=1)
    rows = [
        # u1: A A B A over 3 one-day gaps -> n_changed = 2
        ("u1", t0, "A", 0),
        ("u1", t0 + day, "A", 1),
        ("u1", t0 + 2 * day, "B", 2),
        ("u1", t0 + 3 * day, "A", 3),
        # u2: never changes -> lambda 0 -> clamped to 365
        ("u2", t0, "X", 0),
        ("u2", t0 + 10 * day, "X", 1),
        # u3: single capture -> excluded
        ("u3", t0, "Z", 0),
    ]
    got = {
        r.url: r
        for r in change_rate(
            _caps(spark, rows),
            url_col="url",
            ts_col="ts",
            fp_col="fp",
            id_col="cap_id",
        ).collect()
    }
    assert set(got) == {"u1", "u2"}
    u1 = got["u1"]
    assert (u1.n_caps, u1.n_changed) == (4, 2)
    assert math.isclose(u1.gap_days, 1.0)
    want_lambda = -math.log((3 - 2 + 0.5) / 3.5)  # per day, gap = 1d
    assert math.isclose(u1.lambda_day, want_lambda, rel_tol=1e-12)
    assert math.isclose(u1.recrawl_days, 1.0 / want_lambda, rel_tol=1e-12)
    u2 = got["u2"]
    assert (u2.n_caps, u2.n_changed) == (2, 0)
    assert u2.recrawl_days == 365.0


def test_change_rate_ts_tie_broken_by_id(spark):
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1)
    # both captures share one timestamp: order is cap_id, so the
    # comparison sees A -> B (changed); span 0 -> clamp ceiling
    rows = [("u", t0, "B", 1), ("u", t0, "A", 0)]
    r = change_rate(
        _caps(spark, rows), "url", "ts", "fp", id_col="cap_id"
    ).collect()[0]
    assert (r.n_caps, r.n_changed) == (2, 1)
    assert r.lambda_day == 0.0 and r.recrawl_days == 365.0


def test_change_rate_min_clamp(spark):
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1)
    sec = dt.timedelta(seconds=1)
    # flips every second -> lambda enormous -> clamped to 1 hour
    rows = [("u", t0 + i * sec, "AB"[i % 2], i) for i in range(10)]
    r = change_rate(
        _caps(spark, rows), "url", "ts", "fp", id_col="cap_id"
    ).collect()[0]
    assert r.n_changed == 9
    assert math.isclose(r.recrawl_days, 1.0 / 24)
