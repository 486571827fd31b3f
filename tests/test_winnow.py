"""Winnowing fingerprints (operators/winnow.py) — the SWA/MOSS
local-fingerprint guarantees, hash integrity, and the zero-shuffle
plan shape."""

from __future__ import annotations

import hashlib

from searchengine_spark.operators.winnow import (
    fingerprint_matches,
    winnow_fingerprints,
)
from searchengine_spark.pycore.tokenizer import tokenize

K, W = 3, 4


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_winnow(text: str, k: int = K, w: int = W) -> set[tuple[int, int]]:
    """Independent reference implementation (paper's robust winnowing:
    min of each window, rightmost on ties)."""
    toks = tokenize(text)
    if len(toks) < k:
        return set()
    hl = [_h60(" ".join(toks[i : i + k])) for i in range(len(toks) - k + 1)]
    we = min(w, len(hl))
    out = set()
    for j in range(len(hl) - we + 1):
        win = hl[j : j + we]
        mn = min(win)
        # rightmost index attaining the min
        ridx = max(i for i, h in enumerate(win) if h == mn)
        out.add((j + ridx, mn))
    return out


def test_matches_python_reference(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "pack my box with five dozen liquor jugs"),
        (2, "ab"),  # 1 token < k -> no fingerprints
        (3, "one two three"),  # exactly k tokens -> 1 gram, 1 window
        (4, "the quick brown fox jumps over the lazy dog again and again"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.pos, r.fp)
        for r in winnow_fingerprints(df, k=K, w=W).collect()
    }
    want = {
        (d, p, f) for d, t in rows for (p, f) in _py_winnow(t)
    }
    assert got == want
    assert not any(d == 2 for d, _, _ in got)
    assert sum(1 for d, _, _ in got if d == 3) == 1


def test_shared_run_guarantee(spark):
    # the paper's guarantee: a shared token run of length >= w + k - 1
    # yields at least one shared fingerprint hash
    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens = w+k-1
    rows = [
        (0, "xx yy " + shared + " zz"),
        (1, shared + " aa bb cc dd"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnow_fingerprints(df, k=K, w=W).collect()
    f0 = {r.fp for r in fps if r.doc_id == 0}
    f1 = {r.fp for r in fps if r.doc_id == 1}
    assert f0 & f1


def test_fingerprint_matches_pairs(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta"),
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "totally different words everywhere here now ok yes"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r.doc_a, r.doc_b): r.n_shared
        for r in fingerprint_matches(df, k=K, w=W, min_shared=2).collect()
    }
    assert (0, 1) in pairs
    assert all(a != 2 and b != 2 for (a, b) in pairs)
    # identical docs share ALL their fingerprints
    n_fp = len(_py_winnow(rows[0][1]))
    assert pairs[(0, 1)] == len({f for _, f in _py_winnow(rows[0][1])}) > 0
    assert n_fp >= pairs[(0, 1)]


def test_no_shuffle_in_plan(spark, sf_dir):
    import os

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    plan = winnow_fingerprints(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure per-row selection: zero shuffles
