"""Heaps-law vocabulary growth (textstats.vocab_growth) — correctness
of the two-phase prefix sum vs a direct Python scan, bucket-size
invariance, and the no-global-window plan guarantee."""

from __future__ import annotations

from searchengine_spark.operators.textstats import vocab_growth
from searchengine_spark.pycore.tokenizer import tokenize


def _py_curve(rows):
    seen: set[str] = set()
    out = {}
    cum_t = cum_v = 0
    for doc_id, text in sorted(rows):
        toks = tokenize(text)
        new = {t for t in toks if t not in seen}
        seen |= new
        cum_t += len(toks)
        cum_v += len(new)
        out[doc_id] = (len(toks), len(new), cum_t, cum_v)
    return out


ROWS = [
    (0, "a b c a"),
    (1, "b c d"),
    (2, ""),  # zero tokens: counts 0, cum carries through
    (3, "d e e e"),
    (4, "a"),
    (5, "f g h i j"),
]


def test_matches_python_scan(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.new_types, r.cum_tokens, r.cum_types)
        for r in vocab_growth(df, bucket=2).collect()
    }
    assert got == _py_curve(ROWS)


def test_bucket_size_invariance(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    a = sorted(map(tuple, vocab_growth(df, bucket=1).collect()))
    b = sorted(map(tuple, vocab_growth(df, bucket=100).collect()))
    assert a == b


def test_self_sizing_bucket(spark):
    # bucket=None derives bucket = ceil(sqrt(id_span)) from a
    # column-pruned min/max — same result, provably bounded upsweep
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.new_types, r.cum_tokens, r.cum_types)
        for r in vocab_growth(df).collect()
    }
    assert got == _py_curve(ROWS)
    # sparse / offset ids: span = 9000-100+1 → bucket ≈ 95, still exact
    sparse = [(100, "a b"), (5000, "b c"), (9000, "c d e")]
    sdf = spark.createDataFrame(sparse, "doc_id long, text string")
    got2 = {
        r.doc_id: (r.n_tokens, r.new_types, r.cum_tokens, r.cum_types)
        for r in vocab_growth(sdf).collect()
    }
    assert got2 == _py_curve(sparse)


def test_no_global_order_window(spark, sf_dir):
    # every window in the plan is either over the tiny bucket table or
    # partitioned by bucket — no unpartitioned window over the doc rows
    import io
    import os

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    out = vocab_growth(docs, bucket=64)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the only single-partition exchange feeds the bucket-table window
    # (n_docs/bucket rows); doc-row windows are partitioned by b
    assert plan.count("SinglePartition") <= 1
    n = docs.count()
    last = out.orderBy(out.doc_id.desc()).limit(1).collect()[0]
    assert last.cum_types <= last.cum_tokens
    assert out.count() == n
