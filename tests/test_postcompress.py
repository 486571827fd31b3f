"""Delta-gap varint posting compression (pycore/varint + postcompress)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from searchengine_spark.operators import postcompress as PZ
from searchengine_spark.operators import tfidf as TF
from searchengine_spark.pycore.varint import (
    decode_ids,
    encode_ids,
    encoded_size,
    varint_encode,
    varint_size,
)


def test_varint_known_values():
    assert varint_encode(0) == b"\x00"
    assert varint_encode(1) == b"\x01"
    assert varint_encode(127) == b"\x7f"
    assert varint_encode(128) == b"\x80\x01"
    assert varint_encode(300) == b"\xac\x02"
    assert varint_size(127) == 1
    assert varint_size(128) == 2
    assert varint_size(2**21 - 1) == 3
    assert varint_size(2**21) == 4


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, 2**50), unique=True, max_size=200))
def test_roundtrip_any_ids(ids):
    ids = sorted(ids)
    blob = encode_ids(ids)
    assert decode_ids(blob) == ids
    assert len(blob) == encoded_size(ids)


def test_rejects_unsorted():
    with pytest.raises(ValueError):
        encode_ids([5, 5])
    with pytest.raises(ValueError):
        encode_ids([9, 3])


def test_truncated_blob_rejected():
    blob = encode_ids([0, 1000000])
    with pytest.raises(ValueError):
        decode_ids(blob[:-1])


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (i, "alpha beta " + ("gamma " if i % 3 == 0 else "") + f"tok{i % 7}")
        for i in range(80)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_spark_roundtrip_and_size(spark, corpus):
    tf = TF.term_frequencies(TF.doc_tokens(corpus))
    comp = PZ.compress_postings(tf).localCheckpoint()
    # decode == original distinct (token, doc_id) set
    back = {
        (r["token"], r["doc_id"])
        for r in PZ.decompress_postings(comp).collect()
    }
    orig = {
        (r["token"], r["doc_id"])
        for r in tf.select("token", "doc_id").distinct().collect()
    }
    assert back == orig
    # blob length equals the single-node codec's size arithmetic
    for r in comp.join(
        tf.groupBy("token").agg(
            F.sort_array(F.collect_set("doc_id")).alias("ids")
        ),
        "token",
    ).collect():
        assert r["n_bytes"] == encoded_size(list(r["ids"]))
        assert r["n_docs"] == len(r["ids"])


def test_compression_beats_raw(spark, corpus):
    tf = TF.term_frequencies(TF.doc_tokens(corpus))
    stats = PZ.compression_stats(PZ.compress_postings(tf)).collect()[0]
    # dense gap-1 lists (alpha/beta in every doc) compress ~8x
    assert stats["encoded_bytes"] < stats["raw_bytes"]


def test_no_extra_shuffle(spark, corpus):
    # compression must ride the one groupBy(token) exchange
    tf = TF.term_frequencies(TF.doc_tokens(corpus))
    plan = PZ.compress_postings(tf)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 3  # tf build's own exchanges + token agg


def test_eliasfano_sizes_match_reference_formula(spark):
    from searchengine_spark.operators.postcompress import eliasfano_sizes

    import random

    random.seed(11)
    rows = []
    for t in range(12):
        n = random.randint(1, 180)
        ids = random.sample(range(200), n)
        rows += [(d, f"t{t}") for d in ids]
    df = spark.createDataFrame(rows, "doc_id long, token string")
    got = {
        r.token: (r.n_postings, r.ef_bits, r.ef_bytes)
        for r in eliasfano_sizes(df).collect()
    }
    u = max(d for d, _ in rows) + 1
    from collections import defaultdict

    per = defaultdict(set)
    for d, t in rows:
        per[t].add(d)
    for t, ids in per.items():
        n = len(ids)
        m = u // n
        l = m.bit_length() - 1 if m >= 1 else 0
        bits = n * l + n + (u >> l)
        assert got[t] == (n, bits, (bits + 7) // 8), t


def test_eliasfano_power_of_two_boundaries(spark):
    # u/n landing exactly on powers of two is where a naive
    # floor(log2(double)) goes wrong — assert the repaired expression
    from searchengine_spark.operators.postcompress import eliasfano_sizes

    rows = []
    # token 'a': n=2 postings, universe forced to 256 by token 'pad'
    rows += [(0, "a"), (127, "a")]
    rows += [(255, "pad"), (1, "pad")]
    # token 'b': n=4 -> u/n = 64 = 2^6 exactly
    rows += [(i, "b") for i in (0, 10, 20, 30)]
    df = spark.createDataFrame(rows, "doc_id long, token string")
    got = {r.token: (r.n_postings, r.ef_bits) for r in
           eliasfano_sizes(df).collect()}
    u = 256
    for tok, n in (("a", 2), ("pad", 2), ("b", 4)):
        m = u // n
        l = m.bit_length() - 1
        assert got[tok] == (n, n * l + n + (u >> l)), tok
