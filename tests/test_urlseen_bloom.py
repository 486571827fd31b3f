"""J5 URL-seen: bloom fast path must be a pure accelerator — zero false
negatives, and filter_new(bloom) ≡ plain exact anti-join. Plus J7
fingerprint parity: Spark fingerprint_sql ≡ pycore.ngram_hash_set."""

from __future__ import annotations

from pyspark.sql import functions as F

from searchengine_spark.crawler import urlseen
from searchengine_spark.crawler.gates import fingerprint_sql
from searchengine_spark.pycore.ngrams import ngram_hash_set
from searchengine_spark.pycore.tokenizer import tokenize


def _urls(prefix, n):
    return [f"https://h{i % 7}.test/{prefix}/p{i}" for i in range(n)]


def test_bloom_no_false_negatives_and_antijoin_parity(spark):
    seen_urls = _urls("seen", 500)
    cand_urls = _urls("seen", 200) + _urls("new", 300)  # 200 overlap
    seen = spark.createDataFrame(
        [(u,) for u in seen_urls], "canon_url string"
    ).withColumn("url_hash", F.xxhash64("canon_url"))
    cands = spark.createDataFrame(
        [(u,) for u in cand_urls], "canon_url string"
    ).withColumn("url_hash", F.xxhash64("canon_url"))

    segments = urlseen.build_segments(seen, n_segments=8)
    probed = urlseen.probe_maybe_seen(cands, segments, n_segments=8)
    # no false negatives: every truly-seen candidate is maybe_seen
    missed = probed.filter(
        F.col("canon_url").isin(seen_urls) & ~F.col("maybe_seen")
    ).count()
    assert missed == 0

    fast = {
        r["canon_url"]
        for r in urlseen.filter_new(cands, seen, segments, 8).collect()
    }
    exact = {
        r["canon_url"] for r in urlseen.filter_new(cands, seen, None).collect()
    }
    assert fast == exact == set(_urls("new", 300))


def test_fingerprint_sql_matches_pycore(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "spark shuffle partition skew salt merge",
        "a b",
        "solo",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, t string")
    got = {
        r["i"]: set(r["fp"])
        for r in df.selectExpr(
            "i",
            f"{fingerprint_sql('split(t, chr(32))', 3)} as fp",
        ).collect()
    }
    for i, t in enumerate(texts):
        toks = t.split(" ")
        expected = ngram_hash_set(toks, 3)
        assert got[i] == expected, (i, got[i], expected)


def test_tokenize_roundtrip_vs_pycore(spark):
    # belt-and-braces: the fingerprint inputs (tokens) already proven in
    # test_tokenizer.py; assert one combined path here
    from searchengine_spark.functions.text import tokens_sql

    text = "Hello, World! it's 42 <b>bold</b> café naive"
    df = spark.createDataFrame([(text,)], "t string")
    got = df.selectExpr(f"{tokens_sql('t')} as toks").collect()[0]["toks"]
    assert got == tokenize(text)


def test_probe_paths_identical_and_uncompacted_deltas(spark):
    """The broadcast and cogroup probe paths must produce identical
    maybe_seen columns, including over UN-COMPACTED multi-blob segments
    (per-round append deltas OR-ed on the fly)."""
    seen_a = _urls("era1", 300)
    seen_b = _urls("era2", 250)
    cand_urls = _urls("era1", 100) + _urls("era2", 80) + _urls("fresh", 120)

    def _df(urls):
        return spark.createDataFrame(
            [(u,) for u in urls], "canon_url string"
        ).withColumn("url_hash", F.xxhash64("canon_url"))

    # two delta snapshots unioned, never compacted: 2 blobs per segment
    segments = urlseen.build_segments(_df(seen_a), n_segments=8).unionByName(
        urlseen.build_segments(_df(seen_b), n_segments=8)
    )
    cands = _df(cand_urls)
    via_bc = {
        (r["canon_url"], r["maybe_seen"])
        for r in urlseen._probe_broadcast(cands, segments, 8).collect()
    }
    via_cg = {
        (r["canon_url"], r["maybe_seen"])
        for r in urlseen._probe_cogroup(cands, segments, 8).collect()
    }
    assert via_bc == via_cg
    # no false negative across BOTH eras through either path
    seen_set = set(seen_a) | set(seen_b)
    assert all(ms for (u, ms) in via_bc if u in seen_set)
