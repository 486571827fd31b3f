"""J5 URL-seen, cuckoo backend: the fingerprint fast path must be a
pure accelerator — zero false negatives, filter_new ≡ plain exact
anti-join, both probe paths identical — plus the cuckoo-only deletion
surface (expire exact; delete_fps best-effort) and a full frontier run
on seen_backend="cuckoo" matching the single-node crawl oracle."""

from __future__ import annotations

import shutil

import numpy as np
from pyspark.sql import functions as F

from searchengine_spark.crawler import cuckooseen as C


def _urls(prefix, n):
    return [f"https://h{i % 7}.test/{prefix}/p{i}" for i in range(n)]


def _hashed(spark, urls):
    return spark.createDataFrame(
        [(u,) for u in urls], "canon_url string"
    ).withColumn("url_hash", F.xxhash64("canon_url"))


def test_bulk_insert_eviction_and_stash_bounded():
    """numpy core: at the 0.84 design load eviction absorbs everything
    (empty stash); at 0.95 the stash stays tiny; zero false negatives
    and sub-0.1% FPR either way."""
    rng = np.random.RandomState(7)
    nb = 1 << 12
    for load, stash_cap in ((0.84, 0.0), (0.95, 0.01)):
        n = int(load * 4 * nb)
        keys = rng.randint(-(2**62), 2**62, size=n, dtype=np.int64)
        table, stash, _ = C._build_arrays(keys, nb)
        assert stash.size <= stash_cap * n
        assert C._probe_arrays(table, stash, keys, nb).all()
        other = rng.randint(-(2**62), 2**62, size=n, dtype=np.int64)
        other = other[~np.isin(other, keys)]
        assert C._probe_arrays(table, stash, other, nb).mean() < 1e-3


def test_cuckoo_no_false_negatives_and_antijoin_parity(spark):
    seen_urls = _urls("seen", 500)
    cand_urls = _urls("seen", 200) + _urls("new", 300)  # 200 overlap
    seen = _hashed(spark, seen_urls)
    cands = _hashed(spark, cand_urls)

    segments = C.build_segments(seen, n_segments=8, m_bits=256)
    probed = C.probe_maybe_seen(cands, segments, n_segments=8)
    missed = probed.filter(
        F.col("canon_url").isin(seen_urls) & ~F.col("maybe_seen")
    ).count()
    assert missed == 0

    fast = {
        r["canon_url"] for r in C.filter_new(cands, seen, segments, 8).collect()
    }
    exact = {r["canon_url"] for r in C.filter_new(cands, seen, None).collect()}
    assert fast == exact == set(_urls("new", 300))


def test_cuckoo_probe_paths_identical(spark):
    """broadcast (small configured size) vs cogroup (forced) probes
    produce the same maybe_seen column, including over UN-COMPACTED
    multi-blob segments."""
    seen_a = _hashed(spark, _urls("a", 400))
    seen_b = _hashed(spark, _urls("b", 300))
    cands = _hashed(spark, _urls("a", 100) + _urls("b", 50) + _urls("c", 200))
    multi = C.build_segments(seen_a, 8, 256).unionByName(
        C.build_segments(seen_b, 8, 256)
    )
    bcast = {
        (r["canon_url"], r["maybe_seen"])
        for r in C.probe_maybe_seen(cands, multi, 8, total_bloom_bytes=1).collect()
    }
    cogrp = {
        (r["canon_url"], r["maybe_seen"])
        for r in C.probe_maybe_seen(
            cands, multi, 8, total_bloom_bytes=C.BROADCAST_MAX_BYTES + 1
        ).collect()
    }
    assert bcast == cogrp


def test_cuckoo_merge_segments_equiv(spark):
    """compacted (merged) segments admit exactly the same rows as the
    un-compacted delta pile and as a fresh build over the union."""
    seen_a = _hashed(spark, _urls("a", 400))
    seen_b = _hashed(spark, _urls("b", 300))
    both = seen_a.unionByName(seen_b)
    cands = _hashed(spark, _urls("a", 100) + _urls("b", 50) + _urls("c", 200))
    deltas = C.build_segments(seen_a, 8, 256).unionByName(
        C.build_segments(seen_b, 8, 256)
    )
    merged = C.merge_segments(
        C.build_segments(seen_a, 8, 256), C.build_segments(seen_b, 8, 256)
    )
    assert merged.count() <= 8  # one blob per segment after compaction
    want = {r["canon_url"] for r in C.filter_new(cands, both, None).collect()}
    for segs in (deltas, merged, C.build_segments(both, 8, 256)):
        got = {r["canon_url"] for r in C.filter_new(cands, both, segs, 8).collect()}
        assert got == want == set(_urls("c", 200))


def test_cuckoo_expire_exact(spark):
    """expire() removes keys from BOTH the exact table and the filter by
    rebuilding only touched segments: expired urls re-admit, kept urls
    still dedup, and the post-expiry filter has zero false negatives."""
    seen_urls = _urls("seen", 600)
    expired_urls = seen_urls[::3]
    kept_urls = [u for u in seen_urls if u not in set(expired_urls)]
    seen = _hashed(spark, seen_urls)
    segments = C.build_segments(seen, 8, 256)
    seen2, segs2 = C.expire(seen, segments, _hashed(spark, expired_urls), 8, 256)

    cands = _hashed(spark, seen_urls + _urls("new", 100))
    got = {r["canon_url"] for r in C.filter_new(cands, seen2, segs2, 8).collect()}
    assert got == set(expired_urls) | set(_urls("new", 100))
    # no false negatives post-rebuild: every kept url still probes seen
    probed = C.probe_maybe_seen(_hashed(spark, kept_urls), segs2, 8)
    assert probed.filter(~F.col("maybe_seen")).count() == 0


def test_cuckoo_delete_fps_best_effort(spark):
    """in-place deletion (cheap path): deleted keys stop probing seen;
    collateral fingerprint-collision false negatives on kept keys are
    bounded (documented ~1.2e-4/delete; deterministic inputs → a fixed,
    tiny count here)."""
    seen_urls = _urls("seen", 600)
    expired_urls = seen_urls[::3]
    kept_urls = [u for u in seen_urls if u not in set(expired_urls)]
    seen = _hashed(spark, seen_urls)
    segments = C.build_segments(seen, 8, 256)
    segs2 = C.delete_fps(segments, _hashed(spark, expired_urls), 8)
    assert segs2.count() == segments.count()

    deleted_probe = C.probe_maybe_seen(_hashed(spark, expired_urls), segs2, 8)
    # deleted keys probe not-seen (modulo fp collisions with still-stored
    # keys — none at this size/seed)
    assert deleted_probe.filter(F.col("maybe_seen")).count() <= 2
    kept_probe = C.probe_maybe_seen(_hashed(spark, kept_urls), segs2, 8)
    assert kept_probe.filter(~F.col("maybe_seen")).count() <= 2


def test_cuckoo_crawl_matches_oracle(spark, tmp_path):
    """Full frontier loop on seen_backend="cuckoo" (compacting every 2
    rounds so the merge path runs in-loop) reproduces the single-node
    oracle's crawl order and URL-seen set — the same bar the bloom
    backend is held to in test_crawler_parity.py."""
    from searchengine_spark.crawler import frontier as FR
    from searchengine_spark.crawler import oracle as O
    from searchengine_spark.crawler.config import CrawlConfig
    from searchengine_spark.crawler.synth import (
        ALLOWED_HOST_RE,
        gen_corpus,
        pages_df,
    )
    from searchengine_spark.crawler.tableio import TableIO

    n_pages, seed, max_rounds = 80, 42, 4
    rows, robots_rows, seeds = gen_corpus(n_pages, seed)
    pages, robots = O.corpus_dicts(rows, robots_rows)
    cfg = CrawlConfig(
        seeds=seeds,
        allowed_host_re=ALLOWED_HOST_RE,
        seen_backend="cuckoo",
        cuckoo_n_buckets=64,
        compact_every=2,
    )
    ostate = O.crawl_oracle(cfg, pages, robots, max_rounds=max_rounds)

    pdf, rdf, _ = pages_df(spark, n_pages, seed)
    wh = str(tmp_path / "crawl-cuckoo")
    io = TableIO(spark, wh)
    try:
        FR.crawl(spark, io, cfg, pdf, rdf, max_rounds=max_rounds)
        assert FR.crawl_order(io) == O.crawl_order_oracle(ostate)
        seen = {r["canon_url"] for r in io.read("url_seen").collect()}
        assert seen == ostate.seen
    finally:
        shutil.rmtree(wh, ignore_errors=True)
