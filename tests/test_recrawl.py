"""Freshness recrawl (frontier.recrawl_frontier):

- requeue mode: stale FETCHED rows flip to QUEUED, their fingerprints
  are purged, and the continued crawl re-fetches them (extracted gains
  a second history row per refetched url),
- prune mode (cuckoo backend): stale rows leave the frontier AND the
  seen backend (exact expiry), then re-enter only via link rediscovery,
- bloom backend rejects prune mode.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from searchengine_spark.crawler import frontier as FR
from searchengine_spark.crawler.config import CrawlConfig
from searchengine_spark.crawler.synth import ALLOWED_HOST_RE, gen_corpus, pages_df
from searchengine_spark.crawler.tableio import TableIO

N_PAGES, SEED = 100, 11


def _crawl(spark, tmp_path, cfg, max_rounds):
    pdf, rdf, _ = pages_df(spark, N_PAGES, SEED)
    io = TableIO(spark, str(tmp_path / "wh"))
    FR.crawl(spark, io, cfg, pdf, rdf, max_rounds=max_rounds)
    return io, pdf, rdf


def test_requeue_refetches_stale(spark, tmp_path):
    _, _, seeds = gen_corpus(N_PAGES, SEED)
    cfg = CrawlConfig(seeds=seeds, allowed_host_re=ALLOWED_HOST_RE)
    io, pdf, rdf = _crawl(spark, tmp_path, cfg, max_rounds=6)
    try:
        r0 = io.latest_round()
        pre = {r["canon_url"]: r for r in io.read("frontier").collect()}
        stale = {
            u
            for u, row in pre.items()
            if row["status"] == "FETCHED" and row["round_fetched"] <= r0 - 3
        }
        assert stale  # the corpus yields multi-round fetch history
        n_extracted0 = io.read("extracted").count()

        r1 = FR.recrawl_frontier(spark, io, cfg, max_age_rounds=3, score=0.9)
        assert r1 == r0 + 1

        post = {r["canon_url"]: r for r in io.read("frontier").collect()}
        for u, row in post.items():
            if u in stale:
                assert row["status"] == "QUEUED"
                assert row["score"] == 0.9 and row["round_fetched"] == -1
            else:  # untouched rows keep their state
                assert row["status"] == pre[u]["status"]
                assert row["score"] == pre[u]["score"]
        # fingerprints of stale urls purged, others kept
        fp_urls = {r["canon_url"] for r in io.read("fingerprints").collect()}
        assert not (fp_urls & stale)

        # continued crawl re-fetches every stale url (identical content
        # is NOT self-dup-gated: its old fingerprint is gone)
        FR.crawl(spark, io, cfg, pdf, rdf, max_rounds=r1 + 4)
        after = {r["canon_url"]: r for r in io.read("frontier").collect()}
        for u in stale:
            assert after[u]["status"] == "FETCHED"
            assert after[u]["round_fetched"] > r1
        # extracted is a history log: refetches append fresh rows (not
        # one per stale url — refetched mirror pages are dup-gated
        # intra-batch against their originals, by design)
        ex = io.read("extracted")
        assert ex.count() > n_extracted0
        refreshed = {
            r["canon_url"]
            for r in ex.filter(F.col("round_fetched") > r1)
            .select("canon_url")
            .collect()
        }
        assert refreshed and refreshed <= stale
    finally:
        shutil.rmtree(str(tmp_path / "wh"), ignore_errors=True)


def test_prune_expires_and_rediscovers(spark, tmp_path):
    _, _, seeds = gen_corpus(N_PAGES, SEED)
    cfg = CrawlConfig(
        seeds=seeds, allowed_host_re=ALLOWED_HOST_RE, seen_backend="cuckoo"
    )
    # stop mid-crawl so QUEUED pages remain to drive rediscovery
    io, pdf, rdf = _crawl(spark, tmp_path, cfg, max_rounds=3)
    try:
        r0 = io.latest_round()
        pre = io.read("frontier").collect()
        stale = {
            r["canon_url"]
            for r in pre
            if r["status"] == "FETCHED" and r["round_fetched"] <= r0 - 2
        }
        assert stale
        seen0 = {r["canon_url"] for r in io.read("url_seen").collect()}

        r1 = FR.recrawl_frontier(
            spark, io, cfg, max_age_rounds=2, mode="prune"
        )
        assert r1 == r0 + 1
        post_urls = {r["canon_url"] for r in io.read("frontier").collect()}
        assert not (post_urls & stale) and len(post_urls) == len(pre) - len(stale)
        seen1 = {r["canon_url"] for r in io.read("url_seen").collect()}
        assert seen1 == seen0 - stale

        # the expired filter segments agree with the exact table: pruned
        # urls pass the seen-filter as definitely-new candidates
        FR.crawl(spark, io, cfg, pdf, rdf, max_rounds=r1 + 4)
        front = {r["canon_url"]: r for r in io.read("frontier").collect()}
        readmitted = set(front) & stale
        assert readmitted  # links from the remaining queue rediscover them
        for u in readmitted:
            assert front[u]["round_added"] > r1
        # no duplicate frontier rows after rediscovery
        n = io.read("frontier").count()
        assert n == io.read("frontier").select("canon_url").distinct().count()
    finally:
        shutil.rmtree(str(tmp_path / "wh"), ignore_errors=True)


def test_prune_requires_cuckoo(spark, tmp_path):
    _, _, seeds = gen_corpus(40, 3)
    cfg = CrawlConfig(seeds=seeds, allowed_host_re=ALLOWED_HOST_RE)
    pdf, rdf, _ = pages_df(spark, 40, 3)
    io = TableIO(spark, str(tmp_path / "wh"))
    try:
        FR.crawl(spark, io, cfg, pdf, rdf, max_rounds=3)
        with pytest.raises(ValueError, match="cuckoo"):
            FR.recrawl_frontier(spark, io, cfg, max_age_rounds=1, mode="prune")
        # no-op when nothing is stale: no round consumed
        r = io.latest_round()
        assert FR.recrawl_frontier(spark, io, cfg, max_age_rounds=99) == r
    finally:
        shutil.rmtree(str(tmp_path / "wh"), ignore_errors=True)


def test_crawl_delta_statuses(spark):
    from searchengine_spark.operators.recrawl import crawl_delta, delta_census

    old = spark.createDataFrame(
        [("https://a.test/1", "f1"), ("https://a.test/2", "f2"),
         ("https://b.test/1", "f3")],
        "url string, fp string",
    )
    new = spark.createDataFrame(
        [("https://a.test/1", "f1"),        # same
         ("https://a.test/2", "CHANGED"),   # changed
         ("https://b.test/9", "f9")],       # added; b.test/1 removed
        "url string, fp string",
    )
    got = {r.url: r.status for r in crawl_delta(old, new).collect()}
    assert got == {
        "https://a.test/1": "same",
        "https://a.test/2": "changed",
        "https://b.test/1": "removed",
        "https://b.test/9": "added",
    }
    cen = {(r.host, r.status): r.n_urls
           for r in delta_census(old, new).collect()}
    assert cen == {("a.test", "same"): 1, ("a.test", "changed"): 1,
                   ("b.test", "removed"): 1, ("b.test", "added"): 1}
