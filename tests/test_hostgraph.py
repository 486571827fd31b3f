"""Host link-graph tracking (CrawlConfig.track_host_graph) + PageRank
frontier reseed (frontier.reseed_frontier):

- the staged host_graph must equal the single-node recomputation
  (scraped links of non-dup fetched pages, canonicalized, aggregated
  to host granularity) across compaction boundaries,
- reseed rewrites ONLY QUEUED rows' scores, to rank(host)/max_rank,
- the crawl resumes cleanly from a reseeded snapshot.
"""

from __future__ import annotations

import shutil
from collections import Counter
from urllib.parse import urlparse

import pytest
from pyspark.sql import functions as F

from searchengine_spark.crawler import frontier as FR
from searchengine_spark.crawler import oracle as O
from searchengine_spark.crawler.config import CrawlConfig
from searchengine_spark.crawler.synth import ALLOWED_HOST_RE, gen_corpus, pages_df
from searchengine_spark.crawler.tableio import TableIO
from searchengine_spark.operators import linkrank as LR
from searchengine_spark.pycore.textextract import extract_links
from searchengine_spark.pycore.urltools import canonicalize

N_PAGES, SEED, MAX_ROUNDS = 120, 7, 4


@pytest.fixture(scope="module")
def crawled(spark, tmp_path_factory):
    rows, robots_rows, seeds = gen_corpus(N_PAGES, SEED)
    pages, robots = O.corpus_dicts(rows, robots_rows)
    # compact_every=2 so the host_graph parity check crosses at least
    # one compaction (base-squash) boundary
    cfg = CrawlConfig(
        seeds=seeds, allowed_host_re=ALLOWED_HOST_RE,
        track_host_graph=True, compact_every=2,
    )
    pdf, rdf, _ = pages_df(spark, N_PAGES, SEED)
    wh = str(tmp_path_factory.mktemp("wh") / "crawl-hg")
    io = TableIO(spark, wh)
    FR.crawl(spark, io, cfg, pdf, rdf, max_rounds=MAX_ROUNDS)
    oracle = O.crawl_oracle(cfg, pages, robots, max_rounds=MAX_ROUNDS)
    yield io, cfg, pages, oracle, pdf, rdf
    shutil.rmtree(wh, ignore_errors=True)


def _expected_edges(oracle, pages) -> Counter:
    """Single-node recomputation: oracle.extracted holds exactly the
    non-dup fetched pages (dup pages are not scraped); edges are the
    canonicalized outlinks' hosts, multi-edges kept."""
    exp: Counter = Counter()
    for u in oracle.extracted:
        src = (urlparse(u).hostname or "").lower()
        for raw in extract_links(pages[u], u):
            c = canonicalize(raw)
            if not c:
                continue
            h = (urlparse(c).hostname or "").lower()
            if h:
                exp[(src, h)] += 1
    return exp


def test_host_graph_matches_single_node(crawled):
    io, _, pages, oracle, _, _ = crawled
    got = Counter()
    rows = (
        io.read("host_graph")
        .groupBy("src_host", "dst_host")
        .agg(F.sum("n").alias("n"))
        .collect()
    )
    for r in rows:
        got[(r["src_host"], r["dst_host"])] = r["n"]
    exp = _expected_edges(oracle, pages)
    assert got == exp
    assert sum(exp.values()) > 0  # the corpus really has cross-host links


def test_reseed_scores_follow_host_rank_and_crawl_resumes(crawled, spark):
    io, cfg, _, _, pdf, rdf = crawled
    r0 = io.latest_round()
    edges = (
        io.read("host_graph")
        .groupBy("src_host", "dst_host")
        .agg(F.sum("n").alias("n"))
    )
    ranks = {
        r["host"]: r["rank"]
        for r in LR.host_rank(edges, weight_col="n").collect()
    }
    mx = max(ranks.values())
    pre = io.read("frontier").collect()

    r1 = FR.reseed_frontier(spark, io, cfg)
    assert r1 == r0 + 1 and io.latest_round() == r1

    post = {r["canon_url"]: r for r in io.read("frontier").collect()}
    assert len(post) == len(pre)
    n_rescored = 0
    for row in pre:
        prow = post[row["canon_url"]]
        assert prow["status"] == row["status"]
        if row["status"] == "QUEUED" and row["host"] in ranks:
            assert prow["score"] == pytest.approx(
                ranks[row["host"]] / mx, abs=1e-12
            )
            n_rescored += 1
        else:  # FETCHED/ERROR (and unranked hosts) keep historic scores
            assert prow["score"] == row["score"]
    assert n_rescored > 0

    # the crawl picks up from the reseeded snapshot (frontier-only
    # round: every other table falls through to its last snapshot)
    last = FR.crawl(spark, io, cfg, pdf, rdf, max_rounds=r1 + 2)
    assert last > r1
    seen = io.read("url_seen").count()
    assert seen >= len(pre)


def test_reseed_without_tracking_raises(spark, tmp_path_factory):
    rows, robots_rows, seeds = gen_corpus(40, 3)
    cfg = CrawlConfig(seeds=seeds, allowed_host_re=ALLOWED_HOST_RE)
    pdf, rdf, _ = pages_df(spark, 40, 3)
    wh = str(tmp_path_factory.mktemp("wh") / "crawl-nohg")
    io = TableIO(spark, wh)
    try:
        FR.crawl(spark, io, cfg, pdf, rdf, max_rounds=1)
        with pytest.raises(ValueError, match="track_host_graph"):
            FR.reseed_frontier(spark, io, cfg)
    finally:
        shutil.rmtree(wh, ignore_errors=True)
