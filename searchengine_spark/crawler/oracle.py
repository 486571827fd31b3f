"""Single-node oracle crawler — the reference-semantics ground truth.

Implements EXACTLY the normative round semantics of frontier.run_round,
sequentially, with plain dicts/sets, calling the same pycore row-level
functions the Spark UDFs call (extract_text, extract_links, canonicalize,
tokenize, ngram_hash_set, trap_bucket…). Parity between this and the
distributed engine — same crawl order, same URL-seen set, byte-identical
extracted text — is the test surface mandated by BASELINE.json
("matching the reference's crawl ordering and URL-seen set under the
same seed list + politeness budget"); see tests/test_crawler_parity.py.

No Spark imports here (SURVEY.md §5.2).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from urllib.parse import urlparse

from searchengine_spark.crawler.config import CrawlConfig, frontier_score
from searchengine_spark.pycore.ngrams import jaccard, ngram_hash_set
from searchengine_spark.pycore.textextract import extract_links, extract_text
from searchengine_spark.pycore.tokenizer import tokenize
from searchengine_spark.pycore.trapgate import is_trap, last_charset, trap_bucket
from searchengine_spark.pycore.urltools import canonicalize, is_valid_url


@dataclass
class FrontierRec:
    score: float
    status: str  # QUEUED | FETCHED | ERROR
    round_added: int
    round_fetched: int = -1
    error: str | None = None


@dataclass
class OracleState:
    frontier: dict[str, FrontierRec] = field(default_factory=dict)
    seen: set[str] = field(default_factory=set)
    buckets: dict[tuple, list[frozenset[str]]] = field(default_factory=dict)
    fingerprints: list[tuple[str, set[int]]] = field(default_factory=list)
    extracted: dict[str, str] = field(default_factory=dict)
    crawl_log: list[tuple[int, float, str]] = field(default_factory=list)


def _admit(state: OracleState, url: str, score: float, round_no: int) -> None:
    state.frontier[url] = FrontierRec(score, "QUEUED", round_no)
    state.seen.add(url)
    state.buckets.setdefault(trap_bucket(url), []).append(last_charset(url))


def init_oracle(cfg: CrawlConfig) -> OracleState:
    state = OracleState()
    for s in sorted({c for c in (canonicalize(x) for x in cfg.seeds) if c}):
        _admit(state, s, frontier_score(0), 0)
    return state


def run_round_oracle(
    state: OracleState,
    cfg: CrawlConfig,
    pages: dict[str, bytes],
    robots: dict[str, tuple[list[str], float]],
    round_no: int,
) -> int:
    # ---- 1. politeness quota + priority slice per host
    by_host: dict[str, list[str]] = {}
    for url, rec in state.frontier.items():
        if rec.status == "QUEUED":
            by_host.setdefault(urlparse(url).hostname or "", []).append(url)
    batch: list[str] = []
    for host, urls in by_host.items():
        delay = robots.get(host, ([], cfg.default_crawl_delay))[1]
        q = cfg.quota(delay)
        urls.sort(key=lambda u: (-state.frontier[u].score, u))
        batch.extend(urls[:q])
    # global batch order = (score desc, canon_url asc)
    batch.sort(key=lambda u: (-state.frontier[u].score, u))

    # ---- 3/4. fetch + extract + fingerprint
    ok: list[str] = []
    page_fp: dict[str, set[int]] = {}
    page_text: dict[str, str] = {}
    for url in batch:
        rec = state.frontier[url]
        rec.round_fetched = round_no
        state.crawl_log.append((round_no, rec.score, url))
        html = pages.get(url)
        if html is None:
            rec.status = "ERROR"
            rec.error = "HTTP 404"
            continue
        rec.status = "FETCHED"
        text = extract_text(html)
        page_text[url] = text
        page_fp[url] = ngram_hash_set(tokenize(text), cfg.ngram_n)
        ok.append(url)

    # ---- 5. J7 near-dup gates (rule a vs round-start store, rule b
    # vs earlier-ranked rule-a-clean batch pages)
    dup_a = {
        u
        for u in ok
        if any(
            jaccard(page_fp[u], fp) > cfg.ngram_threshold
            for _, fp in state.fingerprints
        )
    }
    clean_a = [u for u in ok if u not in dup_a]
    dup_b: set[str] = set()
    for i, u in enumerate(clean_a):
        for v in clean_a[:i]:
            if jaccard(page_fp[u], page_fp[v]) > cfg.ngram_threshold:
                dup_b.add(u)
                break
    clean = [u for u in clean_a if u not in dup_b]

    # ---- 6. scrape + candidate pipeline (vs round-start seen/buckets)
    cands: set[str] = set()
    for url in clean:
        for raw in extract_links(pages[url], url):
            c = canonicalize(raw)
            if not c or not is_valid_url(c, cfg.allowed_host_re):
                continue
            host = urlparse(c).hostname or ""
            deny = robots.get(host, ([], None))[0]
            path = urlparse(c).path
            if any(path.startswith(p) for p in deny):
                continue
            cands.add(c)
    start_buckets = {k: list(v) for k, v in state.buckets.items()}
    start_seen = set(state.seen)
    new_urls = []
    for c in sorted(cands):
        if c in start_seen:
            continue
        if is_trap(c, start_buckets.get(trap_bucket(c), []), cfg.trap_threshold):
            continue
        new_urls.append(c)

    # ---- 7. state updates
    for u in new_urls:
        _admit(state, u, frontier_score(round_no), round_no)
    for u in clean:
        state.fingerprints.append((u, page_fp[u]))
        state.extracted[u] = page_text[u]
    return sum(1 for r in state.frontier.values() if r.status == "QUEUED")


def crawl_oracle(
    cfg: CrawlConfig,
    pages: dict[str, bytes],
    robots: dict[str, tuple[list[str], float]],
    max_rounds: int = 50,
) -> OracleState:
    state = init_oracle(cfg)
    for r in range(1, max_rounds + 1):
        if run_round_oracle(state, cfg, pages, robots, r) == 0:
            break
    return state


def crawl_order_oracle(state: OracleState) -> list[str]:
    return [
        u
        for _, _, u in sorted(
            state.crawl_log, key=lambda t: (t[0], -t[1], t[2])
        )
    ]


def corpus_dicts(rows, robots_rows):
    """Adapt synth.gen_corpus output to oracle inputs.

    Common-Crawl-style corpora carry multiple captures per url; the
    normative rule (mirrored by frontier.prepare_pages) is
    LATEST-CAPTURE-WINS: max (warc_ts, html bytes) per url — the html
    tie-break makes exactly-equal timestamps deterministic."""
    pages: dict[str, bytes] = {}
    best: dict[str, tuple] = {}
    for url, ts, html, _, _ in rows:
        key = (ts, html)
        if url not in best or key > best[url]:
            best[url] = key
            pages[url] = html
    robots = {h: (deny, delay) for h, deny, delay in robots_rows}
    return pages, robots
