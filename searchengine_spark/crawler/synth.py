"""Deterministic synthetic Common-Crawl-style pages corpus (FIXTURES.md §1).

Generates the `pages` table exactly per BASELINE.json input_hint —
(url:string, warc_ts:timestamp, html:binary, text:string, lang:string) —
as a seeded web graph exercising every crawler code path:

  * Zipf host skew mirroring the measured reference corpus (top host
    ≈55% of pages — SURVEY.md §0), so the salted-repartition path is hot;
  * a calendar trap family (next-day chains whose urls differ only in
    the date — reference link_similarity.py:203-206 golden case);
  * near-duplicate content pairs (3-gram Jaccard > 0.65) and exact
    mirrors under different urls (J7 gate);
  * link variants of the same page (#fragment, trailing '/', relative
    paths) exercising canonicalization (F8);
  * invalid links (binary extensions, mailto:, off-domain) for P4;
  * robots-denied subtrees (/private) + per-host crawl delays (J8/ST2);
  * dangling links (404 fetch → ERROR rows, ST5).

`text` is the byte-exact output of the normative extractor on `html`
(the golden column for the per-url byte-identical invariant). No
wall-clock, no Python hash() — fully reproducible for any (n_pages, seed).
"""

from __future__ import annotations

import datetime as dt
import random

from searchengine_spark.pycore.textextract import extract_text

HOST_WEIGHTS = [0.55, 0.14, 0.09, 0.07, 0.05, 0.04, 0.03, 0.03]
ALLOWED_HOST_RE = r"\.test$"

_CORE_VOCAB = (
    "spark shuffle frontier crawl index token window fast dup page host "
    "query engine data scale batch round score queue bloom filter robots "
    "delay fetch parse text link graph node edge depth rank seed hash "
    "partition skew salt merge sort join scan agg"
).split()
# Zipf-ish open vocabulary: frequent core head + a long rare tail, so
# 3-gram multiplicity behaves like real web text (a 44-word vocabulary
# makes every gram ~10×-shared, which no real corpus does).
_VOCAB = _CORE_VOCAB + [f"w{i}" for i in range(4000)]


def _word(rng: random.Random) -> str:
    return (
        rng.choice(_CORE_VOCAB) if rng.random() < 0.5 else rng.choice(_VOCAB)
    )

_EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def _para(rng: random.Random, n: int) -> str:
    return " ".join(_word(rng) for _ in range(n))


def _page_html(
    rng: random.Random, title: str, body: str, links: list[tuple[str, str]]
) -> str:
    anchors = "\n".join(f'<a href="{href}">{txt}</a>' for href, txt in links)
    return (
        "<!DOCTYPE html>\n<html>\n<head>\n"
        f"<title>{title}</title>\n"
        "<style>body { color: #222; }</style>\n"
        "<script>var x = 1 &amp;&amp; 2;</script>\n"
        "</head>\n<body>\n"
        f"<h1>{title}</h1>\n"
        "<!-- generated fixture -->\n"
        f"<p>{body}</p>\n"
        f"<p><b>{rng.choice(_CORE_VOCAB)}</b> &amp; <em>{rng.choice(_CORE_VOCAB)}</em></p>\n"
        f"{anchors}\n"
        "</body>\n</html>\n"
    )


def gen_corpus(
    n_pages: int = 500,
    seed: int = 42,
    n_hosts: int | None = None,
    body_scale: int = 1,
    body_repeat: int = 1,
    with_text: bool = True,
    stale_captures: int = 0,
):
    """Returns (pages, robots, seeds):
    pages:  list[(url, warc_ts, html: bytes, text, lang)]
    robots: list[(host, deny_prefixes: list[str], crawl_delay: float)]
    seeds:  list[url]
    All urls in `pages` are already canonical (fetch joins on canon_url).

    n_hosts=None uses the reference-skew HOST_WEIGHTS (8 hosts, 55% on
    the top host); an explicit n_hosts uses a Zipf(1.05) weight curve
    (bench-scale host fan-out). body_scale multiplies page body length
    (bench corpora use heavier pages so extraction dominates overhead).
    """
    rng = random.Random(seed)

    def body(n: int) -> str:
        # body_repeat tiles one random base paragraph: page bytes (and
        # extraction/tokenize work) scale with repeat while the distinct
        # n-gram set stays bounded — heavy pages, cheap generation
        base = _para(rng, n)
        return " ".join([base] * body_repeat) if body_repeat > 1 else base

    if n_hosts is None:
        weights = HOST_WEIGHTS
    else:
        raw = [1.0 / (i + 1) ** 1.05 for i in range(n_hosts)]
        tot = sum(raw)
        weights = [w / tot for w in raw]
    hosts = [f"h{i}.test" for i in range(len(weights))]
    counts = [max(3, int(n_pages * w)) for w in weights]

    pages: dict[str, str] = {}  # canon_url -> html

    def root(h: str) -> str:
        return f"https://{h}"

    for hi, (host, cnt) in enumerate(zip(hosts, counts)):
        n_secs = max(1, min(6, cnt // 8))
        sec_pages: dict[int, list[str]] = {}
        remaining = cnt - 1 - n_secs  # minus root and section indexes
        per_sec = max(1, remaining // n_secs)
        for s in range(n_secs):
            sec_pages[s] = [
                f"{root(host)}/sec{s}/p{i}" for i in range(per_sec)
            ]

        # root: links to sections (relative), other hosts' roots, and one
        # of each invalid-link flavor
        root_links: list[tuple[str, str]] = [
            (f"/sec{s}/", f"section {s}") for s in range(n_secs)
        ]
        for other in hosts:
            if other != host and rng.random() < 0.6:
                root_links.append((root(other), f"visit {other}"))
        root_links += [
            ("/assets/logo.png", "logo"),
            ("/files/report.pdf", "report"),
            ("mailto:admin@" + host, "mail"),
            ("https://outside.example.com/x", "offsite"),
            ("/private/admin", "admin"),
        ]
        pages[root(host)] = _page_html(
            rng, f"{host} home", body(60 * body_scale), root_links
        )

        # section index pages (canonical url has no trailing slash)
        for s in range(n_secs):
            sl = []
            for i, purl in enumerate(sec_pages[s]):
                # mix of relative, absolute, fragment and trailing-slash
                # variants — all canonicalize to purl
                style = rng.randrange(4)
                # relative against base https://host/sec{s} (dir = "/")
                rel = f"sec{s}/p{i}"
                if style == 0:
                    sl.append((rel, f"page {i}"))
                elif style == 1:
                    sl.append((purl, f"page {i}"))
                elif style == 2:
                    sl.append((purl + "#section", f"page {i}"))
                else:
                    sl.append((purl + "/", f"page {i}"))
            if s + 1 < n_secs:
                sl.append((f"/sec{s + 1}/", "next section"))
            sl.append(("/", "home"))
            pages[f"{root(host)}/sec{s}"] = _page_html(
                rng, f"{host} sec{s}", body(40 * body_scale), sl
            )

        # leaf pages
        for s in range(n_secs):
            plist = sec_pages[s]
            for i, purl in enumerate(plist):
                links = [("../", "up"), ("/", "home")]
                if i + 1 < len(plist):
                    links.append((f"p{i + 1}", "next"))
                if rng.random() < 0.1:
                    links.append((root(rng.choice(hosts)), "elsewhere"))
                if rng.random() < 0.05:
                    links.append((f"/missing/x{hi}-{s}-{i}", "dangling"))
                pages[purl] = _page_html(
                    rng, f"{host} sec{s} p{i}", body(rng.randrange(40, 120) * body_scale), links
                )

    h0 = hosts[0]
    # ---- calendar trap on the hot host: /cal → day-01 → day-02 → ...
    # urls differ only in the date (same dir, same path length, char-set
    # Jaccard of last segments ≥ .85) → J6 must cut the chain at day 2.
    cal_days = [f"{root(h0)}/cal/day-2024-01-{d:02d}" for d in range(1, 15)]
    pages[f"{root(h0)}/cal"] = _page_html(
        rng, "calendar", _para(rng, 30), [(cal_days[0], "day 1"), ("/", "home")]
    )
    for di, curl in enumerate(cal_days):
        nxt = (
            [(cal_days[di + 1], "next day")] if di + 1 < len(cal_days) else []
        )
        pages[curl] = _page_html(
            rng, f"events day {di + 1}", _para(rng, 25), nxt + [("/cal", "cal")]
        )
    # link /cal from h0 root by appending an anchor
    pages[root(h0)] = pages[root(h0)].replace(
        "</body>", '<a href="/cal">calendar</a>\n</body>'
    )

    # ---- near-duplicate pair: /dup/near is ~95% the text of sec0/p0 and
    # holds the ONLY link to /dup/orphan (unreachable iff J7 fires).
    donor_url = f"{root(h0)}/sec0/p0"
    donor_body = body(200 * body_scale)
    pages[donor_url] = _page_html(
        rng, "donor", donor_body, [("/dup/near", "shadow"), ("/", "home")]
    )
    near_body = donor_body + " " + _para(rng, 6)
    pages[f"{root(h0)}/dup/near"] = _page_html(
        rng, "donor", near_body, [("/dup/orphan", "hidden"), ("/", "home")]
    )
    pages[f"{root(h0)}/dup/orphan"] = _page_html(
        rng, "orphan", _para(rng, 30), [("/", "home")]
    )
    # ---- exact mirror under a different url (identical html bytes)
    pages[f"{root(h0)}/mirror/p0"] = pages[donor_url]
    pages[f"{root(h0)}/sec0"] = pages[f"{root(h0)}/sec0"].replace(
        "</body>", '<a href="/mirror/p0">mirror</a>\n</body>'
    )

    # ---- robots-denied subtree (pages exist; crawler must never fetch)
    for i in range(3):
        pages[f"{root(h0)}/private/admin" + ("" if i == 0 else f"/x{i}")] = (
            _page_html(rng, "private", _para(rng, 20), [("/", "home")])
        )

    robots = []
    for hi, host in enumerate(hosts):
        delay = 0.25 if hi == 0 else (1.0 if hi == len(hosts) - 1 else 0.5)
        robots.append((host, ["/private"], delay))

    seeds = [root(hosts[0]), root(hosts[1]), root(hosts[2])]

    rows = []
    for i, (url, html) in enumerate(sorted(pages.items())):
        html_b = html.encode("utf-8")
        rows.append(
            (
                url,
                _EPOCH + dt.timedelta(seconds=i),
                html_b,
                # golden column for byte-parity tests; bench corpora skip
                # it (single-threaded driver python, unused by the crawl)
                extract_text(html_b) if with_text else None,
                "en",
            )
        )
    # Common-Crawl-style multi-capture corpus: every 3rd url also gets
    # `stale_captures` OLDER captures with different html — the crawl
    # result must be identical to the single-capture corpus because
    # prepare_pages / corpus_dicts apply latest-capture-wins
    if stale_captures > 0:
        stale_rows = []
        for i, (url, ts, _html, _text, lang) in enumerate(rows):
            if i % 3 != 0:
                continue
            for c in range(1, stale_captures + 1):
                old = _page_html(
                    rng, "stale capture", _para(rng, 12), [("/", "home")]
                ).encode("utf-8")
                stale_rows.append(
                    (
                        url,
                        ts - dt.timedelta(days=c),
                        old,
                        extract_text(old) if with_text else None,
                        lang,
                    )
                )
        rows += stale_rows
    return rows, robots, seeds


PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)
ROBOTS_SCHEMA = "host string, deny_prefixes array<string>, crawl_delay double"


def pages_df(
    spark, n_pages: int = 500, seed: int = 42,
    n_hosts: int | None = None, body_scale: int = 1, body_repeat: int = 1,
    stale_captures: int = 0,
):
    """(pages_df, robots_df, seeds) as Spark DataFrames."""
    rows, robots, seeds = gen_corpus(
        n_pages, seed, n_hosts, body_scale, body_repeat,
        stale_captures=stale_captures,
    )
    pdf = spark.createDataFrame(rows, schema=PAGES_SCHEMA)
    rdf = spark.createDataFrame(robots, schema=ROBOTS_SCHEMA)
    return pdf, rdf, seeds
