"""URL-template trap gate (CrawlConfig.template_gate_every).

A synthetic calendar trap: trap.test emits an ever-expanding /cal/<N>
family (each fetched page links to more), while ok.test has a small
/a/<N> section under the deny threshold. With the gate on, the census
flags ('trap.test', '/cal/{N}') at the first refresh and all later
/cal admissions stop; the small family and other hosts are untouched.
The control run (gate off) keeps admitting /cal urls each round —
proving it is the gate, not frontier drain, that bounds the family.
"""

from __future__ import annotations

import datetime
import shutil

from pyspark.sql import functions as F

from searchengine_spark.crawler import frontier as FR
from searchengine_spark.crawler.config import CrawlConfig
from searchengine_spark.crawler.synth import PAGES_SCHEMA, ROBOTS_SCHEMA
from searchengine_spark.crawler.tableio import TableIO

TS = datetime.datetime(2026, 1, 1)


def _html(body: str, links: list[str]) -> bytes:
    # each page needs a DISTINCT body (3-gram Jaccard < J7 threshold)
    # or the content near-dup gate marks it dup and never scrapes its
    # links — which would hide the trap family from the census
    anchors = "\n".join(f'<a href="{u}">x</a>' for u in links)
    return (
        f"<html><head><title>t</title></head><body><p>{body}</p>\n"
        f"{anchors}\n</body></html>"
    ).encode()


def _corpus(spark):
    rows = []
    # trap.test: root fans out to /cal/1..12; every /cal/i links to
    # /cal/(i+12) and /cal/(i+13) — unbounded growth without the gate
    rows.append(
        (
            "https://trap.test",
            TS,
            _html(
                "trap root welcomes endless calendars nightly",
                [f"https://trap.test/cal/{i}" for i in range(1, 13)],
            ),
            "",
            "en",
        )
    )
    for i in range(1, 400):
        rows.append(
            (
                f"https://trap.test/cal/{i}",
                TS,
                _html(
                    f"calendar page number {i} of the endless"
                    f" event series with identifier code{i}",
                    [
                        f"https://trap.test/cal/{i + 12}",
                        f"https://trap.test/cal/{i + 13}",
                    ],
                ),
                "",
                "en",
            )
        )
    # ok.test: root -> /a/1..4, leaves (family stays under min_urls)
    rows.append(
        (
            "https://ok.test",
            TS,
            _html(
                "ok root lists regular stable articles quietly",
                [f"https://ok.test/a/{i}" for i in range(1, 5)],
            ),
            "",
            "en",
        )
    )
    for i in range(1, 5):
        rows.append(
            (
                f"https://ok.test/a/{i}",
                TS,
                _html(
                    f"article essay numbered {i} presents wholly"
                    f" original prose fragment piece{i}",
                    [],
                ),
                "",
                "en",
            )
        )
    pdf = spark.createDataFrame(rows, schema=PAGES_SCHEMA)
    rdf = spark.createDataFrame(
        [("trap.test", [], 0.25), ("ok.test", [], 0.25)],
        schema=ROBOTS_SCHEMA,
    )
    return pdf, rdf, ["https://trap.test", "https://ok.test"]


def _run(spark, tmp_path, gate_every: int, rounds: int = 5):
    pdf, rdf, seeds = _corpus(spark)
    cfg = CrawlConfig(
        seeds=seeds,
        allowed_host_re=r"\.test$",
        template_gate_every=gate_every,
        template_trap_min_urls=8,
        compact_every=2,  # gate must survive compaction rounds
    )
    wh = str(tmp_path / f"wh-gate{gate_every}")
    io = TableIO(spark, wh)
    FR.crawl(spark, io, cfg, pdf, rdf, max_rounds=rounds)
    return io, wh


def _cal_round_added(io) -> dict[int, int]:
    rows = (
        io.read("frontier")
        .filter(F.col("canon_url").like("%/cal/%"))
        .groupBy("round_added")
        .count()
        .collect()
    )
    return {r["round_added"]: r["count"] for r in rows}


def test_gate_bounds_trap_family(spark, tmp_path):
    io, wh = _run(spark, tmp_path, gate_every=2)
    try:
        deny = {
            (r["host"], r["template"])
            for r in io.read("trap_templates").collect()
        }
        # the trap family is flagged; the small /a family is not
        assert ("trap.test", "/cal/{N}") in deny
        assert all(t != "/a/{N}" for _, t in deny)
        by_round = _cal_round_added(io)
        # census refreshes at round 2 (>= 13 distinct /cal urls known);
        # from round 3 on, no /cal url is ever admitted again
        assert max(by_round) <= 2, by_round
        # already-queued /cal urls keep fetching (gate blocks admission,
        # not scheduled work): some were fetched after the refresh
        fetched_late = (
            io.read("frontier")
            .filter(
                F.col("canon_url").like("%/cal/%")
                & (F.col("round_fetched") >= 3)
            )
            .count()
        )
        assert fetched_late > 0
        # ok.test is untouched: all 4 /a urls admitted and fetched
        a_urls = (
            io.read("frontier")
            .filter(F.col("canon_url").like("%ok.test/a/%"))
            .count()
        )
        assert a_urls == 4
    finally:
        shutil.rmtree(wh, ignore_errors=True)


def test_control_without_gate_keeps_growing(spark, tmp_path):
    io, wh = _run(spark, tmp_path, gate_every=0)
    try:
        by_round = _cal_round_added(io)
        # without the gate, new /cal urls are still being admitted in
        # rounds the gated crawl had already shut the family down
        assert max(by_round) >= 4, by_round
        assert io.read("trap_templates") is None
    finally:
        shutil.rmtree(wh, ignore_errors=True)
