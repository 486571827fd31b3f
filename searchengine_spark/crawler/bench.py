"""Crawl throughput benchmarking helpers.

`bench_crawl` is the per-round driver hook (bench.py): a fixed number of
high-quota frontier rounds over a generated corpus, returning wall
seconds. `run_fixed_crawl` is the workload shared with
tools/scaling_bench.py — the SAME job at two parallelism levels is the
sandbox's stand-in for the N → 4N executor scaling criterion
(BASELINE.json: efficiency ≥ 0.8).
"""

from __future__ import annotations

import shutil
import tempfile
import time

from pyspark.sql import SparkSession

from searchengine_spark.crawler import frontier as FR
from searchengine_spark.crawler.config import CrawlConfig
from searchengine_spark.crawler.synth import ALLOWED_HOST_RE, pages_df
from searchengine_spark.crawler.tableio import TableIO


def bench_config(seeds: list[str], n_partitions: int) -> CrawlConfig:
    return CrawlConfig(
        seeds=seeds,
        allowed_host_re=ALLOWED_HOST_RE,
        round_duration=100.0,  # politeness lifted: batches are quota-capped
        max_per_host_per_round=400,
        n_salts=8,
        n_partitions=n_partitions,
        n_bloom_segments=32,
    )


def run_fixed_crawl(
    spark: SparkSession,
    n_pages: int,
    rounds: int,
    n_hosts: int = 24,
    body_scale: int = 4,
    n_partitions: int = 32,
) -> tuple[float, int]:
    """Run `rounds` frontier rounds; returns (wall_sec, urls_fetched).
    Corpus generation and round-0 init are excluded from the timing."""
    pdf, rdf, seeds = pages_df(spark, n_pages, 42, n_hosts, body_scale)
    pdf = pdf.persist()
    pdf.count()  # materialize the corpus before the clock starts
    cfg = bench_config(seeds, n_partitions)
    # shuffle partitions sized to the crawl's explicit partitioning —
    # tiny-batch stages must not fan out to one task per machine core
    spark.conf.set("spark.sql.shuffle.partitions", str(n_partitions))
    wh = tempfile.mkdtemp(prefix="crawlbench-")
    try:
        io = TableIO(spark, wh)
        FR.init_crawl(spark, io, cfg, rdf)
        t0 = time.perf_counter()
        for r in range(1, rounds + 1):
            if FR.run_round(spark, io, cfg, pdf, r) == 0:
                break
        wall = time.perf_counter() - t0
        fetched = (
            io.read("frontier").filter("round_fetched >= 0").count()
        )
        return wall, fetched
    finally:
        pdf.unpersist()
        shutil.rmtree(wh, ignore_errors=True)


def bench_crawl(spark: SparkSession, n_pages: int = 2000, rounds: int = 3) -> float:
    wall, _ = run_fixed_crawl(
        spark, n_pages, rounds, n_hosts=16, body_scale=2, n_partitions=8
    )
    return round(wall, 3)
