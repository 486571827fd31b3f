"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline set (kept in sync with __spark_entry__.queries()):
  * index_build   — full tf-idf postings build over documents (E1 DAG:
                    tokenize → tf → df → idf → join), materialized count.
  * dnf_search    — ranked OR-of-ANDs boolean query over those postings
                    (E2 DAG) against the persisted index.
  * window_quota  — per-key ordered quota slice over events (T3 shape).
  * crawl_rounds  — frontier micro-batch rounds over a synthetic pages
                    graph (ST1-ST5), if the crawler package is present.

MULTI-TRIAL: each headline runs SPARK_GRAFT_BENCH_TRIALS times
(default 3); `queries` reports per-query MEDIANS and `spread` the
[min, max] envelope. This sandbox's shared host swings ±25% minute to
minute (BENCH/BASELINE.md §1 busy-loop evidence), so a single-trial
number inherits host noise — medians are the comparable statistic.
`value` is the sum of medians.

Scaling evidence for BASELINE.json's two-cluster-size criterion is the
separate tools/scaling_bench.py (local[8] vs local[32]); this file is the
per-round driver hook and runs at one parallelism level.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
TRIALS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3")))


def main() -> int:
    from searchengine_spark.session import get_spark

    spark = get_spark(
        "bench", master=f"local[{CPUS}]", shuffle_partitions=max(8, CPUS)
    )
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from searchengine_spark.operators import query as Q
    from searchengine_spark.operators import tfidf as TF

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    timings: dict[str, float] = {}  # per-query median
    spread: dict[str, list[float]] = {}  # per-query [min, max]

    def record(name: str, obs: list[float]) -> None:
        s = sorted(obs)
        timings[name] = s[len(s) // 2]
        spread[name] = [s[0], s[-1]]

    def trials(name, fn) -> None:
        obs = []
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            fn()
            obs.append(round(time.perf_counter() - t0, 3))
        record(name, obs)

    # -- index_build: materialize the full postings index (fresh persist
    #    per trial — a cached re-count would measure the cache, not the
    #    build). The last trial's index stays persisted for dnf_search,
    #    as a real deployment would keep it.
    obs = []
    postings = None
    for _ in range(TRIALS):
        if postings is not None:
            postings.unpersist()
        postings = TF.build_postings(docs).persist()
        t0 = time.perf_counter()
        postings.count()
        obs.append(round(time.perf_counter() - t0, 3))
    record("index_build", obs)

    # -- dnf_search: ranked boolean retrieval over the persisted index.
    trials(
        "dnf_search",
        lambda: Q.search(postings, "spark AND window OR fast the", k=5).collect(),
    )

    # -- window_quota: T3-shaped per-key priority slice over events.
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    trials(
        "window_quota",
        lambda: ev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .count(),
    )
    postings.unpersist()

    # -- crawl_rounds: synthetic pages graph + frontier rounds (crawler
    #    core). The corpus is generated to parquet ONCE and shared by
    #    all trials (generation is driver-side Python, not workload).
    try:
        from searchengine_spark.crawler.bench import bench_crawl, write_bench_corpus

        corpus_dir = tempfile.mkdtemp(prefix="bench-crawl-corpus-")
        try:
            pages_path = write_bench_corpus(
                spark, os.path.join(corpus_dir, "pages"), n_pages=2000
            )
            trials(
                "crawl_rounds",
                lambda: bench_crawl(
                    spark, n_pages=2000, rounds=4, pages_path=pages_path
                ),
            )
        finally:
            shutil.rmtree(corpus_dir, ignore_errors=True)
    except ImportError:
        pass

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "spread": spread,
                "trials": TRIALS,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cpus": CPUS,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
