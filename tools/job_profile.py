"""Per-round Spark-job census for the crawl loop.

Runs the bench crawl (same workload as bench.py's crawl_rounds) and,
after every round, pulls the job list from the Spark UI REST API
(/api/v1/applications/<id>/jobs) to attribute each driver-scheduled job
to the round that submitted it. Prints per-round: job count, total
executor-side wall (sum of job durations), and the round wall — the gap
between the two is driver-serial fixed cost (scheduling + Catalyst +
commit bookkeeping), the quantity the 8->32 scaling rung is bound by.

Usage: python tools/job_profile.py [n_pages] [rounds] [cpus]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _jobs(ui: str) -> list[dict]:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    return json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded"
        )
    ) + json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/jobs?status=failed"
        )
    )


def main() -> int:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from searchengine_spark.session import get_spark
    from searchengine_spark.crawler import frontier as FR
    from searchengine_spark.crawler.bench import bench_config, write_bench_corpus
    from searchengine_spark.crawler.tableio import TableIO

    spark = get_spark(
        "jobprofile",
        master=f"local[{cpus}]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "true"},
    )
    ui = spark.sparkContext.uiWebUrl
    assert ui, "Spark UI must be enabled for the REST job census"

    corpus_dir = tempfile.mkdtemp(prefix="jobprof-corpus-")
    wh = tempfile.mkdtemp(prefix="jobprof-wh-")
    try:
        pages_path = write_bench_corpus(
            spark, os.path.join(corpus_dir, "pages"), n_pages=n_pages
        )
        pdf = FR.prepare_pages(spark.read.parquet(pages_path), 8)
        pdf.count()
        rdf = spark.read.parquet(pages_path + "_robots")
        seeds = [f"https://h{i}.test" for i in range(16)]
        cfg = bench_config(seeds, n_partitions=8)
        cfg.max_per_host_per_round = 400
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        io = TableIO(spark, wh)
        FR.init_crawl(spark, io, cfg, rdf)
        seen_ids = {j["jobId"] for j in _jobs(ui)}
        remaining = None
        for r in range(1, rounds + 1):
            t0 = time.perf_counter()
            remaining = FR.run_round(spark, io, cfg, pdf, r, prev_queued=remaining)
            wall = time.perf_counter() - t0
            time.sleep(0.3)  # let the UI store flush
            jobs = [j for j in _jobs(ui) if j["jobId"] not in seen_ids]
            seen_ids.update(j["jobId"] for j in jobs)
            from datetime import datetime

            def _dur(j: dict) -> float:
                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                try:
                    a = datetime.strptime(j["submissionTime"], fmt)
                    b = datetime.strptime(j["completionTime"], fmt)
                    return (b - a).total_seconds()
                except Exception:
                    return 0.0

            total_job = sum(_dur(j) for j in jobs)
            print(
                f"round {r}: wall={wall:.2f}s jobs={len(jobs)} "
                f"job-time={total_job:.2f}s driver-gap={wall - total_job:.2f}s "
                f"remaining={remaining}"
            )
            for j in sorted(jobs, key=lambda x: x["jobId"]):
                desc = (j.get("description") or j.get("name") or "")[:100]
                print(f"    job {j['jobId']:>4} {_dur(j):6.2f}s  {desc}")
            if remaining == 0:
                break
    finally:
        shutil.rmtree(corpus_dir, ignore_errors=True)
        shutil.rmtree(wh, ignore_errors=True)
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
