"""Two-cluster-size scaling evidence (BASELINE.json north rule).

The ≥0.8 throughput-scaling-efficiency criterion is defined over N → 4N
executors; this sandbox has one machine, so the same fixed crawl
workload is run at two local parallelism levels (default local[8] vs
local[32] — 4× cores) in separate Spark sessions, and

    efficiency = (urls_per_sec_4N / urls_per_sec_N) / 4

is reported. Results are appended to BENCH/BASELINE.md.

Usage: python tools/scaling_bench.py [n_pages] [rounds] [low_cores] [high_cores]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from searchengine_spark.crawler.bench import run_fixed_crawl
from searchengine_spark.session import get_spark


def run_at(cores: int, n_pages: int, rounds: int) -> tuple[float, int]:
    spark = get_spark(
        f"scaling-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(8, cores),
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "48g",
            # heavy pages (~100 KB html): a 10k-row Arrow batch is ~1 GB
            # per python worker — size batches by bytes, not the default
            "spark.sql.execution.arrow.maxRecordsPerBatch": "256",
        },
    )
    try:
        return run_fixed_crawl(
            spark, n_pages, rounds, n_hosts=32, body_scale=6, body_repeat=25,
            n_partitions=max(8, cores),
        )
    finally:
        spark.stop()


def main() -> int:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    low = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    high = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    wall_lo, fetched_lo = run_at(low, n_pages, rounds)
    wall_hi, fetched_hi = run_at(high, n_pages, rounds)
    thr_lo, thr_hi = fetched_lo / wall_lo, fetched_hi / wall_hi
    eff = (thr_hi / thr_lo) / (high / low)
    result = {
        "n_pages": n_pages,
        "rounds": rounds,
        "low_cores": low,
        "high_cores": high,
        "urls_fetched_low": fetched_lo,
        "urls_fetched_high": fetched_hi,
        "wall_low_sec": round(wall_lo, 2),
        "wall_high_sec": round(wall_hi, 2),
        "urls_per_sec_low": round(thr_lo, 2),
        "urls_per_sec_high": round(thr_hi, 2),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
