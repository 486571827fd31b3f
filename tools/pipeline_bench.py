"""Training-data-pipeline throughput bench — the complement to bench.py
(crawl+index headline) and tools/query_bench.py (serve latency): times
the LLM-curation operator suite end-to-end at a given sf dir, N trials
per op, median + [min, max] spread (single-trial numbers on a shared
box are noise — see BENCH/BASELINE.md §3).

Ops are invoked THROUGH the driver contract (__spark_entry__.queries())
so the timed plans are exactly the oracle-checked ones. Each trial
counts the result (count() materializes the full plan; results are not
cached between trials — every trial pays the whole pipeline).

Usage: python tools/pipeline_bench.py [sf_dir] [trials]
Env: SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OPS = [
    "exact_dedup",      # md5 hash-groupBy
    "minhash_pairs",    # banded LSH propose -> exact Jaccard verify
    "simhash_pairs",    # pigeonhole bands on 60-bit signatures
    "embed_pairs",      # hyperplane-LSH propose -> exact cosine verify
    "dup_clusters",     # connected components over near-dup edges
    "span_dedup",       # C4-style first-occurrence span winners
    "winnow_fp",        # SWA local fingerprints (zero-shuffle)
    "decontaminate",    # eval n-gram broadcast semi-join
    "curate",           # dedup -> keep-best -> quality gate, end to end
    "quality",          # per-doc quality scores (single pass)
    "bpe_count",        # regex piece counting
    "ivf_topk",         # Lloyd-trained IVF ANN over embeddings
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as entrymod
    from searchengine_spark.session import get_spark

    spark = get_spark(
        "pipeline-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    qs = entrymod.queries()
    medians: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in OPS:
        times = []
        for _ in range(trials):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).count()
            times.append(time.perf_counter() - t0)
        medians[name] = round(statistics.median(times), 4)
        spread[name] = [round(min(times), 4), round(max(times), 4)]
    print(
        json.dumps(
            {
                "metric": "pipeline_median_sec",
                "value": round(sum(medians.values()), 3),
                "unit": "sec",
                "queries": medians,
                "spread": spread,
                "trials": trials,
                "sf_dir": sf_dir,
                "cpus": cpus,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
