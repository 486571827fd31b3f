"""Two-cluster-size scaling evidence (BASELINE.json north rule).

The ≥0.8 throughput-scaling-efficiency criterion is defined over N → 4N
executors; this sandbox has one machine, so the same fixed crawl
workload runs at two local parallelism levels (default local[8] vs
local[32] — 4× cores) in separate Spark sessions, and

    efficiency = (urls_per_sec_4N / urls_per_sec_N) / 4

is reported over the TIMED window: the steady-state giant rounds
(rounds ≥ 3 of a wide shallow graph, every host seeded, politeness
lifted), which is the regime a 10^10-URL frontier lives in — a real
frontier never drains, so the BFS ramp from a cold seed list is warm-up,
not workload. The corpus is generated once to parquet and shared by both
legs (generation is driver-side Python and not part of the measured
job).

Usage: python tools/scaling_bench.py [n_pages] [rounds] [low] [high] [body_repeat]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from searchengine_spark.crawler.bench import run_fixed_crawl
from searchengine_spark.session import get_spark

N_HOSTS = 32
BODY_SCALE = 6


def _conf(cores: int) -> dict[str, str]:
    return {
        "spark.ui.showConsoleProgress": "false",
        "spark.driver.memory": "48g",
        # heavy rows (~100 KB html): size Arrow batches and AQE targets
        # by bytes so tasks stay numerous enough to fill the cores
        "spark.sql.execution.arrow.maxRecordsPerBatch": "256",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
    }


def _gen_corpus_once(n_pages: int, body_repeat: int) -> str:
    path = f"/tmp/scaling-corpus-{n_pages}-{BODY_SCALE}-{body_repeat}"
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    from searchengine_spark.crawler.synth import (
        PAGES_SCHEMA,
        ROBOTS_SCHEMA,
        gen_corpus,
    )

    rows, robots, _ = gen_corpus(
        n_pages, 42, N_HOSTS, BODY_SCALE, body_repeat, with_text=False
    )
    spark = get_spark("corpus-gen", master="local[8]", extra_conf=_conf(8))
    pdf = spark.createDataFrame(rows, schema=PAGES_SCHEMA)
    rdf = spark.createDataFrame(robots, schema=ROBOTS_SCHEMA)
    pdf.repartition(32).write.mode("overwrite").parquet(path)
    rdf.write.mode("overwrite").parquet(path + "_robots")
    spark.stop()
    return path


def run_at(cores: int, n_pages: int, rounds: int, pages_path: str) -> tuple[float, int]:
    spark = get_spark(
        f"scaling-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(8, cores),
        extra_conf=_conf(cores),
    )
    try:
        import json as _json

        overrides = _json.loads(
            os.environ.get("SPARK_GRAFT_CFG_OVERRIDES", "{}")
        )  # A/B experiment hook: CrawlConfig field overrides
        return run_fixed_crawl(
            spark, n_pages, rounds,
            n_hosts=N_HOSTS,
            n_partitions=max(8, cores),
            timed_from_round=3,
            pages_path=pages_path,
            cfg_overrides=overrides,
        )
    finally:
        spark.stop()


def _burn(_):
    import time as _time

    t0 = _time.time()
    x = 0
    while _time.time() - t0 < 3.0:
        x += 1
    return x


def hardware_ceiling(low: int, high: int) -> float:
    """Pure-CPU parallel-scaling ceiling of THIS box between the two
    process counts (a busy-loop has no framework overhead — whatever it
    loses is hyperthreading/thermal, not software). Job efficiency is
    meaningful only relative to this. Measured on this sandbox: 1→8
    procs scale 7.7× (linear region); 8→32 only ~3.0×/4 (SMT ceiling) —
    hence the default N=2 → 4N=8 inside the linear region.

    The probe is the noisiest number in the protocol (a 2 s sample once
    read 1.25 — impossible — and 0.54 within the same hour), so it now
    takes the MEDIAN of three interleaved low/high probes of 3 s per
    process; readings outside (0, 1] still mark the run as
    external-load-contaminated."""
    import multiprocessing
    import statistics

    ratios = []
    for _ in range(3):
        out = {}
        for n in (low, high):
            with multiprocessing.Pool(n) as p:
                out[n] = sum(p.map(_burn, range(n)))
        ratios.append((out[high] / out[low]) / (high / low))
    return statistics.median(ratios)


def main() -> int:
    """argv: [n_pages] [rounds] [cores_csv] [body_repeat] — cores_csv is
    a comma-separated ladder (default "2,8"); each consecutive pair is
    reported as an N→kN scaling point over the SAME cached corpus (the
    2→8 pair is the in-linear-region N→4N evidence; an 8→32 rung adds
    the SMT-ceiling-bounded point)."""
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 16000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cores = (
        [int(c) for c in sys.argv[3].split(",")]
        if len(sys.argv) > 3
        else [2, 8]
    )
    body_repeat = int(sys.argv[4]) if len(sys.argv) > 4 else 200
    path = _gen_corpus_once(n_pages, body_repeat)
    legs = []
    for c in cores:
        wall, fetched = run_at(c, n_pages, rounds, path)
        legs.append(
            {
                "cores": c,
                "urls_timed": fetched,
                "wall_sec": round(wall, 2),
                "urls_per_sec": round(fetched / wall, 2),
            }
        )
        print(f"# leg local[{c}]: {json.dumps(legs[-1])}", flush=True)
    pairs = []
    for lo, hi in zip(legs, legs[1:]):
        ratio = hi["cores"] / lo["cores"]
        eff = (hi["urls_per_sec"] / lo["urls_per_sec"]) / ratio
        hw = hardware_ceiling(lo["cores"], hi["cores"])
        pairs.append(
            {
                "pair": f"{lo['cores']}->{hi['cores']}",
                "scaling_efficiency": round(eff, 3),
                "hardware_ceiling_efficiency": round(hw, 3),
                "efficiency_vs_hardware": round(eff / hw, 3),
            }
        )
    result = {
        "n_pages": n_pages,
        "rounds": rounds,
        "timed_from_round": 3,
        "body_repeat": body_repeat,
        "legs": legs,
        "pairs": pairs,
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
