"""A/B harness for round-loop session confs (driver-serial cost work).

Runs the SAME fixed crawl workload (shared cached corpus) under each
candidate conf set and prints wall seconds for (a) the full crawl and
(b) the steady-state timed window — so a conf that saves driver time on
ramp rounds but taxes executor time on giant rounds shows up as a split
verdict. Usage:

    python tools/ab_round_conf.py [n_pages] [rounds] [cores] [body_repeat]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from searchengine_spark.crawler.bench import run_fixed_crawl
from searchengine_spark.session import get_spark

VARIANTS = {
    "default": {},
    "nocodegen": {
        "spark.sql.codegen.wholeStage": "false",
        "spark.sql.codegen.factoryMode": "NO_CODEGEN",
    },
    "noconstraint": {
        "spark.sql.constraintPropagation.enabled": "false",
    },
    "nocodegen+noconstraint": {
        "spark.sql.codegen.wholeStage": "false",
        "spark.sql.codegen.factoryMode": "NO_CODEGEN",
        "spark.sql.constraintPropagation.enabled": "false",
    },
}


def main() -> int:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 16000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    body_repeat = int(sys.argv[4]) if len(sys.argv) > 4 else 200

    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    import scaling_bench as SB

    path = SB._gen_corpus_once(n_pages, body_repeat)
    base = SB._conf(cores)
    out = {}
    for tag, extra in VARIANTS.items():
        spark = get_spark(
            f"ab-{tag}",
            master=f"local[{cores}]",
            shuffle_partitions=max(8, cores),
            extra_conf={**base, **extra},
        )
        try:
            t0 = time.perf_counter()
            wall, fetched = run_fixed_crawl(
                spark, n_pages, rounds,
                n_hosts=SB.N_HOSTS,
                n_partitions=max(8, cores),
                timed_from_round=3,
                pages_path=path,
            )
            total = time.perf_counter() - t0
        finally:
            spark.stop()
        out[tag] = {
            "total_sec": round(total, 2),
            "timed_sec": round(wall, 2),
            "urls_timed": fetched,
            "urls_per_sec_timed": round(fetched / wall, 2) if wall else None,
        }
        print(f"# {tag}: {json.dumps(out[tag])}", flush=True)
    print(json.dumps({"n_pages": n_pages, "cores": cores, "variants": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
