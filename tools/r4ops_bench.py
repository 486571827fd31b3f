"""Round-4 new-operator micro-bench — times every oracle query added in
round 4's second half (RRF/clarity/QPP ranking, SURT/CDX, EF sizing,
trigram LM, cosine pairs, SALSA/harmonic/ANF/diameter graph suite,
cohort/burst/transition event analytics, directives, CDC chunking,
novelty/readability/burstiness text stats, mixture report, sign test,
prior blend, site collapse) at a given sf dir, N trials per op,
median + [min, max].

Same protocol as tools/pipeline_bench.py: ops run THROUGH the driver
contract, so the timed plans are exactly the oracle-checked ones; no
cross-trial caching.

Usage: python tools/r4ops_bench.py [sf_dir] [trials]
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
    "rrf_topk", "surt_keys", "cdx_range", "eliasfano_size", "clarity",
    "lm_trigram", "cosine_pairs", "salsa_rank", "degree_tail",
    "cohort_retention", "crawl_delta", "soft404", "rake_keywords",
    "harmonic", "cdc_chunks", "page_directives", "canonical_census",
    "stopword_census", "anf_reach", "burst_windows", "neighborhood_fn",
    "event_transitions", "doc_keywords", "window_pmi", "novelty",
    "readability", "mixture_report", "reciprocity", "prior_blend",
    "site_collapse", "sign_test", "nqc", "burstiness",
    # third-session wave (ring/layout/ranking/graph/sketch-calibration/
    # pipeline additions) — same driver-contract plans
    "ring_assign", "ring_moves", "zorder_files", "rank_corr",
    "kn_bigrams", "lmjm_topk", "zipf_fit", "pl2_topk", "salt_balance",
    "blocklist_gate", "k_truss", "revisit_resolve", "late_data",
    "bowtie", "minhash_error", "bloom_fpr", "hll_error", "suffix_query",
    "domain_split", "sdm_topk", "pq_topk", "spam_mass", "mime_census",
    "serp", "pivoted_topk", "assortativity", "yule_k", "assoc_rules",
    "rich_club", "fielded_query", "cluster_dilution", "gini_events",
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
        "r4ops-bench",
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
                "metric": "r4ops_median_sec",
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
