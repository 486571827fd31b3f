"""Per-operator SERVE latency off a prebuilt, cached index — the
complement to bench.py (which times index BUILD + crawl). Builds the
postings/BM25/positional structures once, caches them, then times each
retrieval operator N trials and prints one JSON line of medians.

Usage: python tools/query_bench.py [sf_dir] [trials]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from searchengine_spark.operators import positional as PX
from searchengine_spark.operators import query as Q
from searchengine_spark.operators import ranking as RK
from searchengine_spark.operators import simsearch as SS
from searchengine_spark.operators import tfidf as TF
from searchengine_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "query-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    postings = TF.build_postings(docs).persist()
    postings.count()
    bm25 = RK.bm25_table(docs).persist()
    bm25.count()
    pos = PX.positional_postings(docs).persist()
    pos.count()
    vocab = TF.doc_frequencies(postings.select("doc_id", "token", "tf")).persist()
    vocab.count()

    queries = {
        "dnf_search": lambda: Q.search(postings, "spark AND window OR dup").collect(),
        "bm25_topk": lambda: RK.bm25_search(bm25, ["spark", "window", "dup"], 10).collect(),
        "phrase": lambda: PX.phrase_match(pos, ["table", "value"]).collect(),
        "proximity": lambda: PX.proximity_match(pos, "spark", "window", 3).collect(),
        "prefix": lambda: Q.prefix_search(postings, "s", 10).collect(),
        "more_like_this": lambda: SS.more_like_this(postings, 0, 10).collect(),
        "spell": lambda: PX.suggest(vocab, "quary").collect(),
        "complete": lambda: PX.complete(vocab, "s").collect(),
    }
    meds, spreads = {}, {}
    for name, fn in queries.items():
        ts = []
        for _ in range(trials):
            t0 = time.monotonic()
            fn()
            ts.append(time.monotonic() - t0)
        meds[name] = round(statistics.median(ts), 4)
        spreads[name] = [round(min(ts), 4), round(max(ts), 4)]
    print(
        json.dumps(
            {
                "metric": "serve_latency_median_sec",
                "queries": meds,
                "spread": spreads,
                "trials": trials,
                "sf_dir": sf_dir,
                "cpus": int(cpus),
            }
        )
    )

    # ---- serve-path comparison: the same BM25 top-k answered three
    # ways off prebuilt structures — brute (score every matching doc),
    # champion-list-pruned (score only docs on a query term's impact
    # list), MaxScore (exact, essential-list-pruned). Recall is
    # measured against brute's doc set, so the latency table is at
    # MEASURED recall, not assumed.
    k = 10
    terms = ["spark", "window", "dup"]
    champs = RK.champion_lists(bm25, k=50).persist()
    champs.count()
    uniq = [t.lower() for t in terms]

    def _brute():
        return RK.bm25_search(bm25, terms, k).collect()

    def _champion():
        cand = (
            champs.filter(F.col("token").isin(uniq))
            .select("doc_id")
            .distinct()
        )
        return RK.bm25_search(
            bm25.join(cand, "doc_id", "left_semi"), terms, k
        ).collect()

    def _maxscore():
        return RK.maxscore_search(bm25, terms, k).collect()

    paths = {"brute": _brute, "champion": _champion, "maxscore": _maxscore}
    serve_trials = max(trials, 20)
    base = {r["doc_id"] for r in _brute()}
    out = {}
    for name, fn in paths.items():
        got = {r["doc_id"] for r in fn()}
        recall = len(got & base) / max(1, len(base))
        ts = []
        for _ in range(serve_trials):
            t0 = time.monotonic()
            fn()
            ts.append(time.monotonic() - t0)
        ts.sort()
        out[name] = {
            "p50": round(ts[len(ts) // 2], 4),
            "p99": round(ts[min(len(ts) - 1, int(0.99 * len(ts)))], 4),
            "recall_vs_brute": round(recall, 4),
        }
    print(
        json.dumps(
            {
                "metric": "serve_path_latency_sec",
                "k": k,
                "terms": terms,
                "paths": out,
                "trials": serve_trials,
                "sf_dir": sf_dir,
                "cpus": int(cpus),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
