"""E2 — interactive ranked-retrieval loop (reference
retrieve_query.py:177-192: prompt for a boolean query, print the top-5
urls, repeat until EOF/quit).

Spark-first shape: the postings index is built (or read from a
token-sorted parquet sink) ONCE and cached; every query is then a
token-IN-pruned scan + one shuffle — the per-query latency is the plan,
not the index build. The doc-id map (J4) resolves ranked doc_ids to
urls exactly like the reference's doc_id_map lookup (idxer.py:192-193).

Usage:
    python tools/repl.py [sf_dir | --index <sorted_index_path>]
Queries: `spark AND window OR dup` ; blank line or `quit` exits.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from searchengine_spark.operators import docmap as DM
from searchengine_spark.operators import query as Q
from searchengine_spark.operators import tfidf as TF
from searchengine_spark.session import get_spark


def main() -> int:
    spark = get_spark(
        "repl",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
        shuffle_partitions=16,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    args = sys.argv[1:]
    if args and args[0] == "--index":
        postings = spark.read.parquet(args[1])
        doc_map = None
    else:
        sf_dir = args[0] if args else "/root/testdata/sf0.001"
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        postings = TF.build_postings(docs)
        doc_map = DM.build_doc_map(docs)
    postings = postings.persist()
    n = postings.count()  # materialize the index before the prompt
    print(f"index ready: {n} postings. Query syntax: a AND b OR c. "
          "Blank line / 'quit' exits.")
    while True:
        try:
            line = input("query> ").strip()
        except EOFError:
            break
        if not line or line.lower() == "quit":
            break
        ranked = Q.search(postings, line, k=Q.MAX_LINKS_SHOWN)
        if doc_map is not None:
            ranked = DM.resolve_urls(ranked, doc_map)
        rows = ranked.collect()
        if not rows:
            print("  (no results)")
        for r in rows:
            label = r["url"] if "url" in r.asDict() else r["doc_id"]
            print(f"  {label}  (tf_idf={r['tf_idf']:.6g})")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
