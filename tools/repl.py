"""E2 — interactive ranked-retrieval loop (reference
retrieve_query.py:177-192: prompt for a boolean query, print the top-5
urls, repeat until EOF/quit).

Spark-first shape: the postings index is built (or read from a
token-sorted parquet sink) ONCE and cached; every query is then a
token-IN-pruned scan + one shuffle — the per-query latency is the plan,
not the index build. The doc-id map (J4) resolves ranked doc_ids to
urls exactly like the reference's doc_id_map lookup (idxer.py:192-193).

Beyond the reference surface:
  * `:bm25 <terms>`  — Okapi BM25 ranking (operators/ranking.py) with a
    result snippet around the first hit (operators/positional.py)
  * zero-hit queries get "did you mean" suggestions from the
    levenshtein dictionary scan (positional.suggest)

Usage:
    python tools/repl.py [sf_dir | --index <sorted_index_path>]
Queries: `spark AND window OR dup` ; `:bm25 spark window` ;
blank line or `quit` exits.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from searchengine_spark.operators import docmap as DM
from searchengine_spark.operators import positional as PX
from searchengine_spark.operators import query as Q
from searchengine_spark.operators import ranking as RK
from searchengine_spark.operators import tfidf as TF


def _suggest_line(vocab, term: str) -> str | None:
    rows = PX.suggest(vocab, term, max_dist=2, k=3).collect()
    if not rows:
        return None
    return f"  did you mean: {', '.join(r['token'] for r in rows)}?"


def main() -> int:
    from searchengine_spark.session import get_spark

    spark = get_spark(
        "repl",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
        shuffle_partitions=16,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    args = sys.argv[1:]
    docs = None
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
    vocab = TF.doc_frequencies(
        postings.select("doc_id", "token", "tf")
    ).persist()
    bm25 = RK.bm25_table(docs).persist() if docs is not None else None
    print(f"index ready: {n} postings. Query syntax: a AND b OR c "
          "(tf-idf) or ':bm25 a b' (BM25+snippets). "
          "Blank line / 'quit' exits.")
    while True:
        try:
            line = input("query> ").strip()
        except EOFError:
            break
        if not line or line.lower() == "quit":
            break

        if line.startswith(":bm25"):
            terms = line[len(":bm25"):].split()
            if not terms or bm25 is None:
                print("  (bm25 needs terms and a documents-backed index)")
                continue
            page = RK.bm25_search(bm25, terms, k=Q.MAX_LINKS_SHOWN)
            snips = {
                r["doc_id"]: r["snippet"]
                for r in PX.snippets(docs, terms, window=5)
                .join(page.select("doc_id"), "doc_id")
                .collect()
            }
            rows = page.collect()
            if not rows:
                for t in terms:
                    s = _suggest_line(vocab, t)
                    if s:
                        print(s)
                print("  (no results)")
            for r in rows:
                print(f"  doc {r['doc_id']}  (bm25={r['score']:.6g})")
                if r["doc_id"] in snips:
                    print(f"    …{snips[r['doc_id']]}…")
            continue

        ranked = Q.search(postings, line, k=Q.MAX_LINKS_SHOWN)
        if doc_map is not None:
            ranked = DM.resolve_urls(ranked, doc_map)
        rows = ranked.collect()
        if not rows:
            for t in {w.lower() for w in line.split() if w not in ("AND", "OR")}:
                s = _suggest_line(vocab, t)
                if s:
                    print(s)
            print("  (no results)")
        for r in rows:
            label = r["url"] if "url" in r.asDict() else r["doc_id"]
            print(f"  {label}  (tf_idf={r['tf_idf']:.6g})")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
