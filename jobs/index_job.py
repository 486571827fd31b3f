"""spark-submit entry: build (or incrementally refresh) the tf-idf /
BM25 index from a documents table — the E1 lifecycle as a batch job.

    spark-submit --py-files dist/searchengine_spark.zip jobs/index_job.py \
        --docs /path/documents.parquet --out /path/index \
        [--changed /path/changed.parquet] [--bm25] [--stem] \
        [--champions K]

Modes:
  * full build (default): tokenize → tf → df/idf → postings, written
    token-sorted (S4 layout, min/max-prunable by token).
  * --changed: incremental refresh — reads the PREVIOUS tf table from
    <out>/tf, folds in the changed docs via update_tf (O(changed)
    tokenize, empty text = delete), re-derives postings. Equal to a
    full rebuild by construction (the driver's index_update query
    proves it).
  * --bm25: additionally writes the BM25 weight table.
  * --champions K: additionally writes top-K champion lists per token
    (serve-time pruning structure).

Outputs under --out: postings/ (token-sorted), tf/ (maintenance
state), docmap/, and optionally bm25/, champions/.
"""

from __future__ import annotations

import argparse
import os
import sys

from pyspark.sql import SparkSession

from searchengine_spark.operators import docmap as DM
from searchengine_spark.operators import ranking as RK
from searchengine_spark.operators import tfidf as TF


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--changed", help="parquet of changed docs (doc_id, text)")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--url-col", default=None, help="write docmap from this column")
    ap.add_argument("--bm25", action="store_true")
    ap.add_argument("--stem", action="store_true",
                    help="open-vocabulary Porter stemming (F3 unknown-word path)")
    ap.add_argument("--champions", type=int, default=0)
    args = ap.parse_args(argv)

    # reuse an embedding application's session (tests, notebooks) and
    # leave its lifecycle alone; under spark-submit there is none, so
    # create — and stop — our own
    spark = SparkSession.getActiveSession()
    owns_session = spark is None
    if owns_session:
        spark = SparkSession.builder.appName("index-build").getOrCreate()
    docs = spark.read.parquet(args.docs)

    tf_path = os.path.join(args.out, "tf")
    if args.changed:
        tf_prev = spark.read.parquet(tf_path)
        changed = spark.read.parquet(args.changed)
        tf = TF.update_tf(
            tf_prev, changed, args.id_col, args.text_col, stem=args.stem
        )
    else:
        tf = TF.term_frequencies(
            TF.doc_tokens(docs, args.id_col, args.text_col, stem=args.stem)
        )
    # materialize the maintenance state FIRST (staging dir → move would
    # be TableIO's job on a real deployment; plain overwrite here)
    tf.write.mode("overwrite").parquet(tf_path + ".next")
    tf = spark.read.parquet(tf_path + ".next")

    postings = TF.postings_from_tf(tf)
    TF.write_sorted_index(postings, os.path.join(args.out, "postings"))

    if args.url_col:
        DM.write_doc_map(
            DM.build_doc_map(docs, args.id_col, args.url_col),
            os.path.join(args.out, "docmap"),
        )
    if args.bm25 or args.champions:
        w = RK.bm25_table(docs, args.id_col, args.text_col)
        if args.bm25:
            w.write.mode("overwrite").parquet(os.path.join(args.out, "bm25"))
        if args.champions:
            RK.champion_lists(w, k=args.champions).write.mode(
                "overwrite"
            ).parquet(os.path.join(args.out, "champions"))

    # swap the tf state last (the postings sink is idempotent overwrite),
    # then drop the staging dir — count from the WRITTEN sink, not the
    # lazy plan still rooted at the staging files
    final = spark.read.parquet(tf_path + ".next")
    final.write.mode("overwrite").parquet(tf_path)
    n = spark.read.parquet(os.path.join(args.out, "postings")).count()
    import shutil

    shutil.rmtree(tf_path + ".next", ignore_errors=True)
    print(f"index written: {n} postings → {args.out}")
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
