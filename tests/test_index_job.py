"""jobs/index_job.py end-to-end: full build, incremental refresh
(replace + delete), optional sinks — the spark-submit deploy surface
exercised in-process."""

from __future__ import annotations

import os

from searchengine_spark.operators.tfidf import doc_tokens, term_frequencies

import jobs.index_job as J


def test_index_job_full_then_incremental(spark, tmp_path):
    docs_path = str(tmp_path / "docs")
    out = str(tmp_path / "index")
    spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma"), (3, "stale words")],
        "doc_id long, text string",
    ).write.parquet(docs_path)

    assert (
        J.main(["--docs", docs_path, "--out", out, "--bm25", "--champions", "2"])
        == 0
    )
    assert os.path.isdir(os.path.join(out, "postings"))
    assert os.path.isdir(os.path.join(out, "bm25"))
    assert os.path.isdir(os.path.join(out, "champions"))
    assert not os.path.exists(os.path.join(out, "tf.next"))

    chg_path = str(tmp_path / "changed")
    spark.createDataFrame(
        [(2, "beta beta delta"), (3, "")], "doc_id long, text string"
    ).write.parquet(chg_path)
    assert J.main(["--docs", docs_path, "--out", out, "--changed", chg_path]) == 0

    tf = spark.read.parquet(os.path.join(out, "tf"))
    final_docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta beta delta")], "doc_id long, text string"
    )
    expected = sorted(
        (r.doc_id, r.token, round(r.tf, 9))
        for r in term_frequencies(doc_tokens(final_docs)).collect()
    )
    got = sorted((r.doc_id, r.token, round(r.tf, 9)) for r in tf.collect())
    assert got == expected  # doc 2 replaced, doc 3 deleted, doc 1 kept
