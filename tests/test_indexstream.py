"""Streaming index maintenance: replaying a stream of changed-document
versions through the foreachBatch sink converges to the batch rebuild
over the final corpus (updates, inserts, and empty-text deletions)."""

from __future__ import annotations

import os

from searchengine_spark.operators.tfidf import doc_tokens, term_frequencies
from searchengine_spark.streaming.indexstream import read_tf, stream_index

DOCS_SCHEMA = "doc_id long, text string"


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, DOCS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_stream_index_converges_to_batch_rebuild(spark, tmp_path):
    src = str(tmp_path / "changed")
    base = str(tmp_path / "tfgen")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: initial versions; batch 2: update 2, delete 3, insert 4
    _write_batch(spark, src, [(1, "alpha beta"), (2, "beta gamma"), (3, "kill me")])
    _write_batch(spark, src, [(2, "beta beta delta"), (3, ""), (4, "alpha")])

    changed = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_index(changed, base, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    final_docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta beta delta"), (4, "alpha")], DOCS_SCHEMA
    )
    expected = sorted(
        (r.doc_id, r.token, round(r.tf, 9))
        for r in term_frequencies(doc_tokens(final_docs)).collect()
    )
    got_df = read_tf(spark, base)
    assert got_df is not None
    got = sorted(
        (r.doc_id, r.token, round(r.tf, 9)) for r in got_df.collect()
    )
    assert got == expected
    assert 3 not in {d for d, _, _ in got}  # deletion really deletes


def test_apply_batch_is_idempotent(spark, tmp_path):
    from searchengine_spark.streaming.indexstream import apply_batch

    base = str(tmp_path / "tfgen2")
    b1 = spark.createDataFrame([(1, "x y"), (2, "y z")], DOCS_SCHEMA)
    apply_batch(spark, base, b1, epoch_id=0)
    first = sorted(
        (r.doc_id, r.token, round(r.tf, 9))
        for r in read_tf(spark, base).collect()
    )
    # replaying the same epoch (crash-after-marker scenario) is a no-op
    apply_batch(spark, base, b1, epoch_id=0)
    again = sorted(
        (r.doc_id, r.token, round(r.tf, 9))
        for r in read_tf(spark, base).collect()
    )
    assert first == again
    assert os.path.exists(os.path.join(base, "_CURRENT"))


def test_ts_column_latest_version_wins(spark, tmp_path):
    src = str(tmp_path / "changed3")
    base = str(tmp_path / "tfgen3")
    ckpt = str(tmp_path / "ckpt3")
    spark.createDataFrame(
        [(1, 10, "old text"), (1, 20, "new words")],
        "doc_id long, ts long, text string",
    ).coalesce(1).write.parquet(src)

    changed = (
        spark.readStream.schema("doc_id long, ts long, text string")
        .parquet(src)
    )
    q = stream_index(changed, base, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(r.token for r in read_tf(spark, base).collect())
    assert got == ["new", "words"]
