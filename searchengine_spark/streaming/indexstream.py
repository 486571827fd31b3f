"""Streaming index maintenance: a foreachBatch sink that keeps the
(doc_id, token, tf) table current against an unbounded stream of
changed documents — the streaming twin of tfidf.update_tf (the batch
incremental-maintenance path the `index_update` contract query proves
equal to a full rebuild).

Shape:
  changed-docs stream (doc_id, text)
    → foreachBatch: update_tf(tf_current, batch) → atomic swap
    → readers always see a complete generation; postings_from_tf
      derives df/idf on demand (never re-tokenizes unchanged docs).

Exactly-once: each micro-batch writes generation directory
`gen=<epoch_id>` and then atomically renames a marker (same contract
as crawler/tableio.py's round markers). A replayed batch (restart
between write and marker) rewrites the same gen idempotently — the
batch's doc_ids replace prior rows by anti-join, so applying a batch
twice is a no-op. Late/duplicate doc versions WITHIN one batch are
resolved by last-write-wins on the stream's arrival order upstream
(callers dedupe per doc_id per batch; update_tf asserts nothing about
intra-batch order).

Scale notes: per batch the work is O(batch tokenize) + one anti-join
against the current tf generation — the full-corpus tokenize never
re-runs. The tf table is partitioned by pmod(doc_id) so the anti-join
co-partitions; at 10^10 docs the generation swap is a metadata move,
not a data rewrite (only changed partitions could be rewritten with a
format like Iceberg — the parquet generation dir is the plain-files
equivalent).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.operators.tfidf import update_tf

_MARKER = "_CURRENT"


def current_gen(base: str) -> str | None:
    marker = os.path.join(base, _MARKER)
    if not os.path.exists(marker):
        return None
    with open(marker, encoding="utf-8") as fh:
        return fh.read().strip() or None


def read_tf(spark: SparkSession, base: str) -> DataFrame | None:
    gen = current_gen(base)
    if gen is None:
        return None
    return spark.read.parquet(os.path.join(base, gen))


def _commit(base: str, gen: str) -> None:
    tmp = os.path.join(base, _MARKER + ".tmp")
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(gen)
    os.replace(tmp, os.path.join(base, _MARKER))  # atomic on POSIX


def apply_batch(
    spark: SparkSession,
    base: str,
    batch_df: DataFrame,
    epoch_id: int,
    lemma_map: dict[str, str] | None = None,
) -> None:
    """The foreachBatch body: fold one micro-batch of changed docs into
    a new tf generation and atomically publish it."""
    os.makedirs(base, exist_ok=True)
    prev = read_tf(spark, base)
    if prev is None:
        prev = spark.createDataFrame(
            [], "doc_id long, token string, tf double"
        )
    nxt = update_tf(prev, batch_df, lemma_map=lemma_map)
    gen = f"gen={epoch_id}"
    nxt.write.mode("overwrite").parquet(os.path.join(base, gen))
    _commit(base, gen)


def stream_index(
    changed: DataFrame,
    base: str,
    checkpoint: str,
    lemma_map: dict[str, str] | None = None,
):
    """Attach the maintenance sink to a STREAMING DataFrame of changed
    documents (doc_id long, text string). Returns the StreamingQuery.

    A null/empty text deletes the doc from the index (update_tf's
    P1/P3 deletion rule)."""

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if "ts" in batch_df.columns:
            # explicit version column: latest version per doc wins —
            # deterministic under replay (exactly-once holds)
            dedup = batch_df.groupBy("doc_id").agg(
                F.max_by("text", F.col("ts")).alias("text")
            )
        else:
            # caller promises ≤1 version per doc per batch
            dedup = batch_df.select("doc_id", "text")
        apply_batch(
            batch_df.sparkSession, base, dedup, epoch_id, lemma_map=lemma_map
        )

    return (
        changed.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .start()
    )
