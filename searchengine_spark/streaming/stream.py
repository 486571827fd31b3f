"""Structured Streaming skins.

`windowed_event_stream` — watermarked tumbling-window aggregation over a
file-source event stream: the same expressions as
operators/windows.tumbling_counts, so streaming output (after watermark
close) equals the batch aggregate over the same files — asserted by
tests/test_streaming.py.

`stream_crawl` — the crawler round loop driven by a Structured
Streaming rate source: each micro-batch tick executes one frontier
round via foreachBatch (SURVEY.md §1.2: "Structured Streaming
foreachBatch is an optional skin over the same round function"). The
round function itself is unchanged — state lives in the snapshot
tables, which is exactly what makes the loop replayable under
foreachBatch's at-least-once semantics: a re-delivered tick sees the
round already committed and becomes a no-op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.crawler import frontier as FR
from searchengine_spark.crawler.config import CrawlConfig
from searchengine_spark.crawler.tableio import TableIO


def windowed_event_stream(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    checkpoint_dir: str | None = None,
):
    """readStream(parquet dir) → watermark → tumbling agg. Returns the
    streaming DataFrame; caller attaches the sink (memory sink in tests,
    a table sink in production)."""
    stream = (
        spark.readStream.schema(schema).parquet(source_dir)
        .withWatermark("ts", watermark)
        .groupBy(F.window(F.col("ts"), window).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    return stream


def stream_crawl(
    spark: SparkSession,
    io: TableIO,
    cfg: CrawlConfig,
    pages: DataFrame,
    robots_df: DataFrame,
    max_rounds: int = 10,
    tick_seconds: int = 1,
    max_restarts: int = 2,
) -> int:
    """Run the frontier loop under a rate-source streaming query; stops
    when the frontier drains or max_rounds ticks fire. Returns the last
    committed round.

    A terminated query (e.g. a transient foreachBatch/Py4J callback
    failure — observed in the wild on a loaded host) is restarted up to
    max_restarts times: every round commits atomically (ST4), so a
    fresh query resumes from `io.latest_round()` with no duplicated or
    lost work — the same property that makes kill/resume exact makes
    the stream self-healing. Past the budget the query's exception is
    raised."""
    if io.latest_round() is None:
        FR.init_crawl(spark, io, cfg, robots_df)

    state = {"done": False}

    def _tick(_batch_df: DataFrame, _batch_id: int) -> None:
        if state["done"]:
            return
        next_round = (io.latest_round() or 0) + 1
        if next_round > max_rounds:
            state["done"] = True
            return
        remaining = FR.run_round(spark, io, cfg, pages, next_round)
        if remaining == 0:
            state["done"] = True

    def _start():
        return (
            spark.readStream.format("rate")
            .option("rowsPerSecond", 1)
            .load()
            .writeStream.foreachBatch(_tick)
            .trigger(processingTime=f"{tick_seconds} seconds")
            .start()
        )

    from pyspark.errors.exceptions.base import StreamingQueryException

    q = _start()
    restarts = 0
    try:
        while not state["done"]:
            err = None
            try:
                # bounded poll, NOT processAllAvailable: a rate source
                # always has backlog, and under host load micro-batches
                # can run slower than the tick — "wait until drained"
                # then never returns even though the crawl has finished
                # (observed: a 3-round crawl wedged for 36 min on a
                # contended box). awaitTermination(1s) re-checks the
                # round-driven done flag every second instead.
                q.awaitTermination(1)
            except StreamingQueryException as e:
                # raised when the query terminated with error (e.g. a
                # transient foreachBatch failure)
                err = e
            if state["done"]:
                break
            if err is not None or not q.isActive:
                if restarts >= max_restarts:
                    if err is not None:
                        raise err
                    raise RuntimeError(
                        "stream_crawl: query terminated before the "
                        "crawl finished (no exception reported)"
                    )
                restarts += 1
                q.stop()
                q = _start()  # resumes from io.latest_round() (ST4)
    finally:
        q.stop()
    return io.latest_round()
