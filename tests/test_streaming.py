"""Structured Streaming: the windowed stream aggregate equals the batch
aggregate over the same files, and the rate-source foreachBatch crawl
skin produces the same crawl as the plain driver loop."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators.windows import top_user_per_window, tumbling_counts

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


@pytest.fixture(scope="module")
def events_dir(sf_dir, tmp_path_factory):
    """File-source streams need a directory of part files."""
    src = os.path.join(sf_dir, "events.parquet")
    dst = tmp_path_factory.mktemp("events_stream")
    if os.path.isdir(src):
        for f in glob.glob(os.path.join(src, "*.parquet")):
            shutil.copy(f, dst)
    else:
        shutil.copy(src, dst)
    return str(dst)


def test_windowed_stream_equals_batch(spark, events_dir):
    from searchengine_spark.streaming.stream import windowed_event_stream

    batch = spark.read.schema(EVENTS_SCHEMA).parquet(events_dir)
    expected = sorted(
        (r["window_start"], r["event_type"], r["n_events"], round(r["sum_value"], 6))
        for r in tumbling_counts(batch, "1 hour").collect()
    )

    stream = windowed_event_stream(spark, events_dir, EVENTS_SCHEMA, "1 hour")
    q = (
        stream.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            (r["window_start"], r["event_type"], r["n_events"], round(r["sum_value"], 6))
            for r in spark.sql("SELECT * FROM win_counts").collect()
        )
    finally:
        q.stop()
    assert got == expected


def test_top_user_per_window(spark, events_dir):
    batch = spark.read.schema(EVENTS_SCHEMA).parquet(events_dir)
    rows = top_user_per_window(batch, "1 hour").collect()
    assert rows
    # exactly one winner per window
    starts = [r["window_start"] for r in rows]
    assert len(starts) == len(set(starts))


def test_stream_crawl_matches_driver_loop(spark, tmp_path):
    from searchengine_spark.crawler import frontier as FR
    from searchengine_spark.crawler.config import CrawlConfig
    from searchengine_spark.crawler.synth import ALLOWED_HOST_RE, pages_df
    from searchengine_spark.crawler.tableio import TableIO
    from searchengine_spark.streaming.stream import stream_crawl

    pdf, rdf, seeds = pages_df(spark, 60, 42)
    cfg = CrawlConfig(seeds=seeds, allowed_host_re=ALLOWED_HOST_RE)

    io_a = TableIO(spark, str(tmp_path / "loop"))
    FR.crawl(spark, io_a, cfg, pdf, rdf, max_rounds=3)

    io_b = TableIO(spark, str(tmp_path / "stream"))
    stream_crawl(spark, io_b, cfg, pdf, rdf, max_rounds=3)

    assert FR.crawl_order(io_b) == FR.crawl_order(io_a)
    seen_a = {r["canon_url"] for r in io_a.read("url_seen").collect()}
    seen_b = {r["canon_url"] for r in io_b.read("url_seen").collect()}
    assert seen_b == seen_a


def test_streaming_first_seen_dedup(spark, tmp_path):
    """applyInPandasWithState first-seen dedup: across micro-batches,
    each url_hash is emitted exactly once — equal to the batch distinct."""
    import json as _json

    from searchengine_spark.streaming.stateful import streaming_first_seen

    src = tmp_path / "cand_stream"
    src.mkdir()
    batch1 = [f"https://h{i % 4}.test/p{i}" for i in range(30)]
    batch2 = batch1[10:20] + [f"https://h9.test/x{i}" for i in range(5)]

    def _write(name, urls):
        with open(src / name, "w") as f:
            for u in urls:
                f.write(_json.dumps({"canon_url": u}) + "\n")

    _write("b1.json", batch1)
    stream = spark.readStream.schema("canon_url string").json(str(src))
    out = streaming_first_seen(stream, n_segments=4)
    q = (
        out.writeStream.format("memory")
        .queryName("first_seen")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        _write("b2.json", batch2)  # 10 repeats + 5 new
        q.processAllAvailable()
        got = [r["canon_url"] for r in spark.sql("SELECT * FROM first_seen").collect()]
    finally:
        q.stop()
    expected = set(batch1) | set(batch2)
    assert len(got) == len(expected)  # no repeat ever re-emitted
    assert set(got) == expected


def test_session_aggregate_gap_semantics(spark):
    """Session windows: gap < 30min merges, gap >= 30min splits."""
    from datetime import datetime, timedelta

    from searchengine_spark.operators.windows import session_aggregate

    t0 = datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, 1.0),
        (1, t0 + timedelta(minutes=10), 2.0),   # merges (10 < 30)
        (1, t0 + timedelta(minutes=45), 4.0),   # splits (35 >= 30)
        (2, t0, 8.0),
    ]
    ev = spark.createDataFrame(rows, "user_id bigint, ts timestamp, value double")
    got = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["sum_value"])
        for r in session_aggregate(ev, "30 minutes").collect()
    }
    assert got == {
        (1, t0): (2, 3.0),
        (1, t0 + timedelta(minutes=45)): (1, 4.0),
        (2, t0): (1, 8.0),
    }


def test_streaming_sessions_equal_batch(spark, events_dir, tmp_path):
    """session_window under watermark+append emits exactly the batch
    session aggregate once the watermark passes every session's end (a
    far-future sentinel event closes all real sessions)."""
    import glob
    import shutil
    from datetime import timedelta

    from searchengine_spark.operators.windows import session_aggregate

    batch = spark.read.schema(EVENTS_SCHEMA).parquet(events_dir)
    expected = sorted(
        (r["user_id"], r["session_start"], r["n_events"], round(r["sum_value"], 6))
        for r in session_aggregate(batch, "30 minutes").collect()
    )
    max_ts = batch.agg(F.max("ts")).collect()[0][0]

    src = tmp_path / "sess_stream"
    src.mkdir()
    for f in sorted(glob.glob(os.path.join(events_dir, "*.parquet"))):
        shutil.copy(f, src)
    sentinel = spark.createDataFrame(
        [(-1, max_ts + timedelta(days=30), -1, "sentinel", 0.0, "{}")],
        EVENTS_SCHEMA,
    )
    # written after the real files => later mod-time => later micro-batch
    sentinel.coalesce(1).write.mode("append").parquet(str(src / "zz_sentinel"))

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    out = (
        stream.withWatermark("ts", "1 minute")
        .groupBy(
            F.col("user_id"), F.session_window(F.col("ts"), "30 minutes").alias("sw")
        )
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            "user_id", F.col("sw.start").alias("session_start"),
            "n_events", "sum_value",
        )
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            (r["user_id"], r["session_start"], r["n_events"], round(r["sum_value"], 6))
            for r in spark.sql(
                "SELECT * FROM sess_stream WHERE user_id >= 0"
            ).collect()
        )
    finally:
        q.stop()
    assert got == expected


def test_stream_crawl_restarts_after_transient_failure(spark, tmp_path, monkeypatch):
    """A tick that dies mid-crawl (transient foreachBatch/Py4J failure)
    must not lose or duplicate work: the query restarts and resumes from
    the last committed round (ST4), ending with the same crawl order as
    the uninterrupted driver loop."""
    from searchengine_spark.crawler import frontier as FR
    from searchengine_spark.crawler.config import CrawlConfig
    from searchengine_spark.crawler.synth import ALLOWED_HOST_RE, pages_df
    from searchengine_spark.crawler.tableio import TableIO
    from searchengine_spark.streaming import stream as SM

    pdf, rdf, seeds = pages_df(spark, 40, 42)
    cfg = CrawlConfig(seeds=seeds, allowed_host_re=ALLOWED_HOST_RE)

    io_a = TableIO(spark, str(tmp_path / "loop"))
    FR.crawl(spark, io_a, cfg, pdf, rdf, max_rounds=2)

    real_run_round = FR.run_round
    fail_once = {"armed": True}

    def flaky_run_round(spark_, io_, cfg_, pages_, round_no, **kw):
        if round_no == 2 and fail_once["armed"]:
            fail_once["armed"] = False
            raise RuntimeError("injected transient tick failure")
        return real_run_round(spark_, io_, cfg_, pages_, round_no, **kw)

    monkeypatch.setattr(SM.FR, "run_round", flaky_run_round)
    io_b = TableIO(spark, str(tmp_path / "stream"))
    last = SM.stream_crawl(spark, io_b, cfg, pdf, rdf, max_rounds=2)
    assert last == 2 and not fail_once["armed"]  # failure really fired

    assert FR.crawl_order(io_b) == FR.crawl_order(io_a)
