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


def test_late_data_census_bounds_real_watermark_drops(spark, tmp_path):
    """Bridge the batch late_data_census to REAL Structured Streaming
    semantics: replay a disordered log through a file-source stream
    with a watermark, and check the census's row-granular late count
    is a conservative upper bound on what SS actually dropped (the
    per-batch watermark can only be lower than the per-row one)."""
    import datetime as dt
    import os as _os
    import time as _time

    from searchengine_spark.operators.windows import late_data_census

    t0 = dt.datetime(2026, 1, 2)
    delay_s, window_s = 3600, 3600
    # event times over ~6 hours; arrival order = bounded-jitter shuffle
    n = 120
    rows = []
    deep = {17, 43, 71}  # stragglers arriving ~4.5 h of event time late
    for i in range(n):
        jitter = ((i * 7919) % 21) - 10  # displacement <= 10
        arrival = i + (90 if i in deep else jitter)
        rows.append((arrival * 1000 + i, t0 + dt.timedelta(minutes=3 * i)))
    rows.sort()  # arrival order
    caps = spark.createDataFrame(rows, "arrival long, ts timestamp")
    census = {
        r["window_start"]: r
        for r in late_data_census(
            caps, delay_s, window_s, order_col="arrival"
        ).collect()
    }
    batch_counts = {
        int(t0.replace(tzinfo=dt.timezone.utc).timestamp() + 0) // window_s
        * window_s: 0
    }
    batch_counts = {}
    for _, ts in rows:
        w = (
            int(ts.replace(tzinfo=dt.timezone.utc).timestamp())
            // window_s
            * window_s
        )
        batch_counts[w] = batch_counts.get(w, 0) + 1

    # stream the log in 6 arrival-order files + a far-future sentinel
    # (flushes every real window past the final watermark)
    d = str(tmp_path / "late_stream")
    _os.makedirs(d, exist_ok=True)
    chunks = [rows[j * 20:(j + 1) * 20] for j in range(6)]
    for j, chunk in enumerate(chunks):
        pdf = spark.createDataFrame(chunk, "arrival long, ts timestamp")
        pdf.coalesce(1).write.mode("overwrite").parquet(f"{d}/f{j}")
        _time.sleep(0.05)
    # TWO sentinels: the watermark advances at the END of a batch and
    # append-mode state flushes on the NEXT one, so the second
    # sentinel batch is what actually emits the finalized windows
    for si, days in ((9, 30), (10, 31)):
        sentinel = spark.createDataFrame(
            [(10**9 + si, t0 + dt.timedelta(days=days))],
            "arrival long, ts timestamp",
        )
        sentinel.coalesce(1).write.mode("overwrite").parquet(f"{d}/f{si}")
    # one flat dir of part files, mtime-ordered like the writes
    flat = str(tmp_path / "flat")
    _os.makedirs(flat, exist_ok=True)
    import glob as _glob
    import shutil as _shutil

    k = 0
    for j in list(range(6)) + [9, 10]:
        for f in sorted(_glob.glob(f"{d}/f{j}/*.parquet")):
            dst = f"{flat}/part-{k:03d}.parquet"
            _shutil.copy(f, dst)
            _os.utime(dst, (1700000000 + k, 1700000000 + k))
            k += 1

    stream = (
        spark.readStream.schema("arrival long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(flat)
        .withWatermark("ts", f"{delay_s} seconds")
        .groupBy(F.window("ts", f"{window_s} seconds").alias("w"))
        .agg(F.count("*").alias("n"))
    )
    qname = "late_bridge"
    q = (
        stream.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        ss = {
            int(r["w"]["start"].replace(
                tzinfo=dt.timezone.utc).timestamp()): r["n"]
            for r in spark.sql(f"SELECT * FROM {qname}").collect()
        }
    finally:
        q.stop()

    total_dropped = 0
    for w, bc in batch_counts.items():
        got = ss.get(w, 0)
        assert got <= bc
        total_dropped += bc - got
        late_bound = census.get(w)
        if late_bound is not None:
            # census is row-granular (watermark advances per row); SS
            # advances per batch -> SS can only drop FEWER
            assert bc - got <= late_bound["n_late"]
    census_total = sum(r["n_late"] for r in census.values())
    assert total_dropped <= census_total
    # the deep stragglers make the bound non-vacuous: SS really drops
    assert total_dropped >= 1
