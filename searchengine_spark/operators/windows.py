"""Time-window aggregation operators over the events stream/table.

The same declarative shape serves batch (driver oracle checks) and
Structured Streaming (searchengine_spark.streaming — watermark + window
on the identical expressions). Windows are epoch-aligned tumbling
buckets, so DuckDB's time_bucket reproduces the boundaries exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """(window_start, event_type, n_events, sum_value) per tumbling
    window — the micro-batch/streaming-compatible aggregate (partial agg
    map-side; one shuffle on (window, key))."""
    return (
        events.groupBy(
            F.window(F.col(ts_col), window).alias("w"), F.col(key_col)
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def top_user_per_window(
    events: DataFrame, window: str = "1 hour", ts_col: str = "ts"
) -> DataFrame:
    """Per window: the user with the highest summed value (ties → lowest
    user_id) — window + ranked-window composition (T3 shape on time)."""
    from pyspark.sql import Window as W

    per_user = (
        events.groupBy(F.window(F.col(ts_col), window).alias("w"), "user_id")
        .agg(F.sum("value").alias("user_value"))
        .select(F.col("w.start").alias("window_start"), "user_id", "user_value")
    )
    rk = W.partitionBy("window_start").orderBy(
        F.col("user_value").desc(), F.col("user_id").asc()
    )
    return (
        per_user.withColumn("rn", F.row_number().over(rk))
        .filter(F.col("rn") == 1)
        .select("window_start", "user_id", "user_value")
    )


def session_aggregate(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """(user_id, session_start, n_events, sum_value) — session windows:
    a session groups a key's events whose gaps are < `gap`; a quiet
    period ≥ `gap` closes it. Uses Spark's native ``session_window``
    aggregate (the streaming-capable merging-window operator — the same
    expression runs under ``withWatermark`` in Structured Streaming,
    where state merges sessions across micro-batches). One shuffle on
    the key; window merging is state-local.

    session_window's end = last event + gap; session_start = first event
    ts — reproducible in plain SQL via the classic lag/gap-flag/cumsum
    construction (the DuckDB oracle, __spark_entry__)."""
    return (
        events.groupBy(
            F.col(key_col),
            F.session_window(F.col(ts_col), gap).alias("sw"),
        )
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            key_col,
            F.col("sw.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


def fetch_schedule(
    urls: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    delay_col: str = "crawl_delay",
    default_delay: float = 0.5,
) -> DataFrame:
    """(url, host, rk, sched_time) — the ST2 politeness virtual clock
    materialized as a schedule: within each host, urls fetch in priority
    order (url asc here — callers with a score column pre-sort/alias)
    one ``crawl_delay`` apart, so url #k of host h is dispatched at
    (k−1)·delay_h virtual seconds. The export view a fetch fleet
    consumes; the round loop's quota slice (window_quota / frontier
    batch) is this same clock truncated at the round horizon.

    One per-host window — at 10^10-frontier scale the input is the
    ALREADY-QUOTA-SLICED batch (≤ quota rows per host by construction),
    so the window never sees a hot host's full backlog (the two-phase
    salted quota upstream guarantees that)."""
    w = Window.partitionBy(host_col).orderBy(F.col(url_col).asc())
    delay = F.coalesce(F.col(delay_col), F.lit(default_delay))
    return urls.select(
        F.col(url_col).alias("url"),
        F.col(host_col).alias("host"),
        F.row_number().over(w).alias("rk"),
        ((F.row_number().over(w) - F.lit(1)) * delay).alias("sched_time"),
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort_week, week_offset, n_users) — the classic weekly cohort
    retention triangle: users grouped by their first-activity week,
    counted distinct in every later week they return.

    Pure exact-integer analytics (counts + ISO week truncation), so
    the oracle hash has no float tolerance at all.

    Scale shape (100 TB of events): first-activity is ONE min-agg per
    user (map-side combined); the activity grid is a distinct over
    (user, week) — both shuffle on user_id, so AQE reuses the
    exchange; the final count-distinct collapses to exact counts per
    (cohort, offset) — a frame bounded by weeks², never user-sized.
    No window functions: a per-user min beats a global rank at every
    skew level.
    """
    w = F.date_trunc("week", F.col(ts_col))
    act = (
        events.select(F.col(user_col).alias("u"), w.alias("w"))
        .distinct()
    )
    first = act.groupBy("u").agg(F.min("w").alias("cw"))
    return (
        act.join(first, "u")
        .select(
            F.col("cw").alias("cohort_week"),
            F.floor(F.datediff(F.col("w"), F.col("cw")) / 7)
            .cast("int")
            .alias("week_offset"),
            "u",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("u").alias("n_users"))
    )


def burst_windows(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    z_threshold: float = 3.0,
) -> DataFrame:
    """(event_type, ws, n_events, z, is_burst) — per-type hourly rate
    anomaly detection: z-score of each tumbling window's event count
    against that type's own mean/σ over its observed windows, flagged
    at z > threshold. The ops-dashboard burst detector a crawl/serving
    pipeline alarms on (hot-host storms, scraper bursts, breaking-news
    query spikes).

    Determinism without a float-sum tolerance: mean and variance come
    from EXACT integer sums (Σn, Σn², W per type) via the textbook
    population form σ² = (W·Σn² − (Σn)²)/W², evaluated in one fixed
    expression both engines share; per-row z is one subtraction and
    divide. σ = 0 types (constant rate) report z = 0 and never flag.

    Scale: one (type, window) count agg (map-side combined), one tiny
    per-type stats agg broadcast back — no windows over event rows,
    no global sort. ws is formatted as a string, the tumbling_counts
    timestamp discipline."""
    w = F.date_trunc("hour", F.col(ts_col))
    counts = (
        events.select(F.col(type_col).alias("event_type"), w.alias("w"))
        .groupBy("event_type", "w")
        .agg(F.count("*").alias("n_events"))
    )
    stats = counts.groupBy("event_type").agg(
        F.count("*").alias("wn"),
        F.sum("n_events").alias("s1"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("s2"),
    )
    j = counts.join(F.broadcast(stats), "event_type")
    wn = F.col("wn").cast("double")
    mu = F.col("s1").cast("double") / wn
    var = (
        (wn * F.col("s2").cast("double")
         - F.col("s1").cast("double") * F.col("s1").cast("double"))
        / (wn * wn)
    )
    sigma = F.sqrt(var)
    z = F.when(
        sigma > 0.0, (F.col("n_events").cast("double") - mu) / sigma
    ).otherwise(F.lit(0.0))
    return j.select(
        "event_type",
        F.date_format("w", "yyyy-MM-dd HH:mm:ss").alias("ws"),
        "n_events",
        z.alias("z"),
        (z > F.lit(z_threshold)).alias("is_burst"),
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """(prev_type, next_type, n, p) — the first-order Markov
    transition matrix of per-user event streams: how often event type
    A is immediately followed by B in the same user's timeline, with
    p = n / Σ_B n (row-normalized, an exact-int ratio). The
    click-model / navigation-pattern table funnels and sessions both
    build on.

    ONE lag window per user stream (partitioned by user — bounded by a
    user's history, never corpus-wide; ties broken by event id for
    determinism) + one (prev, next) count agg + a row-total broadcast
    back."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = (
        events.select(
            F.col(user_col),
            F.col(ts_col),
            F.col(id_col),
            F.col(type_col).alias("next_type"),
        )
        .withColumn("prev_type", F.lag("next_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count("*").alias("n"))
    )
    tot = pairs.groupBy("prev_type").agg(F.sum("n").alias("tot"))
    return pairs.join(F.broadcast(tot), "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        (F.col("n").cast("double") / F.col("tot").cast("double")).alias("p"),
    )


def late_data_census(
    events: DataFrame,
    delay_seconds: int = 3600,
    window_seconds: int = 3600,
    ts_col: str = "ts",
    order_col: str = "event_id",
    bucket: int | None = None,
) -> DataFrame:
    """(window_start, n_events, n_late) per tumbling window: how many
    events a streaming job with watermark ``delay_seconds`` would have
    DROPPED, replayed over the at-rest log. The arrival order is
    ``order_col`` (the log's total order); the watermark when an event
    arrives is max(event time of all STRICTLY EARLIER arrivals) −
    delay, and the event is late iff its own event time is below that
    — the row-granular idealization of Structured Streaming's
    per-batch watermark (strictly conservative: a per-batch watermark
    can only be lower, so real SS drops ⊆ this count).

    This is the capacity-planning number for the streaming side of the
    engine (streaming/stateful.py): pick the smallest delay whose
    n_late is acceptable, from history, before deploying the stream.

    Scale shape: the running max over the arrival order uses the
    vocab_growth two-phase prefix pattern — bucket upsweep window over
    the tiny bucket table, then within-bucket windows — with the same
    self-sizing bucket = ceil(sqrt(id_span)), so no caller can produce
    an unbounded single-partition sort. Event-time seconds are exact
    int64 (unix_micros div 10^6); the census is pure integer counts.
    """
    if bucket is None:
        import math

        lo, hi = events.select(
            F.min(F.col(order_col)), F.max(F.col(order_col))
        ).first()
        span = max(1, int(hi) - int(lo) + 1) if hi is not None else 1
        bucket = max(1, math.isqrt(span - 1) + 1)
    neg_inf = -(1 << 62)
    e = events.selectExpr(
        f"{order_col} AS oid",
        # timestampdiff: timezone-independent, works on TIMESTAMP_NTZ
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
        f" {ts_col}) div 1000000 AS sec",
    ).withColumn("b", (F.col("oid") / bucket).cast("bigint"))
    bucket_max = e.groupBy("b").agg(F.max("sec").alias("bm"))
    # bounded bucket table (one row per bucket); the constant
    # non-foldable key silences the partition-less WindowExec
    # warning so a REAL unbounded global window stays visible
    # in the logs
    wb = (
        Window.partitionBy(F.pmod(F.col("b"), F.lit(1)))
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bucket_pre = bucket_max.select(
        "b",
        F.coalesce(F.max("bm").over(wb), F.lit(neg_inf)).alias("pre_m"),
    )
    wi = (
        Window.partitionBy("b")
        .orderBy("oid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = (
        e.join(F.broadcast(bucket_pre), "b")
        .withColumn(
            "wm",
            F.greatest(
                F.col("pre_m"),
                F.coalesce(F.max("sec").over(wi), F.lit(neg_inf)),
            ),
        )
        .withColumn(
            "late",
            (F.col("wm") > F.lit(neg_inf))
            & (F.col("sec") < F.col("wm") - F.lit(delay_seconds)),
        )
    )
    return (
        marked.groupBy(
            ((F.col("sec") / window_seconds).cast("bigint") * window_seconds)
            .alias("window_start")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("late").cast("long")).alias("n_late"),
        )
    )


def markov_stationary(
    events: DataFrame,
    n_iters: int = 8,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """(event_type, p_stationary) — the long-run occupancy of the
    per-user event Markov chain: π = π·P iterated ``n_iters`` times
    from the uniform vector over event_transitions' row-normalized
    matrix. The "where do user journeys spend their time" number that
    a single transition row can't show (a rarely-entered state with a
    strong self-loop still accumulates mass).

    Determinism: P's entries are exact-int ratios; each iteration's
    π(next) = Σ_prev π(prev)·p folds in prev-type order (sorted-list
    fold over the ≤|types| incoming terms — the lm_score pattern), so
    every π is bit-reproducible and the unrolled DuckDB oracle
    hash-matches. States missing an outgoing row (none here — every
    observed type has successors or is terminal per user; terminal
    tails simply end streams, mass renormalizes implicitly through
    the row-stochastic P restricted to observed transitions).

    Scale shape: the matrix is |types|² rows (single digits for a
    behavioral schema) — every iteration is a tiny broadcast join +
    one bounded-fold agg; the corpus-sized work is event_transitions'
    single lag window, paid once.
    """
    # eager localCheckpoint (not persist): the returned DataFrame is
    # lazy and references p/states ~n_iters times each — a persist
    # released before the caller collects would recompute the corpus-
    # scale transition window every reference. Checkpointing the TINY
    # matrix pays the corpus pass exactly once; the blocks are
    # ContextCleaner-collected when the result is dropped (k_core's
    # loop pattern).
    p = event_transitions(events, user_col, ts_col, type_col, id_col).select(
        "prev_type", "next_type", "p"
    ).localCheckpoint(eager=True)
    states = (
        p.select(F.col("prev_type").alias("t"))
        .unionByName(p.select(F.col("next_type").alias("t")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_states = states.count()
    pi = states.select(
        "t", (F.lit(1.0) / F.lit(float(n_states))).alias("pi")
    )
    fold = (
        "aggregate(sort_array(collect_list(struct(prev_type, term))), "
        "CAST(0.0 AS DOUBLE), (a, s) -> a + s.term)"
    )
    for _ in range(n_iters):
        nxt = (
            pi.join(p, pi["t"] == p["prev_type"])
            .select(
                F.col("next_type"),
                F.col("prev_type"),
                (F.col("pi") * F.col("p")).alias("term"),
            )
            .groupBy("next_type")
            .agg(F.expr(fold).alias("pi"))
            .withColumnRenamed("next_type", "t")
        )
        # states with no inbound mass drop out of the product; keep the
        # full state vector total (left join, 0 fill)
        pi = states.join(nxt, "t", "left").select(
            "t", F.coalesce("pi", F.lit(0.0)).alias("pi")
        )
    out = pi.select(
        F.col("t").alias("event_type"), F.round("pi", 9).alias("p_stationary")
    )
    return out


def active_users(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    wau_days: int = 7,
    mau_days: int = 30,
) -> DataFrame:
    """(day, dau, wau, mau, stickiness) — the product-analytics
    activity surface per calendar day: distinct actives that day, in
    the trailing ``wau_days``, in the trailing ``mau_days``, and the
    DAU/MAU stickiness ratio. Days are exact int epoch-days
    (timestampdiff — TIMESTAMP_NTZ-safe, no timezone arithmetic).

    Scale shape: the event stream collapses to ONE distinct
    (user, day) projection immediately (everything after runs on the
    activity table, bounded by users x days, not events); trailing
    windows are a range join of the tiny day dimension against the
    activity table (a distinct-count over a range window, which
    window functions cannot express) + one groupBy per horizon. All
    counts exact ints; stickiness is the one division.
    """
    ud = (
        events.selectExpr(
            f"{user_col} AS u",
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 "
            f"00:00:00', {ts_col}) div 86400000000 AS day",
        )
        .distinct()
        # localCheckpoint, not persist: the result references ud three
        # times lazily; checkpoint blocks free themselves when the
        # caller drops the result
        .localCheckpoint(eager=True)
    )
    days = ud.select("day").distinct()
    dau = ud.groupBy("day").agg(F.countDistinct("u").alias("dau"))

    def trailing(n: int, name: str) -> DataFrame:
        return (
            days.join(
                ud.select(F.col("u"), F.col("day").alias("d2")),
                (F.col("d2") <= F.col("day"))
                & (F.col("d2") > F.col("day") - n),
            )
            .groupBy("day")
            .agg(F.countDistinct("u").alias(name))
        )

    out = (
        dau.join(trailing(wau_days, "wau"), "day")
        .join(trailing(mau_days, "mau"), "day")
        .selectExpr(
            "day",
            "dau",
            "wau",
            "mau",
            "round(CAST(dau AS DOUBLE) / CAST(mau AS DOUBLE), 9)"
            " AS stickiness",
        )
    )
    return out


def burst_windows_mad(
    events: DataFrame,
    k: int = 3,
    window_seconds: int = 3600,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(event_type, window_start, n_events, med, mad) — hours whose
    event count sits more than ``k`` median-absolute-deviations from
    the per-type median: the ROBUST sibling of burst_windows' z-scores
    (a single huge spike inflates a mean/σ enough to mask the next
    spike; medians don't move). Everything is an exact integer: counts,
    the lower-median (rank ⌈n/2⌉ order statistic) and the integer MAD,
    so the flag |x − med| > k·mad is bit-exact arithmetic with no
    float in sight.

    Scale shape: one (type, hour) count agg, then two rank windows
    PER TYPE over the bounded hour table (hours-per-type is bounded by
    the time span — 720 rows for a 30-day month — never by events).
    mad = 0 (constant-rate types) flags only exact deviations > 0·k,
    i.e. any change; callers wanting quieter output filter mad > 0.
    """
    hour = (
        f"(timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 "
        f"00:00:00', {ts_col}) div {window_seconds * 1000000})"
        f" * {window_seconds}"
    )
    counts = (
        events.selectExpr(f"{type_col} AS event_type", f"{hour} AS ws")
        .groupBy("event_type", "ws")
        .agg(F.count("*").alias("n"))
    )
    wt = Window.partitionBy("event_type").orderBy(
        F.col("n").asc(), F.col("ws").asc()
    )
    wc = Window.partitionBy("event_type")
    with_med = (
        counts.withColumn("rk", F.row_number().over(wt))
        .withColumn("cnt", F.count(F.lit(1)).over(wc))
        .withColumn(
            "med",
            F.max(
                F.when(
                    F.col("rk") == F.ceil(F.col("cnt") / 2), F.col("n")
                )
            ).over(wc),
        )
        .withColumn("dev", F.abs(F.col("n") - F.col("med")))
    )
    wd = Window.partitionBy("event_type").orderBy(
        F.col("dev").asc(), F.col("ws").asc()
    )
    flagged = (
        with_med.withColumn("drk", F.row_number().over(wd))
        .withColumn(
            "mad",
            F.max(
                F.when(
                    F.col("drk") == F.ceil(F.col("cnt") / 2), F.col("dev")
                )
            ).over(wc),
        )
        .filter(F.col("dev") > F.lit(k) * F.col("mad"))
    )
    return flagged.select(
        "event_type",
        F.col("ws").alias("window_start"),
        F.col("n").alias("n_events"),
        "med",
        "mad",
    )
