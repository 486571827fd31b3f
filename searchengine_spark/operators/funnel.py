"""Ordered-step funnel analysis over the events stream.

The classic product-analytics query: of the users who did step 1, how
many went on to do step 2 AFTER it, then step 3 after that — with
per-step conversion against the funnel entry. Step matching uses the
standard earliest-completion semantics: a user's step-k time is the
MINIMUM event time of the step-k type that is strictly later than
their step-(k-1) time (first-touch attribution; re-orderings of later
events cannot change it).

Scale design:
  * Each step is one type-filtered scan of events (the equality
    predicate pushes to the parquet scan) joined against the previous
    step's per-user table — which is ONE ROW PER USER, i.e. bounded by
    the user dimension, not event volume. The join is user-keyed and
    the min() aggregation combines map-side.
  * Step tables hand off between iterations via eager localCheckpoint
    (the same generation discipline as the dedup/linkrank loops): the
    final union reads each step's materialized blocks instead of
    re-deriving step k-1 once per later step, and the blocks are
    ContextCleaner-collected with the returned frame — no
    session-lifetime cache leak. The funnel result itself is k rows.
  * The entry count joins back as a broadcast 1-row dimension — no
    global window, no driver arithmetic.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(step_idx, step, n_users, conversion) for an ordered step list.

    ``conversion`` is n_users(step) / n_users(first step); the first
    row is 1.0 by construction (or the frame is empty if nobody did
    step 1).
    """
    if not steps:
        raise ValueError("funnel: steps must be non-empty")
    u, t = F.col(user_col).alias("user"), F.col(ts_col).alias("t")
    cur = (
        events.where(F.col(type_col) == steps[0])
        .select(u, F.col(ts_col))
        .groupBy("user")
        .agg(F.min(ts_col).alias("t"))
        .localCheckpoint(eager=True)
    )
    tiers = [cur]
    for s in steps[1:]:
        nxt = (
            events.where(F.col(type_col) == s)
            .select(u, t)
            .join(cur.withColumnRenamed("t", "prev_t"), "user")
            .where(F.col("t") > F.col("prev_t"))
            .groupBy("user")
            .agg(F.min("t").alias("t"))
            .localCheckpoint(eager=True)
        )
        tiers.append(nxt)
        cur = nxt
    tagged = reduce(
        DataFrame.unionByName,
        [
            tier.select(
                F.lit(i + 1).alias("step_idx"),
                F.lit(steps[i]).alias("step"),
                "user",
            )
            for i, tier in enumerate(tiers)
        ],
    )
    counts = tagged.groupBy("step_idx", "step").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    entry = counts.where(F.col("step_idx") == 1).select(
        F.col("n_users").cast("double").alias("n_entry")
    )
    return counts.crossJoin(F.broadcast(entry)).select(
        "step_idx",
        "step",
        "n_users",
        (F.col("n_users").cast("double") / F.col("n_entry")).alias(
            "conversion"
        ),
    )


def assoc_rules(
    events: DataFrame,
    basket_col: str = "user_id",
    item_col: str = "event_type",
    min_support: int = 5,
) -> DataFrame:
    """(antecedent, consequent, n_both, n_ante, confidence, lift) —
    one-item association rules over per-basket item SETS (the Agrawal
    et al. 1993 market-basket statistics, here over behavioral event
    types: "users who did X also did Y"). confidence = P(Y|X),
    lift = P(Y|X)/P(Y) — lift > 1 is genuine association, ≈ 1 is
    popularity coincidence. Rules are emitted in both directions for
    pairs co-occurring in ≥ min_support baskets.

    Exactness: supports are distinct-basket counts (int64); confidence
    and lift are fixed-shape ratios of exact ints. Plan: ONE distinct
    (basket, item) projection, a per-basket self-join on item-distinct
    rows (fan-out bounded by the item-type cardinality squared, not by
    events), and broadcast-sized per-item support dims.
    """
    bi = events.select(
        F.col(basket_col).alias("b"), F.col(item_col).alias("i")
    ).distinct()
    n_baskets = bi.select("b").distinct().count()
    supp = bi.groupBy("i").agg(F.count("*").alias("n"))
    x = bi.select("b", F.col("i").alias("ia"))
    y = bi.select(F.col("b").alias("b2"), F.col("i").alias("ib"))
    both = (
        x.join(y, (x["b"] == y["b2"]) & (F.col("ia") != F.col("ib")))
        .groupBy("ia", "ib")
        .agg(F.count("*").alias("n_both"))
        .filter(F.col("n_both") >= min_support)
    )
    out = (
        both.join(
            F.broadcast(supp.select(F.col("i").alias("ia"),
                                    F.col("n").alias("n_ante"))), "ia"
        )
        .join(
            F.broadcast(supp.select(F.col("i").alias("ib"),
                                    F.col("n").alias("n_cons"))), "ib"
        )
    )
    conf = F.col("n_both").cast("double") / F.col("n_ante").cast("double")
    lift = (F.col("n_both") * F.lit(int(n_baskets))).cast("double") / (
        F.col("n_ante") * F.col("n_cons")
    ).cast("double")
    return out.select(
        F.col("ia").alias("antecedent"),
        F.col("ib").alias("consequent"),
        "n_both",
        "n_ante",
        F.round(conf, 9).alias("confidence"),
        F.round(lift, 9).alias("lift"),
    )


def gini_counts(
    counts: DataFrame,
    key_col: str = "k",
    n_col: str = "n",
) -> DataFrame:
    """One row (n_keys, total, gini) — the Gini coefficient of a
    per-entity count table (host fetch loads, user event volumes,
    shard sizes): the standard inequality number for "is one host /
    user / shard eating the pipeline", complementing partition_balance
    (which shows max load) with the full-distribution statistic.

      G = 2·Σ_i i·x_i / (n·Σx) − (n+1)/n,  x ascending, i = 1..n

    Exactness: ranks and counts are int64, so Σ i·x_i is an exact
    integer and G is a fixed two-division expression — bit-equal in
    any engine. Plan note: the rank window runs over the ENTITY table
    (hosts/users/shards — already aggregated, orders of magnitude
    smaller than the event stream), partitioned by a non-foldable
    constant; for entity tables that are themselves huge, pre-bucket
    with the vocab_growth two-phase pattern first.
    """
    base = counts.select(
        F.col(key_col), F.col(n_col).cast("long").alias("x")
    )
    one = F.pmod(F.col("x"), F.lit(1))
    w = Window.partitionBy(one).orderBy(
        F.col("x").asc(), F.col(key_col).asc()
    )
    ranked = base.withColumn("i", F.row_number().over(w).cast("long"))
    return ranked.agg(
        F.count("*").alias("n_keys"),
        F.sum("x").alias("total"),
        F.sum(F.col("i") * F.col("x")).alias("s_ix"),
    ).selectExpr(
        "n_keys",
        "total",
        "round(CAST(2 * s_ix AS DOUBLE) "
        "/ CAST(n_keys * total AS DOUBLE) "
        "- CAST(n_keys + 1 AS DOUBLE) / CAST(n_keys AS DOUBLE), 9)"
        " AS gini",
    )


def funnel_latency(
    events: DataFrame,
    steps: list[str],
    ps: list[float] = (0.25, 0.5, 0.9),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(p, latency_s, n_converted) — time-to-convert quantiles: for
    users completing the whole ordered funnel (the same
    earliest-valid-progression semantics as funnel()), the exact
    p-quantiles of last-step-minus-first-step in integer seconds.
    Conversion RATE (funnel) says how many; this says how long — the
    second number every activation dashboard needs.

    Exactness: per-user step times are the funnel's deterministic
    min-ts chain; latency is timestampdiff seconds (int64,
    TIMESTAMP_NTZ-safe); the quantile is exact_quantiles' bounded
    two-phase histogram rank selection — no global sort. n_converted
    replicates on each row (the driver's hash covers it once per p).
    """
    if not steps or len(steps) < 2:
        raise ValueError("funnel_latency needs >= 2 steps")
    u = F.col(user_col).alias("user")
    first = (
        events.where(F.col(type_col) == steps[0])
        .select(u, F.col(ts_col))
        .groupBy("user")
        .agg(F.min(ts_col).alias("t0"))
        .localCheckpoint(eager=True)
    )
    cur = first.select("user", F.col("t0").alias("t"))
    for s in steps[1:]:
        cur = (
            events.where(F.col(type_col) == s)
            .select(u, F.col(ts_col).alias("t"))
            .join(cur.withColumnRenamed("t", "prev_t"), "user")
            .where(F.col("t") > F.col("prev_t"))
            .groupBy("user")
            .agg(F.min("t").alias("t"))
            .localCheckpoint(eager=True)
        )
    lat = first.join(cur, "user").selectExpr(
        # microsecond diff then integer-divide: SECOND-granularity
        # timestampdiff and DuckDB date_diff('second') disagree by one
        # on fractional timestamps (floor-of-delta vs boundary count)
        "timestampdiff(MICROSECOND, t0, t) div 1000000 AS lat"
    )
    n_conv = lat.count()
    from searchengine_spark.operators.quantiles import exact_quantiles

    q = exact_quantiles(lat, "lat", list(ps), bucket_width=86400.0)
    return q.selectExpr(
        "p",
        "value AS latency_s",
        f"CAST({n_conv} AS BIGINT) AS n_converted",
    )


def session_paths(
    events: DataFrame,
    gap_minutes: int = 30,
    min_count: int = 3,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """(path, n_sessions) — the top navigation paths: per user session
    (gap-based sessionization, ``gap_minutes`` of silence ends a
    session) the ordered event-type sequence joined with '>', counted
    across sessions. The classic clickstream path-mining census the
    funnel/transition operators summarize but never show whole.

    Determinism: session boundaries come from exact microsecond gap
    comparisons; within a session the path orders by (ts, event_id)
    (id totalises equal timestamps); the census is exact counts.

    Scale shape: ONE user-partitioned lag window for boundaries + one
    (user, session) collect_list (bounded by a session's length — gap
    sessionization caps it in practice; a pathological no-gap user is
    one group, same bound as any sessionizer) + one map-side-combined
    path count.
    """
    us = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    gap_us = gap_minutes * 60 * 1000000
    marked = (
        events.select(
            F.col(user_col).alias("u"),
            F.col(ts_col).alias("t"),
            F.col(id_col).alias("i"),
            F.col(type_col).alias("y"),
        )
        .withColumn("prev_t", F.lag("t").over(
            Window.partitionBy("u").orderBy("t", "i")
        ))
        .withColumn(
            "new_sess",
            F.when(
                F.col("prev_t").isNull()
                | (
                    F.expr("timestampdiff(MICROSECOND, prev_t, t)")
                    > F.lit(gap_us)
                ),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "sess",
            F.sum("new_sess").over(
                Window.partitionBy("u")
                .orderBy("t", "i")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    paths = marked.groupBy("u", "sess").agg(
        F.expr(
            "array_join(transform(sort_array(collect_list("
            "struct(t, i, y))), s -> s.y), '>')"
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .filter(F.col("n_sessions") >= min_count)
    )
