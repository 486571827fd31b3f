"""Per-host crawl-budget apportionment (largest-remainder method).

Engine extension past the reference crawler: the reference fetches
whatever its priority queue yields (`/root/reference/crawler.py`,
single-host politeness only); a distributed frontier over 10^10 URLs
must instead split a global per-round fetch budget across hosts so no
host starves and the round total is exact. This is the classic
apportionment problem; we use Hamilton's largest-remainder method —
every host gets floor(budget * score / total_score), and the leftover
seats go to the largest fractional remainders — because it is (a)
exactly proportional in expectation, (b) pure integer arithmetic, so
the result is bit-identical on any engine, and (c) one pass.

Scale design:
  * totals via an ``agg`` broadcast-crossJoined back (1-row build
    side, no driver round-trip for the per-row math);
  * the leftover-seat count can be O(#hosts), so the +1 winners are
    NOT selected with a global sort/limit. Instead: bucket the
    remainders (integer width, no overflow), count per bucket (one
    tiny agg, <= n_buckets + 1 rows to the driver), find the bucket
    the r-th largest remainder falls in, take every row strictly
    above it for free, and order/limit ONLY inside that boundary
    bucket (~ n / n_buckets rows through TakeOrdered). Degenerate
    all-equal-remainder inputs collapse to one bucket and fall back
    to plain TakeOrdered — correct, just not pruned;
  * driver scalars: the leftover count and the (<= n_buckets + 1)-row
    bucket histogram; never host rows;
  * integer overflow bound: budget * score must fit in int64 —
    holds for any realistic budget (<= 10^9) x score (<= 10^9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 1024


def host_budget(
    hosts: DataFrame,
    budget: int,
    host_col: str = "host",
    score_col: str = "score",
) -> DataFrame:
    """Apportion an integer ``budget`` across hosts proportional to
    ``score`` (non-negative integers), largest-remainder tie-broken
    by host ascending. Output: (host, score, quota) with
    sum(quota) == budget exactly (when total score > 0; all-zero
    scores yield all-zero quotas).
    """
    base = (
        hosts.select(
            F.col(host_col).alias("host"),
            F.col(score_col).cast("bigint").alias("score"),
        )
        .crossJoin(
            F.broadcast(
                hosts.agg(
                    F.sum(F.col(score_col).cast("bigint")).alias("s")
                )
            )
        )
        .selectExpr(
            "host",
            "score",
            "s",
            f"CASE WHEN s > 0 THEN CAST({budget} AS BIGINT) * score DIV s"
            " ELSE CAST(0 AS BIGINT) END AS base",
            f"CASE WHEN s > 0 THEN CAST({budget} AS BIGINT) * score % s"
            " ELSE CAST(0 AS BIGINT) END AS rem",
        )
        # bucket width >= 1; rem in [0, s) so bkt in [0, N_BUCKETS]
        .selectExpr(
            "host",
            "score",
            "s",
            "base",
            "rem",
            f"CASE WHEN s > 0 THEN rem DIV (s DIV {N_BUCKETS} + 1)"
            " ELSE CAST(0 AS BIGINT) END AS bkt",
        )
        .persist()
    )
    row = base.agg(
        F.sum("base").alias("given"),
        F.count(F.lit(1)).alias("n"),
        F.max("s").alias("s"),
    ).first()
    empty_or_zero = (
        row["n"] == 0 or row["s"] is None or int(row["s"]) == 0
    )
    leftover = 0 if empty_or_zero else budget - int(row["given"])
    if leftover > 0:
        hist = {
            r["bkt"]: r["c"]
            for r in base.groupBy("bkt")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        above = 0
        boundary = 0  # bkt of the r-th largest remainder
        for bkt in sorted(hist, reverse=True):
            if above + hist[bkt] >= leftover:
                boundary = bkt
                break
            above += hist[bkt]
        sure = base.where(F.col("bkt") > F.lit(boundary)).select(
            "host", F.lit(1).alias("bump")
        )
        edge = (
            base.where(F.col("bkt") == F.lit(boundary))
            .orderBy(F.col("rem").desc(), F.col("host").asc())
            .limit(leftover - above)
            .select("host", F.lit(1).alias("bump"))
        )
        out = base.join(sure.unionAll(edge), "host", "left")
    else:
        out = base.withColumn("bump", F.lit(None).cast("int"))
    res = out.select(
        "host",
        "score",
        (F.col("base") + F.coalesce(F.col("bump"), F.lit(0))).alias(
            "quota"
        ),
    )
    res = res.localCheckpoint(eager=True)
    base.unpersist()
    return res
