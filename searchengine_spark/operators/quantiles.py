"""Exact distributed quantiles — bounded-histogram rank selection.

Curation pipelines cut on length/quality percentiles (e.g. drop the
shortest 10% and the longest 1% of documents), and at 100 TB the naive
"global sort, pick row k" is a full-data shuffle for a handful of
scalars. Spark's built-in exact ``percentile`` aggregate pulls every
distinct value into one aggregation buffer; ``percentile_approx`` is
approximate. This operator computes EXACT order statistics with the
same two-phase shape as budget.host_budget's remainder selection:

  1. ONE (value) frequency shuffle with map-side combine — the corpus
     collapses to its value histogram (distinct values, not rows).
  2. Coarse fixed-width buckets over the histogram; the per-bucket
     count table (bounded by value_range / bucket_width, asserted
     <= max_buckets) is the ONLY thing the driver sees first.
  3. Each target rank k = max(1, ceil(p * n)) lands in one bucket by
     cumulative count; only THOSE boundary buckets' (value, freq) rows
     are collected and walked — a few hundred rows, never the data.

Driver state: one bounded histogram + the boundary buckets. The k-th
smallest VALUE is tie-order-independent, so no row-level determinism
caveats. Quantile rule: lower order statistic at rank ceil(p*n)
(clamped to [1, n]) — the discrete quantile a filter cutoff wants, and
trivially reproducible in SQL via row_number.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_quantiles(
    df: DataFrame,
    col: str,
    ps: list[float],
    bucket_width: float = 64.0,
    max_buckets: int = 65536,
) -> DataFrame:
    """One-row-per-p frame (p double, value double): the exact
    rank-ceil(p*n) order statistic of ``col`` (nulls ignored). Raises
    if the coarse histogram exceeds ``max_buckets`` — widen
    bucket_width for wide-range columns."""
    if not ps:
        raise ValueError("ps must be non-empty")
    bad = [p for p in ps if not 0.0 <= p <= 1.0]
    if bad:
        raise ValueError(f"quantile fractions outside [0, 1]: {bad}")
    spark = df.sparkSession
    freq = (
        df.select(F.col(col).cast("double").alias("v"))
        .filter(F.col("v").isNotNull())
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    hist = (
        freq.withColumn(
            "b", F.floor(F.col("v") / F.lit(float(bucket_width)))
        )
        .groupBy("b")
        .agg(F.sum("n").alias("bn"))
        .collect()
    )
    if len(hist) > max_buckets:
        raise ValueError(
            f"{len(hist)} histogram buckets > max_buckets={max_buckets}; "
            "increase bucket_width"
        )
    buckets = sorted((r["b"], r["bn"]) for r in hist)
    n = sum(bn for _, bn in buckets)
    if n == 0:
        return spark.createDataFrame([], "p double, value double")

    # rank -> owning bucket via cumulative counts (driver, O(#buckets))
    targets = {p: min(max(1, math.ceil(p * n)), n) for p in ps}
    need: dict[int, list[tuple[float, int]]] = {}
    for p, k in targets.items():
        acc = 0
        for b, bn in buckets:
            if acc + bn >= k:
                need.setdefault(b, []).append((p, k - acc))
                break
            acc += bn
    rows = (
        freq.withColumn(
            "b", F.floor(F.col("v") / F.lit(float(bucket_width)))
        )
        .filter(F.col("b").isin(list(need)))
        .select("b", "v", "n")
        .collect()
    )
    by_bucket: dict[int, list[tuple[float, int]]] = {}
    for r in rows:
        by_bucket.setdefault(r["b"], []).append((r["v"], r["n"]))
    out = []
    for b, wants in need.items():
        vals = sorted(by_bucket[b])
        for p, local_k in wants:
            acc = 0
            for v, cnt in vals:
                acc += cnt
                if acc >= local_k:
                    out.append((float(p), float(v)))
                    break
    return spark.createDataFrame(
        sorted(out), "p double, value double"
    )
