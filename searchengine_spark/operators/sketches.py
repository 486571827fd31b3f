"""KMV (k-minimum-values) distinct-count sketch — exact-verifiable.

The classic bottom-k / theta-sketch cardinality estimator (Bar-Yossef
et al. 2002; Beyer et al. SIGMOD'07 "On synopses for distinct-value
estimation"): hash every value, keep the k smallest DISTINCT hashes;
if fewer than k exist the count is exact, otherwise the k-th smallest
hash position estimates the density, giving
``est = (k - 1) * 2^60 / h_k``.

Why this sketch and not HLL: Spark's approx_count_distinct is a
black-box HLL whose exact output no second engine reproduces. KMV
with the repo's deterministic md5-60bit hash is *bit-reproducible*:
the same k hashes fall out in DuckDB, so the estimate itself is
oracle-checkable — the suite's "approximate algorithms, exactly
verified" discipline.

Scale design:
  * ONE pass, no corpus shuffle: each partition streams its Arrow
    batches through a capped distinct-k-min buffer (mapInPandas,
    O(k + batch) state), emitting at most k candidates. The global
    step sees only (partitions x k) rows — a TakeOrdered-sized tail,
    never the data.
  * KMV sketches are mergeable (union = merge candidate sets, re-cut
    at k), which is exactly what the per-partition → global two-level
    plan exploits; the same property serves cross-day sketch unions.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from searchengine_spark.operators.sampling import h60_col

_TWO60 = float(1 << 60)


def cms_estimates(
    df: DataFrame, expr: str, w: int = 1024, d: int = 4
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) frequency
    estimates for every distinct value of ``expr``.

    Output: (v, exact_count, est_count) with the CMS guarantee
    est_count >= exact_count (equality unless the value collided in
    all d rows). ``exact_count`` rides along for free here because the
    batch construction pre-aggregates — production callers estimating
    keys NOT present in the build scan would drop it.

    Batch construction exploits CMS *linearity*: inserting the
    (value, count) frequency vector yields the identical d x w counter
    array as inserting every occurrence, so the corpus is shuffled
    ONCE (groupBy value, map-side combine) and only the distinct-value
    frame is exploded d ways. The sketch itself is d*w rows — mergeable
    across days/shards by bucket-wise addition, which is the point of
    carrying a sketch instead of the exact table at 100 TB.

    Hashing is the repo's md5-60bit (depth-salted) so every counter —
    and hence every ESTIMATE — is bit-reproducible in DuckDB: the
    approximate answer is exactly verified, same discipline as KMV.
    """
    freq = (
        df.select(F.expr(expr).cast("string").alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    depths = F.array(*[F.lit(i) for i in range(d)])
    keyed = freq.select(
        "v", "n", F.explode(depths).alias("depth")
    ).select(
        "v",
        "n",
        "depth",
        F.pmod(
            h60_col("concat(CAST(depth AS STRING), ':', v)"), F.lit(w)
        ).alias("bucket"),
    )
    sketch = keyed.groupBy("depth", "bucket").agg(
        F.sum("n").alias("c")
    )
    return (
        keyed.join(F.broadcast(sketch), ["depth", "bucket"])
        .groupBy("v", "n")
        .agg(F.min("c").alias("est_count"))
        .select(
            "v",
            F.col("n").alias("exact_count"),
            "est_count",
        )
    )


def kmv_distinct(df: DataFrame, expr: str, k: int = 256) -> DataFrame:
    """One-row frame (n_kept, kth_hash, est_distinct) for ``expr``.

    ``expr`` is a SQL expression over ``df``'s columns (cast to string
    before hashing by the caller if not already). ``n_kept`` < k means
    the sketch saw every distinct value and ``est_distinct`` is exact.
    """
    hashed = df.select(h60_col(expr).alias("h"))

    def part_kmin(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        keep: np.ndarray | None = None
        for pdf in batches:
            vals = pdf["h"].to_numpy()
            pool = vals if keep is None else np.concatenate([keep, vals])
            keep = np.unique(pool)[:k]
        if keep is not None and len(keep):
            yield pd.DataFrame({"h": keep})

    cand = hashed.mapInPandas(part_kmin, "h bigint")
    top = cand.distinct().orderBy("h").limit(k)
    return top.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("h").alias("kth_hash"),
    ).select(
        "n_kept",
        "kth_hash",
        F.when(
            F.col("n_kept") < F.lit(k), F.col("n_kept").cast("double")
        )
        .otherwise(
            F.lit(float(k - 1))
            * F.lit(_TWO60)
            / F.col("kth_hash").cast("double")
        )
        .alias("est_distinct"),
    )
