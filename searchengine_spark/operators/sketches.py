"""Cardinality / frequency sketches — approximate, exactly verified.

KMV (k-minimum-values): the classic bottom-k / theta-sketch cardinality
estimator (Bar-Yossef et al. 2002; Beyer et al. SIGMOD'07 "On synopses
for distinct-value estimation"): hash every value, keep the k smallest
DISTINCT hashes; if fewer than k exist the count is exact, otherwise
the k-th smallest hash position estimates the density, giving
``est = (k - 1) * 2^60 / h_k``.

HLL (hll_distinct): HyperLogLog (Flajolet et al. AofA'07) built from
explicit registers rather than Spark's approx_count_distinct — the
builtin is a black-box HLL whose exact output no second engine
reproduces, while these registers derive from the repo's deterministic
md5-60bit hash, so the ESTIMATE is bit-reproducible in DuckDB. The
register harmonic sum is kept in exact int64 arithmetic
(sum 2^-rho == (sum 2^(53-rho)) / 2^53 — numerator fits: m * 2^52 <
2^63 for m <= 1024) so no float-summation order can perturb it; only
the final alpha*m^2/S division and the low-range ln correction are
floating point, both single deterministic IEEE ops.

Why carry both: KMV gives an unbiased estimator with exact-below-k
behavior and a merge that needs the candidate sets; HLL is the
fixed-size (m registers, max-mergeable) shape a 1000-shard crawl
actually gossips — per-shard register tables merge by element-wise MAX,
the same groupBy(..).agg(max) this builder already uses, so cross-day /
cross-shard unions are one more tiny aggregation, never a rescan.

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


def hll_registers(
    df: DataFrame,
    expr: str,
    group_cols: list[str] | None = None,
    p: int = 8,
) -> DataFrame:
    """Per-group HLL register table (group_cols..., idx, r) for the
    values of SQL expression ``expr`` — m = 2^p registers indexed by the
    hash's top p bits, r = max over values of rho(remaining 60-p bits)
    where rho = leading zeros + 1. Registers from different shards/days
    merge by the same groupBy+max, which is the operational point."""
    if not 4 <= p <= 10:
        raise ValueError(f"p must be in [4, 10], got {p}")
    gcols = list(group_cols or [])
    rem_bits = 60 - p
    h = h60_col(expr)
    idx = F.shiftright(h, rem_bits).alias("idx")
    rest = F.expr(
        f"CAST(conv(substring(md5({expr}), 1, 15), 16, 10) AS BIGINT) "
        f"& {(1 << rem_bits) - 1}"
    )
    # rho = rem_bits - floor(log2(rest)) when rest > 0 else rem_bits + 1;
    # floor(log2) via length(bin(x)) - 1 — exact integer arithmetic,
    # no float log (both engines print minimal binary strings)
    rho = (
        F.when(
            rest > 0,
            F.lit(rem_bits) - (F.length(F.bin(rest)) - F.lit(1)),
        )
        .otherwise(F.lit(rem_bits + 1))
        .alias("rho")
    )
    return (
        df.select(*gcols, idx, rho)
        .groupBy(*gcols, "idx")
        .agg(F.max("rho").alias("r"))
    )


def hll_distinct(
    df: DataFrame,
    expr: str,
    group_cols: list[str] | None = None,
    p: int = 8,
) -> DataFrame:
    """Per-group (group_cols..., n_registers, est_distinct) HLL
    cardinality estimate for ``expr``. Standard HLL with the low-range
    linear-counting correction (E <= 2.5m with empty registers ->
    m*ln(m/zeros)); the 60-bit hash space makes the large-range
    correction irrelevant. See module docstring for why the register
    sum stays in exact int64."""
    regs = hll_registers(df, expr, group_cols, p)
    return hll_estimate_registers(regs, group_cols, p)


def hll_estimate_registers(
    regs: DataFrame,
    group_cols: list[str] | None = None,
    p: int = 8,
) -> DataFrame:
    """(group_cols..., n_registers, est_distinct) from an EXISTING
    register table (group_cols..., idx, r) — the estimate half of
    hll_distinct, factored out so register tables that were built by
    other means (shard merges, the ANF ball iteration in
    graphstats.anf) share the exact same arithmetic, and therefore the
    same oracle translation."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    gcols = list(group_cols or [])
    agg = regs.groupBy(*gcols).agg(
        F.sum(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - r AS INT))")
        ).alias("raw_present"),
        F.count(F.lit(1)).alias("n_registers"),
    )
    zeros = F.lit(m) - F.col("n_registers")
    s_exact = F.col("raw_present") + zeros * F.lit(1 << 53)
    e_raw = (
        F.lit(alpha * m * m * float(1 << 53)) / s_exact.cast("double")
    )
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(e_raw)
    return agg.select(
        *gcols, "n_registers", est.alias("est_distinct")
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


def bloom_fpr_census(
    inserts: DataFrame,
    probes: DataFrame,
    url_col: str = "url",
    k: int = 4,
    m_bits: int | None = None,
) -> DataFrame:
    """One row (m_bits, n_insert, n_probe, bits_set, n_false_pos) — a
    Bloom filter's EMPIRICAL false-positive rate, measured rather than
    quoted from the formula. The crawler's URL-seen fast path
    (crawler/urlseen.py) lives or dies by this number: this census
    builds the same kind of k-hash bit array from ``inserts``, probes
    it with the (deduplicated, anti-joined — guaranteed disjoint)
    ``probes`` set, and counts how many non-members answer "seen".
    Sized by the caller or auto at ~4 bits/key (a deliberately loaded
    filter: the interesting regime for a census is where FPs exist).

    Engine-portable bit math: positions are h60(url#j) % m; the array
    is 32-BIT words (word = pos div 32, mask = 1 << (pos % 32)) —
    never a 1<<63, which DuckDB rejects as signed overflow where the
    JVM silently wraps (the layout.py lesson) — OR-folded with the
    bit_or aggregate; bits_set is a bit_count sum; a probe is a false
    positive iff all k of its bits are set. Every output is an exact
    integer.

    Scale shape: build = one explode(k) projection + ONE
    groupBy(word) bit_or (m/32 rows out — the filter itself is
    broadcast-sized by construction); probe = the same projection
    joined to the word table (broadcast join: the filter is tiny) +
    one groupBy(url) + one count. No driver-side bit twiddling.
    """
    ins = inserts.select(F.col(url_col).alias("u")).distinct()
    prb = (
        probes.select(F.col(url_col).alias("u"))
        .distinct()
        .join(ins, "u", "left_anti")
        .persist()
    )
    n_ins = ins.count()
    if m_bits is None:
        m_bits = max(64, 32 * ((4 * n_ins + 31) // 32))
    pos = (
        f"CAST(conv(substring(md5(concat(u, '#', CAST(j AS STRING))), "
        f"1, 15), 16, 10) AS BIGINT) % {m_bits}"
    )
    expand = [
        F.explode(F.expr(f"sequence(0, {k - 1})")).alias("j"),
    ]
    ins_bits = (
        ins.select("u", *expand)
        .selectExpr("u", f"{pos} AS pos")
        .selectExpr("pos div 32 AS word", "shiftleft(1L, pos % 32) AS mask")
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("w"))
        .persist()
    )
    bits_set = ins_bits.agg(
        F.sum(F.expr("bit_count(w)")).alias("b")
    ).collect()[0]["b"]
    probe_hits = (
        prb.select("u", *expand)
        .selectExpr("u", f"{pos} AS pos")
        .selectExpr(
            "u", "pos div 32 AS word", "shiftleft(1L, pos % 32) AS mask"
        )
        .join(F.broadcast(ins_bits), "word", "left")
        .selectExpr(
            "u",
            "CASE WHEN w IS NOT NULL AND (w & mask) != 0 "
            "THEN 1 ELSE 0 END AS hit",
        )
        .groupBy("u")
        .agg(F.sum("hit").alias("n_set"))
    )
    out = probe_hits.agg(
        F.lit(int(m_bits)).cast("long").alias("m_bits"),
        F.lit(int(n_ins)).cast("long").alias("n_insert"),
        F.count("*").alias("n_probe"),
        F.lit(int(bits_set)).cast("long").alias("bits_set"),
        F.sum(
            F.when(F.col("n_set") == k, 1).otherwise(0)
        ).cast("long").alias("n_false_pos"),
    )
    return out
