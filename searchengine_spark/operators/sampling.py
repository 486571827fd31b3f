"""Deterministic corpus sampling for training-data assembly.

Beyond-reference pipeline operators (SURVEY §2.11): building a training
set from a web corpus needs reproducible subsetting — per-stratum
quotas (balance languages/sources) and corpus-mixture weighting (e.g.
"3 parts src0 : 1 part src2"). Random sampling is useless at 100 TB
(not reproducible, not resumable, not joinable); both operators here
derive their randomness from a 60-bit md5 of the row id, so the sample
is a pure function of the data — re-runs, retries and incremental
appends all agree, and the same arithmetic runs in DuckDB for the
oracle (md5 exists in both engines; see dedup.py's simhash rationale).

Scale shape:
  * sample_stratified — per-group exact top-k by hash priority, using
    the same two-phase (group, salt) window as the crawler's politeness
    quota (frontier.py ST3): phase 1 ranks inside (group, salt) buckets
    and keeps ≤ k per bucket (a group's global top-k rows are
    necessarily in their bucket's top-k, so the prune is lossless),
    phase 2 ranks the ≤ n_salts·k survivors. A hot stratum (one
    language being 90% of a web crawl is normal) never funnels through
    a single task.
  * mixture_sample — stateless integer-threshold Bernoulli: keep row ⟺
    h60(id) < floor(weight · 2^60), with the per-source thresholds
    broadcast-joined. No shuffle at all — a map-side filter that
    composes with scan pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

H60_BITS = 60


def h60_col(expr: str) -> F.Column:
    """First 60 bits of md5(expr) as a bigint — engine-portable
    deterministic priority (same value reconstructible in DuckDB)."""
    return F.expr(
        f"CAST(conv(substring(md5({expr}), 1, 15), 16, 10) AS BIGINT)"
    )


def sample_stratified(
    df: DataFrame,
    group_col: str = "lang",
    k: int = 5,
    id_col: str = "doc_id",
    n_salts: int = 4,
) -> DataFrame:
    """Exact deterministic top-k rows per group, priority = h60(id)
    ascending (ties broken by id): (group, id, prio, rk). Hot-stratum
    skew-proof via the two-phase bucket window (see module docstring)."""
    prio = h60_col(f"CAST({id_col} AS STRING)")
    order = (F.col("prio").asc(), F.col(id_col).asc())
    w_salt = Window.partitionBy(group_col, "salt").orderBy(*order)
    w_group = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.select(group_col, id_col)
        .withColumn("prio", prio)
        .withColumn("salt", F.pmod(F.col("prio"), F.lit(n_salts)))
        .withColumn("rk_pre", F.row_number().over(w_salt))
        .filter(F.col("rk_pre") <= k)
        .withColumn("rk", F.row_number().over(w_group))
        .filter(F.col("rk") <= k)
        .select(group_col, id_col, "prio", "rk")
    )


def mixture_thresholds(weights: dict[str, float]) -> dict[str, int]:
    """source → integer keep-threshold floor(w · 2^60). Integer
    comparison keeps the Spark and DuckDB decisions bit-identical (no
    float-division parity concerns)."""
    lim = 1 << H60_BITS
    return {
        s: min(lim, max(0, int(float(w) * lim))) for s, w in weights.items()
    }


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted corpus mixture: keep a row iff
    h60(id) < floor(weights[source] · 2^60). Sources absent from
    `weights` are dropped (weight 0). Returns (id, source, h) for the
    kept rows. Plan shape: broadcast hash join against the tiny
    threshold dim + a scalar filter — no shuffle, no UDF."""
    spark = df.sparkSession
    thr = mixture_thresholds(weights)
    thr_df = spark.createDataFrame(
        [(s, t) for s, t in sorted(thr.items())],
        f"{source_col} string, keep_below bigint",
    )
    return (
        df.select(id_col, source_col)
        .withColumn("h", h60_col(f"CAST({id_col} AS STRING)"))
        .join(F.broadcast(thr_df), source_col, "inner")
        .filter(F.col("h") < F.col("keep_below"))
        .select(id_col, source_col, "h")
    )


def dsir_log_weights(
    occurrences: DataFrame,
    target_ids: DataFrame,
    n_buckets: int = 128,
    id_col: str = "doc_id",
    token_col: str = "token",
) -> DataFrame:
    """DSIR importance log-weights (Xie et al., NeurIPS 2023 "Data
    Selection via Importance Resampling"): score every source document
    by how much more likely its hashed bag-of-tokens is under the
    TARGET distribution than under the SOURCE (raw-corpus) one —

        log w(d) = Σ_tokens [ ln p_t(b(tok)) − ln p_s(b(tok)) ]

    with b = md5-60bit token hash mod n_buckets and both multinomials
    add-one smoothed. ``target_ids`` is the exemplar set (e.g. the
    wiki-quality slice a pretraining mix should resemble).

    Scale shape: the two bucket count tables are map-side-combined
    groupBy aggregations over the SAME bucketed occurrence frame (the
    target side is a left-semi prune of it); the per-bucket log-ratio
    dim is ≤ n_buckets rows — broadcast-joined, never shuffling the
    corpus; totals fold in as 1-row crossJoins so no scalar ever visits
    the driver. The per-doc sum folds (bucket, count·ratio) structs in
    bucket-sorted order — the lm_score determinism pattern — so the
    DuckDB oracle reproduces every double bit-for-bit.

    Returns (doc_id, n_tokens, log_weight) for every doc with ≥1 token.
    """
    b = F.pmod(h60_col(token_col), F.lit(n_buckets)).alias("bucket")
    occ = occurrences.select(
        F.col(id_col).alias("doc_id"), F.col(token_col).alias(token_col)
    ).withColumn("bucket", b)
    src_cnt = occ.groupBy("bucket").agg(F.count("*").alias("cs"))
    tgt_occ = occ.join(
        target_ids.select(F.col(id_col).alias("doc_id")).distinct(),
        "doc_id",
        "left_semi",
    )
    tgt_cnt = tgt_occ.groupBy("bucket").agg(F.count("*").alias("ct"))
    src_tot = src_cnt.agg(F.sum("cs").alias("ts"))
    tgt_tot = tgt_cnt.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("tt"))
    spark = occurrences.sparkSession
    ratio = (
        spark.range(n_buckets)
        .select(F.col("id").alias("bucket"))
        .join(src_cnt, "bucket", "left")
        .join(tgt_cnt, "bucket", "left")
        .crossJoin(src_tot)
        .crossJoin(tgt_tot)
        .selectExpr(
            "bucket",
            # counts << 2^53 stay exact in double; ln of the smoothed
            # ratios is then bit-identical across engines
            "ln((CAST(coalesce(ct, 0) AS DOUBLE) + 1.0D)"
            f" / (CAST(tt AS DOUBLE) + {float(n_buckets)!r}D))"
            " - ln((CAST(coalesce(cs, 0) AS DOUBLE) + 1.0D)"
            f" / (CAST(ts AS DOUBLE) + {float(n_buckets)!r}D)) AS logr",
        )
    )
    per_db = occ.groupBy("doc_id", "bucket").agg(F.count("*").alias("nb"))
    return (
        per_db.join(F.broadcast(ratio), "bucket")
        .withColumn("term", F.col("nb").cast("double") * F.col("logr"))
        .groupBy("doc_id")
        .agg(
            F.sum("nb").alias("n_tokens"),
            F.expr(
                "aggregate(sort_array(collect_list(struct(bucket, term))), "
                "CAST(0.0 AS DOUBLE), (a, s) -> a + s.term)"
            ).alias("log_weight"),
        )
    )


def dsir_sample(
    log_weights: DataFrame,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Gumbel-top-k resampling over DSIR log-weights: each doc draws a
    deterministic Gumbel g = −ln(−ln(u)) from u = (h60('dsir:'+id)+½)/2^60
    and the k largest (log_weight + g) are the sample — exactly sampling
    WITHOUT replacement ∝ softmax(log_weight) (the Gumbel-max trick),
    but reproducible: a pure function of the data, so retries, resumed
    runs and the DuckDB oracle agree bit-for-bit. The 'dsir:' salt
    decorrelates these draws from weighted_sample's. One scan +
    TakeOrdered — no shuffle beyond the top-k merge.

    Returns (doc_id, log_weight, key) for the k sampled docs.
    """
    u = (
        h60_col(f"concat('dsir:', CAST({id_col} AS STRING))").cast("double")
        + F.lit(0.5)
    ) / F.lit(float(2**H60_BITS))
    key = F.col("log_weight") - F.log(-F.log(u))
    return (
        log_weights.select(
            F.col(id_col), F.col("log_weight"), key.alias("key")
        )
        .orderBy(F.col("key").desc(), F.col(id_col).asc())
        .limit(k)
    )


def weighted_sample(
    df: DataFrame,
    weight: F.Column | str,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis
    & Spirakis 2006 A-ES): each row draws u = (h60(id)+1)/2^60 ∈ (0,1]
    and is ranked by key = ln(u)/w — the top-k keys are exactly a
    w-proportional sample without replacement. ln(u)/w preserves the
    classic u^(1/w) order (ln is monotone, w > 0) while avoiding pow's
    cross-engine precision traps.

    One scan + TakeOrdered — no shuffle beyond the top-k merge; the
    sample is a pure function of row ids, so re-runs, retries and the
    DuckDB oracle reproduce it bit-for-bit.

    Returns the sampled rows' (id, weight, key), key rounded by the
    caller for oracle comparison.
    """
    w = F.col(weight) if isinstance(weight, str) else weight
    u = (h60_col(f"CAST({id_col} AS STRING)") + F.lit(1)).cast(
        "double"
    ) / F.lit(float(2**60))
    key = F.log(u) / w.cast("double")
    return (
        df.select(
            F.col(id_col),
            w.cast("double").alias("weight"),
            key.alias("key"),
        )
        .filter(F.col("weight") > 0)
        .orderBy(F.col("key").desc(), F.col(id_col).asc())
        .limit(k)
    )


def mixture_report(
    documents: DataFrame,
    targets: dict[str, float],
    bucket_col: str = "lang",
) -> DataFrame:
    """(bucket, n, share, target_share, kl_term, ratio) — data-mixture
    diagnostics: how far the corpus composition sits from a target
    mixture, per bucket. kl_term = share·ln(share/target) (summing the
    column gives KL(corpus ‖ target) — the scalar data-mixture papers
    report); ratio = share/target is the per-bucket up/down-sampling
    factor a rebalance (mixture_sample) would need. Buckets absent
    from `targets` get target 0 ⇒ kl_term NULL-guarded to 0 with an
    infinite-ratio sentinel ratio = 0.0 documented here (the caller
    must drop or cap them — they cannot be hit by finite resampling).

    ONE count aggregate over the bucket key + a broadcast 1-row total;
    the target table is a literal broadcast dim. Exact counts into
    fixed float expressions."""
    spark = documents.sparkSession
    tgt = spark.createDataFrame(
        [(k, float(v)) for k, v in sorted(targets.items())],
        "bucket string, target_share double",
    )
    counts = documents.groupBy(
        F.col(bucket_col).alias("bucket")
    ).agg(F.count("*").alias("n"))
    total = documents.count()
    share = F.col("n").cast("double") / F.lit(float(total))
    j = counts.join(F.broadcast(tgt), "bucket", "left")
    kl = F.when(
        F.col("target_share").isNotNull() & (F.col("target_share") > 0.0),
        share * F.log(share / F.col("target_share")),
    ).otherwise(F.lit(0.0))
    ratio = F.when(
        F.col("target_share").isNotNull() & (F.col("target_share") > 0.0),
        share / F.col("target_share"),
    ).otherwise(F.lit(0.0))
    return j.select(
        "bucket",
        "n",
        share.alias("share"),
        F.coalesce(F.col("target_share"), F.lit(0.0)).alias("target_share"),
        kl.alias("kl_term"),
        ratio.alias("ratio"),
    )


def domain_split(
    df: DataFrame,
    pld_sql_expr: str,
    splits: list[tuple[str, float]] | None = None,
    out_col: str = "split",
) -> DataFrame:
    """df + an ``out_col`` string column: leakage-safe train/val/test
    assignment keyed by REGISTRABLE DOMAIN. Splitting a web corpus by
    row (or even by page URL) leaks: near-duplicate pages, mirrors and
    template families live on the same site, so a row-wise 80/10/10
    puts one copy in train and its near-dup in test — the classic
    contamination the split exists to prevent. Keying the split on
    pld(host) puts every page of a domain in ONE split by
    construction.

    Deterministic and stateless like mixture_sample: the split is
    h60(pld) against cumulative integer thresholds (floor(cum_w·2^60)
    — exact int64 both engines), so re-runs, appends and retries agree
    and the assignment is reproducible from the data alone. Rounding
    of the last cumulative weight is forced to 2^60, so every hash is
    always assigned. Zero shuffle: a pure projection over the pld CASE
    expression, composing with scan pruning.
    """
    if splits is None:
        splits = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    if not splits or abs(sum(w for _, w in splits) - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1: {splits}")
    h = h60_col(pld_sql_expr)
    cum = 0.0
    col = None
    for i, (name, w) in enumerate(splits):
        cum += w
        hi = (1 << H60_BITS) if i == len(splits) - 1 else int(
            cum * (1 << H60_BITS)
        )
        cond = h < F.lit(hi)
        col = F.when(cond, F.lit(name)) if col is None else col.when(
            cond, F.lit(name)
        )
    return df.withColumn(out_col, col)
