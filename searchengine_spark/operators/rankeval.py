"""Ranking-quality evaluation: nDCG@k, precision@k, recall@k.

The standard TREC-style metrics (Järvelin & Kekäläinen 2002 DCG) over
a ranked result page and a graded-relevance table:

  gain(rk)  = (2^rel - 1) / log2(rk + 1)
  DCG@rk    = Σ_{i≤rk} gain(i)          (running sum in rank order)
  IDCG@rk   = DCG of the ideal ordering (rel DESC over the judgment set)
  nDCG@rk   = DCG@rk / IDCG@rk
  P@rk      = |{i ≤ rk : rel_i > 0}| / rk
  R@rk      = |{i ≤ rk : rel_i > 0}| / |{d : rel_d > 0}|

Scale note: the ranked input is a RESULT PAGE (top-k of a retrieval
operator), k rows — so the two global-order windows here run over k
rows, not the corpus; that is the one place a partition-less window is
the right plan. The relevance table may be corpus-sized: its top-k
ideal prefix is taken with orderBy().limit(k) (TakeOrdered, no global
shuffle) and the relevant-count is a single aggregate.

Float determinism: every gain derives from exact integers; the running
sums evaluate sequentially in rank order in both Spark and DuckDB, so
the metric columns bit-match the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rank_eval(ranked: DataFrame, rels: DataFrame, k: int = 10) -> DataFrame:
    """Per-rank metric table (rk, doc_id, rel, dcg, idcg, ndcg,
    precision, recall).

    `ranked`: (doc_id, score) — a top-k result page; ranks are assigned
    by (score DESC, doc_id ASC), the engine's deterministic tie-break.
    `rels`: (doc_id, rel) graded judgments; missing docs score rel=0.

    Ranks beyond the judgment-set size are dropped (their IDCG prefix
    is undefined); an empty judgment table therefore yields an empty
    metric table, never a divide-by-zero.
    """
    # all four windows run over a bounded result page (≤k rows by
    # construction), so one partition IS the right plan. The partition
    # key pmod(doc_id, 1) is constant-0 but non-foldable — a literal
    # key would be optimized out of the partitionSpec, reintroducing
    # the partition-less WindowExec that at corpus scale is a killer.
    one = F.pmod(F.col("doc_id"), F.lit(1))
    w_rank = Window.partitionBy(one).orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    page = (
        ranked.withColumn("rk", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("rk") <= k)
        .join(rels, "doc_id", "left")
        .withColumn("rel", F.coalesce(F.col("rel"), F.lit(0)).cast("long"))
    )
    # log2 via ln(x)/ln(2): Spark's F.log2 and DuckDB's log2() may
    # differ in the last ulp; the ln form is bit-stable in both engines
    gain = (F.pow(F.lit(2.0), F.col("rel").cast("double")) - F.lit(1.0)) / (
        F.log(F.col("rk").cast("double") + F.lit(1.0)) / F.log(F.lit(2.0))
    )
    w_cum = (
        Window.partitionBy(F.pmod(F.col("rk"), F.lit(1)))
        .orderBy("rk")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    page = page.withColumn("dcg", F.sum(gain).over(w_cum)).withColumn(
        "hits", F.sum((F.col("rel") > 0).cast("long")).over(w_cum)
    )

    # ideal prefix: top-k judgments by (rel DESC, doc_id ASC) — TakeOrdered
    ideal = (
        rels.orderBy(F.col("rel").desc(), F.col("doc_id").asc())
        .limit(k)
        .withColumn(
            "irk",
            F.row_number()
            .over(
                Window.partitionBy(F.pmod(F.col("doc_id"), F.lit(1))).orderBy(
                    F.col("rel").desc(), F.col("doc_id").asc()
                )
            )
            .cast("long"),
        )
    )
    igain = (F.pow(F.lit(2.0), F.col("rel").cast("double")) - F.lit(1.0)) / (
        F.log(F.col("irk").cast("double") + F.lit(1.0)) / F.log(F.lit(2.0))
    )
    ideal = ideal.select(
        F.col("irk").alias("rk"),
        F.sum(igain)
        .over(
            Window.partitionBy(F.pmod(F.col("irk"), F.lit(1)))
            .orderBy("irk")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("idcg"),
    )

    n_relevant = rels.filter(F.col("rel") > 0).count()
    return (
        page.join(F.broadcast(ideal), "rk")
        .select(
            "rk",
            "doc_id",
            "rel",
            "dcg",
            "idcg",
            (F.col("dcg") / F.col("idcg")).alias("ndcg"),
            (F.col("hits").cast("double") / F.col("rk").cast("double")).alias(
                "precision"
            ),
            (
                F.col("hits").cast("double") / F.lit(float(n_relevant))
            ).alias("recall"),
        )
    )


def paired_sign_test(
    metrics: DataFrame,
    n_perm: int = 200,
    q_col: str = "query_id",
    a_col: str = "metric_a",
    b_col: str = "metric_b",
) -> DataFrame:
    """1-row (n_queries, mean_diff, p_value) — the paired sign-flip
    permutation test for comparing two rankers over a query set (Smucker,
    Allan & Carterette, CIKM 2007 recommend exactly this randomization
    test for IR metric differences): under H0 the per-query metric
    difference d_q is symmetric around 0, so each permutation flips
    every d_q's sign by a fair coin and the p-value is the fraction of
    permutations whose |mean| reaches the observed |mean|
    (add-one smoothed: (hits+1)/(n_perm+1)).

    The coins are DETERMINISTIC: flip_q(perm) = h60('perm:qid') % 2 —
    the repo's md5-60bit idiom — so the whole test is reproducible and
    hash-oracled (no RNG; Date/seed-free by construction). Input is any
    per-query paired metric table, e.g. two rank_eval nDCG@10 columns.

    Scale shape: the permutation grid is n_perm × Q rows built by
    fanning the (tiny, broadcast) per-query diff table across a
    spark.range(n_perm) — bounded by the knob, never corpus-sized; the
    per-permutation means fold in query order."""
    from searchengine_spark.operators.sampling import h60_col

    diffs = metrics.select(
        F.col(q_col).alias("qid"),
        (F.col(a_col) - F.col(b_col)).alias("d"),
    )
    q = diffs.count()
    if q == 0:
        return metrics.sparkSession.createDataFrame(
            [], "n_queries long, mean_diff double, p_value double"
        )
    obs = float(
        diffs.agg(
            F.expr(
                "aggregate(sort_array(collect_list(struct(qid, d AS v))), "
                "0.0D, (a, s) -> a + s.v)"
            )
        ).collect()[0][0]
    ) / float(q)
    spark = metrics.sparkSession
    perms = spark.range(n_perm).select(F.col("id").alias("perm"))
    grid = perms.crossJoin(F.broadcast(diffs))  # bounded fan-out: B x Q
    flip = F.when(
        h60_col("concat(CAST(perm AS STRING), ':', CAST(qid AS STRING))")
        % 2 == 0,
        F.col("d"),
    ).otherwise(-F.col("d"))
    pm = grid.select("perm", "qid", flip.alias("fd")).groupBy("perm").agg(
        (
            F.expr(
                "aggregate(sort_array(collect_list(struct(qid, fd AS v))), "
                "0.0D, (a, s) -> a + s.v)"
            )
            / F.lit(float(q))
        ).alias("pmean")
    )
    hits = pm.filter(F.abs(F.col("pmean")) >= abs(obs)).count()
    p = float(hits + 1) / float(n_perm + 1)
    return spark.createDataFrame(
        [(q, obs, p)], "n_queries long, mean_diff double, p_value double"
    )


def rank_correlation(
    a: DataFrame,
    b: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Agreement between two rankers as one row: Kendall tau-a and
    Spearman rho over the docs BOTH result pages retrieved, plus the
    exact pair/rank-difference counts they derive from.

    The standard rank-correlation pair (Kendall 1938; Spearman 1904)
    is how IR work quantifies "do BM25 and the LM ranker agree" (and
    how rank-preserving optimizations are validated — e.g. comparing a
    pruned ranking to the exhaustive one). Inputs are two (id, score)
    result pages; within their intersection each side is re-ranked
    1..n by (score DESC, id ASC) — a monotone restriction of the
    original order, so tau is unchanged and rho is computed on honest
    dense ranks. Scores being bit-reproducible (see bm25_search /
    qlm_search) makes the ranks exact ints: every output column is
    integer arithmetic plus two final IEEE divisions, so the row
    hash-matches the DuckDB oracle.

      tau = (C - D) / (n(n-1)/2)        C/D = concordant/discordant
      rho = 1 - 6 Σd² / (n(n²-1))       d = rank_a - rank_b

    Scale shape: both inputs are top-k result pages (bounded by a
    query-time constant), so the rank windows, the O(n²) pair join
    (a theta join — bounded by construction, never corpus-sized) and
    the 1-row aggregate all run on ≤ n_cand rows; the corpus-scale
    work happened upstream in the retrieval operators. n < 2 yields
    NULL correlations, never a divide-by-zero.
    """
    one = F.pmod(F.col(id_col), F.lit(1))
    common = a.select(id_col, F.col(score_col).alias("sa")).join(
        b.select(id_col, F.col(score_col).alias("sb")), id_col
    )
    wa = Window.partitionBy(one).orderBy(
        F.col("sa").desc(), F.col(id_col).asc()
    )
    wb = Window.partitionBy(one).orderBy(
        F.col("sb").desc(), F.col(id_col).asc()
    )
    r = common.select(
        F.col(id_col),
        F.row_number().over(wa).cast("long").alias("ra"),
        F.row_number().over(wb).cast("long").alias("rb"),
    )
    x = r.select(
        F.col(id_col).alias("xid"),
        F.col("ra").alias("xa"),
        F.col("rb").alias("xb"),
    )
    y = r.select(
        F.col(id_col).alias("yid"),
        F.col("ra").alias("ya"),
        F.col("rb").alias("yb"),
    )
    sgn = (F.col("xa") - F.col("ya")) * (F.col("xb") - F.col("yb"))
    pagg = x.join(y, F.col("xid") < F.col("yid")).agg(
        F.coalesce(
            F.sum(F.when(sgn > 0, 1).otherwise(0)), F.lit(0)
        ).cast("long").alias("concordant"),
        F.coalesce(
            F.sum(F.when(sgn < 0, 1).otherwise(0)), F.lit(0)
        ).cast("long").alias("discordant"),
    )
    d = F.col("ra") - F.col("rb")
    nagg = r.agg(
        F.count("*").alias("n_common"),
        F.coalesce(F.sum(d * d), F.lit(0)).cast("long").alias("sum_d2"),
    )
    n = F.col("n_common")
    tau = (F.col("concordant") - F.col("discordant")).cast("double") / (
        (n * (n - 1)).cast("double") / F.lit(2.0)
    )
    rho = F.lit(1.0) - F.lit(6.0) * F.col("sum_d2").cast("double") / (
        n * (n * n - 1)
    ).cast("double")
    return nagg.crossJoin(pagg).select(
        "n_common",
        "concordant",
        "discordant",
        F.round(F.when(n >= 2, tau), 9).alias("kendall_tau"),
        "sum_d2",
        F.round(F.when(n >= 2, rho), 9).alias("spearman_rho"),
    )
