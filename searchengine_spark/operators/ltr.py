"""Learning-to-rank feature assembly — the ranking-side training-data
export.

A ranker's training table wants, per (query, candidate-doc): the
lexical score, match breadth, document priors. This operator assembles
the suite's own signals into one feature frame:

    (doc_id, bm25, n_matched, doc_len, quality, rank)

bm25       fixed-order per-term pivot sum (operators/ranking.py)
n_matched  how many distinct query terms hit the doc
doc_len    token count (the BM25 length prior, exposed raw)
quality    web-text quality heuristic (operators/textstats.py)
rank       link-graph PageRank (operators/linkrank.py)

Scale design: the candidate set is the token-IN pruned posting scan
(docs sharing >= 1 query term — never the corpus), and every feature
joins at doc_id granularity onto that pruned set. The three corpus-
wide priors (lengths, quality, pagerank) are each ONE projection /
iteration plan of their owning operator; a production deployment
precomputes them per index build — pass them in via the optional
arguments and this operator does zero corpus work beyond the pruned
candidate scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from searchengine_spark.operators import linkrank as LR
from searchengine_spark.operators import textstats as TS
from searchengine_spark.operators import tfidf as TF
from searchengine_spark.operators.ranking import bm25_table


def ltr_features(
    documents: DataFrame,
    terms: list[str],
    edges: DataFrame,
    weights: DataFrame | None = None,
    lengths: DataFrame | None = None,
    quality: DataFrame | None = None,
    ranks: DataFrame | None = None,
    n_rank_iters: int = 5,
) -> DataFrame:
    """Per-candidate LTR features for one query's term list.

    ``weights``/``lengths``/``quality``/``ranks`` accept precomputed
    tables (bm25_table / doc_tokens / quality_scores / pagerank
    shapes); anything omitted is derived here from ``documents`` and
    ``edges``.
    """
    uniq = list(dict.fromkeys(t.lower() for t in terms))
    if not uniq:
        raise ValueError("ltr_features: terms must be non-empty")
    wts = weights if weights is not None else bm25_table(documents)
    per_term = [
        F.coalesce(
            F.max(F.when(F.col("token") == t, F.col("weight"))), F.lit(0.0)
        ).alias(f"w{i}")
        for i, t in enumerate(uniq)
    ]
    cand = (
        wts.filter(F.col("token").isin(uniq))
        .groupBy("doc_id")
        .agg(*per_term, F.count_distinct("token").alias("n_matched"))
    )
    bm25 = F.col("w0")
    for i in range(1, len(uniq)):
        bm25 = bm25 + F.col(f"w{i}")
    cand = cand.select("doc_id", bm25.alias("bm25"), "n_matched")
    if lengths is None:
        lengths = TF.doc_tokens(documents).select(
            "doc_id", F.col("n_terms").alias("doc_len")
        )
    if quality is None:
        quality = TS.quality_scores(documents).select(
            "doc_id", "quality"
        )
    if ranks is None:
        ranks = LR.pagerank(
            edges,
            documents.select(F.col("doc_id").alias("id")),
            n_iters=n_rank_iters,
        ).select(F.col("id").alias("doc_id"), "rank")
    return (
        cand.join(lengths, "doc_id")
        .join(quality, "doc_id")
        .join(ranks, "doc_id")
    )
