"""Sparse k-means document clustering over tf·idf vectors.

Unsupervised corpus organization — the classic "group the crawl into
topics" analytic (Lloyd's algorithm with cosine assignment, i.e.
spherical k-means, over the sparse bag-of-words space). Complements
the dense-space tooling: IVF (simsearch.py) runs Lloyd on dense
embedding columns for ANN list pruning; this operator clusters
DOCUMENTS by their tf·idf term vectors, where a vector is sparse
(doc_id, token, weight) rows and every step must stay relational.

Determinism contract (the repo's oracle discipline): seeds are the k
lowest doc_ids with ≥1 token (rank order = cluster id); every float
reduction is a SEQUENTIAL FOLD over a sorted list (dots and norms fold
in token order, centroid sums fold in doc_id order) so DuckDB's
list_reduce reproduces each double bit-for-bit; assignment ties break
toward the lowest cluster id via min(struct(-cos, cluster)).

Scale shape: centroids are a k×|vocab of assigned docs| frame — k is a
small constant, so every centroid-side table joins with an EXPLICIT
broadcast hint (stats-independent) and the postings scan only shuffles
once per iteration into the (doc, cluster) dot aggregate. No
all-pairs, no driver-side data beyond the k seed ids and k sizes.
A 100 TB deployment caps centroid width with `max_centroid_tokens`
(the standard spherical-k-means truncation) to bound the broadcast;
default off so the oracle stays exact. Iteration generations hand off
via eager localCheckpoint (the dup_clusters/linkrank pattern): lineage
truncates every round, blocks are ContextCleaner-collected when the
returned frame is GC'd, and broadcasts stay correct because every
small side is hinted explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FOLD = (
    "aggregate(sort_array(collect_list(struct({key}, {val} AS v))), 0.0D, "
    "(acc, s) -> acc + s.v)"
)


def _fold(key: str, val_expr: str) -> str:
    """SQL agg expr: sequential fold of `val_expr` in `key` order."""
    return _FOLD.format(key=key, val=val_expr)


def _truncate(cent: DataFrame, max_tokens: int | None) -> DataFrame:
    if max_tokens is None:
        return cent
    from pyspark.sql import Window

    wv = Window.partitionBy("cluster").orderBy(
        F.col("w").desc(), F.col("token").asc()
    )
    return (
        cent.withColumn("_r", F.row_number().over(wv))
        .filter(F.col("_r") <= max_tokens)
        .drop("_r")
    )


def doc_clusters(
    documents: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_centroid_tokens: int | None = None,
) -> DataFrame:
    """(doc_id, cluster, cosine) — spherical k-means assignment after
    `iters` Lloyd iterations from the deterministic seed centroids.

    cosine is the document's similarity to its winning centroid (0.0
    when the doc shares no token with any centroid — such docs fall to
    cluster 0 by the tie rule). Documents with zero tokens are not
    clustered (they have no vector)."""
    from searchengine_spark.operators.tfidf import build_postings

    spark = documents.sparkSession
    post = build_postings(documents, id_col, text_col).select(
        "doc_id", "token", "tf_idf"
    ).persist()
    seeds = [
        r["doc_id"]
        for r in post.select("doc_id").distinct().orderBy("doc_id")
        .limit(k).collect()
    ]
    if not seeds:
        post.unpersist()
        return spark.createDataFrame(
            [], "doc_id long, cluster int, cosine double"
        )
    seed_map = spark.createDataFrame(
        [(d, c) for c, d in enumerate(sorted(seeds))],
        "doc_id long, cluster int",
    )
    cent = (
        post.join(F.broadcast(seed_map), "doc_id")
        .select("cluster", "token", F.col("tf_idf").alias("w"))
        .localCheckpoint(eager=True)
    )
    doc_norm = post.groupBy("doc_id").agg(
        F.expr(f"sqrt({_fold('token', 'tf_idf * tf_idf')})").alias("dn")
    ).persist()
    clusters = spark.createDataFrame(
        [(c,) for c in range(len(seeds))], "cluster int"
    )

    def _assign(cent_df: DataFrame) -> DataFrame:
        cn = cent_df.groupBy("cluster").agg(
            F.expr(f"sqrt({_fold('token', 'w * w')})").alias("cn")
        )
        dots = (
            post.join(F.broadcast(cent_df), "token")
            .groupBy("doc_id", "cluster")
            .agg(F.expr(_fold("token", "tf_idf * w")).alias("dot"))
        )
        return (
            doc_norm.select("doc_id")
            .crossJoin(F.broadcast(clusters))
            .join(dots, ["doc_id", "cluster"], "left")
            .join(doc_norm, "doc_id")
            .join(F.broadcast(cn), "cluster")
            .select(
                "doc_id",
                "cluster",
                # zero norms happen (a 1-doc corpus has idf ≡ 0, so
                # every vector is all-zero): cos falls to 0, it does
                # not divide by zero
                F.when(
                    F.col("dot").isNotNull()
                    & (F.col("dn") * F.col("cn") > 0),
                    F.col("dot") / (F.col("dn") * F.col("cn")),
                )
                .otherwise(F.lit(0.0))
                .alias("cos"),
            )
            .groupBy("doc_id")
            .agg(
                F.min(
                    F.struct((-F.col("cos")).alias("nc"), "cluster")
                ).alias("b")
            )
            .select(
                "doc_id",
                F.col("b.cluster").alias("cluster"),
                (-F.col("b.nc")).alias("cosine"),
            )
        )

    for _ in range(iters):
        cent_t = _truncate(cent, max_centroid_tokens)
        assign = _assign(cent_t).localCheckpoint(eager=True)
        sizes = assign.groupBy("cluster").agg(F.count("*").alias("n"))
        cent = (
            post.join(assign.select("doc_id", "cluster"), "doc_id")
            .groupBy("cluster", "token")
            .agg(F.expr(_fold("doc_id", "tf_idf")).alias("s"))
            .join(F.broadcast(sizes), "cluster")
            .select(
                "cluster", "token",
                (F.col("s") / F.col("n").cast("double")).alias("w"),
            )
            .localCheckpoint(eager=True)
        )

    final = _assign(
        _truncate(cent, max_centroid_tokens)
    ).localCheckpoint(eager=True)
    post.unpersist()
    doc_norm.unpersist()
    return final
