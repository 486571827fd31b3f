"""Spherical k-means document clustering (operators/clustering.py) —
topic-separation golden case, determinism, guards, broadcast plan."""

from __future__ import annotations

from searchengine_spark.operators.clustering import doc_clusters

TOPIC_ROWS = [
    (0, "spark shuffle partition executor spark shuffle"),
    (1, "shuffle executor spark partition core"),
    (2, "partition spark executor shuffle memory"),
    (3, "garden flower tree soil garden pond"),
    (4, "flower tree garden soil rose"),
    (5, "tree pond garden flower grass"),
]


def test_two_topics_separate(spark):
    df = spark.createDataFrame(TOPIC_ROWS, "doc_id long, text string")
    out = {r.doc_id: r.cluster for r in doc_clusters(df, k=2, iters=2).collect()}
    assert len(out) == 6
    spark_docs = {out[0], out[1], out[2]}
    garden_docs = {out[3], out[4], out[5]}
    assert len(spark_docs) == 1 and len(garden_docs) == 1
    assert spark_docs != garden_docs


def test_deterministic_and_cosine_bounds(spark):
    df = spark.createDataFrame(TOPIC_ROWS, "doc_id long, text string")
    a = sorted(map(tuple, doc_clusters(df, k=3, iters=2).collect()))
    b = sorted(map(tuple, doc_clusters(df, k=3, iters=2).collect()))
    assert a == b
    assert all(-1e-9 <= c <= 1.0 + 1e-9 for _, _, c in a)


def test_guards(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert doc_clusters(empty, k=2).count() == 0
    # zero-token docs have no vector and are not clustered
    df = spark.createDataFrame(
        [(0, "alpha beta"), (1, "")], "doc_id long, text string"
    )
    rows = doc_clusters(df, k=2, iters=1).collect()
    assert {r.doc_id for r in rows} == {0}


def test_centroid_join_broadcasts(spark, sf_dir):
    import os

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    out = doc_clusters(docs, k=4, iters=1)
    # the returned frame is localCheckpointed (lineage-free), so assert
    # on a freshly planned assignment instead: centroid-side joins are
    # explicitly hinted
    from searchengine_spark.operators.clustering import _fold
    from searchengine_spark.operators.tfidf import build_postings
    from pyspark.sql import functions as F

    post = build_postings(docs).select("doc_id", "token", "tf_idf")
    cent = post.limit(50).select(
        F.lit(0).alias("cluster"), "token", F.col("tf_idf").alias("w")
    )
    plan = (
        post.join(F.broadcast(cent), "token")
        .groupBy("doc_id", "cluster")
        .agg(F.expr(_fold("token", "tf_idf * w")).alias("dot"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert out.count() > 0


def test_max_centroid_tokens_cap(spark):
    df = spark.createDataFrame(TOPIC_ROWS, "doc_id long, text string")
    capped = doc_clusters(df, k=2, iters=2, max_centroid_tokens=3)
    assert capped.count() == 6  # still assigns every doc


def test_modularity_two_cliques(spark):
    from searchengine_spark.operators.graphstats import modularity

    # two 4-cliques joined by one bridge edge; the true partition
    # scores high Q, the all-in-one partition scores exactly 0
    cl = []
    for base in (0, 10):
        for i in range(4):
            for j in range(i + 1, 4):
                cl.append((base + i, base + j))
    edges = spark.createDataFrame(cl + [(3, 10)], "src long, dst long")
    good = spark.createDataFrame(
        [(i, 0) for i in range(4)] + [(10 + i, 1) for i in range(4)],
        "node long, label long",
    )
    r = modularity(edges, good).collect()[0]
    # m=13; community 0: ec=6, dc=13; community 1: ec=6, dc=13
    exp = 2 * (6 / 13 - (13 / 26) ** 2)
    assert r.m_edges == 13 and r.n_communities == 2
    assert abs(r.modularity - exp) < 1e-12
    allone = spark.createDataFrame(
        [(i, 7) for i in list(range(4)) + list(range(10, 14))],
        "node long, label long",
    )
    r1 = modularity(edges, allone).collect()[0]
    assert abs(r1.modularity - 0.0) < 1e-12  # e_c/m = 1, (dc/2m)^2 = 1
    assert r.modularity > r1.modularity


def test_modularity_empty(spark):
    from searchengine_spark.operators.graphstats import modularity

    e = spark.createDataFrame([], "src long, dst long")
    c = spark.createDataFrame([], "node long, label long")
    r = modularity(e, c).collect()[0]
    assert (r.m_edges, r.n_communities, r.modularity) == (0, 0, 0.0)
