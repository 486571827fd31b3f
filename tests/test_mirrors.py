"""Host mirror detection: exact mirrors, partial overlap, df-cut."""

from __future__ import annotations

from searchengine_spark.operators.mirrors import host_gram_sets, mirror_pairs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "host string, text string")


def test_exact_mirror_scores_one(spark):
    docs = _docs(
        spark,
        [
            ("a", "one two three four five six"),
            ("b", "one two three four five six"),   # mirror of a
            ("c", "totally different words here now"),
        ],
    )
    got = {
        (r.host_a, r.host_b): r.jaccard
        for r in mirror_pairs(docs, threshold=0.5).collect()
    }
    assert got == {("a", "b"): 1.0}


def test_partial_overlap_jaccard(spark):
    # grams (stride 3): a → {onetwothree, fourfivesix}; b shares only
    # the first → jaccard = 1/3
    docs = _docs(
        spark,
        [
            ("a", "one two three four five six"),
            ("b", "one two three seven eight nine"),
        ],
    )
    rows = mirror_pairs(docs, threshold=0.1).collect()
    assert len(rows) == 1
    assert abs(rows[0].jaccard - 1 / 3) < 1e-12
    assert rows[0].n_shared == 1


def test_df_cut_drops_boilerplate_gram(spark):
    # the shared gram sits on 5 hosts; with max_hosts_per_gram=4 it is
    # dropped, so no pair survives — with the default cut they all pair
    rows = [(f"h{i}", "common boiler plate") for i in range(5)]
    docs = _docs(spark, rows)
    assert mirror_pairs(docs, threshold=0.5, max_hosts_per_gram=4).count() == 0
    assert mirror_pairs(docs, threshold=0.5, max_hosts_per_gram=16).count() == 10


def test_host_gram_sets_dedupes_across_pages(spark):
    docs = _docs(
        spark,
        [("a", "one two three"), ("a", "one two three"), ("a", "")],
    )
    got = [(r.host, r.gram) for r in host_gram_sets(docs).collect()]
    assert got == [("a", "onetwothree")]
