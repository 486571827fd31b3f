"""Block-Max WAND exact BM25 top-k (operators/ranking.bmw_search)."""

from __future__ import annotations

import pytest

from searchengine_spark.operators import ranking as RK


@pytest.fixture(scope="module")
def corpus(spark):
    # doc-id-clustered rare term: 'zebra' lives only in the 40-79
    # block range, so doc-axis (block) pruning has something to cut
    # that term-axis (MaxScore) pruning can't see
    rows = []
    for i in range(160):
        words = ["the", "common", "filler"]
        if i % 3 == 0:
            words += ["graph", "walk"]
        if 40 <= i < 80 and i % 5 == 0:
            words += ["zebra"]
        if i == 57:
            words += ["quark", "zebra", "zebra"]
        rows.append((i, " ".join(words * (1 + i % 4))))
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def weights(corpus):
    return RK.bm25_table(corpus).localCheckpoint()


@pytest.mark.parametrize(
    "terms,k,bs",
    [
        (["zebra", "the"], 5, 16),
        (["graph", "zebra", "quark"], 10, 16),
        (["the"], 3, 64),
        (["THE", "the", "Graph"], 7, 8),  # dedupe + case fold
        (["nosuchtoken", "zebra"], 5, 16),
        (["nosuchtoken"], 5, 16),  # no matches at all
        (["the", "common", "filler", "graph", "zebra"], 160, 32),  # k > hits
        (["zebra", "the"], 5, 1),  # degenerate: one doc per block
        (["zebra", "the"], 5, 10_000),  # degenerate: one block total
    ],
)
def test_equals_brute_force(weights, terms, k, bs):
    brute = RK.bm25_search(weights, terms, k=k).collect()
    pruned = RK.bmw_search(weights, terms, k=k, block_size=bs).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in pruned] == [
        (r["doc_id"], round(r["score"], 9)) for r in brute
    ]


def test_blocks_actually_pruned(weights):
    # 'zebra' is confined to blocks 2-4 (block_size 16 over ids 40-79);
    # with k small, theta lands above the everything-matches floor and
    # blocks holding only 'the'-class weight must die
    out, stats = RK.bmw_search(
        weights, ["zebra", "the"], k=3, block_size=16, return_stats=True
    )
    assert len(out.collect()) == 3
    assert stats["n_live_blocks"] < stats["n_blocks"]
    assert stats["n_candidates"] < stats["n_matching"]


def test_matches_maxscore(weights):
    # two independent exact-pruning strategies must agree with each
    # other, not just with brute force
    a = RK.maxscore_search(weights, ["graph", "zebra"], k=8).collect()
    b = RK.bmw_search(weights, ["graph", "zebra"], k=8, block_size=16).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in a] == [
        (r["doc_id"], round(r["score"], 9)) for r in b
    ]
