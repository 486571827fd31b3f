"""Distributed PageRank vs a dense numpy reference: same fixed-point
arithmetic (fixed iterations, damping, dangling redistribution,
teleport for isolated vertices), including multi-edges."""

from __future__ import annotations

import numpy as np
import pytest

from searchengine_spark.operators import linkrank as LR


def _numpy_pagerank(n, edges, n_iters=5, d=0.85):
    deg = np.zeros(n)
    for s, _ in edges:
        deg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iters):
        dmass = r[deg == 0].sum()
        nxt = np.full(n, (1 - d) / n + d * dmass / n)
        for s, t in edges:
            nxt[t] += d * r[s] / deg[s]
        r = nxt
    return r


EDGES = [
    (0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 2),  # multi-edge 3→2
    (4, 0),
    # 5 is dangling (in-links only), 6 is isolated (vertices list only)
    (2, 5),
]


def test_pagerank_matches_dense_reference(spark):
    n = 7
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    verts = spark.createDataFrame([(i,) for i in range(n)], "id long")
    got = {r["id"]: r["rank"] for r in LR.pagerank(edges, verts).collect()}
    want = _numpy_pagerank(n, EDGES)
    assert set(got) == set(range(n))
    for i in range(n):
        assert got[i] == pytest.approx(want[i], abs=1e-12)
    # total mass conserved (dangling + teleport bookkeeping is exact)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)


def test_pagerank_default_vertices_and_host_rank(spark):
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    got = LR.pagerank(edges)  # vertices inferred from endpoints: 0..5
    assert {r["id"] for r in got.collect()} == set(range(6))

    hedges = spark.createDataFrame(
        [("a.test", "b.test"), ("b.test", "a.test"), ("c.test", "a.test")],
        "src_host string, dst_host string",
    )
    hr = {r["host"]: r["rank"] for r in LR.host_rank(hedges, n_iters=3).collect()}
    assert set(hr) == {"a.test", "b.test", "c.test"}
    assert hr["a.test"] > hr["b.test"] > hr["c.test"]


def test_pagerank_weighted_equals_parallel_edges(spark):
    # a weight-w edge must behave exactly like w parallel unit edges
    unit = spark.createDataFrame(EDGES, "src long, dst long")
    verts = spark.createDataFrame([(i,) for i in range(7)], "id long")
    from collections import Counter

    weighted = spark.createDataFrame(
        [(s, t, float(w)) for (s, t), w in Counter(EDGES).items()],
        "src long, dst long, n double",
    )
    a = {r["id"]: r["rank"] for r in LR.pagerank(unit, verts).collect()}
    b = {
        r["id"]: r["rank"]
        for r in LR.pagerank(weighted, verts, weight_col="n").collect()
    }
    for i in a:
        assert a[i] == pytest.approx(b[i], abs=1e-12)


def _numpy_hits(n, edges, n_iters=5):
    h = np.ones(n)
    a = np.zeros(n)
    for _ in range(n_iters):
        a = np.zeros(n)
        for s, t in edges:
            a[t] += h[s]
        h = np.zeros(n)
        for s, t in edges:
            h[s] += a[t]
    a *= (1.0 / a.sum()) if a.sum() else 0.0
    h *= (1.0 / h.sum()) if h.sum() else 0.0
    return a, h


def test_hits_matches_dense_reference(spark):
    n = 7
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    verts = spark.createDataFrame([(i,) for i in range(n)], "id long")
    got = {r["id"]: r for r in LR.hits(edges, verts).collect()}
    wa, wh = _numpy_hits(n, EDGES)
    assert set(got) == set(range(n))
    for i in range(n):
        assert got[i]["authority"] == pytest.approx(wa[i], abs=1e-12)
        assert got[i]["hub"] == pytest.approx(wh[i], abs=1e-12)
    # isolated vertex 6: both roles zero; dangling 5: authority > 0, hub 0
    assert got[6]["authority"] == 0.0 and got[6]["hub"] == 0.0
    assert got[5]["authority"] > 0.0 and got[5]["hub"] == 0.0
    # empty edge set over explicit vertices: all-zero, no div-by-zero
    e0 = spark.createDataFrame([], "src long, dst long")
    z = LR.hits(e0, verts).collect()
    assert all(r["authority"] == 0.0 and r["hub"] == 0.0 for r in z)


def test_pagerank_empty(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    assert LR.pagerank(edges).count() == 0


def test_cocitation_counts_and_cuts(spark):
    from searchengine_spark.operators.linkrank import cocitation

    edges = spark.createDataFrame(
        # s1 and s2 both cite (a, b); s3 cites (a, b, c); farm cites many
        [("s1", "a"), ("s1", "b"),
         ("s2", "a"), ("s2", "b"),
         ("s3", "a"), ("s3", "b"), ("s3", "c"),
         ("s3", "c"),  # duplicate edge must not double-count
         ("farm", "a"), ("farm", "b"), ("farm", "c"), ("farm", "d")],
        "src string, dst string",
    )
    got = {
        (r.page_a, r.page_b): r.n_shared
        for r in cocitation(edges, min_count=2).collect()
    }
    # (a,b) co-cited by s1, s2, s3, farm; (a,c)/(b,c) by s3+farm
    assert got == {("a", "b"): 4, ("a", "c"): 2, ("b", "c"): 2}

    capped = {
        (r.page_a, r.page_b): r.n_shared
        for r in cocitation(edges, min_count=2, max_out_degree=3).collect()
    }
    # the link farm (out-degree 4) is dropped before pairing
    assert capped == {("a", "b"): 3}


def test_personalized_pagerank_localizes_to_seeds(spark):
    from searchengine_spark.operators.linkrank import personalized_pagerank

    # two disconnected 3-cycles; seeding in cycle A must put ~all mass
    # in A (mass only leaks via teleport, which returns to seeds)
    edges = spark.createDataFrame(
        [("a1", "a2"), ("a2", "a3"), ("a3", "a1"),
         ("b1", "b2"), ("b2", "b3"), ("b3", "b1")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("a1",)], "id string")
    ranks = {
        r.id: r.rank
        for r in personalized_pagerank(edges, seeds, n_iters=20).collect()
    }
    mass_a = ranks["a1"] + ranks["a2"] + ranks["a3"]
    mass_b = ranks["b1"] + ranks["b2"] + ranks["b3"]
    assert abs(mass_a - 1.0) < 1e-9
    assert mass_b == 0.0
    assert ranks["a1"] > ranks["a2"] > 0  # seed keeps the teleport share


def test_personalized_pagerank_dangling_returns_to_seeds(spark):
    from searchengine_spark.operators.linkrank import personalized_pagerank

    # s -> t, t dangles: its mass must return to the seed, not vanish —
    # total mass stays 1
    edges = spark.createDataFrame([("s", "t")], "src string, dst string")
    seeds = spark.createDataFrame([("s",)], "id string")
    ranks = {
        r.id: r.rank
        for r in personalized_pagerank(edges, seeds, n_iters=30).collect()
    }
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    assert ranks["s"] > ranks["t"] > 0


def test_crawl_depth_bfs(spark):
    from searchengine_spark.operators.linkrank import crawl_depth

    # chain 0→1→2→3, branch 1→4, island 9 (unreachable)
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (1, 4), (9, 9)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,)], "id long")
    out = {r["id"]: r["depth"] for r in crawl_depth(edges, seeds).collect()}
    assert out == {0: 0, 1: 1, 2: 2, 3: 3, 4: 2}  # 9 absent

    # shorter of two paths wins: 0→3 direct beats 0→1→2→3
    edges2 = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (0, 3)], "src long, dst long"
    )
    out2 = {r["id"]: r["depth"] for r in crawl_depth(edges2, seeds).collect()}
    assert out2[3] == 1

    # still-expanding frontier at max_iters raises instead of truncating
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "src long, dst long"
    )
    import pytest as _pt

    with _pt.raises(RuntimeError, match="still expanding"):
        crawl_depth(chain, seeds, max_iters=3)


def test_salsa_degree_normalized_and_l1(spark):
    from searchengine_spark.operators.linkrank import salsa

    from searchengine_spark.operators.linkrank import hits

    # TKC fixture (one connected component): a 3-clique of mutual
    # endorsements plus one page endorsed by many independent hubs,
    # clique member 10 also linking out to it. SALSA's degree shares
    # pull authorities toward in-degree proportions (clique members
    # stay near-equal); HITS' eigenstructure punishes 10 for spending
    # hub effort outside the clique.
    clique = [(10, 11), (11, 12), (12, 10), (10, 12), (11, 10), (12, 11)]
    popular = [(h, 99) for h in range(6)] + [(10, 99)]
    edges = spark.createDataFrame(clique + popular, "src long, dst long")
    out = {r.id: (r.authority, r.hub) for r in salsa(edges, n_iters=8).collect()}
    # L1-normalized sides
    assert abs(sum(a for a, _ in out.values()) - 1.0) < 1e-9
    assert abs(sum(h for _, h in out.values()) - 1.0) < 1e-9
    # the broadly-cited page out-authorities every clique member
    assert all(out[99][0] > out[c][0] for c in (10, 11, 12))
    # degree-share behavior: SALSA keeps the equal-in-degree clique
    # members within a few percent of each other ...
    sa = [out[c][0] for c in (10, 11, 12)]
    assert max(sa) / min(sa) < 1.1
    # ... where HITS spreads the same nodes wide (the TKC effect)
    ha = {r.id: r.authority for r in hits(edges, n_iters=8).collect()}
    hh = [ha[c] for c in (10, 11, 12)]
    assert max(hh) / min(hh) > 2.0


def test_salsa_empty_and_isolated(spark):
    from searchengine_spark.operators.linkrank import salsa

    empty = spark.createDataFrame([], "src long, dst long")
    assert salsa(empty).count() == 0
    verts = spark.createDataFrame([(0,), (1,), (2,)], "id long")
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    got = {r.id: (r.authority, r.hub) for r in salsa(edges, verts, 3).collect()}
    assert got[2] == (0.0, 0.0)  # isolated vertex holds zero on both sides
    assert got[1][0] == 1.0 and got[0][1] == 1.0


def test_harmonic_centrality_path_graph(spark):
    from searchengine_spark.operators.linkrank import harmonic_centrality

    # path 0 -> 1 -> 2 -> 3, seeds {0, 2}
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,), (2,)], "id long")
    got = {r.id: r.harmonic for r in
           harmonic_centrality(edges, seeds, max_depth=5).collect()}
    # d(0,1)=1; d(0,2)=2; d(0,3)=3; d(2,3)=1; seeds at d=0 excluded
    assert abs(got[1] - 1.0) < 1e-12
    assert abs(got[2] - 1 / 2) < 1e-12
    assert abs(got[3] - (1 / 3 + 1.0)) < 1e-12
    assert 0 not in got  # no seed reaches node 0


def test_harmonic_centrality_depth_cap(spark):
    from searchengine_spark.operators.linkrank import harmonic_centrality

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,)], "id long")
    got = {r.id: r.harmonic for r in
           harmonic_centrality(edges, seeds, max_depth=2).collect()}
    assert set(got) == {1, 2}  # nodes past depth 2 are not explored
