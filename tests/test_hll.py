"""HyperLogLog distinct sketch (operators/sketches.hll_distinct)."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from searchengine_spark.operators import sketches as SK

P = 8
M = 1 << P
REM = 60 - P


def _py_hll(values) -> tuple[int, float]:
    regs: dict[int, int] = {}
    for v in values:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        idx, rest = h >> REM, h & ((1 << REM) - 1)
        rho = REM - (rest.bit_length() - 1) if rest > 0 else REM + 1
        regs[idx] = max(regs.get(idx, 0), rho)
    raw = sum(1 << (53 - r) for r in regs.values())
    raw += (M - len(regs)) * (1 << 53)
    alpha = 0.7213 / (1.0 + 1.079 / M)
    e = alpha * M * M * float(1 << 53) / float(raw)
    zeros = M - len(regs)
    if e <= 2.5 * M and zeros > 0:
        e = float(M) * math.log(float(M) / zeros)
    return len(regs), e


def _vals(spark, n, prefix="v"):
    return spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("v")
    )


def test_matches_python_reference(spark):
    row = SK.hll_distinct(_vals(spark, 5000), "v", p=P).collect()[0]
    n_regs, est = _py_hll([f"v{i}" for i in range(5000)])
    assert row["n_registers"] == n_regs
    assert abs(row["est_distinct"] - est) < 1e-9


def test_accuracy_and_duplicates_ignored(spark):
    # duplicates must not move the estimate: 3 copies of each value
    df = _vals(spark, 4000).union(_vals(spark, 4000)).union(
        _vals(spark, 4000)
    )
    est = SK.hll_distinct(df, "v", p=P).collect()[0]["est_distinct"]
    assert abs(est - 4000) / 4000 < 0.2  # ~3 sigma at m=256


def test_low_range_linear_counting(spark):
    est = SK.hll_distinct(_vals(spark, 30), "v", p=P).collect()[0][
        "est_distinct"
    ]
    assert abs(est - 30) / 30 < 0.1


def test_register_merge_is_union(spark):
    # shard-merge property: element-wise MAX of two shards' registers
    # == registers of the union (the 1000-shard gossip path)
    a = SK.hll_registers(_vals(spark, 3000), "v", p=P)
    b = SK.hll_registers(_vals(spark, 6000), "v", p=P)  # overlaps a
    merged = (
        a.unionByName(b)
        .groupBy("idx")
        .agg(F.max("r").alias("r"))
    )
    whole = SK.hll_registers(_vals(spark, 6000), "v", p=P)
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_grouped(spark):
    df = spark.range(2000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("v"),
    )
    rows = {
        r["g"]: r["est_distinct"]
        for r in SK.hll_distinct(df, "v", ["g"], p=P).collect()
    }
    assert set(rows) == {"0", "1"}
    for est in rows.values():
        assert abs(est - 1000) / 1000 < 0.2


def test_anf_registers_equal_hll_of_exact_ball(spark):
    """ANF's iterated max-merge must produce, for every node, EXACTLY
    the HLL registers of its true ball — so the estimate equals
    hll_distinct over the exact reachable set, element for element."""
    from searchengine_spark.operators.graphstats import anf
    from searchengine_spark.operators.sketches import hll_distinct

    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (1, 4), (4, 5), (7, 0)]
    e = spark.createDataFrame(edges, "src long, dst long")
    verts = spark.createDataFrame([(i,) for i in range(8)], "id long")
    radius = 3
    got = {r.id: r.est_reach for r in
           anf(e, verts, radius=radius, p=4).collect()}

    # exact balls by BFS
    import collections

    adj = collections.defaultdict(list)
    for s, d in edges:
        adj[s].append(d)
    for v in range(8):
        ball, frontier = {v}, {v}
        for _ in range(radius):
            frontier = {u for x in frontier for u in adj[x]} - ball
            ball |= frontier
        members = spark.createDataFrame([(m,) for m in sorted(ball)],
                                        "id long")
        est = hll_distinct(members, "CAST(id AS STRING)", p=4).collect()[0]
        assert abs(got[v] - est.est_distinct) < 1e-9, (v, ball)


def test_anf_radius_monotone(spark):
    from searchengine_spark.operators.graphstats import anf

    e = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "src long, dst long"
    )
    verts = spark.createDataFrame([(i,) for i in range(7)], "id long")
    r1 = {r.id: r.est_reach for r in anf(e, verts, radius=1, p=4).collect()}
    r3 = {r.id: r.est_reach for r in anf(e, verts, radius=3, p=4).collect()}
    assert all(r3[v] >= r1[v] - 1e-12 for v in r1)
    assert r3[0] > r1[0]  # the chain head's ball actually grows


def test_neighborhood_function_series(spark):
    from searchengine_spark.operators.graphstats import neighborhood_function

    # directed 6-cycle: ball sizes grow 1, 2, 3, 4 per node
    e = spark.createDataFrame(
        [(i, (i + 1) % 6) for i in range(6)], "src long, dst long"
    )
    verts = spark.createDataFrame([(i,) for i in range(6)], "id long")
    rows = {r.r: r for r in
            neighborhood_function(e, verts, max_radius=3, p=4).collect()}
    assert sorted(rows) == [0, 1, 2, 3]
    # monotone non-decreasing series
    vals = [rows[r].est_pairs for r in range(4)]
    assert all(b >= a - 1e-9 for a, b in zip(vals, vals[1:]))
    assert vals[3] > vals[0]
    # exactly one effective-diameter row, and it is the minimal
    # radius covering 90% of the final mass
    effs = [r for r in range(4) if rows[r].is_effective_diameter]
    assert len(effs) == 1
    eff = effs[0]
    assert vals[eff] >= 0.9 * vals[3]
    assert all(vals[r] < 0.9 * vals[3] for r in range(eff))
