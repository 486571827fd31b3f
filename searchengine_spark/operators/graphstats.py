"""Link-graph statistics: distributed triangle counting + clustering.

Triangles (mutually-linked host/page triples) are the standard local-
density signal on web graphs — link-farm rings and template cliques
triangle-heavy, organic link neighborhoods sparse. This implements the
classic degree-ordered node-iterator (Schank & Wagner 2005; the
MapReduce formulation is Suri & Vassilvitskii, WWW'11 "Counting
triangles and the curse of the last reducer"):

  1. canonicalize to an undirected simple graph (least/greatest,
     self-loops dropped, distinct),
  2. direct every edge from its LOWER-degree endpoint to its higher-
     degree endpoint (ties broken by node id — any total order works),
  3. wedges = self-join of the directed edges on their source,
  4. a wedge (u -> v, u -> w) closes iff the directed edge v -> w
     exists (v before w in the same total order), so one more join
     yields each triangle exactly once.

Why degree-ordering is THE scale move: out-degree under this
orientation is O(sqrt(m)) for any graph, so the wedge fan-out — the
"curse of the last reducer" when a celebrity hub would otherwise emit
deg^2 wedges — is bounded, and total wedge volume is O(m^1.5) worst
case instead of sum(deg^2). All joins are key-partitioned hash joins;
nothing is collected to the driver.

The per-node output (each triangle credits all three corners) gives the
local clustering coefficient 2T / (deg * (deg - 1)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected simple graph: (a < b), no self-loops, deduplicated."""
    return (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(node, degree, triangles, clustering) over the undirected graph.

    Every endpoint of every canonical edge appears in the output, with
    triangles = 0 (and clustering = 0.0) where it closes none.
    """
    e = _canonical_edges(edges, src, dst)
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    # orient each edge low -> high in the (degree, node) total order
    d = (
        e.join(deg.withColumnRenamed("node", "a"), "a")
        .withColumnRenamed("degree", "deg_a")
        .join(
            deg.withColumnRenamed("node", "b").withColumnRenamed(
                "degree", "deg_b"
            ),
            "b",
        )
        .select(
            F.when(
                F.struct(F.col("deg_a"), F.col("a"))
                < F.struct(F.col("deg_b"), F.col("b")),
                F.col("a"),
            )
            .otherwise(F.col("b"))
            .alias("lo"),
            F.when(
                F.struct(F.col("deg_a"), F.col("a"))
                < F.struct(F.col("deg_b"), F.col("b")),
                F.col("b"),
            )
            .otherwise(F.col("a"))
            .alias("hi"),
        )
    )
    x = d.alias("x")
    y = d.alias("y")
    wedges = x.join(y, F.col("x.lo") == F.col("y.lo")).where(
        F.col("x.hi") < F.col("y.hi")
    )
    # close the wedge against the ID-canonical edge set (a < b), not the
    # degree-directed set: the wedge pair is already id-sorted
    # (x.hi < y.hi), so this stays a pure equi-join (hash-partitionable)
    # instead of an OR-of-slots condition that would force a nested-loop
    # join. Each triangle is still produced exactly once — at its unique
    # degree-order-minimum corner.
    tri = wedges.select(
        F.col("x.lo").alias("t1"),
        F.col("x.hi").alias("t2"),
        F.col("y.hi").alias("t3"),
    ).join(
        e,
        (F.col("a") == F.col("t2")) & (F.col("b") == F.col("t3")),
    )
    per_node = (
        tri.select(
            F.explode(F.array("t1", "t2", "t3")).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return (
        deg.join(per_node, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce("triangles", F.lit(0)).alias("triangles"),
            F.when(
                F.col("degree") >= 2,
                2.0
                * F.coalesce("triangles", F.lit(0)).cast("double")
                / (
                    F.col("degree").cast("double")
                    * (F.col("degree") - F.lit(1)).cast("double")
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering"),
        )
    )


def adamic_adar(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_common_degree: int | None = 64,
    include_adjacent: bool = False,
) -> DataFrame:
    """Adamic-Adar link prediction: (node_a, node_b, n_common, score).

    score(u, v) = sum over common neighbors w of 1 / ln(deg(w))
    (Adamic & Adar 2003) — the classic "friends you may know" /
    related-pages signal: sharing a RARE neighbor is worth more than
    sharing a hub. Pairs already adjacent are excluded by default
    (link PREDICTION proposes new edges).

    Scale design: the wedge self-join centered on w is the same
    hot-key hazard as mirrors' gram join — a hub with degree d emits
    d^2/2 pairs. ``max_common_degree`` drops hub centers BEFORE the
    join (their contribution 1/ln(d) is the smallest anyway; the cut
    is part of the operator contract, deterministic, documented). The
    per-pair sum folds in w-sorted order so the double is
    bit-reproducible across partitionings (same recipe as
    more_like_this cosine).
    """
    e = _canonical_edges(edges, src, dst)
    adj = e.select(F.col("a").alias("w"), F.col("b").alias("n")).unionAll(
        e.select(F.col("b").alias("w"), F.col("a").alias("n"))
    )
    deg = adj.groupBy("w").agg(F.count(F.lit(1)).alias("deg"))
    centers = adj.join(deg, "w")
    if max_common_degree is not None:
        centers = centers.where(F.col("deg") <= F.lit(max_common_degree))
    x, y = centers.alias("x"), centers.alias("y")
    wedges = (
        x.join(y, F.col("x.w") == F.col("y.w"))
        .where(F.col("x.n") < F.col("y.n"))
        .select(
            F.col("x.n").alias("node_a"),
            F.col("y.n").alias("node_b"),
            F.col("x.w").alias("w"),
            (
                F.lit(1.0)
                / F.log(F.col("x.deg").cast("double"))
            ).alias("val"),
        )
    )
    if not include_adjacent:
        wedges = wedges.join(
            e,
            (F.col("a") == F.col("node_a")) & (F.col("b") == F.col("node_b")),
            "left_anti",
        )
    return wedges.groupBy("node_a", "node_b").agg(
        F.count(F.lit(1)).alias("n_common"),
        F.expr(
            "aggregate(sort_array(collect_list(struct(w, val))), 0.0D, "
            "(acc, s) -> acc + s.val)"
        ).alias("score"),
    )


def k_core(
    edges: DataFrame, k: int, max_iters: int = 50
) -> DataFrame:
    """Nodes of the k-core (node, core_degree): iterative peeling.

    Repeatedly deletes nodes whose degree in the SURVIVING subgraph is
    below k until a fixpoint (Seidman 1983 cores; the distributed
    peel-until-stable loop is the standard Pregel/GraphX formulation).
    ``core_degree`` is the node's degree inside the final core.

    Loop discipline matches dup_clusters/linkrank: per-iteration
    generations hand off via eager localCheckpoint (lineage never
    chains), the driver sees ONE scalar (surviving-node count) per
    round, and the peel is monotone so equal consecutive counts prove
    the fixpoint. Raises past ``max_iters`` rather than returning a
    silently-unconverged core.
    """
    e = _canonical_edges(edges, "src", "dst").localCheckpoint(eager=True)
    alive = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_alive = alive.count()
    for _ in range(max_iters):
        ee = e.join(
            alive.withColumnRenamed("node", "a"), "a", "left_semi"
        ).join(alive.withColumnRenamed("node", "b"), "b", "left_semi")
        deg = (
            ee.select(F.col("a").alias("node"))
            .unionAll(ee.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("core_degree"))
        )
        survivors = deg.where(F.col("core_degree") >= F.lit(k))
        nxt = survivors.select("node").localCheckpoint(eager=True)
        n_next = nxt.count()
        alive = nxt
        if n_next == n_alive:
            # monotone peel: same count means the SAME node set — done;
            # the surviving degree table is the k-core answer
            return survivors
        n_alive = n_next
        if n_alive == 0:
            return survivors
    raise RuntimeError(
        f"k_core: peeling did not stabilize in {max_iters} iterations"
    )


def lpa_communities(
    edges: DataFrame,
    n_iters: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, label) — community detection by synchronous label
    propagation (Raghavan et al. 2007), made deterministic: every node
    starts with label = its own id; each iteration EVERY node
    simultaneously adopts the most frequent label among its undirected
    neighbors, ties to the smallest label; isolated nodes keep theirs.
    A fixed iteration count (not convergence polling) keeps the result
    an exact replayable function of the edge set — the DuckDB oracle
    unrolls the identical chain.

    Scale shape per iteration: one join of the (deduped, undirected)
    edge list onto the ≤|V|-row label table on the neighbor key, one
    map-side-combinable groupBy (node, label) count, one partial-
    aggregable argmax via max(struct(cnt, -label)) — no windows, no
    all-pairs. Generations hand off via eager localCheckpoint (the
    k_core/dup_clusters loop discipline) so lineage never chains
    across iterations."""
    e = _canonical_edges(edges, src, dst)
    und = (
        e.select(F.col("a").alias("v"), F.col("b").alias("n"))
        .unionAll(e.select(F.col("b").alias("v"), F.col("a").alias("n")))
        .localCheckpoint(eager=True)
    )
    labels = (
        und.select(F.col("v").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(n_iters):
        counted = (
            und.join(
                labels.select(F.col("node").alias("n"), "label"), "n"
            )
            .groupBy("v", "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        best = (
            counted.groupBy("v")
            .agg(F.max(F.struct("cnt", (-F.col("label")).alias("nl"))).alias("m"))
            .select(F.col("v").alias("node"), (-F.col("m.nl")).alias("new_label"))
        )
        labels = (
            labels.join(best, "node", "left")
            .select(
                "node",
                F.coalesce("new_label", "label").alias("label"),
            )
            .localCheckpoint(eager=True)
        )
    return labels


def degree_tail_stats(edges: DataFrame, d_min: int = 2) -> DataFrame:
    """(side, n_tail, alpha) — in-/out-degree distribution tail with
    the Hill MLE power-law exponent (Clauset, Shalizi & Newman 2009,
    continuous approximation):

      α = 1 + n_tail / Σ_{d_i ≥ d_min} ln(d_i / d_min)

    The web graph's signature heavy tail: α ≈ 2.1 for in-degree is the
    canonical published value; a crawl whose frontier drifts (trap
    farms, mirror explosions) shows it immediately in α.

    Determinism + scale in one move: Σ ln(d_i/d_min) is NOT folded per
    node (that would collect_list n_tail values) — it is regrouped by
    DEGREE VALUE first (exact integer counts; distinct degrees are
    O(max_degree) ≈ O(√|E|)), then folded in degree order as
    Σ cnt_d · ln(d/d_min): a bounded, bit-reproducible sum. Two degree
    aggregates, two tiny folds; no corpus-sized single partition.
    """
    sides = []
    for side, key in (("in", "dst"), ("out", "src")):
        deg = edges.groupBy(F.col(key).alias("id")).agg(
            F.count("*").alias("d")
        )
        hist = (
            deg.filter(F.col("d") >= d_min)
            .groupBy("d")
            .agg(F.count("*").alias("cnt"))
        )
        agg = hist.agg(
            F.sum("cnt").alias("n_tail"),
            F.expr(
                f"aggregate(sort_array(collect_list(struct(d, "
                f"CAST(cnt AS DOUBLE) * ln(CAST(d AS DOUBLE) "
                f"/ {float(d_min)!r}D) AS v))), 0.0D, (a, s) -> a + s.v)"
            ).alias("s"),
        )
        sides.append(
            agg.select(
                F.lit(side).alias("side"),
                F.coalesce(F.col("n_tail"), F.lit(0)).alias("n_tail"),
                F.when(
                    F.coalesce(F.col("s"), F.lit(0.0)) > 0.0,
                    F.lit(1.0) + F.col("n_tail").cast("double") / F.col("s"),
                )
                .otherwise(F.lit(0.0))
                .alias("alpha"),
            )
        )
    out = sides[0]
    for s in sides[1:]:
        out = out.unionByName(s)
    return out


def anf(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    radius: int = 3,
    p: int = 4,
) -> DataFrame:
    """(id, n_registers, est_reach) — HyperANF (Boldi, Rosa & Vigna,
    WWW 2011): per-node estimate of |ball(v, radius)| — how many nodes
    v reaches within `radius` hops — via iterated HLL register merges.
    THE public algorithm for neighborhood functions / effective
    diameter on web graphs (exact per-node reachability is O(n·m)).

      B_0(v) = HLL({v});  B_k(v) = B_{k-1}(v) ∨ ⋁_{v→u} B_{k-1}(u)

    where ∨ is the elementwise register max — associative, commutative
    and idempotent, so the merge is shuffle-order-free and the
    registers (exact small ints) have NO float tolerance; the single
    float is the final estimate, the same exact-int arithmetic as
    sketches.hll_distinct (shared via hll_estimate_registers — one
    implementation, one oracle translation).

    Relational register form: (node, idx, r) rows, merge = ONE
    groupBy(node, idx).max per iteration over self ∪ successor rows
    (production HyperANF packs registers into long arrays; the row
    form is its relational equivalent — n·2^p rows, p=4 default keeps
    the blow-up at 16× nodes). Generation handoff via eager
    localCheckpoint, the pagerank discipline."""
    from searchengine_spark.operators.sketches import (
        hll_estimate_registers,
        hll_registers,
    )

    if vertices is None:
        vertices = (
            edges.select(F.col("src").alias("id"))
            .unionByName(edges.select(F.col("dst").alias("id")))
            .distinct()
        )
    e = edges.select("src", "dst").distinct().persist()
    regs = (
        hll_registers(
            vertices.select(F.col("id")),
            "CAST(id AS STRING)",
            group_cols=["id"],
            p=p,
        )
        .withColumnRenamed("id", "node")
        .localCheckpoint(eager=True)
    )
    for _ in range(radius):
        succ = (
            e.join(regs.withColumnRenamed("node", "dst"), "dst")
            .select(F.col("src").alias("node"), "idx", "r")
        )
        regs = (
            regs.unionByName(succ)
            .groupBy("node", "idx")
            .agg(F.max("r").alias("r"))
            .localCheckpoint(eager=True)
        )
    e.unpersist()
    out = hll_estimate_registers(regs, ["node"], p)
    return out.select(
        F.col("node").alias("id"), "n_registers",
        F.col("est_distinct").alias("est_reach"),
    )


def neighborhood_function(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_radius: int = 3,
    p: int = 4,
) -> DataFrame:
    """(r, est_pairs, is_effective_diameter) — the graph's
    neighborhood function N(r) = Σ_v |ball(v, r)| estimated by the anf
    register iteration, one row per radius 0..max_radius, with the
    effective diameter flagged: the smallest r where N(r) ≥ 0.9 ·
    N(max_radius) (the Boldi-Vigna 90% convention — "how many hops
    cover the web graph", the number HyperANF was built to compute).

    Per-radius cost is the same ONE register merge as anf; the
    per-radius scalar N(r) folds the per-node estimates in node order
    (bit-stable), collected as one bounded driver scalar per radius —
    the pagerank O(iters)-scalars discipline."""
    from searchengine_spark.operators.sketches import (
        hll_estimate_registers,
        hll_registers,
    )

    if vertices is None:
        vertices = (
            edges.select(F.col("src").alias("id"))
            .unionByName(edges.select(F.col("dst").alias("id")))
            .distinct()
        )
    e = edges.select("src", "dst").distinct().persist()
    regs = (
        hll_registers(
            vertices.select("id"), "CAST(id AS STRING)", ["id"], p
        )
        .withColumnRenamed("id", "node")
        .localCheckpoint(eager=True)
    )

    def n_of(regs_df: DataFrame) -> float:
        est = hll_estimate_registers(regs_df, ["node"], p)
        return float(
            est.agg(
                F.expr(
                    "aggregate(sort_array(collect_list(struct(node, "
                    "est_distinct AS v))), 0.0D, (a, s) -> a + s.v)"
                )
            ).collect()[0][0]
        )

    series = [n_of(regs)]
    for _ in range(max_radius):
        succ = (
            e.join(regs.withColumnRenamed("node", "dst"), "dst")
            .select(F.col("src").alias("node"), "idx", "r")
        )
        regs = (
            regs.unionByName(succ)
            .groupBy("node", "idx")
            .agg(F.max("r").alias("r"))
            .localCheckpoint(eager=True)
        )
        series.append(n_of(regs))
    e.unpersist()
    target = 0.9 * series[-1]
    eff = next(r for r, v in enumerate(series) if v >= target)
    spark = edges.sparkSession
    return spark.createDataFrame(
        [(r, v, r == eff) for r, v in enumerate(series)],
        "r int, est_pairs double, is_effective_diameter boolean",
    )


def reciprocity(edges: DataFrame) -> DataFrame:
    """1-row (n_edges, n_reciprocal, reciprocity) — the fraction of
    distinct directed edges whose reverse edge also exists (self-loops
    excluded): the classic directed web-graph statistic (~0.25 for the
    web per published crawls; link farms and scraper mirrors push it
    toward 1, another drift alarm next to degree_tail_stats).

    ONE self-semi-join on the reversed key + exact counts; the ratio
    is the only float."""
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    n = e.count()
    r = e.join(rev, ["src", "dst"], "left_semi").count()
    spark = edges.sparkSession
    frac = float(r) / float(n) if n else 0.0
    return spark.createDataFrame(
        [(n, r, frac)],
        "n_edges long, n_reciprocal long, reciprocity double",
    )


def modularity(
    edges: DataFrame,
    communities: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """1-row (m_edges, n_communities, modularity) — Newman-Girvan
    modularity Q of a node partition over the undirected simple graph
    (the same canonical edge set lpa_communities uses):

      Q = Σ_c ( e_c / m  −  (d_c / 2m)² )

    with m undirected edges, e_c intra-community edges and d_c the
    community's total degree. THE quality number for a community
    assignment — "did LPA find real structure" (Q ≈ 0 for random
    partitions, 0.3+ for genuinely modular graphs).

    e_c and d_c are exact integers (one edge join against the
    community map + two aggregates); the per-community Q terms fold in
    community order — bit-stable. communities: (node, label) as
    lpa_communities emits."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    m = e.count()
    spark = edges.sparkSession
    if m == 0:
        return spark.createDataFrame(
            [(0, 0, 0.0)],
            "m_edges long, n_communities long, modularity double",
        )
    cm = communities.select(F.col("node"), F.col("label"))
    ej = (
        e.join(cm.select(F.col("node").alias("a"),
                         F.col("label").alias("la")), "a")
        .join(cm.select(F.col("node").alias("b"),
                        F.col("label").alias("lb")), "b")
    )
    intra = (
        ej.filter(F.col("la") == F.col("lb"))
        .groupBy(F.col("la").alias("label"))
        .agg(F.count("*").alias("ec"))
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
        .join(cm, "node")
        .groupBy("label")
        .agg(F.sum("d").alias("dc"))
    )
    terms = deg.join(intra, "label", "left").select(
        "label",
        (
            F.coalesce(F.col("ec"), F.lit(0)).cast("double")
            / F.lit(float(m))
            - (F.col("dc").cast("double") / F.lit(float(2 * m)))
            * (F.col("dc").cast("double") / F.lit(float(2 * m)))
        ).alias("q"),
    )
    agg = terms.agg(
        F.count("*").alias("n_communities"),
        F.expr(
            "aggregate(sort_array(collect_list(struct(label, q AS v))), "
            "0.0D, (a, s) -> a + s.v)"
        ).alias("q"),
    )
    return agg.select(
        F.lit(m).cast("long").alias("m_edges"),
        F.col("n_communities").cast("long").alias("n_communities"),
        F.col("q").alias("modularity"),
    )


def edge_support(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """(a, b, support) for every canonical undirected edge: the number
    of triangles the edge closes. Enumeration reuses triangle_counts'
    degree-ordered wedge plan (each triangle found once, at its
    degree-order-minimum corner; hub wedge fan-out bounded by the
    orientation), then each triangle credits its three id-canonical
    edges through one explode + groupBy. Edges in no triangle report
    support 0."""
    e = _canonical_edges(edges, src, dst)
    return _support_on_canonical(e)


def _support_on_canonical(e: DataFrame) -> DataFrame:
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    d = (
        e.join(deg.withColumnRenamed("node", "a"), "a")
        .withColumnRenamed("degree", "deg_a")
        .join(
            deg.withColumnRenamed("node", "b").withColumnRenamed(
                "degree", "deg_b"
            ),
            "b",
        )
        .select(
            F.when(
                F.struct(F.col("deg_a"), F.col("a"))
                < F.struct(F.col("deg_b"), F.col("b")),
                F.col("a"),
            )
            .otherwise(F.col("b"))
            .alias("lo"),
            F.when(
                F.struct(F.col("deg_a"), F.col("a"))
                < F.struct(F.col("deg_b"), F.col("b")),
                F.col("b"),
            )
            .otherwise(F.col("a"))
            .alias("hi"),
        )
    )
    x = d.alias("x")
    y = d.alias("y")
    wedges = x.join(y, F.col("x.lo") == F.col("y.lo")).where(
        F.col("x.hi") < F.col("y.hi")
    )
    tri = wedges.select(
        F.col("x.lo").alias("t1"),
        F.col("x.hi").alias("t2"),
        F.col("y.hi").alias("t3"),
    ).join(
        e,
        (F.col("a") == F.col("t2")) & (F.col("b") == F.col("t3")),
    )
    tri_edges = tri.select(
        F.explode(
            F.array(
                F.struct(
                    F.least("t1", "t2").alias("a"),
                    F.greatest("t1", "t2").alias("b"),
                ),
                F.struct(
                    F.least("t1", "t3").alias("a"),
                    F.greatest("t1", "t3").alias("b"),
                ),
                F.struct(
                    F.col("t2").alias("a"), F.col("t3").alias("b")
                ),
            )
        ).alias("te")
    ).select("te.a", "te.b")
    sup = tri_edges.groupBy("a", "b").agg(F.count(F.lit(1)).alias("support"))
    return (
        e.join(sup, ["a", "b"], "left")
        .select(
            "a", "b", F.coalesce("support", F.lit(0)).alias("support")
        )
    )


def k_truss(
    edges: DataFrame, k: int, max_iters: int = 30
) -> DataFrame:
    """Edges of the k-truss (a, b, support): iterative edge peeling —
    every surviving edge closes ≥ k-2 triangles WITHIN the surviving
    subgraph (Cohen 2008 trusses; the cohesive-subgraph step up from
    k_core's node peel). For a link graph this isolates tightly
    inter-citing page clusters — link farms and mirror cliques light
    up as high-truss components while organic hub-and-spoke citation
    (high core, low truss) does not.

    Loop discipline is k_core's: per-iteration generations hand off
    via eager localCheckpoint, the driver sees ONE scalar (surviving
    edge count) per round, peeling is monotone so an unchanged count
    proves the fixpoint, and exceeding ``max_iters`` raises rather
    than returning a silently-unconverged truss. The reported support
    is measured in the stable subgraph (the fixpoint makes the
    pre-filter support self-consistent).
    """
    if k < 3:
        raise ValueError(f"k-truss needs k >= 3, got {k}")
    e = _canonical_edges(edges, "src", "dst").localCheckpoint(eager=True)
    n_edges = e.count()
    for _ in range(max_iters):
        sup = _support_on_canonical(e)
        survivors = sup.where(F.col("support") >= F.lit(k - 2))
        nxt = survivors.localCheckpoint(eager=True)
        n_next = nxt.count()
        if n_next == n_edges:
            return nxt
        e, n_edges = nxt.select("a", "b"), n_next
    raise RuntimeError(
        f"k_truss did not converge within {max_iters} iterations"
    )


def assortativity(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """One row (m_edges, r) — Newman (2002) degree assortativity of
    the undirected graph: the Pearson correlation of degrees across
    edges. The web is famously DISassortative (hubs link to leaves,
    r < 0); a crawl segment turning assortative is a link-farm signal
    (farms wire high-degree nodes to each other), complementing the
    k_truss/degree_tail alarms.

    Exactness: with S1 = Σ_e j·k, S2 = Σ_e (j+k), S3 = Σ_e (j²+k²)
    over edge-end degrees (all exact int64 — degree ≤ 2^31 keeps every
    product well inside the 63-bit range at any web scale),

      r = (4·M·S1 − S2²) / (2·M·S3 − S2²)

    is ONE division of two exact integers — bit-reproducible anywhere.
    Plan: the canonical-edge degree join + one aggregate; no window.
    A regular graph (denominator 0) reports NULL r.
    """
    e = _canonical_edges(edges, src, dst)
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    j = (
        e.join(deg.withColumnRenamed("node", "a"), "a")
        .withColumnRenamed("d", "da")
        .join(deg.withColumnRenamed("node", "b"), "b")
        .withColumnRenamed("d", "db")
    )
    agg = j.agg(
        F.count(F.lit(1)).alias("m_edges"),
        F.sum(F.col("da") * F.col("db")).alias("s1"),
        F.sum(F.col("da") + F.col("db")).alias("s2"),
        F.sum(
            F.col("da") * F.col("da") + F.col("db") * F.col("db")
        ).alias("s3"),
    )
    num = 4 * F.col("m_edges") * F.col("s1") - F.col("s2") * F.col("s2")
    den = 2 * F.col("m_edges") * F.col("s3") - F.col("s2") * F.col("s2")
    return agg.select(
        "m_edges",
        F.round(
            F.when(den != 0, num.cast("double") / den.cast("double")), 9
        ).alias("r"),
    )


def rich_club(
    edges: DataFrame,
    ks: list[int] = (4, 6, 8, 10),
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(k, n_nodes, n_edges, phi) — rich-club coefficient (Zhou &
    Mondragon 2004): the edge density among nodes of degree > k, for
    each threshold in ``ks``. Hubs wiring preferentially to each other
    (phi ≈ 1 at high k) is the "core elite" structure; combined with
    assortativity it separates an organic hub layer from a wired farm.

    Exactness: for each k the club size, internal edge count and
    phi = 2e/(n(n-1)) are exact ints + one division. Plan: ONE degree
    table, then per threshold a broadcast-semi-joined edge count —
    |ks| passes over the (already canonical) edge list, no windows.
    Clubs with < 2 members report NULL phi.
    """
    e = _canonical_edges(edges, src, dst).persist()
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
        .persist()
    )
    spark = edges.sparkSession
    out = None
    for k in ks:
        club = deg.filter(F.col("d") > k).select("node")
        n_nodes = club.count()
        n_edges = (
            e.join(club.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(club.withColumnRenamed("node", "b"), "b", "left_semi")
            .count()
        )
        row = spark.createDataFrame(
            [(k, n_nodes, n_edges)],
            "k long, n_nodes long, n_edges long",
        )
        out = row if out is None else out.unionByName(row)
    e.unpersist()
    deg.unpersist()
    # phi in ENGINE arithmetic (same rounding as the oracle's round())
    return out.selectExpr(
        "k",
        "n_nodes",
        "n_edges",
        "round(CASE WHEN n_nodes >= 2 THEN "
        "CAST(2 * n_edges AS DOUBLE) / CAST(n_nodes * (n_nodes - 1) "
        "AS DOUBLE) END, 9) AS phi",
    )
