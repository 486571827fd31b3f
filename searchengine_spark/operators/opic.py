"""OPIC — On-line Page Importance Computation (crawl-priority scorer).

Abiteboul, Preda & Cobena, "Adaptive On-Line Page Importance
Computation" (WWW 2003, public): every page holds CASH; when visited it
distributes its cash equally over its out-links and banks the amount in
its HISTORY; a page's importance estimate is its share of banked
history. Unlike PageRank it needs no convergence loop over the whole
graph — cash flows incrementally, which is why real crawlers use it to
order frontiers (crawl the page holding the most cash next).

This is the synchronous batch variant (all pages distribute each
round) with two deliberate, documented deviations that make the result
EXACT and order-independent — i.e. DuckDB-oracle-checkable and immune
to float-summation nondeterminism across partitionings:

* integer cash: each node starts with `cash0` integer units; an
  out-degree-d node sends floor(c/d) to every link target plus one
  extra unit to the (c mod d) targets with smallest dst (largest-
  remainder apportionment — same exact-int technique as
  operators/budget.py). Cash is conserved to the unit every round.
* virtual-page shortcut: a dangling node's cash is redistributed
  uniformly over ALL nodes in the SAME round (floor share everywhere,
  remainder to the lowest-ranked node ids) instead of parking one
  round inside the virtual page. Same stationary behavior, one less
  state column.

Scale shape: per round ONE edges⋈state broadcast-or-shuffle join on
src, one groupBy(dst) sum (map-side combined), and one scalar action
(the dangling-cash sum — a long per round, the driver never sees
rows). The per-src remainder ranking is a window partitioned by src,
bounded by out-degree, computed ONCE before the loop. State hands off
through eager localCheckpoints so lineage stays O(1) across rounds
(same generation pattern as linkrank.link_rank). With rounds ≪
PageRank's iteration count this is the cheap frontier-priority signal:
reference frontier ordering is score-DESC (frontier.py:282-320), and
opic `cash` drops in as that score.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def opic_scores(
    edges: DataFrame,
    nodes: DataFrame,
    rounds: int = 3,
    cash0: int = 1_000_000,
    dense_ids: bool = False,
) -> DataFrame:
    """(id, cash, history, score) after `rounds` synchronous OPIC
    rounds over `edges` (src, dst) starting from uniform integer cash
    on `nodes` (id). cash/history are exact int64; score =
    history / (rounds * n * cash0) ∈ [0, 1], rounded to 9 — banked
    history as a fraction of everything banked, the paper's importance
    estimate.

    dense_ids=True asserts ids are 0..n-1 and uses them directly as
    the uniform-redistribution remainder rank; otherwise one global
    row_number over `nodes` computes the rank ONCE (a single-partition
    O(n) window — fine for dimension-sized node tables, wrong for
    10^10 nodes: pass dense ids there)."""
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    spark = edges.sparkSession
    e = edges.select("src", "dst").distinct()
    w_src = Window.partitionBy("src").orderBy("dst")
    ranked = (
        e.withColumn("idx", F.row_number().over(w_src) - 1)
        .withColumn("outdeg", F.count(F.lit(1)).over(Window.partitionBy("src")))
        .persist()
    )
    ranked.count()

    if dense_ids:
        base_nodes = nodes.select(
            F.col("id"), F.col("id").cast("long").alias("id_rank")
        )
    else:
        base_nodes = nodes.select("id").withColumn(
            "id_rank",
            F.row_number()
            .over(
                # bounded node-dimension table; constant-but-non-
                # foldable key keeps WindowExec partitioned (no
                # partition-less warning) without changing the rank
                Window.partitionBy(
                    F.pmod(F.xxhash64("id"), F.lit(1))
                ).orderBy("id")
            )
            .cast("long") - 1,
        )
    n = base_nodes.count()
    state = base_nodes.select(
        "id",
        "id_rank",
        F.lit(int(cash0)).cast("long").alias("cash"),
        F.lit(0).cast("long").alias("history"),
    ).localCheckpoint(eager=True)

    for _ in range(rounds):
        snd = state.join(ranked, state["id"] == ranked["src"]).select(
            F.col("dst"),
            (
                F.expr("cash div outdeg")  # exact int64 division
                + F.when(
                    F.col("idx") < F.col("cash") % F.col("outdeg"), 1
                ).otherwise(0)
            ).cast("long").alias("amt"),
        )
        incoming = snd.groupBy("dst").agg(F.sum("amt").alias("inc"))
        dangling = (
            state.join(
                ranked.select("src").distinct(),
                state["id"] == F.col("src"),
                "left_anti",
            )
            .agg(F.coalesce(F.sum("cash"), F.lit(0)))
            .collect()[0][0]
        )
        v_base, v_rem = divmod(int(dangling), n)
        nxt = (
            state.join(incoming, state["id"] == incoming["dst"], "left")
            .select(
                "id",
                "id_rank",
                (
                    F.coalesce(F.col("inc"), F.lit(0))
                    + F.lit(v_base)
                    + F.when(F.col("id_rank") < v_rem, 1).otherwise(0)
                ).cast("long").alias("cash"),
                (F.col("history") + F.col("cash")).cast("long").alias(
                    "history"
                ),
            )
            .localCheckpoint(eager=True)
        )
        state.unpersist()
        state = nxt

    total_banked = rounds * n * int(cash0)
    out = state.select(
        "id",
        "cash",
        "history",
        F.round(F.col("history") / F.lit(total_banked), 9).alias("score"),
    )
    ranked.unpersist()
    return out
