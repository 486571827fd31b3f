"""Redirect-chain resolution with loop detection — pointer doubling.

A crawl frontier accumulates HTTP redirects as (url, redirect_to)
edges; canonical indexing needs every url mapped to its FINAL target
(the page that actually serves content), with cycles flagged. The
naive per-url walk is O(chain length) sequential hops — on a 100 TB
crawl the chains live on different executors, so the right distributed
algorithm is pointer doubling (a.k.a. path doubling): iteration k
extends every url's known successor from 2^(k-1) to 2^k hops by
self-joining the successor table, so chains up to max_hops resolve in
ceil(log2(max_hops)) rounds — each round ONE equi-join + no driver
data, instead of max_hops sequential join rounds.

Semantics (mirrored by the recursive-CTE oracle):
  * terminal url (redirect_to NULL) → (url, url, 0, false)
  * chain of d ≤ max_hops hops     → (url, final_url, d, false)
  * cycle, or chain > max_hops     → (url, NULL, NULL, true)
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(pages: DataFrame, max_hops: int = 64) -> DataFrame:
    """(url, final_url, n_hops, is_loop) for every row of `pages`
    (url string, redirect_to string nullable)."""
    edges = (
        pages.filter(F.col("redirect_to").isNotNull())
        .select(
            F.col("url").alias("u"),
            F.col("redirect_to").alias("nxt"),
            F.lit(1).cast("long").alias("d"),
        )
    )
    rounds = max(1, math.ceil(math.log2(max_hops)))
    s = edges
    for _ in range(rounds):
        # extend each known path by the successor's known path; a miss
        # means nxt is terminal (no outgoing edge) — keep as-is
        b = s.select(
            F.col("u").alias("b_u"),
            F.col("nxt").alias("b_nxt"),
            F.col("d").alias("b_d"),
        )
        s = (
            s.join(b, s["nxt"] == b["b_u"], "left")
            .select(
                "u",
                F.coalesce(F.col("b_nxt"), F.col("nxt")).alias("nxt"),
                (
                    F.col("d")
                    + F.coalesce(F.col("b_d"), F.lit(0).cast("long"))
                ).alias("d"),
            )
        )

    # nxt still having an outgoing edge after full doubling ⇒ cycle (or
    # chain beyond max_hops — same flag, both unresolvable)
    srcs = edges.select(F.col("u").alias("src")).distinct()
    resolved = (
        s.join(srcs, s["nxt"] == srcs["src"], "left")
        .select(
            "u",
            F.when(F.col("src").isNull(), F.col("nxt")).alias("final_url"),
            F.when(F.col("src").isNull(), F.col("d")).alias("n_hops"),
            F.col("src").isNotNull().alias("is_loop"),
        )
    )
    terminals = pages.filter(F.col("redirect_to").isNull()).select(
        F.col("url").alias("u"),
        F.col("url").alias("final_url"),
        F.lit(0).cast("long").alias("n_hops"),
        F.lit(False).alias("is_loop"),
    )
    return resolved.unionByName(terminals).withColumnRenamed("u", "url")
