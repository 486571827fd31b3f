"""Rendezvous (highest-random-weight) fetch-shard assignment.

A distributed crawler must partition its fetch work across N fetcher
shards so that (a) the same URL always lands on the same shard (per-host
politeness state, connection reuse, robots cache locality) and (b)
adding/removing a shard moves only ~1/N of the keys instead of
rehashing the world (mod-N moves (N-1)/N of them). Rendezvous hashing
(Thaler & Ravishankar 1996, the public HRW algorithm) gives both with
no ring state: ``shard(key) = argmax_s h(key, s)``. The reference
crawler is single-process (`/root/reference/crawler.py` thread loop) so
it never needs this; it is the standard scale-out seam a 1000-executor
crawl adds in front of the fetch stage.

Scale shape: ONE per-row projection — ``transform(sequence(0, N-1),
s -> h60(key # s))`` then argmax — pure whole-stage-codegen Column
arithmetic, no UDF, no shuffle, no join, no driver state. Cost is
O(N) per row, the right trade for fetcher fleets (N ≤ a few thousand);
past ~10^4 shards you'd switch to a consistent-hash ring lookup, noted
here for honesty. Hash = the engine-portable md5-60bit used across this
repo (sampling.h60_col), so DuckDB reproduces every weight bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from searchengine_spark.operators.sampling import h60_col


def _weights_sql(key_sql: str, n_shards: int) -> str:
    """Spark-SQL array<bigint> of HRW weights h60(key || '#' || s) for
    s in 0..n_shards-1. The '#' separator never appears in a shard id,
    so (key, s) pairs cannot collide across boundaries."""
    return (
        f"transform(sequence(0, {n_shards - 1}), s -> "
        f"CAST(conv(substring(md5(concat({key_sql}, '#', "
        "CAST(s AS STRING))), 1, 15), 16, 10) AS BIGINT))"
    )


def shard_col(key_sql: str, n_shards: int) -> F.Column:
    """Column: rendezvous shard id (0-based int) for a string-typed SQL
    expression ``key_sql`` over ``n_shards`` shards. First-max wins on
    the (negligible, 2^-60) weight tie, deterministically."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    w = _weights_sql(key_sql, n_shards)
    return F.expr(
        f"CAST(array_position({w}, array_max({w})) - 1 AS INT)"
    )


def shard_assign(
    df: DataFrame,
    n_shards: int,
    key_col: str = "url",
    out_col: str = "shard",
) -> DataFrame:
    """df + an ``out_col`` int column: the rendezvous shard of
    ``key_col``. For a crawler, key the HOST (not the URL) so one
    host's politeness budget lives on one shard: pass a host expression
    via key_col."""
    return df.withColumn(out_col, shard_col(key_col, n_shards))


def partition_balance(
    df: DataFrame,
    key_sql: str,
    n_partitions: int = 8,
    n_salts: int = 16,
    id_sql: str = "CAST(doc_id AS STRING)",
) -> DataFrame:
    """Two rows — ('keyed' | 'salted', n_parts_used, max_load,
    min_load, total_keys): the frontier's hot-host skew problem and the
    ST3 salting answer, as data.

    'keyed' routes rows by h60(key) % P — one hot host (half a crawl
    batch pointing at one CDN is normal) lands its whole load on ONE
    partition, and max_load IS the straggler wall the north rule's
    scaling criterion hits. 'salted' routes by h60(key # (id % S)) % P
    — the same two-phase decomposition frontier.py's politeness quota
    uses (phase 1 per (key, salt), phase 2 merges ≤ S·k survivors),
    which spreads any single key over min(S, P) partitions. The census
    is exact integer counts, so the skew collapse is hash-checkable,
    not a claim.

    Scale shape: two map-side-combined groupBys over pure-codegen hash
    projections; nothing here is heavier than the word-count plan.
    """
    keyed = F.pmod(h60_col(key_sql), F.lit(n_partitions))
    salted = F.pmod(
        h60_col(
            f"concat({key_sql}, '#', CAST(({id_sql}) % {n_salts} AS STRING))"
        ),
        F.lit(n_partitions),
    )
    out = []
    for scheme, part in (("keyed", keyed), ("salted", salted)):
        out.append(
            df.select(part.alias("p"))
            .groupBy("p")
            .agg(F.count("*").alias("n"))
            .agg(
                F.lit(scheme).alias("scheme"),
                F.count("*").alias("n_parts_used"),
                F.max("n").alias("max_load"),
                F.min("n").alias("min_load"),
                F.sum("n").alias("total_keys"),
            )
        )
    return out[0].unionByName(out[1])
