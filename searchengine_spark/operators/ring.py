"""Consistent-hash ring fetch-shard assignment (the >~10^4-shard path).

sharding.py's rendezvous assignment is O(n_shards) per row — the right
trade for fetcher fleets up to a few thousand shards, and its module
docstring promises "past ~10^4 shards you'd switch to a consistent-hash
ring lookup".  This module is that lookup: the classic Karger et
al. 1997 ring (public algorithm; also the memcached/libketama and
Dynamo partitioning scheme).  Each shard owns ``vnodes`` points on a
2^60 hash circle — ``point(s, v) = h60('ring!' || s || '!' || v)`` —
and a key belongs to the shard owning the first point clockwise from
``h60(key)`` (successor convention, wrapping past 2^60-1 to the
smallest point).  Virtual nodes flatten the ownership variance from
O(1) per-shard arcs to ~1/sqrt(vnodes) relative spread.

Properties a 10^10-URL frontier needs, both shipped as oracle queries:
  * stability — ``shard(key)`` is a pure function of (key, shard set):
    re-runs, retries and incremental appends agree (``ring_assign``);
  * minimal movement — adding shard N+1 steals keys ONLY for the new
    shard; no key moves between two old shards (``ring_moves`` reports
    the moved-elsewhere count, which must be identically zero — the
    invariant as data).

Scale shape: the ring itself is tiny driver state (n_shards · vnodes
pairs, e.g. 10^4 shards × 128 vnodes = 1.28 M points ≈ 10 MB as two
numpy arrays) captured by a vectorized pandas UDF; the per-key cost is
``np.searchsorted`` — O(log R) with R = ring size, beating HRW's O(N)
precisely in the >10^4-shard regime the seam named.  The key hash
stays JVM-side (the same engine-portable md5-60bit column every
sampler/sketch in this repo uses, sampling.h60_col), so the Python
stage is a single Arrow-batched array lookup on an int64 column — no
per-row Python, no shuffle, no join, no driver round-trips.

Reference: the single-process reference crawler
(`/root/reference/crawler.py` thread loop) needs no sharding at all;
this is the standard scale-out seam in front of the fetch stage.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from searchengine_spark.operators.sampling import h60_col


def h60_py(s: str) -> int:
    """Python twin of sampling.h60_col / __spark_entry__._duck_h60:
    first 60 bits of md5 — hashlib md5 is the same RFC 1321 digest the
    JVM and DuckDB compute, so all three agree bit-for-bit."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def ring_points(n_shards: int, vnodes: int = 64) -> list[tuple[int, int]]:
    """The sorted ring: [(point, shard)] for every (shard, vnode) pair,
    ordered by (point, shard) so a (2^-60-probability) point collision
    still resolves deterministically in every engine."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if vnodes < 1:
        raise ValueError(f"vnodes must be >= 1, got {vnodes}")
    pts = [
        (h60_py(f"ring!{s}!{v}"), s)
        for s in range(n_shards)
        for v in range(vnodes)
    ]
    pts.sort()
    return pts


def ring_assign(
    df: DataFrame,
    n_shards: int,
    key_col: str = "url",
    vnodes: int = 64,
    out_col: str = "shard",
) -> DataFrame:
    """df + an ``out_col`` int column: the consistent-hash-ring shard
    of ``key_col``.  Key the HOST for a crawler (politeness state
    locality), the URL for a document store — same contract as
    sharding.shard_assign, different cost curve (O(log R) vs O(N))."""
    ring = ring_points(n_shards, vnodes)
    pts = np.array([p for p, _ in ring], dtype=np.int64)
    owners = np.array([s for _, s in ring], dtype=np.int32)

    @F.pandas_udf("int")
    def _lookup(hv: pd.Series) -> pd.Series:
        idx = np.searchsorted(pts, hv.to_numpy(), side="left")
        return pd.Series(owners[idx % len(pts)])

    return df.withColumn(
        out_col, _lookup(h60_col(key_col).cast("long"))
    )
