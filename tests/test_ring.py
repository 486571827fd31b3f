"""Consistent-hash ring sharding (operators/ring.py) properties."""

from __future__ import annotations

import bisect

import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators import ring as RG


def _py_owner(ring, hv):
    pts = [p for p, _ in ring]
    i = bisect.bisect_left(pts, hv)
    return ring[i % len(ring)][1]


def _keys(spark, n=400):
    return spark.range(n).select(
        F.concat(F.lit("https://k"), F.col("id")).alias("url")
    )


def test_matches_pure_python_successor(spark):
    df = RG.ring_assign(_keys(spark), 8, vnodes=16)
    ring = RG.ring_points(8, 16)
    for r in df.collect():
        assert r["shard"] == _py_owner(ring, RG.h60_py(r["url"]))


def test_stability_and_balance(spark):
    a = {r["url"]: r["shard"] for r in RG.ring_assign(_keys(spark), 8).collect()}
    b = {r["url"]: r["shard"] for r in RG.ring_assign(_keys(spark), 8).collect()}
    assert a == b  # pure function of (key, shard set)
    counts = {}
    for s in a.values():
        counts[s] = counts.get(s, 0) + 1
    assert len(counts) == 8  # vnodes flatten arcs: every shard owns keys
    assert max(counts.values()) < 4 * min(counts.values())


def test_minimal_movement_only_to_new_shard(spark):
    df = RG.ring_assign(
        RG.ring_assign(_keys(spark), 8, out_col="s8"), 9, out_col="s9"
    )
    rows = df.collect()
    moved = [r for r in rows if r["s8"] != r["s9"]]
    assert moved, "adding a shard must steal some keys"
    assert all(r["s9"] == 8 for r in moved)  # never between old shards
    # expected steal fraction ~ 1/9; allow wide slack on 400 keys
    assert len(moved) < len(rows) // 3


def test_ring_points_sorted_and_sized():
    ring = RG.ring_points(10, 64)
    assert len(ring) == 640
    assert ring == sorted(ring)
    with pytest.raises(ValueError):
        RG.ring_points(0)
    with pytest.raises(ValueError):
        RG.ring_points(4, 0)
