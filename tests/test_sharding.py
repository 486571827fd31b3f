"""Rendezvous (HRW) fetch-shard assignment (operators/sharding.py)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators import sharding as SH


def _py_shard(key: str, n: int) -> int:
    ws = [
        int(hashlib.md5(f"{key}#{s}".encode()).hexdigest()[:15], 16)
        for s in range(n)
    ]
    return ws.index(max(ws))


def _urls(spark, n_rows: int):
    return spark.range(n_rows).select(
        F.concat(
            F.lit("https://h"),
            (F.col("id") % 37).cast("string"),
            F.lit(".test/p/"),
            F.col("id").cast("string"),
        ).alias("url")
    )


def test_matches_python_reference(spark):
    rows = SH.shard_assign(_urls(spark, 64), 5, key_col="url").collect()
    assert rows and all(
        r["shard"] == _py_shard(r["url"], 5) for r in rows
    )


def test_minimal_movement_on_shard_removal(spark):
    # THE rendezvous property: dropping shard 7 moves exactly the keys
    # that lived on shard 7 — every other key keeps its assignment
    # (mod-N hashing would move ~7/8 of them)
    df = SH.shard_assign(
        SH.shard_assign(_urls(spark, 2000), 8, out_col="s8"),
        7,
        out_col="s7",
    )
    moved = df.filter(F.col("s8") != F.col("s7"))
    assert moved.filter(F.col("s8") != 7).count() == 0
    assert df.filter(F.col("s8") == 7).count() == moved.count()
    assert 0 < moved.count() < 2000 / 4  # ~1/8 expected


def test_balance(spark):
    counts = [
        r["n"]
        for r in SH.shard_assign(_urls(spark, 4000), 8)
        .groupBy("shard")
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    assert len(counts) == 8
    assert max(counts) < 2 * (4000 / 8) and min(counts) > 0.5 * (4000 / 8)


def test_host_keyed_assignment_is_per_host(spark):
    # keying by host puts every URL of a host on one shard (politeness)
    df = SH.shard_assign(
        _urls(spark, 500),
        16,
        key_col="regexp_extract(url, '^https://([^/]+)', 1)",
    )
    per_host = (
        df.withColumn(
            "host", F.regexp_extract("url", "^https://([^/]+)", 1)
        )
        .groupBy("host")
        .agg(F.countDistinct("shard").alias("k"))
        .collect()
    )
    assert per_host and all(r["k"] == 1 for r in per_host)


def test_degenerate_and_invalid(spark):
    assert (
        SH.shard_assign(_urls(spark, 10), 1)
        .filter(F.col("shard") != 0)
        .count()
        == 0
    )
    with pytest.raises(ValueError):
        SH.shard_col("url", 0)
