"""Exact distributed quantiles (operators/quantiles.exact_quantiles)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators.quantiles import exact_quantiles

PS = [0.0, 0.1, 0.5, 0.9, 0.99, 1.0]


def _py_q(vals: list[float], p: float) -> float:
    s = sorted(vals)
    k = min(max(1, math.ceil(p * len(s))), len(s))
    return float(s[k - 1])


def _check(spark, vals, ps=PS, **kw):
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    got = {
        r["p"]: r["value"]
        for r in exact_quantiles(df, "x", ps, **kw).collect()
    }
    for p in ps:
        assert got[p] == _py_q(vals, p), (p, got[p], _py_q(vals, p))


def test_skewed_with_duplicates(spark):
    # heavy duplication + outliers spanning many buckets
    vals = [5] * 500 + [7] * 300 + list(range(100, 300)) + [100000, 99999]
    _check(spark, vals, bucket_width=64.0)


def test_tiny_and_single_value(spark):
    _check(spark, [42.0])
    _check(spark, [3.0, 1.0, 2.0])


def test_negative_and_fractional(spark):
    vals = [-12.5, -1.25, 0.0, 0.5, 3.75, 3.75, 9.0]
    _check(spark, vals, bucket_width=2.0)


def test_nulls_ignored(spark):
    df = spark.createDataFrame(
        [(1.0,), (None,), (2.0,), (None,), (3.0,)], "x double"
    )
    got = {r["p"]: r["value"] for r in exact_quantiles(df, "x", [0.5]).collect()}
    assert got[0.5] == 2.0


def test_bucket_cap_raises(spark):
    df = spark.range(10000).select((F.col("id") * 1000).cast("double").alias("x"))
    with pytest.raises(ValueError, match="max_buckets"):
        exact_quantiles(df, "x", [0.5], bucket_width=1.0, max_buckets=100)


def test_bad_fraction_raises(spark):
    df = spark.range(5).select(F.col("id").cast("double").alias("x"))
    with pytest.raises(ValueError, match="outside"):
        exact_quantiles(df, "x", [1.5])


def test_empty_input(spark):
    df = spark.createDataFrame([], "x double")
    assert exact_quantiles(df, "x", [0.5]).count() == 0
