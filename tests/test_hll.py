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
