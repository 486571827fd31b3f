"""Z-order layout (operators/layout.py): correctness + pruning value."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators import layout as LY


def _ref_morton(x: int, y: int) -> int:
    out = 0
    for i in range(31):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_morton_sql_matches_bit_interleave(spark):
    df = spark.range(300).select(
        (F.col("id") * 2654435761 % (1 << 31)).alias("x"),
        (F.col("id") * 40503 % (1 << 31)).alias("y"),
    )
    rows = LY.zorder_key(df, "x", "y").collect()
    for r in rows:
        assert r["zkey"] == _ref_morton(r["x"], r["y"])
        assert r["zkey"] >= 0  # sign bit provably untouched


def _zone_maps(df, file_col):
    return {
        r["f"]: (r["x0"], r["x1"], r["y0"], r["y1"])
        for r in df.groupBy(F.col(file_col).alias("f"))
        .agg(
            F.min("hid").alias("x0"),
            F.max("hid").alias("x1"),
            F.min("day").alias("y0"),
            F.max("day").alias("y1"),
        )
        .collect()
    }


def _touched(zones, h_rng, d_rng):
    return sum(
        1
        for x0, x1, y0, y1 in zones.values()
        if x1 >= h_rng[0] and x0 <= h_rng[1] and y1 >= d_rng[0] and y0 <= d_rng[1]
    )


def test_zorder_prunes_two_dimensions(spark):
    # 16 hosts x 365 days; 64 files under each layout. The zone-map
    # question: how many files must a scan open for a predicate?
    n = 8000
    base = spark.range(n).select(
        (F.col("id") % 16).alias("hid"), (F.col("id") % 365).alias("day")
    )
    # day-sorted strawman: files are day stripes
    sorted_zones = _zone_maps(
        base.withColumn("f", (F.col("day") * 64 / 365).cast("int")), "f"
    )
    # z-order: interleave hid (spread to 31 bits) with scaled day
    z = base.withColumn(
        "f",
        F.shiftright(
            F.expr(LY.morton_sql("(hid << 27)", "(day << 22)")), 56
        ),
    )
    z_zones = _zone_maps(z, "f")
    assert len(z_zones) > 8  # layout actually fans out

    host3 = (3, 3)
    month = (100, 129)
    all_days = (0, 364)
    all_hosts = (0, 15)
    # combined predicate: z-order opens fewer files
    assert _touched(z_zones, host3, month) < _touched(
        sorted_zones, host3, month
    )
    # host-only predicate: day-sorted layout degenerates to a full scan
    assert _touched(sorted_zones, host3, all_days) == len(sorted_zones)
    assert _touched(z_zones, host3, all_days) <= len(z_zones) // 2
    # day-only predicate: z-order still prunes (coarser than day-sort,
    # which is optimal for this one — that trade is the point)
    assert _touched(z_zones, all_hosts, month) < len(z_zones)


def test_file_bits_validation(spark):
    df = spark.range(4).select(F.col("id").alias("a"), F.col("id").alias("b"))
    with pytest.raises(ValueError):
        LY.zorder_files(df, "a", "b", 0)
    with pytest.raises(ValueError):
        LY.zorder_files(df, "a", "b", 63)
