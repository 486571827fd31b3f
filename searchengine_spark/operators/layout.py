"""Z-order (Morton) file layout for multi-dimension scan pruning.

A 100 TB crawl store is always queried on two axes at once — "host X
over the last 30 days" — but a file layout can only SORT on one. The
public fix (Morton 1966; the layout behind Delta/Iceberg Z-ORDER
clustering and the Tropashko bit-interleave) is to key files by the
interleaved bits of both dimensions: a Z-order range is a stack of
small rectangles, so files end up covering a BOUNDED host set and a
BOUNDED time range simultaneously, and either predicate alone — or
both together — prunes file-level min/max zone maps (T4's parquet
min/max seek, now effective on two columns instead of one).

Implementation is 100% whole-stage-codegen integer arithmetic — the
standard magic-number bit spreads (five shift-or-mask steps per
coordinate, public folklore also used by e.g. libmorton), no UDF, no
shuffle until the reporting groupBy. Each spread step references its
input twice, so the generated expression TEXT doubles per step (2^5
copies of the leaf); that is fine exactly because the steps are plain
projections — Spark's codegen-level common-subexpression elimination
collapses the repeated leaves (the cdc_chunks lesson documented in
traindata.py applies to lambda bodies, where CSE cannot reach; there
are no lambdas here). DuckDB evaluates the same spelled-out arithmetic
for the oracle, so file assignment is bit-identical across engines.

Coordinates are 31-bit (not 32) so every intermediate and the final
interleave stays inside non-negative int64 in BOTH engines — DuckDB
raises on BIGINT shift overflow rather than wrapping like the JVM, so
the sign bit must provably never be touched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MORTON_BITS = 31  # per coordinate; 2*31 = 62 bits, sign-safe in int64

_SPREAD_STEPS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def spread31_sql(expr: str) -> str:
    """SQL for the even-bit spread of a 31-bit int (engine-portable:
    plain & | << on BIGINT with decimal mask literals)."""
    s = f"(CAST({expr} AS BIGINT) & {(1 << MORTON_BITS) - 1})"
    for sh, m in _SPREAD_STEPS:
        s = f"(({s} | ({s} << {sh})) & {m})"
    return s


def morton_sql(x_expr: str, y_expr: str) -> str:
    """SQL for the 62-bit Morton interleave of two 31-bit ints
    (x on even bits, y on odd)."""
    return f"({spread31_sql(x_expr)} | ({spread31_sql(y_expr)} << 1))"


def zorder_key(
    df: DataFrame, x_sql: str, y_sql: str, out_col: str = "zkey"
) -> DataFrame:
    """df + the Morton key of two 31-bit integer SQL expressions —
    write-sorted by this column, a file store gets 2-D zone-map
    pruning from its existing 1-D min/max machinery."""
    return df.withColumn(out_col, F.expr(morton_sql(x_sql, y_sql)))


def zorder_files(
    df: DataFrame,
    x_sql: str,
    y_sql: str,
    file_bits: int = 6,
) -> DataFrame:
    """File-assignment census for a Z-order layout: route each row to
    file ``zkey >> (62 - file_bits)`` (2^file_bits files — the top
    bits of the Morton key are the coarsest interleave, i.e. the
    quadtree cell) and report per file the row count and the x/y
    extents the file's zone map would carry. Bounded extents on BOTH
    axes at once are the property a single-axis sort cannot give.
    """
    if not 1 <= file_bits <= 2 * MORTON_BITS:
        raise ValueError(f"file_bits out of range: {file_bits}")
    keyed = df.select(
        F.expr(x_sql).cast("long").alias("zx"),
        F.expr(y_sql).cast("long").alias("zy"),
        F.expr(morton_sql(x_sql, y_sql)).alias("zkey"),
    )
    return (
        keyed.withColumn(
            "file_id",
            F.shiftright(F.col("zkey"), 2 * MORTON_BITS - file_bits),
        )
        .groupBy("file_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("zx").alias("n_x"),
            F.min("zy").alias("min_y"),
            F.max("zy").alias("max_y"),
        )
    )
