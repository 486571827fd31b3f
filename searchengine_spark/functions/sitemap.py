"""Spark surface for sitemap parsing (seed-discovery input path).

Turns a table of raw sitemap documents into exploded url-entry rows and
into canonicalized, priority-scored crawl seeds (the frontier's
score-ordered queue consumes priority directly). One Arrow-batched
pandas UDF over pycore.sitemap.parse_sitemap — the normative parser."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

# type objects, not a DDL string: DDL parsing needs a live session and
# this module must import Spark-session-free (test collection, zip ship)
_ENTRY_TYPE = ArrayType(
    StructType(
        [
            StructField("loc", StringType()),
            StructField("lastmod", StringType()),
            StructField("changefreq", StringType()),
            StructField("priority", DoubleType()),
            StructField("nested", BooleanType()),
        ]
    )
)


@F.pandas_udf(_ENTRY_TYPE)
def parse_sitemap_udf(xml: pd.Series) -> pd.Series:
    """sitemap_xml → url entries + nested index refs (nested=True rows
    carry the child sitemap's loc; a fetch layer resolves them and feeds
    the child documents back through this same UDF)."""
    from searchengine_spark.pycore.sitemap import parse_sitemap

    out = []
    for x in xml:
        entries, nested = parse_sitemap(x)
        rows = [
            (e.loc, e.lastmod, e.changefreq, e.priority, False)
            for e in entries
        ]
        rows += [(loc, None, None, None, True) for loc in nested]
        out.append(rows)
    return pd.Series(out, dtype="object")


def sitemap_entries(raw: DataFrame, xml_col: str = "sitemap_xml") -> DataFrame:
    """(…, sitemap_xml) → one row per sitemap entry, original columns
    kept: (…, loc, lastmod, changefreq, priority, nested)."""
    return raw.withColumn(
        "_e", F.explode(parse_sitemap_udf(F.col(xml_col)))
    ).select("*", "_e.loc", "_e.lastmod", "_e.changefreq", "_e.priority",
             "_e.nested").drop("_e", xml_col)


def sitemap_seeds(
    raw: DataFrame,
    xml_col: str = "sitemap_xml",
    default_priority: float = 0.5,
) -> DataFrame:
    """sitemap documents → (canon_url, score) seed rows for
    frontier.init_crawl/crawl(seeds_df=…): url entries only (index refs
    excluded — resolve those upstream), locs canonicalized, duplicates
    keep the highest priority; unstated priority takes the spec default
    0.5 so sitemap seeds slot into the frontier's (0, 1] score scale."""
    from searchengine_spark.functions.urls import canonicalize_udf

    return (
        sitemap_entries(raw, xml_col)
        .filter(~F.col("nested"))
        .select(
            canonicalize_udf(F.col("loc")).alias("canon_url"),
            F.coalesce(F.col("priority"), F.lit(default_priority)).alias(
                "score"
            ),
        )
        .filter(F.col("canon_url").isNotNull())
        .groupBy("canon_url")
        .agg(F.max("score").alias("score"))
    )
