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


def sitemap_fixture(documents: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(host, sitemap_xml) — deterministic sitemap corpus synthesized
    from document ids (the testdata carries no sitemap files; same
    pattern as urlmining.url_fixture): one urlset per h0..h15 host with
    an <url> entry per doc on that host (loc = the article URL,
    lastmod from the id, <priority> stated only when doc_id % 3 != 0 so
    the spec-default-0.5 path is exercised), plus ONE duplicate entry
    per host (the host's min doc repeated at priority 0.9) so
    sitemap_seeds' max-priority dedup rule is exercised too.

    Entries concatenate in doc_id order via sort_array(collect_list)
    — one groupBy(host), deterministic bytes on any partitioning."""
    d = F.col(id_col)
    entry = F.concat(
        F.lit("<url><loc>https://h"),
        (d % 16).cast("string"),
        F.lit(".test/article/"),
        d.cast("string"),
        F.lit("</loc><lastmod>2026-01-"),
        F.lpad(((d % 28) + 1).cast("string"), 2, "0"),
        F.lit("</lastmod>"),
        F.when(
            d % 3 != 0,
            F.concat(
                F.lit("<priority>0."),
                (d % 10).cast("string"),
                F.lit("</priority>"),
            ),
        ).otherwise(F.lit("")),
        F.lit("</url>"),
    )
    per_host = (
        documents.select(
            F.concat(F.lit("h"), (d % 16).cast("string"), F.lit(".test")).alias(
                "host"
            ),
            d.alias("doc_id"),
            entry.alias("e"),
        )
        .groupBy("host")
        .agg(
            F.expr(
                "array_join(transform(sort_array(collect_list("
                "struct(doc_id, e))), x -> x.e), '')"
            ).alias("body"),
            F.min("doc_id").alias("mn"),
        )
    )
    dup = F.concat(
        F.lit("<url><loc>https://"),
        F.col("host"),
        F.lit("/article/"),
        F.col("mn").cast("string"),
        F.lit("</loc><priority>0.9</priority></url>"),
    )
    return per_host.select(
        "host",
        F.concat(
            F.lit('<?xml version="1.0" encoding="UTF-8"?><urlset '
                  'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'),
            F.col("body"),
            dup,
            F.lit("</urlset>"),
        ).alias("sitemap_xml"),
    )
