"""A6 — HTML tag term weights as a distributed operator.

The tag-text scan is per-row scalar code → one Arrow UDF emitting
(token, weight) pairs per page (pycore.tagweights is the normative
implementation, shared with the tests' oracle); the aggregation is a
plain groupBy — partial map-side combine, one shuffle on (url, token).

`tag_boosted_postings` shows the composition the reference's idxer path
intended (idxer.py:111 → helpers.py:31-47): tf·idf scaled by the summed
tag weight (weight defaults to 1.0 for tokens never inside a weighted
tag — joining LEFT keeps them).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from searchengine_spark.pycore.tagweights import tag_token_weights

_PAIR_TYPE = ArrayType(
    StructType(
        [
            StructField("token", StringType()),
            StructField("w", DoubleType()),
        ]
    )
)


@F.pandas_udf(_PAIR_TYPE)
def _tag_pairs_udf(html: pd.Series) -> pd.Series:
    return pd.Series(
        [list(tag_token_weights(h).items()) for h in html], dtype="object"
    )


# deterministic html fixture (media_table-style): re-wrap each document's
# text in weighted tags so A6 is exercisable — and DuckDB-oracle-able —
# over the plain-text `documents` testdata. Both engines slice the text
# with the same 1-indexed substr bounds, so tokenization agrees even when
# a bound splits a word.
HTML_TITLE_LEN = 64
HTML_BOLD_LEN = 64


def html_table(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, html binary): <title> = first 64 chars, <b> = next 64,
    remainder in an unweighted <p>."""
    t = text_col
    return documents.select(
        F.col(id_col).alias("doc_id"),
        F.encode(
            F.concat(
                F.lit("<html><title>"),
                F.expr(f"substr({t}, 1, {HTML_TITLE_LEN})"),
                F.lit("</title><body><b>"),
                F.expr(f"substr({t}, {HTML_TITLE_LEN + 1}, {HTML_BOLD_LEN})"),
                F.lit("</b><p>"),
                F.expr(f"substr({t}, {HTML_TITLE_LEN + HTML_BOLD_LEN + 1})"),
                F.lit("</p></body></html>"),
            ),
            "utf-8",
        ).alias("html"),
    )


def tag_term_weights(
    pages: DataFrame, id_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, token, weight) — summed tag-weight contributions per term
    (A6, helpers.py:31-47)."""
    return (
        pages.select(
            F.col(id_col).alias("url"),
            F.explode(_tag_pairs_udf(F.col(html_col))).alias("p"),
        )
        .select("url", F.col("p.token").alias("token"), F.col("p.w").alias("w"))
        .groupBy("url", "token")
        .agg(F.sum("w").alias("weight"))
    )


def tag_boosted_postings(
    postings: DataFrame, weights: DataFrame, join_cols: list[str] | None = None
) -> DataFrame:
    """postings(doc_id/url, token, tf_idf) × weights → boosted score =
    tf_idf · coalesce(weight, 1.0) (idxer deferred-weight path)."""
    cols = join_cols or ["url", "token"]
    return postings.join(weights, cols, "left").withColumn(
        "boosted", F.col("tf_idf") * F.coalesce(F.col("weight"), F.lit(1.0))
    )
