"""Anchor-text aggregation: the inbound-link description index.

Web-scale retrieval weighs the text OF LINKS pointing at a page as a
description of that page (public signal, used by every major engine;
the reference scraper keeps only hrefs — README.md:105-111 — so this is
rebuild-only surface). This operator turns a pages table into
(target_url, token, weight) postings where weight = number of inbound
anchors whose text contains the token.

Plan shape (100 TB audit): html crosses into Python exactly ONCE — one
Arrow stage fuses extract_anchors with target canonicalization (the
same fusion as the crawler's extract_canon_links_udf) and drops the
payload immediately; anchor text is ~10^-3 of page bytes. Tokenization
is Column exprs; the aggregation is a single (target, token) shuffle
with map-side partial aggs — the one unavoidable global exchange, since
anchors for a target originate on every source page's partition. No
driver-side data.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

from searchengine_spark.functions.text import tokens_sql

_ANCHOR_TYPE = ArrayType(
    StructType(
        [
            StructField("target", StringType()),
            StructField("anchor", StringType()),
        ]
    )
)


@F.pandas_udf(_ANCHOR_TYPE)
def extract_canon_anchors_udf(html: pd.Series, url: pd.Series) -> pd.Series:
    """extract_anchors ∘ canonicalize(target) fused in one Arrow stage;
    pairs whose target fails canonicalization are dropped."""
    from searchengine_spark.pycore.textextract import extract_anchors
    from searchengine_spark.pycore.urltools import canonicalize

    out = []
    for h, u in zip(html, url):
        pairs = []
        for target, text in extract_anchors(h, u):
            c = canonicalize(target)
            if c:
                pairs.append((c, text))
        out.append(pairs)
    return pd.Series(out, dtype="object")


def anchor_postings(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    self_links: bool = False,
) -> DataFrame:
    """pages(url, html) → (target_url, token, weight): weight counts the
    token's occurrences across ALL inbound anchor texts — duplicate
    anchors weigh multiply, matching the multi-edge link semantics. self_links=False (default) drops a page's links to
    itself (navigation boilerplate would self-describe every page).
    Join the output onto an index by (doc url, token) to boost postings
    the way tag_term_weights boosts on-page tag terms (A6)."""
    anchors = pages.select(
        F.col(url_col).alias("_src"),
        F.explode(extract_canon_anchors_udf(F.col(html_col), F.col(url_col))).alias(
            "_a"
        ),
    ).select(
        "_src",
        F.col("_a.target").alias("target_url"),
        F.col("_a.anchor").alias("_anchor"),
    )
    if not self_links:
        anchors = anchors.filter(F.col("target_url") != F.col("_src"))
    return (
        anchors.select(
            "target_url", F.explode(F.expr(tokens_sql("_anchor"))).alias("token")
        )
        .groupBy("target_url", "token")
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def anchor_entropy(postings: DataFrame) -> DataFrame:
    """(target_url, n_terms, n_anchors, entropy) — anchor-vocabulary
    entropy per link target over the (target_url, token, weight)
    anchor postings: H = −Σ p·ln(p), p = weight/Σweight. The classic
    nepotistic-link signal (Davison 2000 line of work): organically
    cited pages accumulate DIVERSE anchor wording (high H); a link
    farm repeats one phrase (H ≈ 0). Pairs with reciprocity and
    degree_tail as the third link-spam alarm.

    Exact integer weights; p and the token-ordered entropy fold are
    the only floats — one groupBy(target_url), skew-safe because the
    per-target term list is the (already aggregated) distinct anchor
    vocabulary, not the raw link stream."""
    tot = postings.groupBy("target_url").agg(
        F.sum("weight").alias("tw"), F.count("*").alias("n_terms")
    )
    j = postings.join(tot, "target_url")
    ent_term = (
        F.col("weight").cast("double") / F.col("tw").cast("double")
    )
    return (
        j.select(
            "target_url",
            "n_terms",
            F.col("tw").alias("n_anchors"),
            "token",
            (-(ent_term * F.log(ent_term))).alias("h"),
        )
        .groupBy("target_url")
        .agg(
            F.first("n_terms").alias("n_terms"),
            F.first("n_anchors").alias("n_anchors"),
            F.expr(
                "aggregate(sort_array(collect_list(struct(token, h AS v))), "
                "0.0D, (a, s) -> a + s.v)"
            ).alias("entropy"),
        )
    )
