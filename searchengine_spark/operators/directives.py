"""Page-level crawl directives: meta-robots flags + rel=canonical.

The reference obeys robots.txt (SURVEY §2 J8) but never reads the
page-LEVEL directives that real crawl curation runs on: the
`<meta name="robots" content="noindex…">` flags (the REP's page-level
half, RFC 9309's companion convention) and `<link rel="canonical">`
(the public Google/Bing duplicate-consolidation signal). At
Common-Crawl scale both are mandatory: noindex pages must not enter
the index, and canonical groups collapse huge parameter/mirror
families into one representative before dedup even starts.

Everything here is ONE case-insensitive regexp projection per signal —
JVM regex, whole-stage codegen, no UDF, no shuffle (patterns are
RE2-compatible: no lookahead/backrefs, so the DuckDB oracle runs the
identical expressions). Attribute order is handled by an
href-first/rel-first alternation pair coalesced together.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# RE2-safe (and Java-safe) patterns; (?i) = case-insensitive
_NOINDEX = r'(?i)<meta[^>]*name="robots"[^>]*content="[^"]*noindex'
_NOFOLLOW = r'(?i)<meta[^>]*name="robots"[^>]*content="[^"]*nofollow'
_CANON_RL = r'(?i)<link[^>]*rel="canonical"[^>]*href="([^"]*)"'
_CANON_HR = r'(?i)<link[^>]*href="([^"]*)"[^>]*rel="canonical"'


def page_directives(
    pages: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
) -> DataFrame:
    """(doc_id, noindex, nofollow, canonical_url) — canonical_url is
    NULL when the page declares none (empty-match regexp results are
    nullif'd identically in both engines)."""
    h = F.col(html_col)
    canon = F.coalesce(
        F.nullif(F.regexp_extract(h, _CANON_RL, 1), F.lit("")),
        F.nullif(F.regexp_extract(h, _CANON_HR, 1), F.lit("")),
    )
    return pages.select(
        F.col(id_col).alias("doc_id"),
        (F.regexp_count(h, F.lit(_NOINDEX)) > 0).alias("noindex"),
        (F.regexp_count(h, F.lit(_NOFOLLOW)) > 0).alias("nofollow"),
        canon.alias("canonical_url"),
    )


def canonical_census(
    pages: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """(target_url, n_pages) — pages grouped by their canonical
    consolidation target (own url when no rel=canonical declared):
    the pre-dedup collapse report. One directives projection + ONE
    groupBy on the target key; parameter families that all point at
    one canonical collapse before any similarity machinery runs."""
    d = page_directives(pages, id_col=id_col, html_col=html_col)
    j = pages.select(F.col(id_col).alias("doc_id"), F.col(url_col)).join(
        d, "doc_id"
    )
    return (
        j.select(
            F.coalesce(F.col("canonical_url"), F.col(url_col)).alias(
                "target_url"
            )
        )
        .groupBy("target_url")
        .agg(F.count("*").alias("n_pages"))
    )
