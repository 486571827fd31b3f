"""URL template mining — crawl-trap / faceted-navigation detection.

A crawler at 10^10-frontier scale dies on URL *families*, not URLs:
calendar pages, session-id links, faceted search grids each emit
millions of syntactically distinct URLs with one underlying template.
The reference gates these per-pair via URL similarity
(`/root/reference/url_similarity.py` — path-segment voting); template
mining is the corpus-level complement: normalize every URL's
path+query to a template (hex runs → ``{H}``, digit runs → ``{N}``),
count URLs per (host, template), and the heavy templates are the trap
candidates a frontier budget (operators/budget.py) or the trap gate
(pycore/trapgate.py) can then throttle by *pattern* instead of
one-pair-at-a-time.

Scale shape: two regexp_replace projections (per-row, whole-stage
codegen, no UDF) + ONE groupBy((host, template)) with map-side partial
aggregation — the same single-shuffle cost as a word count, at any
corpus size. Both regexes are RE2-compatible so the DuckDB oracle runs
the identical normalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# host = authority after the scheme; template operates on everything
# after it (path + query + fragment). RE2-safe: no lookarounds.
HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/?#]+)"
HEX_RUN_RE = r"[0-9a-f]{8,}"
DIGIT_RUN_RE = r"[0-9]+"


def host_expr(url_col: str):
    """Column: authority of the (lowercased) URL."""
    return F.regexp_extract(F.lower(F.col(url_col)), HOST_RE, 1)


def template_expr(url_col: str):
    """Column: the URL's template — path+query lowercased, hex runs ≥8
    collapsed to ``{H}`` then digit runs to ``{N}``. The shared
    normalization used by the census (url_templates) and by the
    crawler's frontier gate, so deny-list keys always match."""
    rest = F.regexp_replace(F.lower(F.col(url_col)), HOST_RE, "")
    return F.regexp_replace(
        F.regexp_replace(rest, HEX_RUN_RE, "{H}"), DIGIT_RUN_RE, "{N}"
    )


def url_templates(
    urls: DataFrame, url_col: str = "url"
) -> DataFrame:
    """(host, template, n_urls, n_distinct_urls, example_url) — URL
    pattern census. template = path+query lowercased with long hex runs
    collapsed to ``{H}`` (session ids, content hashes) then digit runs
    to ``{N}`` (ids, page numbers, dates). n_urls counts raw rows (a
    recrawled URL counts each capture), n_distinct_urls the distinct
    URLs behind the template — a template with huge n_distinct_urls and
    low content diversity is the classic crawler trap signature.
    example_url = min URL, a deterministic representative."""
    return (
        urls.select(
            host_expr(url_col).alias("host"),
            template_expr(url_col).alias("template"),
            F.col(url_col).alias("url"),
        )
        .groupBy("host", "template")
        .agg(
            F.count("*").alias("n_urls"),
            F.countDistinct("url").alias("n_distinct_urls"),
            F.min("url").alias("example_url"),
        )
    )


def trap_templates(
    templates: DataFrame, min_urls: int = 100
) -> DataFrame:
    """Filter a url_templates() census down to throttle candidates:
    templates backing ≥ min_urls distinct URLs on one host. Pure filter
    over the census — the output is small (templates, not URLs) and is
    meant to be broadcast back against the frontier as a deny/limit
    list."""
    return templates.filter(F.col("n_distinct_urls") >= min_urls)


def url_fixture(documents: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic URL corpus synthesized from document ids — the
    sandbox testdata carries no url column (same pattern as
    traindata.pii_table). Five families across 16 hosts: plain article
    ids, product ids with a ref facet, per-language tag pagination,
    hex session paths (md5-derived, so both engines reproduce them),
    and a static page that collapses to one template per host."""
    d = F.col(id_col)
    host = F.concat(F.lit("https://h"), (d % 16).cast("string"), F.lit(".test"))
    hexid = F.substring(F.md5(d.cast("string")), 1, 12)
    path = (
        F.when(d % 5 == 0, F.concat(F.lit("/article/"), d.cast("string")))
        .when(
            d % 5 == 1,
            F.concat(
                F.lit("/product/"), d.cast("string"),
                F.lit("?ref="), (d % 7).cast("string"),
            ),
        )
        .when(
            d % 5 == 2,
            F.concat(
                F.lit("/tag/"), F.col("lang"),
                F.lit("/page/"), (d % 50).cast("string"),
            ),
        )
        .when(d % 5 == 3, F.concat(F.lit("/s/"), hexid))
        .otherwise(F.lit("/static/about"))
    )
    return documents.select(
        d.alias("doc_id"), F.concat(host, path).alias("url")
    )


def path_prefix_census(
    urls: DataFrame,
    max_depth: int = 3,
    url_col: str = "url",
) -> DataFrame:
    """(host, prefix, depth, n_urls) — URL-space census by path prefix
    up to max_depth segments: every URL contributes its /a, /a/b,
    /a/b/c ancestors, counted per host. The scope-decision view a
    crawl operator reads before widening or pruning a site ("/forum is
    80% of the budget") — the tree-census companion to url_templates'
    pattern census.

    One explode of ≤ max_depth prefix rows per URL + one count
    aggregate keyed (host, prefix) — map-side combinable, no UDF (path
    split is parse_url + slice/array_join exprs)."""
    host = F.lower(F.parse_url(F.col(url_col), F.lit("HOST")))
    path = F.coalesce(F.parse_url(F.col(url_col), F.lit("PATH")), F.lit(""))
    segs = F.expr(
        "filter(split(regexp_replace(path, '^/', ''), '/'), s -> s <> '')"
    )
    pref = F.expr(
        f"transform(sequence(1, least(size(segs), {max_depth})), "
        f"d -> struct(d AS depth, "
        f"concat('/', array_join(slice(segs, 1, d), '/')) AS prefix))"
    )
    return (
        urls.select(host.alias("host"), path.alias("path"))
        .select("host", segs.alias("segs"))
        .filter(F.size("segs") > 0)
        .select("host", F.explode(pref).alias("p"))
        .select("host", F.col("p.prefix").alias("prefix"),
                F.col("p.depth").alias("depth"))
        .groupBy("host", "prefix", "depth")
        .agg(F.count("*").alias("n_urls"))
    )
