"""URL-stage Spark surfaces.

Canonicalization needs urljoin/urlparse semantics → Arrow-vectorized
pandas UDF over pycore (shared with the oracle). Host extraction, hashing
and validity are pure Column expressions (JVM-side, codegen'd).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from searchengine_spark.pycore.urltools import EXTENSIONS, canonicalize, url_host


@F.pandas_udf(StringType())
def canonicalize_udf(url: pd.Series) -> pd.Series:
    """F8 — defrag + lowercase scheme/host + rstrip '/'."""
    return url.map(lambda u: canonicalize(u) if u is not None else None)


@F.pandas_udf(StringType())
def host_udf(url: pd.Series) -> pd.Series:
    return url.map(lambda u: url_host(u) if u is not None else None)


def host_col(url: Column) -> Column:
    """Host extraction as a Column expr (parse_url is JVM-side)."""
    return F.lower(F.parse_url(url, F.lit("HOST")))


def urlhash64_col(canon_url: Column) -> Column:
    """64-bit URL key (north rule): Spark xxhash64 — bit-identical to
    pycore.xxhash64 (verified by tests/test_urltools.py)."""
    return F.xxhash64(canon_url)


def urlhash_sha256_col(url: Column) -> Column:
    """F7 reference-parity hash: sha256 of
    "netloc/path/params/query/fragment" — scheme excluded, fragment
    included (utils/__init__.py:25-30). Semicolon path-params are not
    exposed by parse_url; the engine's canonical urls never carry them,
    so '' stands in (parity asserted in tests for param-free urls)."""
    netloc = F.coalesce(F.parse_url(url, F.lit("HOST")), F.lit(""))
    path = F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit(""))
    query = F.coalesce(F.parse_url(url, F.lit("QUERY")), F.lit(""))
    frag = F.coalesce(F.parse_url(url, F.lit("REF")), F.lit(""))
    return F.sha2(
        F.concat_ws("/", netloc, path, F.lit(""), query, frag), 256
    )


# Registrable-domain (pay-level domain) extraction. Real deployments
# key politeness and budgets on the PLD, not the hostname — otherwise a
# site sharded as {www,cdn,blog,m}.example.com gets 4x the crawl rate,
# and *.blogspot-style platforms collapse to one starved key. The full
# public-suffix list is an external artifact a deployment drops in (the
# seam is this tuple); this embedded subset covers the common multi-part
# ICANN suffixes + the major user-subdomain platforms and is documented
# as a subset, not the PSL.
PLD_MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "sch.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "co.nz", "net.nz", "org.nz",
    "co.kr", "or.kr", "go.kr",
    "co.in", "net.in", "org.in", "ac.in", "gov.in",
    "com.br", "net.br", "org.br", "gov.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "com.mx", "com.ar", "com.tr", "com.sg", "com.hk", "com.tw",
    "co.za", "org.za", "co.il", "org.il", "ac.il",
    "github.io", "gitlab.io", "blogspot.com", "wordpress.com",
    "netlify.app", "vercel.app", "web.app", "pages.dev",
)


def pld_sql(host_expr: str) -> str:
    """Registrable domain (PLD) of a lowercased host, as a pure SQL
    expression (codegen'd, pushdown-friendly — same style as
    is_valid_sql). Rules: <=2 labels or an all-numeric (IPv4) host pass
    through; a host whose last two labels form a known multi-part
    public suffix keeps three labels; everything else keeps two."""
    h = f"lower({host_expr})"
    in_list = ", ".join(f"'{s}'" for s in PLD_MULTI_SUFFIXES)
    l2 = (
        f"concat_ws('.', element_at(split({h}, '[.]'), -2), "
        f"element_at(split({h}, '[.]'), -1))"
    )
    l3 = (
        f"concat_ws('.', element_at(split({h}, '[.]'), -3), "
        f"element_at(split({h}, '[.]'), -2), "
        f"element_at(split({h}, '[.]'), -1))"
    )
    return (
        f"CASE WHEN {h} IS NULL THEN NULL "
        f"WHEN size(split({h}, '[.]')) <= 2 THEN {h} "
        f"WHEN {h} RLIKE '^[0-9.]+$' THEN {h} "
        f"WHEN {l2} IN ({in_list}) THEN {l3} "
        f"ELSE {l2} END"
    )


def pld_col(host_expr: str) -> Column:
    """pld_sql over a SQL expression (usually a column name)."""
    return F.expr(pld_sql(host_expr))


def is_valid_sql(url_expr: str, allowed_host_re: str | None = None) -> str:
    """P4 as a pure SQL boolean expression (pushdown-friendly).

    Mirrors pycore.is_valid_url: http(s) scheme, non-empty host, optional
    domain regex, binary-extension blacklist (README.md:209-212).
    """
    host = f"lower(parse_url({url_expr}, 'HOST'))"
    scheme = f"lower(parse_url({url_expr}, 'PROTOCOL'))"
    path = f"lower(coalesce(parse_url({url_expr}, 'PATH'), ''))"
    # Doubled backslash: one level consumed by the SQL string literal.
    ext_pattern = "\\\\.(" + "|".join(EXTENSIONS) + ")$"
    cond = (
        f"{scheme} IN ('http','https') AND {host} IS NOT NULL AND {host} != ''"
        f" AND NOT ({path} RLIKE '{ext_pattern}')"
    )
    if allowed_host_re:
        # same escaping rule as ext_pattern: the SQL string literal
        # consumes one backslash level
        sql_re = allowed_host_re.replace("\\", "\\\\")
        cond += f" AND {host} RLIKE '{sql_re}'"
    return cond
