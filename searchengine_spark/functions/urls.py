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
