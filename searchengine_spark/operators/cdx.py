"""CDX-style capture index: SURT-keyed URL lookup with prefix RANGE
scans — the web-archive access path over a crawl's capture log.

The reference resolves single URLs through its doc-id map
(doc_id_map.py via operators/docmap.py, S8) and has no subtree lookup;
at Common-Crawl scale the public answer is the CDX index: every
capture keyed by its SURT (functions/urls.py:surt_col), stored sorted
by that key, so "all captures under example.org/foo/" is ONE
lexicographic range `[p, p̄)` — never a LIKE scan over 10^10 rows.

Scale shape (100 TB): `cdx_index` is a projection (zero shuffle) —
sort/partition-by-surt happens at the sink, exactly the token-sorted
index layout (T4): parquet min/max stats on the surt column turn the
range predicate into partition+row-group pruning (PushedFilters
asserted in tests/test_cdx.py). `cdx_range` is a pure filter; the
half-open upper bound reuses the dictionary prefix idiom
(operators/query.py:_prefix_upper).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from searchengine_spark.functions.urls import surt_col
from searchengine_spark.operators.query import _prefix_upper


def cdx_index(captures: DataFrame, url_col: str = "url") -> DataFrame:
    """(…capture cols…, surt) — the capture frame keyed for range
    lookup. Pure projection; write it sorted by surt (S4's
    write_sorted_index idiom) to make every range scan stats-prunable."""
    return captures.withColumn("surt", surt_col(F.col(url_col)))


def cdx_range(index: DataFrame, surt_prefix: str) -> DataFrame:
    """All captures whose SURT starts with `surt_prefix`, as the
    half-open range [p, p̄) — a pushdown-able pair of comparisons, not
    startswith (which parquet stats cannot prune)."""
    if not surt_prefix:
        raise ValueError("cdx_range() needs a non-empty surt prefix")
    return index.filter(
        (F.col("surt") >= surt_prefix)
        & (F.col("surt") < _prefix_upper(surt_prefix))
    )
