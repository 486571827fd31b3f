"""Compressed posting-list blobs: delta-gap varint over sorted doc_ids.

Reference parity: the reference's index sink writes one text line per
token with its raw posting list (idxer.py:214-233; retrieve_query.py
seeks into it via the index-of-index, SURVEY §2 S4/T4). This operator
is the scale-path replacement for that sink's payload: per-token
binary blobs, delta-gap + LEB128 varint coded (pycore/varint.py is the
normative codec), cutting the id-list bytes by ~4-8× on web-scale
id distributions (Zobel & Moffat 2006).

Plan shape at 100 TB:
  * ONE shuffle — the groupBy(token) that any posting sink already
    pays; sort_array + the Arrow-batched encode UDF run inside that
    aggregated partition, so compression adds zero exchanges.
  * The blob column is opaque binary — parquet stores it untouched
    (no double-encoding), and the (token, blob) table partitions /
    bucket-sorts by token exactly like the uncompressed sink (T1), so
    query-side seek semantics are unchanged.
  * Decode is a per-row Arrow batch expansion (blob → array<long> →
    explode): embarrassingly parallel, no shuffle until the consumer
    asks for one.

Verification story (see __spark_entry__ postings_compress): the DuckDB
oracle recomputes BOTH the byte size (varint size is pure integer
arithmetic on gaps — expressible as a CASE ladder in SQL) and an md5
fingerprint of the DECODED ids. Spark must produce the size from the
real encoder and the fingerprint from a real decode round-trip, so a
bug in either direction of the codec breaks the hash.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from searchengine_spark.pycore.varint import decode_ids, encode_ids


def _encode_udf() -> F.Column:
    @F.pandas_udf("binary")
    def enc(ids: pd.Series) -> pd.Series:
        return ids.map(lambda a: encode_ids([int(x) for x in a]))

    return enc


def _decode_udf() -> F.Column:
    @F.pandas_udf("array<long>")
    def dec(blobs: pd.Series) -> pd.Series:
        return blobs.map(lambda b: decode_ids(bytes(b)))

    return dec


def compress_postings(
    postings: DataFrame,
    token_col: str = "token",
    id_col: str = "doc_id",
) -> DataFrame:
    """(token, n_docs, n_bytes, blob) — one delta-gap varint blob per
    token over its distinct sorted doc_ids. The distinct + groupBy is
    the single token shuffle; encode runs Arrow-batched inside it."""
    return (
        postings.select(
            F.col(token_col).alias("token"), F.col(id_col).alias("doc_id")
        )
        .distinct()
        .groupBy("token")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .select(
            "token",
            F.size("ids").cast("long").alias("n_docs"),
            _encode_udf()("ids").alias("blob"),
        )
        .withColumn("n_bytes", F.length("blob").cast("long"))
        .select("token", "n_docs", "n_bytes", "blob")
    )


def decompress_postings(compressed: DataFrame) -> DataFrame:
    """Inverse: (token, doc_id) exploded back out of the blobs."""
    return compressed.select(
        "token", F.explode(_decode_udf()("blob")).alias("doc_id")
    )


def roundtrip_digest(compressed: DataFrame) -> DataFrame:
    """(token, n_docs, n_bytes, ids_md5) — ids_md5 fingerprints the
    DECODED id list (comma-joined ascending), proving the blob decodes
    back to exactly what was encoded; n_bytes exposes the real encoded
    size. Both are independently recomputable by the SQL oracle."""
    return (
        compressed.withColumn("__ids__", _decode_udf()("blob"))
        .select(
            "token",
            "n_docs",
            "n_bytes",
            F.expr(
                "md5(concat_ws(',', transform(__ids__, x -> CAST(x AS STRING))))"
            ).alias("ids_md5"),
        )
    )


def compression_stats(compressed: DataFrame) -> DataFrame:
    """One-row index-size rollup: tokens, postings, encoded bytes, and
    the raw 8-byte-per-id baseline the blobs replace."""
    return compressed.agg(
        F.count("token").alias("n_tokens"),
        F.sum("n_docs").alias("n_postings"),
        F.sum("n_bytes").alias("encoded_bytes"),
        (F.sum("n_docs") * F.lit(8)).alias("raw_bytes"),
    )


# ---- Elias-Fano posting-list sizing ------------------------------------


def _floor_log2(m: F.Column) -> F.Column:
    """Exact floor(log2(m)) for a BIGINT column m >= 1, engine-portable.

    floor(log2(double)) alone can be off by one at power-of-two
    boundaries (log rounding); the integer verification step repairs
    it, so the result is exact in Spark AND in the DuckDB oracle
    regardless of each engine's libm. power(2, c) is a dyadic double —
    exact for every c <= 52, far above any posting-universe width."""
    c = F.floor(F.log2(m.cast("double"))).cast("long")
    p = F.pow(F.lit(2.0), c.cast("double")).cast("long")
    return (
        F.when(p * 2 <= m, c + 1).when(p > m, c - 1).otherwise(c)
    )


def eliasfano_sizes(
    postings: DataFrame,
    token_col: str = "token",
    id_col: str = "doc_id",
) -> DataFrame:
    """(token, n_postings, ef_bits, ef_bytes) — the exact Elias-Fano
    encoded size of each token's sorted doc-id list (Vigna, WSDM 2013
    "quasi-succinct indices"; the posting format of modern engines —
    public Lucene/Trino use it for id lists).

    For n strictly increasing ids in universe U = max(doc_id) + 1:

      l        = max(0, floor(log2(U / n)))   (low-bit width)
      ef_bits  = n*l  +  n + (U >> l)         (low halves + upper unary)
      ef_bytes = ceil(ef_bits / 8)

    floor(log2(U/n)) == floor(log2(U div n)) for integers U >= n >= 1,
    so the whole computation is exact 64-bit arithmetic — the DuckDB
    oracle reproduces every value bit-for-bit, no float tolerance.

    Scale shape (100 TB): ONE count per token (the df aggregate the
    dictionary already pays) + a 1-row universe aggregate broadcast
    back; the size formula is a pure per-token projection — no joins
    against bit tables, no UDF, no extra shuffle. Pair with
    compression_stats to choose varint vs EF per index segment from
    real numbers instead of folklore.
    """
    df_tab = (
        postings.select(F.col(token_col).alias("token"), F.col(id_col))
        .distinct()
        .groupBy("token")
        .agg(F.count("*").alias("n_postings"))
    )
    urow = postings.agg((F.max(id_col) + 1).alias("u"))
    j = df_tab.crossJoin(F.broadcast(urow))  # 1-row dim: broadcast, not shuffle
    n = F.col("n_postings")
    m = F.floor(F.col("u") / n).cast("long")  # U div n, exact (< 2^53)
    l = F.when(m <= F.lit(1), F.lit(0)).otherwise(_floor_log2(m))
    v = F.pow(F.lit(2.0), l.cast("double")).cast("long")  # 2^l, exact
    bits = n * l + n + F.floor(F.col("u") / v).cast("long")
    return j.select(
        "token",
        "n_postings",
        bits.alias("ef_bits"),
        F.floor((bits + 7) / 8).cast("long").alias("ef_bytes"),
    )
