"""WARC source: Common-Crawl-style archives → the crawl pages table.

The north-star input (BASELINE.json input_hint) is an Iceberg/parquet
table of Common-Crawl-style pages `(url, warc_ts, html, text, lang)`;
the wire format those corpora actually arrive in is WARC. This module
is the ingest edge: WARC blobs → relational page rows, Spark-first.

Scale shape: Common Crawl ships ~1 GB gzip'd WARC files; the unit of
parallelism is the FILE (one task per blob — each gzip member chain is
inherently sequential), so a 100 TB ingest is a `binaryFile` scan over
~10^5 files with mapInPandas doing the record split per file. No
shuffle anywhere: the output is a pure per-file flatMap, and the
downstream frontier/dedup repartition by host-hash is where the first
exchange happens. Parsing is pycore.warc (the normative codec — same
bytes-in/rows-out on Spark and in tests).

Fixture: the testdata carries no .warc files, so `warc_fixture`
synthesizes a deterministic per-host WARC blob from the documents
table (same generative-fixture pattern as functions/sitemap.py
sitemap_fixture): records in doc_id order, a warcinfo + request record
per blob that ingest must SKIP, odd hosts plain / even hosts
per-record-gzip'd so both storage layouts are exercised, and one
corrupt record injected per host-0 blob to exercise resync-skip.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RECORD_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", StringType()),
        StructField("status", IntegerType()),
        StructField("content_type", StringType()),
        StructField("html", BinaryType()),
        StructField("n_skipped", LongType()),
    ]
)


def _records_from_blobs(
    blobs: Iterator[pd.DataFrame], blob_col: str
) -> Iterator[pd.DataFrame]:
    from searchengine_spark.pycore.warc import parse_warc

    for pdf in blobs:
        rows = []
        for blob in pdf[blob_col]:
            if blob is None:
                continue
            recs, skipped = parse_warc(bytes(blob))
            for r in recs:
                if r.rec_type != "response":
                    continue
                rows.append(
                    (
                        r.url,
                        r.date,
                        r.http_status,
                        r.http_content_type,
                        r.body,
                        skipped,
                    )
                )
        yield pd.DataFrame(
            rows,
            columns=[
                "url", "warc_ts", "status", "content_type", "html",
                "n_skipped",
            ],
        )


def warc_records(blobs: DataFrame, blob_col: str = "warc") -> DataFrame:
    """(…, warc:binary) → one row per response record:
    (url, warc_ts, status, content_type, html, n_skipped)."""
    src = blobs.select(F.col(blob_col).alias("_b"))
    return src.mapInPandas(
        lambda it: _records_from_blobs(it, "_b"), schema=RECORD_SCHEMA
    )


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Directory/glob of .warc / .warc.gz files → response-record rows.
    binaryFile scan: one row per file, whole file as content — the
    correct granularity because gzip-member chains don't split."""
    return warc_records(
        spark.read.format("binaryFile").load(path).select("content"),
        blob_col="content",
    )


def cc_pages(records: DataFrame) -> DataFrame:
    """Response records → the north-star pages shape
    (url, warc_ts:timestamp, html:binary, text, lang): ok-status html
    rows only, text via the normative extractor (byte-identical to the
    reference parser per url), lang left null for a downstream
    lang-ID pass (operators/textstats.lang_id)."""
    from searchengine_spark.functions.text import extract_text_udf

    return (
        records.filter(
            (F.col("status") == 200)
            & (F.col("content_type") == "text/html")
        )
        .withColumn("warc_ts", F.to_timestamp("warc_ts"))
        .withColumn(
            "text", extract_text_udf(F.col("html").cast("string"))
        )
        .select("url", "warc_ts", "html", "text", F.lit(None).cast(
            "string").alias("lang"))
    )


# ---------------------------------------------------------------- fixture

_FIXTURE_SCHEMA = StructType(
    [
        StructField("host", LongType()),
        StructField("warc", BinaryType()),
    ]
)


def _build_host_blob(key, pdf):  # no type hints: applyInPandas infers
    # the (key, pdf) eval type from the 2-arg signature alone
    from searchengine_spark.pycore import warc as W

    host = int(key[0])
    pdf = pdf.sort_values("doc_id")
    date0 = "2026-02-01T00:00:00Z"
    recs = [
        W.build_record(
            "warcinfo",
            b"software: searchengine-spark-fixture\r\n",
            date=date0,
        )
    ]
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        d = int(doc_id)
        url = f"https://h{host}.test/article/{d}"
        date = f"2026-02-{d % 28 + 1:02d}T{d % 24:02d}:00:00Z"
        status = 404 if d % 17 == 0 else 200
        body = b"" if status == 404 else str(text).encode("utf-8")
        recs.append(
            W.build_record(
                "request",
                f"GET /article/{d} HTTP/1.1\r\nHost: h{host}.test\r\n\r\n".encode(),
                url=url,
                date=date,
            )
        )
        recs.append(
            W.build_record(
                "response",
                W.build_http_response(body, status=status),
                url=url,
                date=date,
            )
        )
    if host == 0:
        # corrupt garbage between records: ingest must resync-skip it
        recs.insert(1, b"GARBAGE not a warc record\r\n\r\n")
    blob = W.build_warc(recs, gzip_members=(host % 2 == 0))
    return pd.DataFrame({"host": [host], "warc": [blob]})


def warc_fixture(documents: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """documents → (host, warc) — one deterministic WARC blob per
    doc_id%16 host; see module docstring for what each blob exercises."""
    return (
        documents.select(
            F.col(id_col).alias("doc_id"),
            F.col("text"),
            (F.col(id_col) % 16).alias("host"),
        )
        .groupBy("host")
        .applyInPandas(_build_host_blob, schema=_FIXTURE_SCHEMA)
    )
