"""S1/S2/P2 — recursive JSON corpus ingest, schema-on-read.

Reference shape (index_construction.py:153-163): os.walk over a DEV-style
corpus root, keep only ``.json`` files (P2 suffix filter), per-file
``json.load`` of a ``{url, content, encoding}`` document with
silent-skip of undecodable files (index_construction.py:73-88) and of
docs with null url/content (P1).

Spark-first rebuild: ONE ``spark.read.json`` with an explicit schema —
no driver-side directory walk, no per-file Python.

  * S1 recursive scan  → ``recursiveFileLookup`` (the scan parallelizes
    over files; at 100 TB the listing itself is distributed).
  * P2 suffix filter   → ``pathGlobFilter='*.json'`` (applied at the
    file index, before any bytes are read).
  * S2 lenient decode  → PERMISSIVE mode: an unparseable file/line
    becomes a row whose ``_corrupt_record`` is set and every schema
    column is null — dropped by the same null filter as P1 (the
    reference's try/except-skip, lifted to a filter predicate the
    optimizer can push around).
  * provenance         → ``input_file_name()`` per row (the reference
    keeps the file path for its doc-id map).

Schema-on-read means column pruning works: a query touching only ``url``
never materializes ``content`` strings from the JSON parser.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORPUS_FIELDS = "url string, content string, encoding string"
CORPUS_SCHEMA = CORPUS_FIELDS + ", _corrupt_record string"


def read_corpus(
    spark: SparkSession,
    root: str,
    pattern: str = "*.json",
    multiline: bool = True,
    with_provenance: bool = True,
) -> DataFrame:
    """(url, content, encoding[, src_file]) over every ``pattern`` file
    under ``root``, recursively; undecodable files and null-url/content
    docs are skipped (reference silent-skip semantics).

    multiline=True reads one JSON document per file (the reference's DEV
    corpus layout); multiline=False reads JSON-lines parts (the layout
    Spark itself writes)."""
    df = (
        spark.read.schema(CORPUS_SCHEMA)
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", pattern)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("multiLine", "true" if multiline else "false")
        .json(root)
    )
    if with_provenance:
        df = df.withColumn("src_file", F.input_file_name())
    return (
        df.filter(F.col("_corrupt_record").isNull())  # S2: decode-failure skip
        .filter(F.col("url").isNotNull() & F.col("content").isNotNull())  # P1
        .drop("_corrupt_record")
    )
