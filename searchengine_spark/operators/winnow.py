"""Winnowing document fingerprints (Schleimer-Wilkerson-Aiken, MOSS).

The local-fingerprinting algorithm from "Winnowing: Local Algorithms
for Document Fingerprinting" (SIGMOD 2003): hash every k-token shingle,
slide a w-wide window over the hash sequence, and in each window select
the MINIMUM hash (rightmost occurrence on ties — the paper's robust
winnowing rule, which makes the selected positions insensitive to
where the window boundaries fall). The distinct selected (position,
hash) pairs are the document's fingerprint set, with the guarantee
that any shared run of w + k - 1 tokens between two documents yields
at least one shared fingerprint.

This is a different primitive from the engine's other near-dup tools:
minhash/simhash summarize the WHOLE document (one signature per doc);
winnowing fingerprints are LOCAL — they localize which region matched,
which is why it is the plagiarism-detection / code-clone primitive
(MOSS) rather than a corpus-dedup one. `span_dedup`
(traindata.py) removes exact fixed-width spans; winnowing selects a
guaranteed-density sample of positions so matches survive token
insertions between them.

Scale shape: the entire selection is per-row array arithmetic inside
whole-stage codegen — shingle hashing, window minima, and tie-breaking
are nested `transform` lambdas over the token array, deduped with
`array_distinct` BEFORE the explode — so the operator runs with ZERO
shuffles and no Python. At 100 TB it is a pure map over the corpus;
the downstream "find documents sharing a fingerprint" join shuffles
only (fp, doc_id, pos) rows, ~2/(w+1) of the gram count per doc (the
paper's expected density), not the text.

Engine-portable hashing: md5-60bit (same idiom as dedup.simhash /
sampling / sharding) so a DuckDB oracle reproduces every fingerprint
bit-for-bit; `fingerprint_matches` then composes the standard
shared-fingerprint pair join on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from searchengine_spark.functions.text import tokens_sql


def _h60(expr: str) -> str:
    """SQL: bigint of the first 60 bits of md5(expr) — engine-portable."""
    return f"CAST(conv(substring(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


def winnow_fingerprints(
    documents: DataFrame,
    k: int = 4,
    w: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, pos, fp) — robust-winnowing fingerprint selection.

    pos is the 0-based index of the selected k-gram in the document's
    gram sequence; fp is the md5-60bit hash of the space-joined k-gram.
    Documents with fewer than k tokens emit nothing; documents with
    1 ≤ #grams < w use a single window over all grams (so every
    document with at least one gram gets at least one fingerprint —
    the paper's coverage guarantee).

    Selection rule per window j (grams j .. j+w_eff-1): fp = min hash
    in the window, pos = RIGHTMOST index attaining it (robust
    winnowing: ties break toward the most recent gram, so consecutive
    windows re-select the same position and the fingerprint density
    stays ~2/(w+1)). Duplicate (pos, fp) selections from overlapping
    windows collapse via array_distinct inside the row.
    """
    if k < 1 or w < 1:
        raise ValueError("winnow_fingerprints: require k >= 1 and w >= 1")
    gram = _h60(f"array_join(slice(tl, i + 1, {k}), ' ')")
    # hl = md5-60bit hash of each k-gram (0-based positions i)
    hl = f"transform(sequence(0, size(tl) - {k}), i -> {gram})"
    win = "slice(hl, j + 1, we)"
    # rightmost index (1-based within the window) attaining the min
    rmin = (
        f"array_max(transform(sequence(1, we), i -> "
        f"IF(element_at({win}, i) = array_min({win}), i, 0)))"
    )
    sel = (
        f"array_distinct(transform(sequence(0, size(hl) - we), j -> "
        f"named_struct('pos', j + {rmin} - 1, 'fp', array_min({win}))))"
    )
    return (
        documents.selectExpr(f"{id_col} AS doc_id", f"{tokens_sql(text_col)} AS tl")
        .filter(F.expr(f"size(tl) >= {k}"))
        .selectExpr("doc_id", f"{hl} AS hl")
        .selectExpr("doc_id", "hl", f"least({w}, size(hl)) AS we")
        .selectExpr("doc_id", f"explode({sel}) AS s")
        .selectExpr(
            "doc_id", "CAST(s.pos AS INT) AS pos", "CAST(s.fp AS BIGINT) AS fp"
        )
    )


def fingerprint_matches(
    documents: DataFrame,
    k: int = 4,
    w: int = 5,
    min_shared: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_a, doc_b, n_shared) — unordered document pairs sharing at
    least `min_shared` winnowing fingerprint hashes (doc_a < doc_b).

    The MOSS match step: self-join the fingerprint table on fp and
    count distinct shared hashes per pair. Only fingerprint rows
    (~2/(w+1) gram density) shuffle — never the text; a fingerprint
    shared by many documents fans out quadratically within its fp
    group exactly like the minhash band join, and the same guard
    applies (drop degenerate ultra-common fps upstream if a corpus
    has them; the groupBy count is map-side combinable)."""
    fps = winnow_fingerprints(documents, k=k, w=w, id_col=id_col, text_col=text_col)
    a = fps.select(F.col("doc_id").alias("doc_a"), "fp").distinct()
    b = fps.select(F.col("doc_id").alias("doc_b"), "fp").distinct()
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
