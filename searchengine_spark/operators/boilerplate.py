"""Host-level boilerplate line removal (CCNet-style, public recipe).

Web pages on one host share navigation / footer / legal lines that are
noise for both indexing and LLM training data. The public CCNet /
C4-style recipe strips a LINE when it appears on at least a fraction of
the host's pages: line frequency is computed per (host, trimmed line),
and any line whose document-frequency within its host crosses
``min_frac`` (and an absolute ``min_df`` floor, so 1-of-2 pages never
counts as "frequent") is dropped from every page of that host.

Scale design (the part that matters at 100 TB):
  * The frequent-line table is TINY — bounded by hosts x the
    boilerplate vocabulary (each row needs df >= min_df across the
    host's pages), not by corpus size. It is collected per host into
    an array and **broadcast**; the strip itself is then a single
    broadcast hash join + an array ``filter`` over each page's lines —
    zero extra shuffles, and line order is preserved for free because
    the text is never exploded on the strip side.
  * The frequency pass is ONE shuffle: distinct (host, doc, line) →
    groupBy (host, line) with map-side partial aggregation. Host page
    totals ride the same host-keyed exchange.
  * Whitespace-only lines are excluded from the frequent set (they
    would be "frequent" on every host and carry no signal); they pass
    through untouched.

Reference parity: the reference engine has no boilerplate pass — this
is one of the §2.11 training-data-pipeline additions (same family as
dedup/quality in operators/textstats.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_lines(
    docs: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    min_df: int = 2,
    min_frac: float = 0.3,
) -> DataFrame:
    """(host, line, df, n_docs) for lines crossing the boilerplate bar.

    ``line`` is the TRIMMED line string; matching at strip time trims
    the page's lines the same way, so indentation variants of one
    boilerplate line collapse. A line repeated within one page counts
    once (document frequency, not term frequency).
    """
    lines = (
        docs.select(
            F.col(host_col).alias("host"),
            F.col(doc_id_col).alias("doc_id"),
            F.explode(
                F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
            ).alias("raw"),
        )
        .select("host", "doc_id", F.trim(F.col("raw")).alias("line"))
        .where(F.col("line") != "")
        .distinct()
    )
    totals = docs.groupBy(F.col(host_col).alias("host")).agg(
        F.countDistinct(doc_id_col).alias("n_docs")
    )
    return (
        lines.groupBy("host", "line")
        .agg(F.count(F.lit(1)).alias("df"))
        .join(totals, "host")
        .where(
            (F.col("df") >= F.lit(min_df))
            & (F.col("df") >= F.col("n_docs") * F.lit(float(min_frac)))
        )
    )


def strip_boilerplate(
    docs: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    min_df: int = 2,
    min_frac: float = 0.3,
) -> DataFrame:
    """(doc_id, clean_text, n_kept, n_dropped) with boilerplate removed.

    ``clean_text`` is the page with its host's frequent lines deleted,
    remaining lines in original order. A page that was ALL boilerplate
    comes back with ``clean_text = ''`` (kept in the output — dropping
    whole rows is the quality gate's decision, not this operator's).
    """
    freq = frequent_lines(
        docs, host_col, text_col, doc_id_col, min_df=min_df, min_frac=min_frac
    )
    per_host = freq.groupBy("host").agg(
        F.collect_set("line").alias("boiler_lines")
    )
    out = (
        # null text behaves as empty (split(null) would otherwise
        # propagate null arrays into size() = -1 counts)
        docs.select(
            F.col(doc_id_col).alias("doc_id"),
            F.col(host_col).alias("host"),
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n").alias(
                "lines"
            ),
        )
        .join(F.broadcast(per_host), "host", "left")
        .select(
            "doc_id",
            F.expr(
                "CASE WHEN boiler_lines IS NULL THEN lines "
                "ELSE filter(lines, l -> NOT array_contains(boiler_lines, trim(l))) "
                "END"
            ).alias("kept_lines"),
            F.size("lines").alias("n_lines"),
        )
    )
    return out.select(
        "doc_id",
        F.concat_ws("\n", F.col("kept_lines")).alias("clean_text"),
        F.size("kept_lines").alias("n_kept"),
        (F.col("n_lines") - F.size("kept_lines")).alias("n_dropped"),
    )
