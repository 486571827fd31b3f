"""Unicode text normalization for training-data curation.

The curation stage every web-scale pipeline runs before tokenizing
(CCNet/Dolma "fix text"): web-extracted text arrives with decomposed
combining sequences (e + U+0301 vs é), zero-width joiners, soft
hyphens, stray C0/C1 control bytes and tab/space runs — all of which
fragment the token vocabulary and poison dedup fingerprints (two
byte-different strings that RENDER identically must hash identically
downstream). The reference tokenizes raw extracted text directly
(tokenizer.py, SURVEY §2 F2) — fine for its single-site corpus,
wrong at Common-Crawl diversity.

Normalization order (each step's output feeds the next):
  1. Unicode NFC — canonical composition (combining sequences fold to
     precomposed forms; compatibility forms like ﬁ/full-width are NOT
     touched: NFC is lossless, NFKC is a policy decision left to the
     caller).
  2. Strip format/control noise: C0 except \\t \\n, DEL+C1, zero-width
     space/joiner/non-joiner, BOM/ZWNBSP, soft hyphen.
  3. Collapse horizontal whitespace runs (space/tab) to one space and
     trim line edges — newlines survive (paragraph structure is signal
     for span dedup and quality scoring).

Engine parity: steps 2-3 are pure regexp_replace Column exprs (the
patterns are built from literal codepoints, so the Java-regex and RE2
dialects see identical character classes — no escape-syntax skew).
Step 1 has no Spark built-in, so it is the one Arrow-batched pandas
UDF (Python unicodedata ↔ DuckDB nfc_normalize, both tracking the
Unicode standard; parity pinned by tests and the hash-checked oracle).

Scale shape: a pure projection — zero shuffle, composes with scan
pruning; the NFC UDF short-circuits to a no-op copy for pure-ASCII
batches (the overwhelming majority of English web text), keeping the
Arrow hop cheap where it cannot matter.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# step-2 class: C0 minus \t\n, DEL, C1, zero-widths, BOM, soft hyphen.
# Written with \x{..} hex escapes — the one escape syntax Java regex
# and RE2 share — so the pattern TEXT is pure ASCII (a raw NUL inside
# an SQL literal is a parser error on the oracle side).
_STRIP_CLASS = (
    r"[\x{0000}-\x{0008}\x{000B}-\x{001F}\x{007F}-\x{009F}"
    r"\x{200B}-\x{200D}\x{FEFF}\x{00AD}]"
)
_HSPACE_RUN = "[ \t]+"
_EDGE_SPACE = "(^ +| +$)"


def _nfc_udf() -> F.Column:
    import unicodedata

    @F.pandas_udf("string")
    def nfc(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: None
            if t is None
            else (t if t.isascii() else unicodedata.normalize("NFC", t))
        )

    return nfc


def clean_text_col(col: F.Column) -> F.Column:
    """The normalization pipeline as a single Column expression chain
    (steps 2-3 stay in whole-stage codegen around the one NFC hop)."""
    c = _nfc_udf()(col)
    c = F.regexp_replace(c, _STRIP_CLASS, "")
    c = F.regexp_replace(c, _HSPACE_RUN, " ")
    # trim each line's edges without eating newlines (multiline mode)
    c = F.regexp_replace(c, "(?m)" + _EDGE_SPACE, "")
    return c


def clean_text(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, clean, n_chars_raw, n_chars_clean) — the normalized
    text plus the before/after accounting a curation pipeline logs
    (how much of the corpus was mojibake/noise)."""
    raw = F.col(text_col)
    return documents.select(
        F.col(id_col).alias("doc_id"),
        clean_text_col(raw).alias("clean"),
        F.length(raw).cast("long").alias("n_chars_raw"),
    ).select(
        "doc_id",
        "clean",
        "n_chars_raw",
        F.length("clean").cast("long").alias("n_chars_clean"),
    )
