"""Unicode normalization stage (operators/textnorm.clean_text)."""

from __future__ import annotations

import unicodedata

import duckdb
import pytest

from searchengine_spark.operators import textnorm as TN

CASES = [
    # decomposed combining accent folds to precomposed (NFC)
    ("café menu", "café menu"),
    # zero-width space / joiner / non-joiner / BOM / soft hyphen vanish
    ("a​b‌c‍d﻿e­f", "abcdef"),
    # C0 (except tab/newline) and C1 controls vanish; tabs collapse
    ("x\x07y\x0bz\x85w", "xyzw"),
    ("a\t\tb  \t c", "a b c"),
    # newlines survive, line edges trimmed
    ("  line one  \n\t line two \n", "line one\nline two\n"),
    # pure ascii passes through untouched
    ("plain ascii text", "plain ascii text"),
    # NFC does NOT apply compatibility folds (ligature stays)
    ("ﬁne", "ﬁne"),
]


@pytest.fixture(scope="module")
def cleaned(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)],
        "doc_id long, text string",
    )
    return {r["doc_id"]: r for r in TN.clean_text(df).collect()}


@pytest.mark.parametrize("i", range(len(CASES)))
def test_known_cases(cleaned, i):
    raw, want = CASES[i]
    assert cleaned[i]["clean"] == want
    assert cleaned[i]["n_chars_raw"] == len(raw)
    assert cleaned[i]["n_chars_clean"] == len(want)


def test_duckdb_parity(cleaned):
    # the oracle's pipeline (nfc_normalize + RE2 global replaces) must
    # produce the same bytes as the Spark pipeline for every case
    con = duckdb.connect()
    strip = TN._STRIP_CLASS.replace("'", "''")
    for i, (raw, _) in enumerate(CASES):
        got = con.execute(
            f"""
            SELECT regexp_replace(
                     regexp_replace(
                       regexp_replace(nfc_normalize(?),
                         '{strip}', '', 'g'),
                       '[ \t]+', ' ', 'g'),
                     '(?m)(^ +| +$)', '', 'g')
            """,
            [raw],
        ).fetchone()[0]
        assert got == cleaned[i]["clean"], (i, raw)


def test_nfc_matches_python(spark):
    # non-ascii batch path really runs unicodedata NFC
    s = "Ä ô ñ"  # Ä ô ñ decomposed
    df = spark.createDataFrame([(0, s)], "doc_id long, text string")
    out = TN.clean_text(df).collect()[0]["clean"]
    assert out == unicodedata.normalize("NFC", s)
    assert len(out) == 5


def test_null_text_passes_through(spark):
    df = spark.createDataFrame([(0, None)], "doc_id long, text string")
    row = TN.clean_text(df).collect()[0]
    assert row["clean"] is None
