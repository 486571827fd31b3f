"""F2 tokenizer: pycore ↔ Spark Column-expression parity + reference
golden cases (tokenizer.py:9-44 semantics, FIXTURES.md §6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from searchengine_spark.functions.text import tokens_sql
from searchengine_spark.pycore.tokenizer import tokenize

CASES = [
    "Hello, World!",
    "don't stop-believing",
    "  'quoted'  and ''' lone apostrophes ' ",
    "ascii123 MIXED456case",
    "naïve café résumé",          # non-ASCII letters split tokens
    "a" * 10001,                   # over-long token discarded
    "b" * 10000,                   # exactly at bound kept
    "tail-token",
    "",
    "...!!!...",
    "o'brien's 'tis",
]


def test_reference_golden_semantics():
    assert tokenize("Hello, World!") == ["hello", "world"]
    # apostrophe is a token char (tokenizer.py:17)
    assert tokenize("don't") == ["don't"]
    # leading/trailing apostrophes stripped (tokenizer.py:27)
    assert tokenize("'tis") == ["tis"]
    # over-long tokens discarded entirely (tokenizer.py:20-23)
    assert tokenize("a" * 10001) == []
    assert tokenize("b" * 10000) == ["b" * 10000]
    # non-ASCII chars split (precedence quirk tokenizer.py:17)
    assert tokenize("naïve") == ["na", "ve"]
    # end-of-text token flush (tokenizer.py:35-39)
    assert tokenize("end token") == ["end", "token"]
    assert tokenize("") == []
    assert tokenize(None) == []


def test_spark_expr_matches_pycore(spark):
    df = spark.createDataFrame([(s,) for s in CASES], ["text"])
    got = [
        r["toks"]
        for r in df.select(F.expr(tokens_sql("text")).alias("toks")).collect()
    ]
    want = [tokenize(s) for s in CASES]
    assert got == want


def test_lemma_apply(spark):
    from searchengine_spark.functions.text import lemma_apply

    df = spark.createDataFrame([("cats run wolves",)], ["text"])
    toks = lemma_apply(
        F.expr(tokens_sql("text")), {"cats": "cat", "wolves": "wolf"}
    )
    [row] = df.select(toks.alias("t")).collect()
    assert row["t"] == ["cat", "run", "wolf"]
