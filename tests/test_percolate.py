"""Percolation (reverse search): DNF alert semantics, registry parse."""

from __future__ import annotations

from searchengine_spark.operators.percolate import (
    percolate,
    registry_from_strings,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_registry_parse_shapes(spark):
    reg = registry_from_strings(
        spark, [(1, "a AND b OR c"), (2, "x x y")]
    )
    got = sorted((r.query_id, r.conj_id, r.term) for r in reg.collect())
    # duplicate terms within a conjunct collapse (query 2: x once)
    assert got == [
        (1, 0, "a"),
        (1, 0, "b"),
        (1, 1, "c"),
        (2, 0, "x"),
        (2, 0, "y"),
    ]


def test_percolate_dnf_semantics(spark):
    docs = _docs(
        spark,
        [
            (10, "a b extra"),    # matches q1 conj0
            (11, "c"),            # matches q1 conj1
            (12, "a only"),       # a without b: no match
            (13, "a b c"),        # matches both conjuncts → ONE row
            (14, "unrelated"),
        ],
    )
    reg = registry_from_strings(spark, [(1, "a AND b OR c")])
    got = sorted((r.query_id, r.doc_id) for r in percolate(docs, reg).collect())
    assert got == [(1, 10), (1, 11), (1, 13)]


def test_percolate_multiple_queries_and_case(spark):
    docs = _docs(spark, [(1, "Spark STREAMING rocks"), (2, "spark only")])
    reg = registry_from_strings(
        spark, [(7, "spark AND streaming"), (8, "rocks")]
    )
    got = sorted((r.query_id, r.doc_id) for r in percolate(docs, reg).collect())
    assert got == [(7, 1), (8, 1)]
