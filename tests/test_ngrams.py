"""A8/A9/A10 — non-overlapping n-grams, hashing, Jaccard
(reference ngrams.py semantics, FIXTURES.md §6)."""

from __future__ import annotations

from searchengine_spark.pycore.ngrams import (
    custom_string_hash,
    jaccard,
    ngram_hash_set,
    ngrams,
)
from searchengine_spark.pycore.urltools import xxhash64


def test_nonoverlapping_stride_with_ragged_tail():
    toks = ["a", "b", "c", "d", "e", "f", "g"]
    assert ngrams(toks) == [("a", "b", "c"), ("d", "e", "f"), ("g",)]
    assert ngrams(toks, 2) == [("a", "b"), ("c", "d"), ("e", "f"), ("g",)]
    assert ngrams([]) == []


def test_hash_set_is_xxhash_of_concat():
    toks = ["a", "b", "c", "d"]
    assert ngram_hash_set(toks) == {xxhash64("abc"), xxhash64("d")}


def test_custom_string_hash_golden():
    # ngrams.py:20-25 sum-of-ords
    assert custom_string_hash("abc") == 97 + 98 + 99
    assert custom_string_hash("") == 0


def test_jaccard():
    a, b = {1, 2, 3, 4}, {3, 4, 5, 6}
    assert jaccard(a, b) == 2 / 6
    assert jaccard(a, a) == 1.0
    assert jaccard(set(), set()) == 0.0
    # threshold semantics: reject only when strictly > 0.65 (ngrams.py:98)
    assert not (jaccard(a, b) > 0.65)
