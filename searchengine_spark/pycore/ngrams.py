"""Content near-duplicate n-gram fingerprints — normative semantics of
reference ngrams.py.

Spec reproduced:
  * NON-overlapping n-grams, stride = n, n=3 default, ragged tail kept
    (ngrams.py:28-46; AMOUNT_OF_LIST_TO_SELECT=1 so the random sampling
    branch always fires — no randomness in effect);
  * each gram's tokens are concatenated with no separator and hashed
    (ngrams.py:49-62); grams are a *set* (ngrams.py:46,66);
  * page A is a near-dup of page B when Jaccard(A,B) > 0.65
    (MAX_ALLOWED_SIMILARITY, ngrams.py:11,80-101).

Deviation (normative): the reference hashes with Python ``hash()``
(ngrams.py:58), which is PYTHONHASHSEED-randomized and non-reproducible
across processes; we hash with xxhash64 (Spark-parity) instead —
SURVEY.md §2.4 A10. The reference's own ``custom_string_hash``
(sum-of-ords, ngrams.py:20-25, off by default) is kept for golden tests.
"""

from __future__ import annotations

from searchengine_spark.pycore.urltools import xxhash64

MAX_ALLOWED_SIMILARITY = 0.65  # ngrams.py:11
DEFAULT_N_GRAM_SIZE = 3  # ngrams.py:14


def custom_string_hash(s: str) -> int:
    """ngrams.py:20-25 — sum of ord(c); golden-test parity only."""
    return sum(ord(c) for c in s)


def ngrams(tokens: list[str], n: int = DEFAULT_N_GRAM_SIZE) -> list[tuple[str, ...]]:
    return [tuple(tokens[i : i + n]) for i in range(0, len(tokens), n)]


def ngram_hash_set(tokens: list[str], n: int = DEFAULT_N_GRAM_SIZE) -> set[int]:
    return {xxhash64("".join(gram)) for gram in ngrams(tokens, n)}


def jaccard(a: set[int], b: set[int]) -> float:
    """ngrams.py:69-77 — |A∩B| / |A∪B|; 0-division only for two empty
    sets, defined as 0.0 here (the reference would raise)."""
    union = len(a | b)
    if union == 0:
        return 0.0
    return len(a & b) / union
