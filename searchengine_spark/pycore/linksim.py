"""URL near-duplicate (trap) similarity — faithful reimplementation of the
reference's scoring (link_similarity.py:29-163), minus the debug prints.

Score spec (link_similarity.py):
  * 0 unless scheme, netloc, hostname and port are all equal (:106-112);
  * split both paths on '/', dropping empty parts (:56-57);
  * if same length and equal up to the last segment (:48-52): score =
    char-set Jaccard of the two last segments (:65-71);
  * else: consecutive-prefix-match count ÷ max(path lengths) (:29-45,
    :61-62).
Reject (do NOT evaluate) a candidate when score ≥ 0.85
(URL_SIMILARITY_THRESHOLD, link_similarity.py:12,162-163).

Golden cases ported verbatim from link_similarity.py:179-222 live in
tests/test_linksim.py.
"""

from __future__ import annotations

from urllib.parse import urlparse

URL_SIMILARITY_THRESHOLD = 0.85  # link_similarity.py:12


def _path_parts(path: str) -> list[str]:
    return [part for part in path.split("/") if part]


def _consecutive_prefix(a: list[str], b: list[str]) -> int:
    n = 0
    for x, y in zip(a, b):
        if x == y:
            n += 1
        else:
            break
    return n


def get_link_similarity(url1: str, url2: str) -> float:
    p1, p2 = urlparse(url1), urlparse(url2)
    if not (
        p1.scheme == p2.scheme
        and p1.netloc == p2.netloc
        and p1.hostname == p2.hostname
        and p1.port == p2.port
    ):
        return 0.0
    a, b = _path_parts(p1.path), _path_parts(p2.path)
    if len(a) == len(b) and a[:-1] == b[:-1]:
        # char-set Jaccard of the last segments (link_similarity.py:65-71);
        # NB for two identical empty paths this is 0-division in the
        # reference too only when both last segments are empty — with
        # empty parts dropped, equal urls with paths give Jaccard of the
        # same set = 1.0; for two empty paths define 1.0 (identical).
        if not a and not b:
            return 1.0
        s1, s2 = set(a[-1]), set(b[-1])
        union = len(s1 | s2)
        if union == 0:
            return 1.0
        return len(s1 & s2) / union
    return _consecutive_prefix(a, b) / max(len(a), len(b))


def should_evaluate_url(
    url1: str, url2: str, threshold: float = URL_SIMILARITY_THRESHOLD
) -> bool:
    """True ⇒ the candidate is dissimilar enough to be worth evaluating
    (link_similarity.py:162-163)."""
    return get_link_similarity(url1, url2) < threshold
