"""Normative URL trap gate (J6) — the scalable narrowing of the
reference's O(candidates × seen) URL-similarity theta-join
(link_similarity.py:120-163,225-230).

The reference rejects a candidate when its similarity to ANY seen URL is
≥ 0.85. Its scoring has two branches (SURVEY.md §2.3 J6); only the
last-segment char-set-Jaccard branch (same scheme+netloc, same path
length, equal up to the last segment — link_similarity.py:48-71) can
reach 0.85 for the trap families the gate exists to kill (calendar/day
pages differing only in a date — the reference's own golden case,
link_similarity.py:203-206 scores such a pair 1.0). The normative rebuild
therefore keys the gate on an equality bucket:

    bucket(url) = (scheme, host, parent_dir, n_path_segments)

and rejects a candidate iff some *seen* URL in the same bucket has
char-set Jaccard of the last path segment ≥ 0.85. This turns the
theta-join into a bucketed equi-join (bounded, shuffle-partitionable at
10^10 scale). The consecutive-prefix branch (link_similarity.py:29-45)
cannot be bucketed without quadratic blowup and can only fire for ≥85%
shared path segments; it is deliberately out of the gate (documented
deviation — SURVEY.md §2.2 P6).

Candidates are compared against the URL-seen set as of the ROUND START
(not intra-batch) — the deterministic, order-free batch semantics.
"""

from __future__ import annotations

from urllib.parse import urlparse

TRAP_THRESHOLD = 0.85  # link_similarity.py:12


def path_parts(url: str) -> list[str]:
    return [p for p in urlparse(url).path.split("/") if p]


def trap_bucket(url: str) -> tuple[str, str, str, int]:
    """(scheme, host, parent_dir, n_segments) equality bucket."""
    p = urlparse(url)
    parts = [x for x in p.path.split("/") if x]
    return (
        p.scheme.lower(),
        (p.hostname or "").lower(),
        "/".join(parts[:-1]),
        len(parts),
    )


def last_charset(url: str) -> frozenset[str]:
    parts = path_parts(url)
    return frozenset(parts[-1]) if parts else frozenset()


def charset_jaccard(a: frozenset[str], b: frozenset[str]) -> float:
    """link_similarity.py:65-71 — char-set Jaccard; both-empty ⇒ 1.0
    (identical), matching pycore.linksim.get_link_similarity."""
    union = len(a | b)
    if union == 0:
        return 1.0
    return len(a & b) / union


def is_trap(
    candidate_url: str,
    seen_charsets_in_bucket: list[frozenset[str]],
    threshold: float = TRAP_THRESHOLD,
) -> bool:
    cs = last_charset(candidate_url)
    return any(
        charset_jaccard(cs, s) >= threshold for s in seen_charsets_in_bucket
    )
