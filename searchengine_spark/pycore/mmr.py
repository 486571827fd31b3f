"""Normative Maximal Marginal Relevance (Carbonell & Goldstein 1998).

MMR re-ranks a bounded result page to balance relevance against
redundancy: at each step pick

    argmax_{d ∉ S}  λ·rel(d) − (1−λ)·max_{s ∈ S} sim(d, s)

(S = already-selected; sim = sparse cosine over the docs' term-weight
vectors; the first pick is the pure-relevance argmax since S is empty
and max over ∅ is taken as 0). Ties break on doc_id ascending.

This module is the single source of truth; the Spark operator
(operators/ranking.diversify_mmr) runs the IDENTICAL arithmetic inside
one applyInPandas group and is parity-tested against it.
"""

from __future__ import annotations

import math


def cosine(a: dict[str, float], b: dict[str, float]) -> float:
    """Sparse cosine with token-sorted accumulation (deterministic
    float order — the engine twin sums in the same order)."""
    dot = 0.0
    for t in sorted(a.keys() & b.keys()):
        dot += a[t] * b[t]
    na = math.sqrt(sum(a[t] * a[t] for t in sorted(a)))
    nb = math.sqrt(sum(b[t] * b[t] for t in sorted(b)))
    if na == 0.0 or nb == 0.0:
        return 0.0
    return dot / (na * nb)


def mmr(
    page: list[tuple[int, float]],
    vectors: dict[int, dict[str, float]],
    lam: float = 0.5,
    k: int | None = None,
) -> list[tuple[int, int, float]]:
    """[(rank, doc_id, mmr_score)] — greedy MMR selection.

    `page`: (doc_id, relevance) candidates; `vectors`: doc_id → sparse
    term-weight vector (missing docs are zero vectors, similarity 0).
    """
    k = len(page) if k is None else min(k, len(page))
    rel = dict(page)
    remaining = sorted(rel, key=lambda d: (-rel[d], d))
    selected: list[int] = []
    out: list[tuple[int, int, float]] = []
    while remaining and len(out) < k:
        best_d, best_score = None, None
        for d in remaining:
            sim = 0.0
            for s in selected:
                sim = max(
                    sim, cosine(vectors.get(d, {}), vectors.get(s, {}))
                )
            score = lam * rel[d] - (1.0 - lam) * sim
            if best_score is None or score > best_score or (
                score == best_score and d < best_d
            ):
                best_d, best_score = d, score
        selected.append(best_d)
        remaining.remove(best_d)
        out.append((len(out), best_d, best_score))
    return out
