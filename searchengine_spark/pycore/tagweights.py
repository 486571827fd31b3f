"""A6 — HTML tag term weights (reference helpers.py:7-19,31-47; the
multiplier variant at index_construction.py:16-28,57-70 is dormant).

Reference semantics: for each HTML tag occurrence whose text contains a
term, ADD the tag's weight multiplier to that term's weight —
title 3.0, h1 2.0, h2 1.75, h3 1.5, b/strong 1.25, a/i/em/h5/h6 1.05.
The live reference path walks soup.find_all over exactly these tags
(helpers.py:34), so only they contribute; each token OCCURRENCE inside a
tag adds that tag's weight (helpers.py:37-44 splits the tag text and
adds per token instance).

Normative narrowing (documented): tag bodies are captured with a
non-nesting `<tag ...>…</tag>` scan (the fixtures do not nest weighted
tags); tokenization of tag text is the normative tokenizer (F2), which
is re-expressible as the same regex split the reference uses
(helpers.py:37).
"""

from __future__ import annotations

import re

from searchengine_spark.pycore.tokenizer import tokenize

TAG_WEIGHTS: dict[str, float] = {
    "title": 3.0,
    "h1": 2.0,
    "h2": 1.75,
    "h3": 1.5,
    "b": 1.25,
    "strong": 1.25,
    "a": 1.05,
    "i": 1.05,
    "em": 1.05,
    "h5": 1.05,
    "h6": 1.05,
}

_TAG_RE = {
    tag: re.compile(
        rf"<{tag}(?:\s[^>]*)?>(.*?)</\s*{tag}\s*>", re.IGNORECASE | re.DOTALL
    )
    for tag in TAG_WEIGHTS
}
_INNER_TAG_RE = re.compile(r"<[^>]*>")


def tag_token_weights(html: bytes | str | None) -> dict[str, float]:
    """token → summed tag weight for one document."""
    if html is None:
        return {}
    if isinstance(html, bytes):
        try:
            s = html.decode("utf-8")
        except UnicodeDecodeError:
            s = html.decode("latin-1")
    else:
        s = html
    weights: dict[str, float] = {}
    for tag, rx in _TAG_RE.items():
        w = TAG_WEIGHTS[tag]
        for m in rx.finditer(s):
            inner = _INNER_TAG_RE.sub(" ", m.group(1))
            for tok in tokenize(inner):
                weights[tok] = weights.get(tok, 0.0) + w
    return weights
