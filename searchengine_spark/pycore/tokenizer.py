"""Normative tokenizer — same observable semantics as reference
tokenizer.py:9-44, re-expressed as a regex (provably equivalent to the
char loop for these rules):

  * token chars are ASCII alphanumerics plus apostrophe
    (``char.isascii() and char.isalnum() or char == "'"``,
    tokenizer.py:17 — note Python precedence: (ascii∧alnum)∨apostrophe,
    so non-ASCII letters are separators);
  * chars are lowercased (tokenizer.py:19);
  * every other char splits (tokenizer.py:24-32);
  * each token is ``.strip(" '")``-ed (tokenizer.py:27,37);
  * over-long tokens are discarded entirely (MAX_TOKEN_LENGTH=10000,
    tokenizer.py:6,20-23).

Documented deviations (normative spec wins; both engine and oracle use it):
  * empty-after-strip tokens are dropped (the reference appends '' —
    tokenizer.py:26-28 — which only pollutes the index);
  * the length bound is applied to the stripped token;
  * lemmatization (NLTK WordNet, tokenizer.py:4,28) is replaced by an
    optional broadcast lookup map with identity fallback — WordNet is not
    available in this environment; the map covers fixture vocabulary.
"""

from __future__ import annotations

import re

MAX_TOKEN_LENGTH = 10000  # reference tokenizer.py:6

_TOKEN_RE = re.compile(r"[a-z0-9']+")


def tokenize(text: str | None, lemma_map: dict[str, str] | None = None) -> list[str]:
    if not text:
        return []
    out: list[str] = []
    for raw in _TOKEN_RE.findall(text.lower()):
        tok = raw.strip(" '")
        if not tok or len(tok) > MAX_TOKEN_LENGTH:
            continue
        if lemma_map is not None:
            tok = lemma_map.get(tok, tok)
        out.append(tok)
    return out
