"""Porter stemmer — normative single-node implementation (F3 open-
vocabulary path).

The reference lemmatizes every token through WordNet (reference
tokenizer.py:4,28,38); WordNet/nltk are absent from this environment, so
SURVEY.md §2.8 F3 ships a fixture lemma table (exact-match fast path)
and THIS module closes the open-vocabulary gap with the classic Porter
suffix-stripping algorithm (M.F. Porter, "An algorithm for suffix
stripping", Program 14(3) 1980 — public knowledge). Unknown words get a
deterministic morphological stem instead of identity.

This is the NORMATIVE implementation: the Spark surface
(functions/text.py stem_tokens_udf) delegates to `porter_stem` inside an
Arrow-batched pandas UDF, so distributed output is bit-identical to this
module by construction, and the DuckDB oracle applies a literal CASE
generated from this module over the (closed) fixture vocabulary.

Variant note: this is the ORIGINAL published algorithm (no later
Snowball departures such as logi→log), so golden tests cite examples
straight from the 1980 paper.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")


def _is_cons(word: str, i: int) -> bool:
    """True if word[i] is a consonant under Porter's definition:
    a/e/i/o/u are vowels; y is a vowel iff preceded by a consonant
    (y at position 0 is a consonant)."""
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in [C](VC)^m[V]: the number of vowel-run→consonant-run
    transitions after the optional initial consonant run."""
    n = 0
    i = 0
    ln = len(stem)
    while i < ln and _is_cons(stem, i):
        i += 1
    while i < ln:
        while i < ln and not _is_cons(stem, i):
            i += 1
        if i >= ln:
            break
        n += 1
        while i < ln and _is_cons(stem, i):
            i += 1
    return n


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _ends_cvc(word: str) -> bool:
    """*o: stem ends consonant-vowel-consonant where the final consonant
    is not w, x or y (so 'hop' +e-candidate, but not 'snow'/'box'/'tray')."""
    if len(word) < 3:
        return False
    ln = len(word)
    return (
        _is_cons(word, ln - 3)
        and not _is_cons(word, ln - 2)
        and _is_cons(word, ln - 1)
        and word[-1] not in "wxy"
    )


def _rule_step(word: str, rules: list[tuple[str, str, int | None]]) -> str:
    """Apply the LONGEST-matching suffix rule of a step; a matched
    suffix whose m-condition fails still ends the step (Porter's
    longest-match-wins semantics)."""
    for suffix, repl, min_m in rules:
        if word.endswith(suffix):
            stem = word[: len(word) - len(suffix)]
            if min_m is None or _measure(stem) > min_m:
                return stem + repl
            return word
    return word


_STEP2 = [
    ("ational", "ate", 0), ("tional", "tion", 0), ("enci", "ence", 0),
    ("anci", "ance", 0), ("izer", "ize", 0), ("abli", "able", 0),
    ("alli", "al", 0), ("entli", "ent", 0), ("eli", "e", 0),
    ("ousli", "ous", 0), ("ization", "ize", 0), ("ation", "ate", 0),
    ("ator", "ate", 0), ("alism", "al", 0), ("iveness", "ive", 0),
    ("fulness", "ful", 0), ("ousness", "ous", 0), ("aliti", "al", 0),
    ("iviti", "ive", 0), ("biliti", "ble", 0),
]

_STEP3 = [
    ("icate", "ic", 0), ("ative", "", 0), ("alize", "al", 0),
    ("iciti", "ic", 0), ("ical", "ic", 0), ("ful", "", 0),
    ("ness", "", 0),
]

_STEP4 = [
    ("al", "", 1), ("ance", "", 1), ("ence", "", 1), ("er", "", 1),
    ("ic", "", 1), ("able", "", 1), ("ible", "", 1), ("ant", "", 1),
    ("ement", "", 1), ("ment", "", 1), ("ent", "", 1),
    # ("ion", ...) handled inline: needs the extra *S-or-*T condition
    ("ou", "", 1), ("ism", "", 1), ("ate", "", 1), ("iti", "", 1),
    ("ous", "", 1), ("ive", "", 1), ("ize", "", 1),
]

# step 2/3/4 suffixes longer than "ion" that themselves end in "ion"
# don't exist, so ordering "ion" by length within step 4 is: all
# 5-char suffixes (ement) first, then 4-char (ance/ence/able/ible/
# ment), then ion (3), sion/tion covered by the *S/*T condition.


def porter_stem(word: str) -> str:
    """Stem one lowercase token. Tokens shorter than 3 characters are
    returned unchanged (per the paper's implementation note that 1- and
    2-letter words are never stemmed)."""
    if len(word) < 3:
        return word
    w = word

    # ---- step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # ---- step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        cleanup = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w = w[:-2]
            cleanup = True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w = w[:-3]
            cleanup = True
        if cleanup:
            if w.endswith(("at", "bl", "iz")):
                w = w + "e"
            elif _ends_double_cons(w) and not w.endswith(("l", "s", "z")):
                w = w[:-1]
            elif _measure(w) == 1 and _ends_cvc(w):
                w = w + "e"

    # ---- step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # ---- steps 2 and 3 (m>0 conditions)
    w = _rule_step(w, _STEP2)
    w = _rule_step(w, _STEP3)

    # ---- step 4 (m>1), with ion's extra *S-or-*T condition
    matched = False
    for suffix, repl, min_m in _STEP4:
        if w.endswith(suffix):
            # longest-match: "ement" must win over "ment"/"ent", and
            # "ance"/"ence" over "ant"/"ent" — the list is ordered so a
            # shorter suffix that is a suffix OF a longer one comes
            # later; verify by checking no longer rule also matches
            longer = [s for s, _, _ in _STEP4 if len(s) > len(suffix) and w.endswith(s)]
            if longer:
                continue
            stem = w[: len(w) - len(suffix)]
            if _measure(stem) > min_m:
                w = stem + repl
            matched = True
            break
    if not matched and w.endswith("ion"):
        stem = w[:-3]
        if stem and stem[-1] in "st" and _measure(stem) > 1:
            w = stem

    # ---- step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            w = stem

    # ---- step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w
