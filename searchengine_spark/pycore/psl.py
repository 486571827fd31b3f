"""Public Suffix List: parser + registrable-domain (PLD) resolution.

Parses the complete Mozilla PSL shipped as package data
(data/public_suffix_list.dat — ICANN + private sections, wildcard and
exception rules) into depth-grouped rule sets that feed two consumers:

  * functions/urls.pld_sql — a generated pure-SQL CASE expression
    (JVM-side, codegen'd, no UDF) used by the politeness/budget keying
    paths (budget.host_budget, pld_census);
  * pld() here — the single-node oracle semantics, used by parity tests
    and any driver-side host keying.

PSL algorithm (https://github.com/publicsuffix/list/wiki/Format):
the matching rule set is evaluated right-to-left on dot-labels; an
exception rule ("!www.ck") beats everything and makes ITSELF the
registrable domain; otherwise the LONGEST matching rule wins, where a
wildcard rule ("*.ck") matches any single label in the starred
position; hosts with no matching rule use the implicit "*" rule (the
bare TLD is the suffix). The registrable domain ("pay-level domain") is
the matched public suffix plus one more label; a host that IS a public
suffix (or an IPv4 literal) passes through unchanged — a stable
engine-side convention so budget keys are never NULL.

Reference parity note: the reference crawler keys politeness on the
raw hostname (README.md:213-214, utils/config.py:17); PLD keying is
the documented production upgrade (SURVEY.md §2 round-3 row), now
backed by the full PSL instead of the round-3 embedded subset.
"""

from __future__ import annotations

from functools import lru_cache

MAX_DEPTH = 5  # deepest rule in the current list (asserted at load)


def _read_dat() -> str:
    from importlib.resources import files

    return (
        files("searchengine_spark.data")
        .joinpath("public_suffix_list.dat")
        .read_text(encoding="utf-8")
    )


@lru_cache(maxsize=1)
def rules() -> tuple[
    dict[int, frozenset[str]],  # exact suffix rules by label depth
    dict[int, frozenset[str]],  # wildcard PARENTS ("*.x" -> x) by depth of x
    dict[int, frozenset[str]],  # exception rules (without "!") by depth
]:
    exact: dict[int, set[str]] = {}
    wild: dict[int, set[str]] = {}
    exc: dict[int, set[str]] = {}

    def _forms(rule: str) -> list[str]:
        """The rule as listed plus, for non-ASCII rules, its punycode
        twin — the PSL publishes unicode labels but crawled hosts carry
        IDNA (xn--) form; matching both keeps the SQL a pure string
        lookup with no per-row IDNA decode."""
        if rule.isascii():
            return [rule]
        try:
            puny = ".".join(
                lb if lb.isascii() else lb.encode("idna").decode("ascii")
                for lb in rule.split(".")
            )
            return [rule, puny]
        except UnicodeError:
            return [rule]

    for raw in _read_dat().splitlines():
        line = raw.strip()
        if not line or line.startswith("//"):
            continue
        # rules are whitespace-terminated per the PSL format spec
        rule = line.split()[0].lower()
        assert "'" not in rule and "\\" not in rule, rule  # SQL-literal safe
        if rule.startswith("!"):
            for body in _forms(rule[1:]):
                exc.setdefault(body.count(".") + 1, set()).add(body)
        elif rule.startswith("*."):
            for parent in _forms(rule[2:]):
                wild.setdefault(parent.count(".") + 1, set()).add(parent)
        else:
            for r in _forms(rule):
                exact.setdefault(r.count(".") + 1, set()).add(r)
    assert max(exact) <= MAX_DEPTH and max(wild) < MAX_DEPTH, (
        "PSL grew deeper than MAX_DEPTH; bump it"
    )
    return (
        {d: frozenset(s) for d, s in exact.items()},
        {d: frozenset(s) for d, s in wild.items()},
        {d: frozenset(s) for d, s in exc.items()},
    )


def _last(labels: list[str], n: int) -> str:
    return ".".join(labels[-n:])


def branch_spec() -> list[tuple[str, int, tuple[str, ...], int]]:
    """(kind, match_depth, sorted_rules, result_depth) in PSL match-
    precedence order — the shared input of the Spark (urls.pld_sql) and
    DuckDB (oracle) CASE generators. kind: 'exc' (result = the matched
    rule itself), 'suf' (exact suffix of depth match_depth → keep
    result_depth labels), 'wild' (wildcard PARENT of depth match_depth,
    effective suffix depth match_depth+1 → keep result_depth labels).
    Exceptions first, then effective suffix depth descending; depth-1
    exact rules are omitted — the implicit '*' ELSE branch (keep two
    labels) already produces their result."""
    exact, wild, exc = rules()
    out: list[tuple[str, int, tuple[str, ...], int]] = []
    for d in sorted(exc, reverse=True):
        out.append(("exc", d, tuple(sorted(exc[d])), d))
    for e in range(MAX_DEPTH, 1, -1):
        if e in exact:
            out.append(("suf", e, tuple(sorted(exact[e])), e + 1))
        if e - 1 in wild:
            out.append(("wild", e - 1, tuple(sorted(wild[e - 1])), e + 1))
    return out


def pld(host: str | None) -> str | None:
    """Registrable domain of a lowercased host (single-node oracle for
    pld_sql — the generated SQL must agree with this on every host)."""
    if host is None:
        return None
    h = host.lower().rstrip(".")
    if not h or ":" in h:
        return host if host is None else h
    labels = h.split(".")
    sz = len(labels)
    if sz <= 1 or all(c.isdigit() or c == "." for c in h):
        return h
    exact, wild, exc = rules()
    for d in sorted(exc, reverse=True):
        if sz >= d and _last(labels, d) in exc[d]:
            return _last(labels, d)
    # longest match: effective suffix depth d comes from an exact rule
    # of depth d or a wildcard whose parent has depth d-1
    for d in range(MAX_DEPTH + 1, 1, -1):
        hit = (
            sz > d
            and d in exact
            and _last(labels, d) in exact[d]
            or sz > d
            and d - 1 in wild
            and _last(labels, d - 1) in wild[d - 1]
        )
        if hit:
            return _last(labels, d + 1)
        # host IS a public suffix at this depth: pass through
        if sz == d and (
            (d in exact and h in exact[d])
            or (d - 1 in wild and _last(labels, d - 1) in wild[d - 1])
        ):
            return h
    # implicit "*" rule: bare TLD is the suffix (known or not)
    return _last(labels, 2)
