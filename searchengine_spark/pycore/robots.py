"""robots.txt parsing (Robots Exclusion Protocol, RFC 9309 subset).

Completes the J8 politeness chain: the crawler consumes a parsed robots
cache (host, deny_prefixes, crawl_delay — synth.py:260 ROBOTS_SCHEMA);
this module produces that row from RAW robots.txt text, so a deployment
can point the engine at a fetched (host, robots_txt) table instead of
pre-parsing one (reference scope: the course engine's cache server
enforces politeness upstream, README.md:89-96 — parsing is rebuild-only
surface, public spec).

Subset semantics (documented deviations from full RFC 9309):
- Group selection: the most specific matching user-agent token wins —
  the longest token that is a case-insensitive substring of the
  caller's agent string; `*` groups apply only when no specific group
  matches (RFC 9309 §2.2.1). All groups with the winning token merge.
- `Disallow` values are treated as PATH PREFIXES (the engine's deny
  gate is prefix-based); `$`/`*` wildcard patterns and `Allow`
  overrides are NOT applied — an `Allow` line is parsed and ignored.
  An empty `Disallow:` means allow-all (contributes no prefix).
- `Crawl-delay` (de-facto extension, not in the RFC) is honored per
  group; non-numeric values are ignored.

No Spark imports (SURVEY.md §5.2): this is the normative single source
of truth; functions/robots.py wraps it in an Arrow UDF, and tests
assert Spark ≡ pycore on golden cases.
"""

from __future__ import annotations

_FIELDS = {"user-agent", "disallow", "allow", "crawl-delay", "sitemap"}


def _lines(text: str):
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        if field in _FIELDS:
            yield field, value.strip()


def sitemap_urls(text: str | None) -> list[str]:
    """The robots.txt `Sitemap:` lines (RFC 9309 §2.2.4 treats them as
    group-independent): ordered, de-duplicated absolute sitemap URLs —
    the discovery hook for pycore.sitemap.parse_sitemap."""
    if not text:
        return []
    seen: set[str] = set()
    out: list[str] = []
    for field, value in _lines(text):
        if field == "sitemap" and value and not (
            value in seen or seen.add(value)
        ):
            out.append(value)
    return out


def parse_robots(
    text: str | None, agent: str = "*"
) -> tuple[list[str], float | None]:
    """robots.txt text → (deny_prefixes, crawl_delay).

    deny_prefixes: ordered, de-duplicated Disallow paths of the winning
    user-agent group(s). crawl_delay: the group's Crawl-delay seconds,
    None when absent/unparseable. None/empty text ⇒ allow-all."""
    if not text:
        return [], None
    # token -> merged group rules, in encounter order
    groups: dict[str, dict] = {}
    cur: list[str] = []
    last_was_ua = False
    for field, value in _lines(text):
        if field == "user-agent":
            if not last_was_ua:
                cur = []
            tok = value.lower()
            if tok:
                cur.append(tok)
                groups.setdefault(tok, {"deny": [], "delay": None})
            last_was_ua = True
            continue
        last_was_ua = False
        if not cur:
            continue  # rules before any user-agent line: no group, skip
        if field == "disallow" and value:
            for t in cur:
                groups[t]["deny"].append(value)
        elif field == "crawl-delay":
            try:
                delay = float(value)
            except ValueError:
                continue
            for t in cur:
                groups[t]["delay"] = delay

    a = agent.lower()
    specific = [t for t in groups if t != "*" and t in a]
    if specific:
        win = max(specific, key=len)  # longest (most specific) token
    elif "*" in groups:
        win = "*"
    else:
        return [], None
    g = groups[win]
    seen: set[str] = set()
    deny = [p for p in g["deny"] if not (p in seen or seen.add(p))]
    return deny, g["delay"]
