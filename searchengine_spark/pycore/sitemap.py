"""Sitemap XML parsing (sitemaps.org protocol, public spec).

Completes the seed-discovery chain: robots.txt `Sitemap:` lines
(pycore.robots.sitemap_urls) point at sitemap documents; this module
parses them into crawl-seed entries — `<urlset>` url entries with their
optional lastmod/changefreq/priority hints, and `<sitemapindex>` nested
sitemap references (the caller recurses; sitemap files are capped at
50k entries by the spec, so one file is always driver- or task-sized).

Subset semantics: tag matching is case-insensitive regex over the
document (no XML library dependency — the protocol's structure is flat
and regular); XML entities in `<loc>` are unescaped; CDATA sections are
unwrapped; `priority` outside [0,1] or non-numeric is dropped (spec
default 0.5 is applied by the CALLER if desired — None preserves "not
stated"). No Spark imports (SURVEY.md §5.2): normative single source of
truth; functions/sitemap.py wraps it in an Arrow UDF.
"""

from __future__ import annotations

import html as _html
import re
from dataclasses import dataclass

_URL_BLOCK = re.compile(r"<url\s*>(.*?)</url\s*>", re.I | re.S)
_SM_BLOCK = re.compile(r"<sitemap\s*>(.*?)</sitemap\s*>", re.I | re.S)
_CDATA = re.compile(r"<!\[CDATA\[(.*?)\]\]>", re.S)


def _tag(block: str, name: str) -> str | None:
    m = re.search(rf"<{name}\s*>(.*?)</{name}\s*>", block, re.I | re.S)
    if not m:
        return None
    v = m.group(1).strip()
    cm = _CDATA.match(v)
    if cm:
        v = cm.group(1).strip()
    return _html.unescape(v) or None


@dataclass(frozen=True)
class SitemapEntry:
    loc: str
    lastmod: str | None = None
    changefreq: str | None = None
    priority: float | None = None


def parse_sitemap(xml: str | None) -> tuple[list[SitemapEntry], list[str]]:
    """sitemap document → (url entries, nested sitemap locs).

    A `<urlset>` yields entries and no nested locs; a `<sitemapindex>`
    yields no entries and the child sitemap locs; junk/None yields
    ([], []). Entries keep document order; entries without a <loc> are
    dropped (spec: loc is required)."""
    if not xml:
        return [], []
    entries: list[SitemapEntry] = []
    for m in _URL_BLOCK.finditer(xml):
        block = m.group(1)
        loc = _tag(block, "loc")
        if not loc:
            continue
        pr: float | None = None
        praw = _tag(block, "priority")
        if praw is not None:
            try:
                p = float(praw)
                pr = p if 0.0 <= p <= 1.0 else None
            except ValueError:
                pr = None
        entries.append(
            SitemapEntry(
                loc=loc,
                lastmod=_tag(block, "lastmod"),
                changefreq=_tag(block, "changefreq"),
                priority=pr,
            )
        )
    nested = []
    for m in _SM_BLOCK.finditer(xml):
        loc = _tag(m.group(1), "loc")
        if loc:
            nested.append(loc)
    return entries, nested
