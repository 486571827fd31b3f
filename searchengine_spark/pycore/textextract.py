"""Normative HTML→text extraction and link extraction.

Capability-equivalent of the reference's
``BeautifulSoup(html, 'lxml').get_text(separator=' ').lower()``
(reference: index_construction.py:125-127, idxer.py:101-103) rebuilt as a
deterministic single-pass state machine, because bs4/lxml are absent from
the build environment and because the north rule requires a *normative*
extractor whose output is byte-identical between the Spark UDF and the
single-node oracle (both call THIS function).

Documented deviations from bs4 (normative spec wins):
  * script/style text IS kept — faithful to the reference's live path,
    which never decomposes script/style (the stripping variant is
    commented out at index_construction.py:93-102).
  * consecutive empty text nodes produce no extra separators: non-empty
    text segments are joined with a single space.
  * entities are decoded with html.unescape (stdlib, deterministic).

Link extraction implements the scraper contract (reference README.md:105-111):
return defragmented absolute urls found in href attributes.
"""

from __future__ import annotations

import html as _htmllib
import re
from urllib.parse import urljoin

# Tags whose raw content is not HTML markup (CDATA-like). The reference's
# get_text keeps their *text*, so we keep the text but must not treat `<`
# inside them as tag starts.
_RAWTEXT_TAGS = ("script", "style")

_TAG_NAME_RE = re.compile(r"[a-zA-Z][a-zA-Z0-9:-]*")


def _decode_html(html: bytes | str) -> str:
    """bytes→str, deterministically: utf-8 first, latin-1 fallback.

    (The reference opens corpus files with encoding='ascii' and silently
    skips failures — index_construction.py:75,87-88; we decode leniently
    instead and let the caller decide to drop nulls.)
    """
    if isinstance(html, str):
        return html
    try:
        return html.decode("utf-8")
    except UnicodeDecodeError:
        return html.decode("latin-1")


def extract_text(html: bytes | str | None) -> str | None:
    """HTML → lowercase text with single-space separators between text nodes."""
    if html is None:
        return None
    s = _decode_html(html)
    n = len(s)
    i = 0
    segments: list[str] = []
    buf: list[str] = []
    rawtext_until: str | None = None  # closing tag name we are waiting for

    def flush() -> None:
        if buf:
            seg = "".join(buf)
            if seg:
                segments.append(seg)
            buf.clear()

    while i < n:
        c = s[i]
        if c == "<":
            if rawtext_until is not None:
                # Only a matching closing tag ends rawtext mode.
                m = re.match(rf"</\s*{rawtext_until}\s*>", s[i:], re.IGNORECASE)
                if m:
                    flush()
                    rawtext_until = None
                    i += m.end()
                    continue
                buf.append(c)
                i += 1
                continue
            # comment
            if s.startswith("<!--", i):
                end = s.find("-->", i + 4)
                flush()
                i = n if end == -1 else end + 3
                continue
            # doctype / CDATA / other markup declarations
            if s.startswith("<!", i) or s.startswith("<?", i):
                end = s.find(">", i)
                flush()
                i = n if end == -1 else end + 1
                continue
            # regular or closing tag
            m = re.match(r"</?\s*([a-zA-Z][a-zA-Z0-9:-]*)", s[i:])
            if m:
                end = s.find(">", i)
                if end == -1:
                    flush()
                    i = n
                    continue
                flush()
                name = m.group(1).lower()
                is_closing = s[i + 1] == "/"
                self_closing = s[end - 1] == "/"
                if not is_closing and not self_closing and name in _RAWTEXT_TAGS:
                    rawtext_until = name
                i = end + 1
                continue
            # stray '<' → literal text
            buf.append(c)
            i += 1
        else:
            buf.append(c)
            i += 1
    flush()
    joined = " ".join(_htmllib.unescape(seg) for seg in segments)
    return joined.lower()


_HREF_RE = re.compile(
    r"""<a\s[^>]*?href\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""",
    re.IGNORECASE | re.DOTALL,
)


def _href_target(m: re.Match, base_url: str) -> str | None:
    """Resolve one _HREF_RE match to an absolute defragged url (None =
    dropped: empty, non-fetchable scheme, or unjoinable)."""
    raw = m.group(2) if m.group(2) is not None else (
        m.group(3) if m.group(3) is not None else m.group(4)
    )
    raw = _htmllib.unescape(raw.strip())
    if not raw or raw.startswith(("javascript:", "mailto:", "tel:", "data:")):
        return None
    try:
        absu = urljoin(base_url, raw)
    except ValueError:
        return None
    # defragment (reference imports urldefrag, link_similarity.py:7)
    absu = absu.split("#", 1)[0]
    return absu or None


def extract_links(html: bytes | str | None, base_url: str) -> list[str]:
    """All <a href> targets, resolved absolute against base_url, defragmented.

    Implements the scraper return contract (README.md:105-111): absolute,
    defragged urls; invalid/unjoinable hrefs are dropped. Order of
    appearance is preserved; duplicates within one page are kept (the
    frontier dedups downstream, J5).
    """
    if html is None:
        return []
    s = _decode_html(html)
    out: list[str] = []
    for m in _HREF_RE.finditer(s):
        absu = _href_target(m, base_url)
        if absu:
            out.append(absu)
    return out


_ANCHOR_CLOSE_RE = re.compile(r"</a\s*>", re.IGNORECASE)
_INNER_TAG_RE = re.compile(r"<[^>]*>")


def extract_anchors(
    html: bytes | str | None, base_url: str
) -> list[tuple[str, str]]:
    """(target url, anchor text) pairs for every <a href> — the classic
    target-description signal an anchor-text index aggregates (rebuild-
    only: the reference scraper keeps hrefs and drops the text).

    Target resolution is IDENTICAL to extract_links (same regex, same
    drop rules). Anchor text = the inner text from the opening tag's
    '>' to the first matching '</a>': nested tags stripped, entities
    unescaped, whitespace collapsed, lowercased; an unclosed tag yields
    ''. Order preserved, duplicates kept (an aggregation weighs them)."""
    if html is None:
        return []
    s = _decode_html(html)
    out: list[tuple[str, str]] = []
    for m in _HREF_RE.finditer(s):
        absu = _href_target(m, base_url)
        if not absu:
            continue
        text = ""
        gt = s.find(">", m.end())
        if gt != -1:
            cm = _ANCHOR_CLOSE_RE.search(s, gt + 1)
            if cm:
                inner = _INNER_TAG_RE.sub(" ", s[gt + 1 : cm.start()])
                text = " ".join(_htmllib.unescape(inner).split()).lower()
        out.append((absu, text))
    return out
