"""URL canonicalization, hashing, validity — normative pure-Python forms.

Reference semantics reproduced:
  * ``normalize`` strips trailing '/' (utils/__init__.py:32-35 —
    ``rstrip`` strips *all* trailing slashes; faithful);
  * ``get_urlhash`` is sha256 over "{netloc}/{path}/{params}/{query}/
    {fragment}" — scheme excluded, fragment included (faithful quirks,
    utils/__init__.py:25-30);
  * scraped urls must be defragmented absolute http(s) urls
    (README.md:105-111) restricted by an is_valid extension/domain filter
    (README.md:113-114, 209-212).

``xxhash64`` is a from-scratch XXH64 (public algorithm, Cyan4973 spec)
with Spark's default seed 42 — bit-identical to Spark SQL's
``xxhash64(string)``, so the oracle and the engine agree on 64-bit URL
keys without any Python ``hash()`` (which is PYTHONHASHSEED-randomized
and banned for determinism).
"""

from __future__ import annotations

import re
from hashlib import sha256
from urllib.parse import urljoin, urlparse

# ---------------------------------------------------------------- xxhash64

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M64
    acc = _rotl(acc, 31)
    return (acc * _P1) & _M64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * _P1) + _P4) & _M64


def xxhash64(data: bytes | str, seed: int = 42) -> int:
    """XXH64, returned as a *signed* 64-bit int (Spark LongType parity)."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


# ------------------------------------------------------------ canonicalize


def canonicalize(url: str | None, base_url: str | None = None) -> str | None:
    """Defragment + lowercase scheme/host + strip trailing slashes.

    Composite of reference F8: urljoin for relative links (scraper
    contract README.md:105-111), urldefrag (link_similarity.py:7),
    normalize's trailing-'/' strip (utils/__init__.py:32-35).
    """
    if url is None:
        return None
    u = url.strip()
    if not u:
        return None
    if base_url:
        try:
            u = urljoin(base_url, u)
        except ValueError:
            return None
    u = u.split("#", 1)[0]
    try:
        p = urlparse(u)
    except ValueError:
        return None
    scheme = p.scheme.lower()
    netloc = p.netloc.lower()
    rest = u[len(p.scheme) + 3 + len(p.netloc):] if p.scheme and p.netloc else u
    u = f"{scheme}://{netloc}{rest}" if scheme and netloc else u
    return u.rstrip("/")


def url_host(url: str | None) -> str | None:
    if url is None:
        return None
    try:
        return (urlparse(url).hostname or "").lower() or None
    except ValueError:
        return None


def urlhash_sha256(url: str) -> str:
    """Reference get_urlhash (utils/__init__.py:25-30): sha256 hex of
    "{netloc}/{path}/{params}/{query}/{fragment}" — scheme excluded,
    fragment included (faithful quirks)."""
    p = urlparse(url)
    return sha256(
        f"{p.netloc}/{p.path}/{p.params}/{p.query}/{p.fragment}".encode("utf-8")
    ).hexdigest()


# ----------------------------------------------------------------- is_valid

# Standard binary/asset extension blacklist per README.md:209-212 ("PDFs,
# PPTs, css, js, etc. The is_valid filters a large number of such
# extensions"). Kept as a list so the SQL-side filter
# (functions/urls.py:is_valid_sql) builds the identical pattern.
EXTENSIONS = (
    "css|js|bmp|gif|jpe?g|ico|png|tiff?|mid|mp2|mp3|mp4"
    "|wav|avi|mov|mpeg|ram|m4v|mkv|ogg|ogv|pdf"
    "|ps|eps|tex|ppt|pptx|doc|docx|xls|xlsx|names"
    "|data|dat|exe|bz2|tar|msi|bin|7z|psd|dmg|iso"
    "|epub|dll|cnf|tgz|sha1|thmx|mso|arff|rtf|jar|csv"
    "|rm|smil|wmv|swf|wma|zip|rar|gz"
).split("|")

BAD_EXT_RE = re.compile(r".*\.(" + "|".join(EXTENSIONS) + r")$", re.IGNORECASE)


def is_valid_url(url: str | None, allowed_host_re: str | None = None) -> bool:
    """P4: http(s) scheme, optional domain restriction (README.md:210
    'filter out urls that are not with ics.uci.edu domain' — the domain
    set is config in our engine), binary-extension path filter."""
    if not url:
        return False
    try:
        p = urlparse(url)
    except ValueError:
        return False
    if p.scheme not in ("http", "https"):
        return False
    host = (p.hostname or "").lower()
    if not host:
        return False
    if allowed_host_re is not None and not re.search(allowed_host_re, host):
        return False
    if BAD_EXT_RE.match(p.path.lower()):
        return False
    return True
