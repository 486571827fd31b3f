"""Delta-gap + LEB128 varint posting-list codec (single-node normative).

The reference serializes its inverted index as sorted text lines
(idxer.py:214-233 writes ``token:postings`` files; SURVEY §2 S4/T1) —
at 100 TB that format is the index-size bottleneck, so the Spark build
adds the standard IR compression layer (Zobel & Moffat, ACM CS 2006):
doc_ids sorted ascending, first value stored raw, followed by strictly
positive gaps, each integer LEB128-varint coded (7 payload bits per
byte, high bit = continuation).

This module is the engine-portable normative codec: the Spark operator
(operators/postcompress.py) wraps exactly these functions in an
Arrow-batched pandas UDF, and tests assert the UDF output is
byte-identical to this single-node path. The byte SIZE of an encoded
list is also pure integer arithmetic on the gaps — which is how the
DuckDB oracle recomputes ``n_bytes`` without ever seeing the blob.
"""

from __future__ import annotations


def varint_encode(value: int) -> bytes:
    """LEB128 encoding of one unsigned integer."""
    if value < 0:
        raise ValueError("varint is unsigned")
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def varint_size(value: int) -> int:
    """Bytes varint_encode(value) produces — 1 + floor(bits/7)."""
    if value < 0:
        raise ValueError("varint is unsigned")
    n = 1
    while value >= 0x80:
        value >>= 7
        n += 1
    return n


def encode_ids(ids: list[int]) -> bytes:
    """Sorted-unique doc_id list → delta-gap varint blob. Input must be
    strictly ascending non-negative ints (the operator sorts/dedups
    upstream); the first id is stored raw, the rest as gaps."""
    out = bytearray()
    prev = None
    for i in ids:
        if prev is None:
            out += varint_encode(i)
        else:
            gap = i - prev
            if gap <= 0:
                raise ValueError("ids must be strictly ascending")
            out += varint_encode(gap)
        prev = i
    return bytes(out)


def decode_ids(blob: bytes) -> list[int]:
    """Inverse of encode_ids."""
    ids: list[int] = []
    acc = 0
    shift = 0
    prev: int | None = None
    for byte in blob:
        acc |= (byte & 0x7F) << shift
        if byte & 0x80:
            shift += 7
            continue
        prev = acc if prev is None else prev + acc
        ids.append(prev)
        acc = 0
        shift = 0
    if shift or acc:
        raise ValueError("truncated varint blob")
    return ids


def encoded_size(ids: list[int]) -> int:
    """Byte size encode_ids(ids) would produce, without materializing
    the blob — the same arithmetic the DuckDB oracle runs in SQL."""
    total = 0
    prev = None
    for i in ids:
        total += varint_size(i if prev is None else i - prev)
        prev = i
    return total
