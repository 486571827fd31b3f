"""Minimal pure-Python baseline JPEG codec (public ITU-T T.81 spec +
JFIF; tables from T.81 Annex K).

Sibling of pycore.png — the container ships no PIL/libjpeg, so a
spec-subset codec gives `multimodal.decode_image` a real pixel path for
the dominant web image format:

  * decode_jpeg: baseline sequential DCT (SOF0), 8-bit, greyscale or
    YCbCr; any sampling factors (4:4:4, 4:2:0, 4:2:2 — nearest-neighbor
    chroma upsampling); restart intervals (DRI/RSTn). No progressive
    (SOF2), no arithmetic coding, no 12-bit.
  * encode_jpeg: baseline 4:4:4 (or greyscale) with the Annex K
    quantization + Huffman tables, so decode(encode(x)) roundtrips
    within DCT quantization error and the tests need no binary fixture.

The DCT is the separable 8×8 matrix form (numpy float64) — exactness
beyond the spec's own quantization loss is not a goal. Per-block
Huffman coding is plain Python: fine for test-sized fixtures; the
Spark pipeline only ever runs this inside mapInPandas batches on small
thumbnails (payloads are feature-extracted, not re-served).
"""

from __future__ import annotations

import math
import struct

import numpy as np

# zigzag scan order: position in scan → linear index into the 8×8 block
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# T.81 Annex K.1 — luminance / chrominance quantization tables
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# T.81 Annex K.3 — standard Huffman tables as (bits[1..16], huffval)
HT_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HT_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """8×8 orthonormal DCT-II matrix A: forward X = A·x·Aᵀ, inverse
    x = Aᵀ·X·A."""
    a = np.zeros((8, 8))
    for k in range(8):
        c = math.sqrt(1.0 / 8) if k == 0 else math.sqrt(2.0 / 8)
        for n in range(8):
            a[k, n] = c * math.cos(math.pi * (2 * n + 1) * k / 16)
    return a


_A = _dct_matrix()


def _build_decode_table(bits: list[int], huffval: list[int]) -> dict:
    """(code_length, code) → symbol, per T.81 C.2 canonical assignment."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], huffval: list[int]) -> dict:
    """symbol → (code, code_length)."""
    out = {}
    for (length, code), sym in _build_decode_table(bits, huffval).items():
        out[sym] = (code, length)
    return out


class _BitReader:
    """MSB-first bit reader over an entropy-coded segment with 0xFF00
    byte-unstuffing; stops at any real marker (0xFF xx, xx ≠ 0)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:  # stuffed
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RSTn handled by caller
                raise _RestartMarker(nxt)
            else:
                raise _SegmentEnd()
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> None:
        """Drop partial-byte bits and consume one RST marker."""
        self.acc = 0
        self.nbits = 0
        while self.data[self.pos] != 0xFF:
            self.pos += 1
        self.pos += 2  # FF Dn


class _RestartMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


class _SegmentEnd(Exception):
    pass


def _extend(v: int, n: int) -> int:
    """T.81 F.2.2.1 value extension: n-bit magnitude → signed."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def _decode_huff(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes → uint8 ndarray (H, W) greyscale or (H, W, 3) RGB.
    Raises ValueError on non-JPEG input or unsupported features
    (progressive, arithmetic, 12-bit)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: bad SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []
    width = height = None
    restart_interval = 0
    scan_pos = None
    scan_comps: list[dict] = []

    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int32)
                for z in range(64):
                    tbl[ZIGZAG[z]] = body[i + 1 + z]
                qt[tq] = tbl
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                huffval = list(body[i + 17 : i + 17 + n])
                tbl = _build_decode_table(bits, huffval)
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            depth, height, width, nc = (
                body[0],
                struct.unpack(">H", body[1:3])[0],
                struct.unpack(">H", body[3:5])[0],
                body[5],
            )
            if depth != 8:
                raise ValueError("only 8-bit depth supported")
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported SOF marker 0xFF{marker:02X} "
                             "(only baseline SOF0)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            for c in range(ns):
                cid, tables = body[1 + 2 * c], body[2 + 2 * c]
                comp = next(x for x in comps if x["id"] == cid)
                comp["td"], comp["ta"] = tables >> 4, tables & 0xF
                scan_comps.append(comp)
            scan_pos = pos + 2 + seglen
            break
        pos += 2 + seglen

    if scan_pos is None or width is None:
        raise ValueError("no scan found")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    for c in comps:
        c["plane"] = np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8))
        c["pred"] = 0

    reader = _BitReader(data, scan_pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                reader.align_to_marker()
                for c in scan_comps:
                    c["pred"] = 0
            mcu_count += 1
            for c in scan_comps:
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        try:
                            block = _decode_block(
                                reader, huff_dc[c["td"]], huff_ac[c["ta"]], c, q
                            )
                        except (_SegmentEnd, IndexError):
                            block = np.zeros((8, 8))
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        c["plane"][y0 : y0 + 8, x0 : x0 + 8] = block

    planes = []
    for c in comps:
        p = c["plane"]
        # nearest-neighbor upsample to full resolution
        if c["h"] < hmax or c["v"] < vmax:
            p = np.repeat(
                np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1
            )
        planes.append(p[:height, :width])

    if len(planes) == 1:
        return np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def _decode_block(reader, dc_tbl, ac_tbl, comp, q) -> np.ndarray:
    coeffs = np.zeros(64)
    t = _decode_huff(reader, dc_tbl)
    diff = _extend(reader.receive(t), t)
    comp["pred"] += diff
    coeffs[0] = comp["pred"] * q[0]
    k = 1
    while k < 64:
        rs = _decode_huff(reader, ac_tbl)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL: skip 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            break
        coeffs[ZIGZAG[k]] = _extend(reader.receive(s), s) * q[ZIGZAG[k]]
        k += 1
    block = coeffs.reshape(8, 8)
    return _A.T @ block @ _A + 128.0


# --------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _magnitude(v: int) -> tuple[int, int]:
    """signed value → (size-in-bits, magnitude-bits per T.81 F.1.2.1)."""
    if v == 0:
        return 0, 0
    n = abs(v).bit_length()
    bits = v if v > 0 else v + (1 << n) - 1
    return n, bits


def _encode_block(
    writer, block: np.ndarray, q: np.ndarray, pred: int, dc_tbl, ac_tbl
) -> int:
    coeffs = _A @ (block - 128.0) @ _A.T
    zz = np.array(
        [int(np.rint(coeffs.flat[ZIGZAG[z]] / q[ZIGZAG[z]])) for z in range(64)]
    )
    diff = int(zz[0]) - pred
    n, bits = _magnitude(diff)
    code, length = dc_tbl[n]
    writer.write(code, length)
    if n:
        writer.write(bits, n)
    run = 0
    last_nz = max([z for z in range(1, 64) if zz[z] != 0], default=0)
    for z in range(1, 64):
        if z > last_nz:
            code, length = ac_tbl[0x00]  # EOB
            writer.write(code, length)
            break
        if zz[z] == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tbl[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        n, bits = _magnitude(int(zz[z]))
        code, length = ac_tbl[(run << 4) | n]
        writer.write(code, length)
        writer.write(bits, n)
        run = 0
    return int(zz[0])


def encode_jpeg(arr: np.ndarray) -> bytes:
    """uint8 (H, W) greyscale or (H, W, 3) RGB → baseline JFIF bytes
    (4:4:4, Annex K tables)."""
    arr = np.asarray(arr, dtype=np.float64)
    grey = arr.ndim == 2
    h, w = arr.shape[:2]
    if grey:
        planes = [arr]
        qts = [QT_LUMA]
    else:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
        qts = [QT_LUMA, QT_CHROMA, QT_CHROMA]

    out = bytearray(b"\xff\xd8")  # SOI
    # JFIF APP0
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
    # DQT ×2 (or ×1 for grey)
    for tq, qtab in enumerate([QT_LUMA] if grey else [QT_LUMA, QT_CHROMA]):
        zz = bytes(int(qtab[ZIGZAG[z]]) for z in range(64))
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + zz
    # SOF0
    nc = 1 if grey else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for c in range(nc):
        sof += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT ×4 (or ×2)
    tables = [(0x00, HT_DC_LUMA), (0x10, HT_AC_LUMA)]
    if not grey:
        tables += [(0x01, HT_DC_CHROMA), (0x11, HT_AC_CHROMA)]
    for tid, (bits, huffval) in tables:
        body = bytes([tid]) + bytes(bits) + bytes(huffval)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    # SOS
    sos = bytes([nc])
    for c in range(nc):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_luma = _build_encode_table(*HT_DC_LUMA)
    ac_luma = _build_encode_table(*HT_AC_LUMA)
    dc_chroma = _build_encode_table(*HT_DC_CHROMA)
    ac_chroma = _build_encode_table(*HT_AC_CHROMA)
    writer = _BitWriter()
    preds = [0] * nc
    # pad planes to multiples of 8 (edge replicate)
    padded = []
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    for p in planes:
        pp = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
        padded.append(pp)
    for by in range(ph // 8):
        for bx in range(pw // 8):
            for ci in range(nc):
                dc = dc_luma if ci == 0 else dc_chroma
                ac = ac_luma if ci == 0 else ac_chroma
                block = padded[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                preds[ci] = _encode_block(
                    writer, block, qts[ci], preds[ci], dc, ac
                )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
