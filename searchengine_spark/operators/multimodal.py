"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media ride as opaque `binary` columns with typed metadata, processed by
Arrow-batched `mapInPandas` — the schema, partitioning, UDF signatures
and batch shapes are real and tested; only the codec step is stubbed
(the image/audio libraries are not in this container): `decode_image`
raises NotImplementedError unless PIL is importable, and the tested path
uses deterministic byte-level features instead (byte histograms, block
sampling — real computations on the binary payload, no codec needed).

Scale notes: payloads dominate row size, so every transform projects the
payload column away as early as possible (features are ~100 B vs ~MB
media); mapInPandas streams Arrow batches — no payload ever materializes
on the driver. Partition by a content-hash bucket for even byte-volume
per task (row-count balance is NOT byte balance for media).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - codec gate
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

N_HIST_BINS = 16

FEATURES_SCHEMA = (
    "media_id bigint, n_bytes bigint, entropy double, "
    f"hist array<double>"
)
FRAMES_SCHEMA = "media_id bigint, frame_idx int, frame_hash bigint"


def media_table(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic media fixture: payload = utf-8 bytes of text, kind
    round-robins image/audio/video, meta carries declared dimensions.
    (Stands in for real WARC/СС media records; schema per SURVEY.md —
    opaque binary + typed metadata.)"""
    return documents.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("kind"),
        F.struct(
            (F.pmod(F.xxhash64(text_col), F.lit(1280)) + 1).alias("width"),
            (F.pmod(F.xxhash64(text_col, F.lit(1)), F.lit(720)) + 1).alias("height"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):
    """bytes → uint8 ndarray (H,W[,C]). PNG payloads decode via the
    pure-Python spec-subset codec (pycore.png — stdlib zlib only) and
    baseline JPEG via pycore.jpeg (ITU-T T.81 subset: SOF0, 4:4:4 /
    4:2:0 / 4:2:2, restart markers), so the pixel path is REAL and
    tested in this container for the two dominant web formats; other
    formats fall through to PIL when importable, else raise (webp et
    al. — environment constraint); GIF87a/89a decodes via pycore.gif
    (pure-Python LZW, interlace, transparency)."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from searchengine_spark.pycore.png import decode_png

        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from searchengine_spark.pycore.jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from searchengine_spark.pycore.gif import decode_gif

        return decode_gif(payload)
    if not _HAS_PIL:
        raise NotImplementedError(
            "non-PNG/JPEG/GIF image decode requires PIL; container "
            "ships without codecs — PNG (pycore.png), baseline JPEG "
            "(pycore.jpeg) and GIF (pycore.gif) decode natively; "
            "byte-level features (byte_histogram_features) are the "
            "codec-free path"
        )
    import io

    return np.asarray(Image.open(io.BytesIO(payload)))


PIXEL_FEATURES_SCHEMA = (
    "media_id bigint, height int, width int, channels int, "
    "mean_luma double, pixel_hash bigint"
)


def pixel_features(media: DataFrame) -> DataFrame:
    """Decoded-pixel features over image payloads via mapInPandas:
    (H, W, C, mean luminance, 60-bit md5 pixel hash). Rows whose
    payload fails to decode are SKIPPED (the P1/S2 decode-skip policy
    applied to media). Same Arrow-batch shape as
    byte_histogram_features; payload dropped after decode."""
    import hashlib

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs, ws, cs, lum, ph = [], [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    arr = decode_image(bytes(payload))
                except (ValueError, NotImplementedError):
                    continue
                if arr.ndim == 2:
                    h, w, c = arr.shape[0], arr.shape[1], 1
                else:
                    h, w, c = arr.shape
                ids.append(mid)
                hs.append(h)
                ws.append(w)
                cs.append(c)
                lum.append(float(arr.astype(np.float64).mean()))
                digest = hashlib.md5(arr.tobytes()).hexdigest()[:15]
                ph.append(int(digest, 16))
            yield pd.DataFrame(
                {
                    "media_id": ids, "height": hs, "width": ws,
                    "channels": cs, "mean_luma": lum, "pixel_hash": ph,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        _features, schema=PIXEL_FEATURES_SCHEMA
    )


def byte_histogram_features(media: DataFrame) -> DataFrame:
    """(media_id, n_bytes, entropy, hist[16]) via mapInPandas — a real,
    deterministic feature extraction over the binary payload (the
    codec-free stand-in for embed/resize): normalized 16-bin byte
    histogram + Shannon entropy (bits)."""

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nb, ent, hists = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = np.frombuffer(payload, dtype=np.uint8)
                counts = np.bincount(arr >> 4, minlength=N_HIST_BINS).astype(
                    np.float64
                )
                total = counts.sum()
                probs = counts / total if total else counts
                nz = probs[probs > 0]
                ids.append(mid)
                nb.append(len(arr))
                ent.append(float(-(nz * np.log2(nz)).sum()) if len(nz) else 0.0)
                hists.append(probs.tolist())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "n_bytes": nb,
                    "entropy": ent,
                    "hist": hists,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        _features, schema=FEATURES_SCHEMA
    )


def frame_sample(
    media: DataFrame, block_bytes: int = 256, stride: int = 4
) -> DataFrame:
    """UDTF-shape expansion: one 'video' row → 0..n sampled 'frames'
    (every `stride`-th `block_bytes` block), each fingerprinted. The
    real pipeline would decode+sample frames; the block sampler proves
    the 1→N mapInPandas row-expansion plumbing with identical schema
    mechanics."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def _md5_60(b: bytes) -> int:
            # engine-portable 60-bit fingerprint: first 15 hex chars of
            # md5 (same rationale as dedup.SIMHASH_BITS — md5 exists in
            # both Spark and DuckDB, so the SQL oracle recomputes frame
            # hashes exactly; xxhash64 would leave this rows-only)
            return int(hashlib.md5(b).hexdigest()[:15], 16)

        for pdf in batches:
            out_id, out_idx, out_hash = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                blocks = [
                    payload[o : o + block_bytes]
                    for o in range(0, len(payload), block_bytes)
                ]
                for i, blk in enumerate(blocks[::stride]):
                    out_id.append(mid)
                    out_idx.append(i)
                    out_hash.append(_md5_60(bytes(blk)))
            yield pd.DataFrame(
                {
                    "media_id": out_id,
                    "frame_idx": out_idx,
                    "frame_hash": out_hash,
                }
            )

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(_frames, schema=FRAMES_SCHEMA)
    )


# magic-byte signatures as hex prefixes (public file-format magics; the
# content-sniffing step every web-scale ingest needs because HTTP
# Content-Type headers lie). HTML detection is exact-prefix over the
# common spellings — full WHATWG sniffing needs case-folded scans the
# hex form can't express; documented limitation.
_MAGIC_HEX = [
    ("89504E470D0A1A0A", "image/png"),
    ("FFD8FF", "image/jpeg"),
    ("474946383761", "image/gif"),
    ("474946383961", "image/gif"),
    ("52494646", "riff"),  # refined to webp/wav below
    ("255044462D", "application/pdf"),
    ("1F8B", "application/gzip"),
    ("504B0304", "application/zip"),
    ("3C21444F4354595045", "text/html"),  # <!DOCTYPE
    ("3C21646F6374797065", "text/html"),  # <!doctype
    ("3C68746D6C", "text/html"),  # <html
    ("3C48544D4C", "text/html"),  # <HTML
    ("3C3F786D6C", "text/xml"),  # <?xml
]


def sniff_mime_sql(payload_col: str) -> str:
    """Engine-portable SQL: sniffed MIME type of a binary column from
    its leading magic bytes. Works on the HEX of the payload prefix
    (``substring(hex(x), ...)``) because that is the one binary
    primitive Spark SQL and DuckDB share — DuckDB has no BLOB
    substring/slice, and hex is a bijection so prefix tests are
    equivalent. Pure whole-stage-codegen CASE ladder — no UDF; RIFF
    containers are refined by the format tag at bytes 9-12 (WEBP/WAVE).
    Unknown formats report 'application/octet-stream'.
    """
    h = f"hex({payload_col})"
    branches = []
    for sig, mime in _MAGIC_HEX:
        if mime == "riff":
            branches.append(
                f"WHEN substring({h}, 1, 8) = '52494646' THEN "
                f"(CASE substring({h}, 17, 8) "
                f"WHEN '57454250' THEN 'image/webp' "
                f"WHEN '57415645' THEN 'audio/wav' "
                f"ELSE 'application/riff' END)"
            )
        else:
            branches.append(
                f"WHEN substring({h}, 1, {len(sig)}) = '{sig}' "
                f"THEN '{mime}'"
            )
    return (
        "CASE " + " ".join(branches) + " ELSE 'application/octet-stream' END"
    )


def mime_census(
    media: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """(mime, n_payloads, total_bytes) — content-type census by magic
    bytes over an opaque binary column: the routing step in front of
    decode_image / frame_sample (headers lie; payload magics do not).
    One projection + one map-side-combined groupBy."""
    return (
        media.select(
            F.expr(sniff_mime_sql(payload_col)).alias("mime"),
            F.length(F.col(payload_col)).alias("nb"),
        )
        .groupBy("mime")
        .agg(
            F.count("*").alias("n_payloads"),
            F.sum("nb").alias("total_bytes"),
        )
    )


def sniff_bom_sql(payload_col: str) -> str:
    """Engine-portable SQL: Unicode BOM / encoding hint from leading
    bytes ('utf-8-bom', 'utf-16-le', 'utf-16-be', 'utf-32-le',
    'utf-32-be', or 'none') — the charset-detection front half of the
    text-decode stage (the reference decodes JSON as utf-8 and skips
    failures; a WARC pipeline must sniff first). Same hex-prefix CASE
    technique as sniff_mime_sql, and the same reason: hex is the one
    shared binary primitive. UTF-32 LE is tested before UTF-16 LE
    (FF FE 00 00 vs FF FE — the classic ordering bug)."""
    h = f"hex({payload_col})"
    return (
        f"CASE WHEN substring({h}, 1, 8) = 'FFFE0000' THEN 'utf-32-le' "
        f"WHEN substring({h}, 1, 8) = '0000FEFF' THEN 'utf-32-be' "
        f"WHEN substring({h}, 1, 6) = 'EFBBBF' THEN 'utf-8-bom' "
        f"WHEN substring({h}, 1, 4) = 'FFFE' THEN 'utf-16-le' "
        f"WHEN substring({h}, 1, 4) = 'FEFF' THEN 'utf-16-be' "
        f"ELSE 'none' END"
    )
