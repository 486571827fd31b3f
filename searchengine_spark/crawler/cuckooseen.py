"""URL-seen dedup, cuckoo-filter backend: deletable fingerprint fast
path + exact anti-join backstop (J5 variant).

The north rule names "bloom/cuckoo-filter URL-seen dedup inside
vectorized Arrow UDFs". The bloom backend (urlseen.py) is insert-only;
this backend stores 16-bit fingerprints in 4-slot buckets of a
partial-key cuckoo table (Fan et al., CoNEXT'14 — public algorithm),
which adds the one capability a bloom cannot offer: DELETION, the
primitive a recrawl/expiry scheduler needs (drop a URL from the seen
set so the frontier re-admits it). Same contract as the bloom path: a
key that was inserted (and not deleted) always probes maybe_seen=true,
so definite-new URLs skip the exact anti-join and false positives fall
through to it (reference semantics: the frontier must never re-admit a
seen URL — README.md:166-169, keyed per utils/__init__.py:25-30).

Vectorization (input_hint mandate: no per-row Python): classic cuckoo
insertion is a sequential eviction chain. Builds here run BULK numpy
rounds instead — every pending key targets one bucket per round,
per-bucket ranks come from one stable argsort, keys whose rank fits
the free slots place in a single vectorized scatter, leftovers flip to
their alternate bucket, and keys that failed BOTH buckets evict (one
evictor per bucket per round via np.unique; the displaced fingerprint
re-enters the pending set aimed at its own alternate bucket — the
XOR-involution `alt = b ^ (mix(fp) mod nb)` makes that computable from
the fingerprint alone). After _MAX_ROUNDS the (empirically zero at the
0.84 design load) stragglers go to an exact per-segment fingerprint
STASH stored next to the table; probes check the stash too, so the
no-false-negative contract holds at ANY load.

Segmentation mirrors urlseen.py: segment_id = pmod(url_hash,
n_segments) — the hash partitioning the frontier tables use, so at
cluster scale each executor builds/probes only its co-located
segments. The frontier treats the two backends through one seam
(build_segments / merge_segments / filter_new / segment_load /
required_m_bits / segment_bytes); for this backend the generation size
parameter ("m_bits" in the commit manifest) is N_BUCKETS.

Deletion caveat (documented, bounded, healable): removing a
fingerprint for key A can strip key B's identical fingerprint when A
and B share a bucket pair AND a 16-bit fingerprint (P ≈ 2·4/2^16 ≈
1.2e-4 per delete) — B would then probe definite-new and be refetched
once. `expire` therefore defaults to REBUILDING only the affected
segments from the exact url_seen table (exact, heals everything,
O(expired segments) not O(seen)); `delete_fps` is the cheap in-place
path for deployments that tolerate a rare duplicate fetch between
compactions (compaction rebuilds from truth and heals collateral).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .urlseen import _mix64

_B = 4  # slots per bucket
_FP_DTYPE = np.uint16
_MAX_ROUNDS = 64  # eviction-round cap; leftovers go to the exact stash
DEFAULT_N_BUCKETS = 1 << 12  # 4096 buckets = 16384 slots = 32 KiB/segment
DEFAULT_MAX_LOAD = 0.84  # design load; b=4 cuckoo sustains ~0.95 worst-case

SEGMENT_SCHEMA = (
    "segment_id int, ctable binary, stash binary, n_items bigint, n_buckets bigint"
)


def _fp_i1(url_hash: np.ndarray, nb: int) -> tuple[np.ndarray, np.ndarray]:
    """(fingerprint, primary bucket) from the 64-bit url hash.

    fp = high 16 bits of the splitmix64 finalizer (0 remapped to 1 — 0
    marks an empty slot); i1 = low bits. Both come from the MIXED hash,
    never the raw one: segment_id is pmod(raw, n_segments), so raw-hash
    bucket bits would alias the segment-selection bits (the measured
    failure mode documented at urlseen._h1h2)."""
    h = _mix64(url_hash.astype(np.int64).view(np.uint64))
    fp = (h >> np.uint64(48)).astype(_FP_DTYPE)
    fp = np.where(fp == 0, _FP_DTYPE(1), fp)
    i1 = (h & np.uint64(nb - 1)).astype(np.int64)
    return fp, i1


def _alt(bucket: np.ndarray, fp: np.ndarray, nb: int) -> np.ndarray:
    """Partial-key alternate bucket: alt = b XOR (mix(fp) mod nb).
    Involutive (alt(alt(b)) == b), so it is computable from the stored
    fingerprint alone — the property that makes eviction and
    enumeration (merge) possible without the original keys."""
    fh = _mix64(fp.astype(np.uint64))
    return bucket ^ (fh & np.uint64(nb - 1)).astype(np.int64)


def _canon_key(b1: np.ndarray, b2: np.ndarray, fp: np.ndarray) -> np.ndarray:
    """Order-free stash encoding: (min(bucket-pair) << 16) | fp."""
    return (np.minimum(b1, b2).astype(np.uint64) << np.uint64(16)) | fp.astype(
        np.uint64
    )


def _bulk_insert(
    table: np.ndarray,
    counts: np.ndarray,
    fp0: np.ndarray,
    cur0: np.ndarray,
    nb: int,
    tried0: np.ndarray | None = None,
) -> np.ndarray:
    """Vectorized cuckoo insertion rounds. table is (nb, _B) uint16
    (0 = empty), counts the per-bucket fill. Entries start aimed at
    cur0 (their primary bucket, or — for re-inserted enumerated
    entries — wherever they previously sat). Returns the stash array
    (uint64 canon keys) for entries that outlived _MAX_ROUNDS."""
    fp = np.asarray(fp0, dtype=_FP_DTYPE).copy()
    cur = np.asarray(cur0, dtype=np.int64).copy()
    tried_alt = (
        np.zeros(len(fp), dtype=bool) if tried0 is None else tried0.copy()
    )
    pend = np.arange(len(fp), dtype=np.int64)
    for rnd in range(_MAX_ROUNDS):
        if pend.size == 0:
            break
        b = cur[pend]
        order = np.argsort(b, kind="stable")
        p = pend[order]
        bs = b[order]
        # rank of each entry within its equal-bucket run
        newg = np.ones(len(bs), dtype=bool)
        newg[1:] = bs[1:] != bs[:-1]
        gstart = np.where(newg, np.arange(len(bs)), 0)
        np.maximum.accumulate(gstart, out=gstart)
        rank = np.arange(len(bs)) - gstart
        slot = counts[bs] + rank
        ok = slot < _B
        table[bs[ok], slot[ok]] = fp[p[ok]]
        np.add.at(counts, bs[ok], 1)
        rest = p[~ok]
        if rest.size == 0:
            pend = rest
            continue
        # failed keys that haven't tried their other bucket yet: flip
        flip = ~tried_alt[rest]
        f = rest[flip]
        cur[f] = _alt(cur[f], fp[f], nb)
        tried_alt[f] = True
        # keys that failed BOTH buckets: evict — one evictor per bucket
        # per round (np.unique picks the first); the victim fingerprint
        # re-enters pending aimed at ITS alternate bucket
        ev = rest[~flip]
        carry = f
        if ev.size:
            bev = cur[ev]
            ub, first_idx = np.unique(bev, return_index=True)
            evictor = ev[first_idx]
            s = rnd % _B
            victim_fp = table[ub, s].copy()
            table[ub, s] = fp[evictor]
            vcur = _alt(ub, victim_fp, nb)
            vidx = np.arange(len(fp), len(fp) + len(ub), dtype=np.int64)
            fp = np.concatenate([fp, victim_fp])
            cur = np.concatenate([cur, vcur])
            tried_alt = np.concatenate([tried_alt, np.ones(len(ub), dtype=bool)])
            not_first = np.ones(len(ev), dtype=bool)
            not_first[first_idx] = False
            carry = np.concatenate([carry, ev[not_first], vidx])
        pend = carry
    if pend.size == 0:
        return np.empty(0, dtype=np.uint64)
    # exact stash: contract holds at any load
    pb = cur[pend]
    pa = _alt(pb, fp[pend], nb)
    return np.unique(_canon_key(pb, pa, fp[pend]))


def _build_arrays(hashes: np.ndarray, nb: int) -> tuple[np.ndarray, np.ndarray, int]:
    """(table, stash, n_items) for one segment's url hashes."""
    uh = np.unique(hashes)  # idempotent inserts (bloom parity)
    table = np.zeros((nb, _B), dtype=_FP_DTYPE)
    counts = np.zeros(nb, dtype=np.int64)
    fp, i1 = _fp_i1(uh, nb)
    stash = _bulk_insert(table, counts, fp, i1, nb)
    return table, stash, len(uh)


def _probe_arrays(
    table: np.ndarray, stash: np.ndarray, url_hash: np.ndarray, nb: int
) -> np.ndarray:
    fp, i1 = _fp_i1(url_hash, nb)
    i2 = _alt(i1, fp, nb)
    out = (table[i1] == fp[:, None]).any(axis=1)
    out |= (table[i2] == fp[:, None]).any(axis=1)
    if stash.size:
        out |= np.isin(_canon_key(i1, i2, fp), stash)
    return out


def _delete_arrays(
    table: np.ndarray, stash: np.ndarray, url_hash: np.ndarray, nb: int
) -> np.ndarray:
    """Best-effort in-place deletion: clears ONE stored copy of each
    key's fingerprint (bucket i1 first, then i2, then the stash).
    (bucket, slot) write conflicts between distinct expire keys are
    resolved in vectorized rounds (first-wins via np.unique); keys
    whose fingerprint is absent no-op. Returns the new stash."""
    uh = np.unique(url_hash)
    fp, i1 = _fp_i1(uh, nb)
    i2 = _alt(i1, fp, nb)
    pend = np.arange(len(uh), dtype=np.int64)
    for _ in range(_B * 2):
        if pend.size == 0:
            break
        hit1 = table[i1[pend]] == fp[pend, None]
        hit2 = table[i2[pend]] == fp[pend, None]
        any1 = hit1.any(axis=1)
        any2 = ~any1 & hit2.any(axis=1)
        bucket = np.where(any1, i1[pend], i2[pend])
        slot = np.where(any1, hit1.argmax(axis=1), hit2.argmax(axis=1))
        found = any1 | any2
        fb, fs, fk = bucket[found], slot[found], pend[found]
        # first-wins per (bucket, slot); losers retry next round
        _, first_idx = np.unique(fb * _B + fs, return_index=True)
        table[fb[first_idx], fs[first_idx]] = 0
        won = np.zeros(len(fk), dtype=bool)
        won[first_idx] = True
        pend = fk[~won]
    if pend.size and stash.size:
        stash = stash[~np.isin(stash, _canon_key(i1[pend], i2[pend], fp[pend]))]
    return stash


# ---------------------------------------------------------------------------
# backend seam (same function surface as urlseen.py; size param = n_buckets)
# ---------------------------------------------------------------------------


def build_segments(
    url_seen: DataFrame, n_segments: int = 16, m_bits: int = DEFAULT_N_BUCKETS
) -> DataFrame:
    """url_seen(url_hash, ...) → one fixed-size cuckoo table per hash
    segment, built in applyInPandas (per-partition at cluster scale).
    `m_bits` is the backend-generic size parameter — here N_BUCKETS
    (power of two). Fixed nb within a generation keeps delta tables
    from different rounds mergeable (merge_segments re-inserts
    enumerated fingerprints — see _alt's involution note)."""
    nb = int(m_bits)

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        seg = int(pdf["segment_id"].iloc[0])
        table, stash, n = _build_arrays(pdf["url_hash"].to_numpy(), nb)
        return pd.DataFrame(
            {
                "segment_id": [seg],
                "ctable": [table.tobytes()],
                "stash": [stash.tobytes()],
                "n_items": [n],
                "n_buckets": [nb],
            }
        )

    return (
        url_seen.select(
            F.pmod(F.col("url_hash"), F.lit(n_segments)).cast("int").alias("segment_id"),
            "url_hash",
        )
        .groupBy("segment_id")
        .applyInPandas(_build, schema=SEGMENT_SCHEMA)
    )


def _decode(pdf: pd.DataFrame) -> tuple[np.ndarray, np.ndarray, int]:
    """OR-view over one segment's (possibly multiple, un-compacted)
    blobs: re-insert every enumerated fingerprint into one table."""
    nb = int(pdf["n_buckets"].max())
    table = np.zeros((nb, _B), dtype=_FP_DTYPE)
    counts = np.zeros(nb, dtype=np.int64)
    stashes = [np.frombuffer(b, dtype=np.uint64) for b in pdf["stash"] if len(b)]
    extra: list[np.ndarray] = []
    for blob in pdf["ctable"]:
        t = np.frombuffer(blob, dtype=_FP_DTYPE).reshape(-1, _B)
        bk, sl = np.nonzero(t)
        if bk.size:
            extra.append(_bulk_insert(table, counts, t[bk, sl], bk, nb))
    stash = np.unique(np.concatenate(stashes + extra)) if (stashes or extra) else (
        np.empty(0, dtype=np.uint64)
    )
    return table, stash, nb


def merge_segments(prev: DataFrame, delta: DataFrame) -> DataFrame:
    """Compaction: merge each segment's accumulated delta tables into
    one by re-inserting enumerated (bucket, fingerprint) entries —
    possible without the original keys because alt() is an involution
    of (bucket, fp). Same generation size required (resize = rebuild
    from the exact url_seen table, which compaction already pays)."""

    def _merge(pdf: pd.DataFrame) -> pd.DataFrame:
        seg = int(pdf["segment_id"].iloc[0])
        table, stash, nb = _decode(pdf)
        return pd.DataFrame(
            {
                "segment_id": [seg],
                "ctable": [table.tobytes()],
                "stash": [stash.tobytes()],
                "n_items": [int(pdf["n_items"].sum())],
                "n_buckets": [nb],
            }
        )

    return (
        prev.unionByName(delta).groupBy("segment_id").applyInPandas(
            _merge, schema=SEGMENT_SCHEMA
        )
    )


def required_m_bits(
    total_items: int,
    n_segments: int,
    bits_per_key: float = 16.0 / DEFAULT_MAX_LOAD,
    floor_m_bits: int = DEFAULT_N_BUCKETS,
) -> int:
    """Capacity policy (seam-compatible with urlseen.required_m_bits):
    smallest power-of-two N_BUCKETS (≥ floor) keeping per-segment load
    ≤ DEFAULT_MAX_LOAD. `bits_per_key` is accepted for seam parity; a
    16-bit-fp cuckoo's space is 16/load bits per key, so the load
    target IS the bits-per-key policy."""
    per_seg = max(1, total_items) / max(1, n_segments)
    nb = max(8, int(floor_m_bits))
    while per_seg > DEFAULT_MAX_LOAD * _B * nb:
        nb <<= 1
    return nb


def segment_load(segments: DataFrame) -> tuple[int, int]:
    row = segments.agg(
        F.coalesce(F.sum("n_items"), F.lit(0)).alias("n"),
        F.coalesce(F.max("n_buckets"), F.lit(DEFAULT_N_BUCKETS)).alias("m"),
    ).collect()[0]
    return int(row["n"]), int(row["m"])


def segment_bytes(m_bits: int) -> int:
    """Bytes per segment for size param m_bits (= n_buckets here)."""
    return int(m_bits) * _B * 2


def _probe_cogroup(
    candidates: DataFrame, segments: DataFrame, n_segments: int
) -> DataFrame:
    """Partition-local probe (cf. urlseen._probe_cogroup): candidates
    cogroup with their co-located segment blobs on segment_id, so each
    task loads only its own tables; multiple un-compacted delta blobs
    are merged into one view on the fly."""
    from pyspark.sql.types import BooleanType, StructField, StructType

    cands_seg = candidates.withColumn(
        "_seg", F.pmod(F.col("url_hash"), F.lit(n_segments)).cast("int")
    )
    out_schema = StructType(
        list(cands_seg.schema.fields) + [StructField("maybe_seen", BooleanType())]
    )

    def _probe(cand_pdf: pd.DataFrame, seg_pdf: pd.DataFrame) -> pd.DataFrame:
        if cand_pdf.empty:
            return cand_pdf.assign(maybe_seen=pd.Series([], dtype=bool))
        h = cand_pdf["url_hash"].to_numpy()
        if seg_pdf.empty:
            out = np.zeros(len(h), dtype=bool)
        else:
            table, stash, nb = _decode(seg_pdf)
            out = _probe_arrays(table, stash, h, nb)
        res = cand_pdf.copy()
        res["maybe_seen"] = out
        return res

    return (
        cands_seg.groupBy("_seg")
        .cogroup(segments.groupBy("segment_id"))
        .applyInPandas(_probe, schema=out_schema)
        .drop("_seg")
    )


def _probe_broadcast(
    candidates: DataFrame, segments: DataFrame, n_segments: int
) -> DataFrame:
    """Broadcast probe (cf. urlseen._probe_broadcast): only eligible
    when the configured aggregate table size fits executors."""
    by_seg: dict[int, list] = {}
    for r in segments.collect():
        by_seg.setdefault(int(r["segment_id"]), []).append(r)
    merged: dict[int, tuple[np.ndarray, np.ndarray, int]] = {
        sid: _decode(pd.DataFrame([row.asDict() for row in rows]))
        for sid, rows in by_seg.items()
    }
    spark = candidates.sparkSession
    bc = spark.sparkContext.broadcast(merged)

    @F.pandas_udf("boolean")
    def _probe(url_hash: pd.Series) -> pd.Series:
        tables = bc.value
        h = url_hash.to_numpy()
        segs = (h % n_segments + n_segments) % n_segments
        out = np.zeros(len(h), dtype=bool)
        for seg in np.unique(segs):
            entry = tables.get(int(seg))
            if entry is None:
                continue
            table, stash, nb = entry
            mask = segs == seg
            out[mask] = _probe_arrays(table, stash, h[mask], nb)
        return pd.Series(out)

    return candidates.withColumn("maybe_seen", _probe(F.col("url_hash")))


BROADCAST_MAX_BYTES = 64 << 20  # same small-side rule as the bloom backend


def probe_maybe_seen(
    candidates: DataFrame,
    segments: DataFrame,
    n_segments: int = 16,
    total_bloom_bytes: int | None = None,
) -> DataFrame:
    if total_bloom_bytes is not None and total_bloom_bytes <= BROADCAST_MAX_BYTES:
        return _probe_broadcast(candidates, segments, n_segments)
    return _probe_cogroup(candidates, segments, n_segments)


def filter_new(
    candidates: DataFrame,
    url_seen: DataFrame,
    segments: DataFrame | None = None,
    n_segments: int = 16,
    total_bloom_bytes: int | None = None,
) -> DataFrame:
    """Rows of `candidates` whose url_hash is NOT in url_seen — cuckoo
    fast path + exact anti-join backstop; identical output to the plain
    anti-join by construction (tested; same contract as
    urlseen.filter_new, including the storage-bucketing note there)."""
    if segments is None:
        return candidates.join(url_seen.select("url_hash"), "url_hash", "left_anti")
    probed = probe_maybe_seen(candidates, segments, n_segments, total_bloom_bytes)
    definite_new = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
    suspects = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
    confirmed_new = suspects.join(url_seen.select("url_hash"), "url_hash", "left_anti")
    return definite_new.unionByName(confirmed_new)


# ---------------------------------------------------------------------------
# deletion / expiry (the cuckoo-only capability)
# ---------------------------------------------------------------------------


def delete_fps(
    segments: DataFrame, expired: DataFrame, n_segments: int = 16
) -> DataFrame:
    """In-place fingerprint deletion (cheap path): cogroup expired url
    hashes with their segment and clear one stored copy per key from
    the first blob that holds it. Collateral-collision caveat in the
    module docstring — deployments needing exactness use `expire`."""

    def _del(exp_pdf: pd.DataFrame, seg_pdf: pd.DataFrame) -> pd.DataFrame:
        if seg_pdf.empty:
            return seg_pdf
        if exp_pdf.empty:
            return seg_pdf
        h = exp_pdf["url_hash"].to_numpy()
        out = []
        remaining = np.unique(h)
        for _, row in seg_pdf.iterrows():
            nb = int(row["n_buckets"])
            table = (
                np.frombuffer(row["ctable"], dtype=_FP_DTYPE)
                .reshape(-1, _B)
                .copy()
            )
            stash = np.frombuffer(row["stash"], dtype=np.uint64).copy()
            if remaining.size:
                present = _probe_arrays(table, stash, remaining, nb)
                stash = _delete_arrays(table, stash, remaining[present], nb)
                remaining = remaining[~present]
            out.append(
                {
                    "segment_id": int(row["segment_id"]),
                    "ctable": table.tobytes(),
                    "stash": stash.tobytes(),
                    "n_items": int(row["n_items"]),
                    "n_buckets": nb,
                }
            )
        return pd.DataFrame(out)

    exp_seg = expired.select(
        "url_hash",
        F.pmod(F.col("url_hash"), F.lit(n_segments)).cast("int").alias("_seg"),
    )
    return (
        exp_seg.groupBy("_seg")
        .cogroup(segments.groupBy("segment_id"))
        .applyInPandas(_del, schema=SEGMENT_SCHEMA)
    )


def expire(
    url_seen: DataFrame,
    segments: DataFrame,
    expired: DataFrame,
    n_segments: int = 16,
    m_bits: int = DEFAULT_N_BUCKETS,
) -> tuple[DataFrame, DataFrame]:
    """Exact expiry: (url_seen', segments') with `expired(url_hash)`
    rows removed. The seen table anti-joins the expired set; ONLY the
    touched segments are rebuilt from the post-expiry truth (exact —
    heals any prior in-place-delete collateral), untouched segments
    pass through unchanged. O(keys in expired segments), never O(seen)."""
    seen_next = url_seen.join(
        expired.select("url_hash"), "url_hash", "left_anti"
    )
    touched = expired.select(
        F.pmod(F.col("url_hash"), F.lit(n_segments)).cast("int").alias("segment_id")
    ).distinct()
    rebuilt = build_segments(
        seen_next.join(
            F.broadcast(touched),
            F.pmod(F.col("url_hash"), F.lit(n_segments)).cast("int")
            == F.col("segment_id"),
            "left_semi",
        ),
        n_segments,
        m_bits,
    )
    untouched = segments.join(F.broadcast(touched), "segment_id", "left_anti")
    return seen_next, untouched.unionByName(rebuilt)
