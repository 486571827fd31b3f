"""Custom stateful streaming operator: first-seen URL dedup
(`applyInPandasWithState`) — the streaming twin of the batch J5 gate.

An unbounded stream of candidate URLs (url_hash, canon_url) is grouped
by bloom segment id (the same pmod(url_hash, n_segments) key space as
crawler/urlseen.py), and each group keeps its seen-hash set as managed
GroupState. Only first occurrences are emitted — exactly the frontier
admission rule, but incremental: no per-round anti-join, state survives
across micro-batches and restarts via the streaming checkpoint.

Scale notes: state is partitioned by segment (co-located with its
shuffle partition — one executor owns a segment's set, the
applyInPandasWithState contract); per-batch work is vectorized numpy
membership (np.isin against the sorted state array), no per-row Python.
At 10^10 URLs per-segment exact sets become RocksDB-backed state on a
real cluster; the operator shape (key space, schema, update protocol)
is identical.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "segment_id int, url_hash bigint, canon_url string"
STATE_SCHEMA = "seen array<long>"


def _first_seen_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    seen = (
        np.asarray(state.get[0], dtype=np.int64)
        if state.exists
        else np.empty(0, dtype=np.int64)
    )
    for pdf in pdfs:
        pdf = pdf[~pdf["url_hash"].duplicated(keep="first")]
        mask = ~np.isin(pdf["url_hash"].to_numpy(), seen)
        new = pdf[mask]
        if len(new):
            seen = np.concatenate([seen, new["url_hash"].to_numpy()])
            yield pd.DataFrame(
                {
                    "segment_id": np.full(len(new), key[0], dtype=np.int32),
                    "url_hash": new["url_hash"].to_numpy(),
                    "canon_url": new["canon_url"].to_numpy(),
                }
            )
    state.update((seen.tolist(),))


def streaming_first_seen(
    candidates: DataFrame, n_segments: int = 16
) -> DataFrame:
    """candidates — a STREAMING DataFrame with (canon_url string[,
    url_hash bigint]) — → stream of first occurrences only.

    url_hash is derived as xxhash64(canon_url) when absent (F7/J5 key).
    Emission order within a micro-batch is the group's input order;
    across batches, exactly the first delivery of each hash is emitted
    (at-least-once input + idempotent state ⇒ exactly-once output per
    url_hash)."""
    df = candidates
    if "url_hash" not in df.columns:
        df = df.withColumn("url_hash", F.xxhash64("canon_url"))
    keyed = df.withColumn(
        "segment_id", F.pmod(F.col("url_hash"), F.lit(n_segments)).cast("int")
    )
    return keyed.groupBy("segment_id").applyInPandasWithState(
        _first_seen_fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
