"""Snapshot-versioned table storage — Iceberg-contract facade over parquet.

The north rule mandates per-round checkpoints with per-partition lineage
(frontier snapshot, bloom segments, robots cache, fetch metrics) so a
crawl resumes exactly from any round. The sandbox has no Iceberg runtime
jar (checked: pyspark 4.1.2 ships none), so the same snapshot semantics
are implemented over versioned parquet directories:

    warehouse/<table>/snap-<round>/part-*.parquet     immutable data files
    warehouse/<table>/_commit-<round>.json            commit manifest
    warehouse/_round-<round>.DONE                     atomic round marker

A round is visible iff its round marker exists; the marker is written
LAST via os.replace (atomic on POSIX), so a crash mid-round leaves only
invisible orphan files — replay-safe, exactly like an Iceberg snapshot
commit. ``TableIO`` is a thin facade: swapping in real Iceberg means
replacing read/write with ``spark.table`` / ``writeTo(...).append`` and
the round marker with a catalog transaction; no caller changes.

Reference analogue: the crawler save-file (README.md:50-51,122-127) —
delete warehouse = restart from seeds; otherwise resume from the latest
committed round (ST4).
"""

from __future__ import annotations

import json
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

_ROUND_RE = re.compile(r"_round-(\d+)\.DONE$")


class TableIO:
    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)

    # ----------------------------------------------------------- rounds

    def committed_rounds(self) -> list[int]:
        out = []
        for f in os.listdir(self.warehouse):
            m = _ROUND_RE.search(f)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def latest_round(self) -> int | None:
        rounds = self.committed_rounds()
        return rounds[-1] if rounds else None

    def commit_round(self, round_no: int) -> None:
        """Atomic visibility flip for everything staged under this round."""
        tmp = os.path.join(self.warehouse, f"._round-{round_no}.tmp")
        final = os.path.join(self.warehouse, f"_round-{round_no}.DONE")
        with open(tmp, "w") as f:
            json.dump({"round": round_no}, f)
        os.replace(tmp, final)

    def destroy(self) -> None:
        shutil.rmtree(self.warehouse, ignore_errors=True)
        os.makedirs(self.warehouse, exist_ok=True)

    # ----------------------------------------------------------- tables

    def _snap_dir(self, table: str, round_no: int) -> str:
        return os.path.join(self.warehouse, table, f"snap-{round_no:06d}")

    def stage(
        self,
        table: str,
        df: DataFrame,
        round_no: int,
        mode: str = "overwrite",
        n_files: int = 4,
        base: bool = False,
        props: dict | None = None,
    ) -> None:
        """Write a snapshot of `table` for `round_no` (invisible until
        commit_round).

        mode="overwrite": the snapshot is the full table state (read()
        returns the latest visible snapshot) — used for mutable state
        like the frontier.
        mode="append": the snapshot holds only this round's DELTA rows
        (read() unions all visible snapshots) — the Iceberg append-files
        shape; used for url_seen / fingerprints / extracted / metrics so
        a round writes O(new rows), never O(table).

        base=True (append tables): this snapshot REPLACES all earlier
        snapshots — the COMPACTION commit (Iceberg
        rewrite-data-files). read() unions from the latest visible base
        forward, so the read fan-in is bounded by the compaction cadence
        instead of growing O(rounds); prune_compacted() reclaims the
        superseded files after commit.

        props: small JSON-able key-values recorded in the commit
        manifest (e.g. the bloom generation's m_bits) — the Iceberg
        table-properties shape; read back via table_props().

        The frontier itself uses overwrite (copy-on-write): a round
        rewrites O(frontier) data files for O(batch) status flips. On
        real Iceberg the same commit is a MERGE with merge-on-read
        deletes — O(delta) writes, with compaction amortized off the
        round path. The facade keeps copy-on-write because parquet has
        no delete-file read path; callers are unaffected either way.
        """
        path = self._snap_dir(table, round_no)
        # write compaction: snapshot deltas are small relative to the
        # executor count — without coalesce every stage writes one file
        # per shuffle partition and append-mode reads degrade into a
        # small-files storm (n_files is the compaction knob; a real
        # deployment sizes it to delta bytes / target file size)
        df.coalesce(max(1, n_files)).write.mode("overwrite").parquet(path)
        manifest = os.path.join(
            self.warehouse, table, f"_commit-{round_no:06d}.json"
        )
        with open(manifest, "w") as f:
            json.dump(
                {
                    "table": table,
                    "round": round_no,
                    "path": path,
                    "mode": mode,
                    "base": bool(base),
                    "props": props or {},
                    # schema-in-manifest (the Iceberg metadata shape):
                    # readers apply it instead of re-inferring from
                    # parquet footers — a per-read driver job saved
                    "schema": df.schema.json(),
                },
                f,
            )

    def _manifest(self, table: str, snap: int) -> dict:
        manifest = os.path.join(
            self.warehouse, table, f"_commit-{snap:06d}.json"
        )
        try:
            with open(manifest) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            return {}

    def _mode(self, table: str, snap: int) -> str:
        return self._manifest(table, snap).get("mode", "overwrite")

    def _visible_rounds(self, table: str, round_no: int | None) -> list[int]:
        committed = set(self.committed_rounds())
        tdir = os.path.join(self.warehouse, table)
        if not os.path.isdir(tdir):
            return []
        snaps = sorted(
            int(d.split("-")[1])
            for d in os.listdir(tdir)
            if d.startswith("snap-")
        )
        vis = [s for s in snaps if s in committed]
        if round_no is not None:
            vis = [s for s in vis if s <= round_no]
        return vis

    def read(self, table: str, round_no: int | None = None) -> DataFrame | None:
        """Time-travel read at round_no: latest visible snapshot for
        overwrite tables; union of visible delta snapshots for append
        tables (Iceberg manifest-union shape), starting from the latest
        visible BASE snapshot — a compaction commit replaces everything
        before it, so read fan-in is bounded by the compaction cadence,
        not crawl age."""
        vis = self._visible_rounds(table, round_no)
        if not vis:
            return None
        m = self._manifest(table, vis[-1])
        reader = self.spark.read
        if m.get("schema"):
            from pyspark.sql.types import StructType

            reader = reader.schema(StructType.fromJson(json.loads(m["schema"])))
        if m.get("mode", "overwrite") == "append":
            for i in range(len(vis) - 1, 0, -1):
                if self._manifest(table, vis[i]).get("base"):
                    vis = vis[i:]
                    break
            return reader.parquet(*[self._snap_dir(table, s) for s in vis])
        return reader.parquet(self._snap_dir(table, vis[-1]))

    def table_props(self, table: str, round_no: int | None = None) -> dict:
        """props of the latest visible commit manifest (Iceberg
        table-properties shape) — driver-side file read, no Spark job."""
        vis = self._visible_rounds(table, round_no)
        if not vis:
            return {}
        return self._manifest(table, vis[-1]).get("props") or {}

    def prune_compacted(self, table: str) -> int:
        """Reclaim append-table snapshots superseded by the latest
        COMMITTED base snapshot (Iceberg expire-snapshots after a
        rewrite). Returns the number of snapshots removed. Idempotent;
        safe after a crash between commit and prune. Time travel to
        rounds before the base is no longer possible for this table —
        the standard expire-snapshots trade."""
        vis = self._visible_rounds(table, None)
        base_idx = None
        for i in range(len(vis) - 1, 0, -1):
            if self._manifest(table, vis[i]).get("base"):
                base_idx = i
                break
        if base_idx is None:
            return 0
        removed = 0
        for s in vis[:base_idx]:
            shutil.rmtree(self._snap_dir(table, s), ignore_errors=True)
            try:
                os.remove(
                    os.path.join(self.warehouse, table, f"_commit-{s:06d}.json")
                )
            except OSError:
                pass
            removed += 1
        return removed

    def gc_orphans(self) -> None:
        """Drop staged-but-never-committed snapshots (crash leftovers)."""
        committed = set(self.committed_rounds())
        for table in os.listdir(self.warehouse):
            tdir = os.path.join(self.warehouse, table)
            if not os.path.isdir(tdir):
                continue
            for d in list(os.listdir(tdir)):
                if d.startswith("snap-") and int(d.split("-")[1]) not in committed:
                    shutil.rmtree(os.path.join(tdir, d), ignore_errors=True)
