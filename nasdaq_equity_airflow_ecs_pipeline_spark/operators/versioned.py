"""Versioned table: manifest-committed parquet (a minimal Iceberg/Delta-
style transaction log) for atomic multi-partition writes.

Why: plain directory writes are only atomic per directory rename, and
dynamic partition overwrite (operators/upsert.py cow path) swaps each
partition dir independently — a crash mid-commit leaves a mixed table.
The lakehouse fix is indirection: data files are immutable and
write-once; a tiny manifest (one JSON per version) lists the files that
ARE the table; committing = atomically renaming the next manifest into
place. Readers resolve the manifest first, so they see version N or
N+1, never a blend. Old versions remain readable (time travel) until
vacuumed.

This is the local stand-in for the reference's Iceberg format-version-2
tables (glue/jobs/build_stock_fact_table.py:98-111) — same guarantees,
no extension jars.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import latest_wins  # noqa: F401  (re-exported convenience)
from .upsert import merge_upsert

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"


class VersionedTable:
    """Parquet files + JSON manifests under one root."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(os.path.join(root, _MANIFEST_DIR), exist_ok=True)
        os.makedirs(os.path.join(root, _DATA_DIR), exist_ok=True)

    # ------------------------------------------------------------ versions
    def versions(self) -> list[int]:
        d = os.path.join(self.root, _MANIFEST_DIR)
        return sorted(
            int(f[1:-5]) for f in os.listdir(d)
            if f.startswith("v") and f.endswith(".json")
        )

    def current_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _manifest(self, version: int) -> dict:
        with open(os.path.join(self.root, _MANIFEST_DIR, f"v{version}.json")) as f:
            return json.load(f)

    # -------------------------------------------------------------- write
    def commit(self, df: DataFrame, ts: float | None = None) -> int:
        """Write ``df`` as the table's next version. Data lands in a fresh
        immutable subdir; the version becomes visible only when the
        manifest rename succeeds (atomic on POSIX)."""
        snap_dir = os.path.join(self.root, _DATA_DIR, uuid.uuid4().hex[:12])
        df.write.parquet(snap_dir)
        files = sorted(
            os.path.join(snap_dir, f)
            for f in os.listdir(snap_dir)
            if f.endswith(".parquet")
        )
        return self._publish(files, ts=ts)

    def append(self, df: DataFrame, ts: float | None = None) -> int:
        """Fast append: write only the NEW rows' files and publish them
        alongside the current version's files — existing data is never
        rewritten (Iceberg/Delta append semantics: a metadata-only commit
        over immutable files). The whole-table rewrite path is
        ``commit``; MERGE is ``upsert``."""
        snap_dir = os.path.join(self.root, _DATA_DIR, uuid.uuid4().hex[:12])
        df.write.parquet(snap_dir)
        new_files = sorted(
            os.path.join(snap_dir, f)
            for f in os.listdir(snap_dir)
            if f.endswith(".parquet")
        )
        # the head is re-read INSIDE the commit loop: if a concurrent
        # writer wins the version race, the retry must append onto ITS
        # file list, not the stale pre-race head (else the winner's rows
        # silently vanish from the new head)
        return self._publish_rebased(
            lambda head: (
                (head or {}).get("files", []) + new_files,
                (head or {}).get("added_columns"),
            ),
            ts=ts,
        )

    def _publish_rebased(self, build, ts: float | None = None) -> int:
        """CAS commit whose content is a FUNCTION of the current head:
        ``build(head_manifest_or_None) -> (files, added_columns)`` is
        re-evaluated on every retry, so losing the version race rebases
        the change onto the winner's state instead of clobbering it
        (append/add_column must compose with concurrent commits; a full
        rewrite like ``commit`` is rebase-invariant and uses _publish)."""
        while True:
            cur = self.current_version()
            head = self._manifest(cur) if cur is not None else None
            files, added = build(head)
            v = self._try_publish(
                (cur + 1) if cur is not None else 0, files, ts, added
            )
            if v is not None:
                return v

    def _publish(
        self,
        files: list[str],
        ts: float | None = None,
        added_columns: list[list[str]] | None = None,
    ) -> int:
        """Optimistic-concurrency commit: claim the next version number
        with a hard link (fails with EEXIST if a concurrent writer won the
        race — unlike rename, which silently overwrites) and retry against
        the new head. Matches Iceberg/Delta's compare-and-swap commit.

        ``ts`` (commit wall-clock, injectable for tests) is recorded in
        the manifest — it is what age-based snapshot expiry consults,
        mirroring Iceberg's snapshot timestamp-ms."""
        while True:
            version = (self.current_version() + 1) if self.versions() else 0
            v = self._try_publish(version, files, ts, added_columns)
            if v is not None:
                return v

    def _try_publish(
        self,
        version: int,
        files: list[str],
        ts: float | None,
        added_columns: list[list[str]] | None,
    ) -> int | None:
        """One CAS attempt: link the manifest for ``version``; None means
        a concurrent writer claimed it (caller re-reads head and retries)."""
        tmp = os.path.join(self.root, _MANIFEST_DIR, f".tmp_{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as f:
            json.dump(
                {
                    "version": version,
                    "files": files,
                    "ts": time.time() if ts is None else ts,
                    # metadata-only schema evolution: [name, ddl_type]
                    # pairs appended by add_column(); realized at read
                    # time, no data files rewritten
                    "added_columns": added_columns or [],
                },
                f,
            )
        try:
            os.link(tmp, os.path.join(self.root, _MANIFEST_DIR, f"v{version}.json"))
            return version
        except FileExistsError:
            return None  # lost the race
        finally:
            os.remove(tmp)

    def add_column(self, name: str, ddl_type: str, ts: float | None = None) -> int:
        """Iceberg-style metadata-only ALTER TABLE ADD COLUMN: republish
        the current files with the new column recorded in the manifest —
        zero data rewritten; readers see typed NULLs on historical rows,
        and later appends may populate it (mixed-file schemas merge at
        read). Old snapshots keep their narrower schema."""
        if not self.versions():
            raise FileNotFoundError(f"versioned table {self.root} has no commits")
        if name in [f.name for f in self.schema().fields]:
            raise ValueError(f"column {name!r} already exists")
        return self._publish_rebased(
            lambda head: (
                (head or {}).get("files", []),
                (head or {}).get("added_columns", []) + [[name, ddl_type]],
            ),
            ts=ts,
        )

    # --------------------------------------------------------------- read
    def read(self, version: int | None = None) -> DataFrame:
        v = self.current_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"versioned table {self.root} has no commits")
        m = self._manifest(v)
        files = m["files"]
        if not files:
            raise FileNotFoundError(f"version {v} committed no files")
        # mergeSchema: evolved tables legitimately hold files of mixed
        # width (append after add_column); columns absent from a file
        # read as NULL
        df = self.spark.read.option("mergeSchema", "true").parquet(*files)
        for name, ddl_type in m.get("added_columns", []):
            if name not in df.columns:
                df = df.withColumn(name, F.lit(None).cast(ddl_type))
        return df

    def table_changes(
        self, key: str, payload: list[str],
        from_version: int, to_version: int | None = None,
    ) -> DataFrame:
        """Delta-style change data feed between two committed versions:
        row-level insert/delete/update records derived by diffing the
        snapshots (operators/cdc.py snapshot_diff — null-safe payload
        comparison). ``to_version`` defaults to the current head."""
        from .cdc import snapshot_diff

        v2 = self.current_version() if to_version is None else to_version
        return snapshot_diff(
            self.read(version=from_version), self.read(version=v2),
            key=key, payload=payload,
        )

    # -------------------------------------------------------------- upsert
    def upsert(
        self,
        source: DataFrame,
        keys: list[str],
        evolve_schema: bool = False,
        delete_condition=None,
        ts: float | None = None,
    ) -> int:
        """Keyed MERGE as a new version: read current, merge, commit.
        Readers of the old version are unaffected (snapshot isolation).

        ``evolve_schema=True`` = Iceberg mergeSchema-on-MERGE: a source
        column absent from the table is added to the table schema (NULL
        on historical rows — old snapshots keep their narrower schema,
        exactly like Iceberg schema evolution: metadata-only, no data
        rewrite of prior versions). A table column absent from the source
        inserts as NULL. Off by default — silent widening hides producer
        bugs."""
        target = self.read() if self.versions() else None
        merged = merge_upsert(
            target, source, keys,
            evolve_schema=evolve_schema,
            delete_condition=delete_condition,
        )
        return self.commit(merged, ts=ts)

    def schema(self, version: int | None = None):
        """Schema of a snapshot (time travel over schema evolution)."""
        return self.read(version).schema

    # ------------------------------------------------------------ rollback
    def rollback(self, version: int) -> int:
        """Restore an old snapshot by committing its file list as the new
        head (no data copied — manifests share immutable files). The full
        target manifest is republished — files AND its recorded
        added_columns — so rolling back past (or onto) a metadata-only
        ALTER TABLE ADD COLUMN restores exactly that snapshot's schema."""
        m = self._manifest(version)
        return self._publish(m["files"], added_columns=m.get("added_columns"))

    # ------------------------------------------------------------- compact
    def compact(self, target_partitions: int) -> int:
        """Small-file compaction: rewrite the current snapshot into
        ``target_partitions`` files as a new version. Streaming MERGE
        sinks accrete small files; compaction restores scan efficiency
        without blocking readers (they keep their snapshot)."""
        df = self.read().coalesce(target_partitions)
        return self.commit(df)

    def vacuum(self, keep_last: int = 2) -> list[str]:
        """Drop manifests older than the last ``keep_last`` versions and
        delete data files no surviving manifest references."""
        vs = self.versions()
        return self._expire(vs[:-keep_last])

    def expire_snapshots(
        self,
        older_than_ts: float,
        keep_last: int = 1,
        now: float | None = None,
    ) -> list[str]:
        """Age-based snapshot expiry — Iceberg's ``expireSnapshots(
        olderThan)`` / the reference's S3 lifecycle expiration rules
        (terraform/modules/s3/main.tf:43-47: raw data 90 days, logs 30).

        Expires every version whose commit ``ts`` predates
        ``older_than_ts``, but always retains the newest ``keep_last``
        versions regardless of age (a table must stay readable even if
        nothing was written within the window). Returns removed data
        files. Manifests written before timestamps existed are treated as
        infinitely old."""
        del now  # accepted for API symmetry; expiry compares commit ts only
        vs = self.versions()
        protected = set(vs[-keep_last:]) if keep_last else set()
        dead = [
            v for v in vs
            if v not in protected
            and self._manifest(v).get("ts", float("-inf")) < older_than_ts
        ]
        return self._expire(dead)

    def _expire(self, dead: list[int]) -> list[str]:
        """Remove ``dead`` manifests + any data files only they reference
        (reachability over the SURVIVING manifests, so shared immutable
        files — e.g. after rollback — are never deleted)."""
        dead_set = set(dead)
        keep_files: set[str] = set()
        for v in self.versions():
            if v not in dead_set:
                keep_files.update(self._manifest(v)["files"])
        removed = []
        for v in dead:
            for f in self._manifest(v)["files"]:
                if f not in keep_files and os.path.exists(f):
                    os.remove(f)
                    removed.append(f)
            os.remove(os.path.join(self.root, _MANIFEST_DIR, f"v{v}.json"))
        return removed
