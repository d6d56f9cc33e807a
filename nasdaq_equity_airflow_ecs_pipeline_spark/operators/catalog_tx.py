"""Multi-table transactions: a catalog-level commit log over
``VersionedTable`` (operators/versioned.py).

Why: the reference pipeline publishes a fact table and three aggregation
tables as SEPARATE commits (glue/jobs/build_stock_fact_table.py then
build_stock_aggregations.py:80-217) — a consumer can observe a new fact
snapshot with stale aggregates between jobs. Lakehouse engines close this
gap with a transaction spanning tables (Delta commit coordination /
Iceberg multi-table catalogs a la Nessie): data files for every table are
staged first, then ONE atomic catalog pointer swap makes all of them
visible together.

Mechanism (two levels of indirection, all files immutable):
- each table is a ``VersionedTable`` (parquet + per-version manifests);
- the catalog log (``_txlog/t{N}.json``) pins an exact version per table:
  ``{"tx": N, "tables": {"fact": 3, "weekly": 5}}``;
- ``Transaction.commit()`` writes every staged table's data as a new
  TABLE version (invisible to catalog readers), then claims the next
  catalog version via hard-link compare-and-swap. Readers resolving
  table versions through a catalog snapshot see all of a transaction's
  writes or none — a crash between stage and swap only orphans files
  (cleaned by vacuum), never publishes a partial transaction.
- write-write conflicts are detected at commit: if another transaction
  advanced a staged table since ``begin()``, commit raises
  ``TxConflictError`` (first-committer-wins, same as Delta).

Scale note: the log holds pointers, not data — a commit is O(tables
touched) metadata I/O regardless of data volume, and executors never
touch the log (driver-side metadata only, like Delta's _delta_log).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from .upsert import merge_upsert
from .versioned import VersionedTable

_TXLOG_DIR = "_txlog"


class TxConflictError(RuntimeError):
    """Another transaction committed a staged table first."""


class TransactionalCatalog:
    """A directory of versioned tables with atomic multi-table commits."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(os.path.join(root, _TXLOG_DIR), exist_ok=True)

    # ---------------------------------------------------------------- log
    def tx_versions(self) -> list[int]:
        d = os.path.join(self.root, _TXLOG_DIR)
        return sorted(
            int(f[1:-5]) for f in os.listdir(d)
            if f.startswith("t") and f.endswith(".json")
        )

    def current_tx(self) -> int | None:
        vs = self.tx_versions()
        return vs[-1] if vs else None

    def _snapshot(self, tx: int | None = None) -> dict[str, int]:
        """table -> pinned table-version at catalog version ``tx``."""
        tx = self.current_tx() if tx is None else tx
        if tx is None:
            return {}
        p = os.path.join(self.root, _TXLOG_DIR, f"t{tx}.json")
        with open(p) as f:
            return json.load(f)["tables"]

    def _table(self, name: str) -> VersionedTable:
        return VersionedTable(self.spark, os.path.join(self.root, name))

    # --------------------------------------------------------------- read
    def read(self, name: str, tx: int | None = None) -> DataFrame:
        """Read ``name`` as pinned by catalog version ``tx`` (default
        head). Two reads at the same ``tx`` are mutually consistent even
        while commits land in between (snapshot isolation): pass
        ``tx=catalog.current_tx()`` to hold one snapshot across reads."""
        pins = self._snapshot(tx)
        if name not in pins:
            raise FileNotFoundError(f"table {name!r} not in catalog snapshot")
        return self._table(name).read(pins[name])

    def tables(self, tx: int | None = None) -> list[str]:
        return sorted(self._snapshot(tx))

    # -------------------------------------------------------------- write
    def begin(self) -> "Transaction":
        return Transaction(self)


class Transaction:
    """Staged multi-table write-set; all-or-nothing on commit."""

    def __init__(self, catalog: TransactionalCatalog):
        self.catalog = catalog
        self.base_tx = catalog.current_tx()
        self.base_pins = catalog._snapshot(self.base_tx)
        self._staged: dict[str, tuple[str, DataFrame, list[str] | None]] = {}
        self.committed_tx: int | None = None

    def write(self, name: str, df: DataFrame) -> "Transaction":
        """Stage a full overwrite of ``name``."""
        self._staged[name] = ("overwrite", df, None)
        return self

    def upsert(self, name: str, df: DataFrame, keys: list[str]) -> "Transaction":
        """Stage a keyed MERGE into ``name`` (against this transaction's
        snapshot of the table — concurrent merges conflict, by design)."""
        self._staged[name] = ("upsert", df, keys)
        return self

    def read(self, name: str) -> DataFrame:
        """Read within the transaction: staged overwrite frames are not
        visible (they are unwritten plans); reads resolve against the
        transaction's base snapshot — standard snapshot isolation."""
        if name not in self.base_pins:
            raise FileNotFoundError(f"table {name!r} not in base snapshot")
        return self.catalog._table(name).read(self.base_pins[name])

    def commit(self) -> int:
        """Stage data, then one hard-link CAS on the catalog log.

        Ordering: (1) every staged table's data is fully written as a new
        table version — crash here publishes nothing; (2) the catalog
        version is claimed; losing the CAS race re-checks conflicts
        against the new head and re-points (data is NOT rewritten — table
        versions are immutable and already safe)."""
        if self.committed_tx is not None:
            raise RuntimeError("transaction already committed")
        if not self._staged:
            raise ValueError("empty transaction")
        self._check_conflicts(self.base_pins, self.catalog.current_tx())
        new_pins: dict[str, int] = {}
        for name, (mode, df, keys) in self._staged.items():
            vt = self.catalog._table(name)
            if mode == "upsert":
                base_version = self.base_pins.get(name)
                target = None if base_version is None else vt.read(base_version)
                df = merge_upsert(target, df, keys)
            new_pins[name] = vt.commit(df)
        while True:
            head = self.catalog.current_tx()
            self._check_conflicts(self.base_pins, head)
            pins = dict(self.catalog._snapshot(head))
            pins.update(new_pins)
            tx = (head + 1) if head is not None else 0
            d = os.path.join(self.catalog.root, _TXLOG_DIR)
            tmp = os.path.join(d, f".tmp_{uuid.uuid4().hex[:8]}")
            with open(tmp, "w") as f:
                json.dump({"tx": tx, "tables": pins}, f)
            try:
                os.link(tmp, os.path.join(d, f"t{tx}.json"))
                self.committed_tx = tx
                return tx
            except FileExistsError:
                continue  # lost the race; re-validate against new head
            finally:
                os.remove(tmp)

    def _check_conflicts(self, base: dict[str, int], head_tx: int | None) -> None:
        head = self.catalog._snapshot(head_tx)
        for name in self._staged:
            if head.get(name) != base.get(name):
                raise TxConflictError(
                    f"table {name!r} advanced to v{head.get(name)} "
                    f"(transaction began at v{base.get(name)})"
                )
