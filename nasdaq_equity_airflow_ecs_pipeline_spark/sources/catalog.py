"""Name-addressed catalog front: ``catalog.db.table`` -> warehouse path.

The reference addresses every table through a 3-level name —
``glue_catalog.nasdaq_airflow_warehouse_dev.fact_stock_daily_price`` —
where the Glue Data Catalog maps names to S3 locations and an Iceberg
SparkCatalog resolves them (glue/jobs/build_stock_fact_table.py:84,
terraform/modules/glue/main.tf:79).  Its write path probes the catalog
first and branches CREATE vs MERGE on the result
(build_stock_fact_table.py:88-95 — reference K7).

This is the local analog: a deterministic name->path resolver over a
warehouse root, existence probing against committed table state (not
bare directories), and the same create-vs-merge branch over
``operators.versioned.VersionedTable`` (the Iceberg v2 stand-in).  No
driver-side state beyond the root path — at cluster scale the resolver
maps to object-store prefixes exactly like Glue maps to S3 locations,
so every operation here stays metadata-sized.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

from ..operators.versioned import VersionedTable

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


class NameCatalog:
    """Resolve ``[catalog.]db.table`` / bare ``table`` names to warehouse
    paths and VersionedTable handles.

    ``catalog_name`` plays glue_catalog; names qualified with a DIFFERENT
    catalog are rejected (the reference would route those to another
    SparkCatalog, which does not exist here).  A table "exists" iff it
    has at least one committed version — mkdir'd-but-never-committed
    directories (e.g. a crashed first write) do NOT exist, matching
    Iceberg, where existence is a catalog entry, not an S3 prefix.
    """

    def __init__(
        self,
        spark: SparkSession,
        warehouse_root: str,
        catalog_name: str = "local_catalog",
        default_db: str = "default",
    ):
        self.spark = spark
        self.root = warehouse_root
        self.catalog_name = catalog_name
        self.default_db = default_db
        os.makedirs(warehouse_root, exist_ok=True)

    # ----------------------------------------------------------- resolve
    def _split(self, qualified: str) -> tuple[str, str]:
        parts = qualified.split(".")
        if len(parts) == 3:
            cat, db, tbl = parts
            if cat != self.catalog_name:
                raise ValueError(
                    f"unknown catalog {cat!r} in {qualified!r} "
                    f"(this catalog is {self.catalog_name!r})"
                )
        elif len(parts) == 2:
            db, tbl = parts
        elif len(parts) == 1:
            db, tbl = self.default_db, parts[0]
        else:
            raise ValueError(f"malformed table name {qualified!r}")
        for ident in (db, tbl):
            if not _IDENT.match(ident):
                raise ValueError(
                    f"invalid identifier {ident!r} in {qualified!r} "
                    f"(letters, digits, underscore only — path metachars "
                    f"never reach the filesystem)"
                )
        return db, tbl

    def resolve(self, qualified: str) -> str:
        """Warehouse path for a table name (existing or not)."""
        db, tbl = self._split(qualified)
        return os.path.join(self.root, db, tbl)

    # ------------------------------------------------------------ probe
    def table_exists(self, qualified: str) -> bool:
        """The reference's ``spark.table(name)``-probe analog
        (build_stock_fact_table.py:88-95): True iff the name points at
        readable table state — a committed VersionedTable version, or a
        plain/partitioned parquet directory (the pipeline's cow-upsert
        layout).  A bare mkdir'd directory (crashed first write) does
        NOT exist, matching Iceberg where existence is a catalog entry,
        not an S3 prefix."""
        path = self.resolve(qualified)
        return self._is_versioned(path) or self._is_plain_parquet(path)

    def _is_versioned(self, path: str) -> bool:
        # committed versions, not just a mkdir'd _manifests (which
        # VersionedTable.__init__ creates eagerly — a bare handle must
        # not make a table spring into existence)
        if not os.path.isdir(os.path.join(path, "_manifests")):
            return False
        return VersionedTable(self.spark, path).current_version() is not None

    @staticmethod
    def _is_plain_parquet(path: str) -> bool:
        if not os.path.isdir(path):
            return False
        return any(
            e.endswith(".parquet") or "=" in e for e in os.listdir(path)
        )

    def table(self, qualified: str) -> VersionedTable:
        return VersionedTable(self.spark, self.resolve(qualified))

    def list_tables(self, db: str | None = None) -> list[str]:
        db = db or self.default_db
        if not _IDENT.match(db):
            raise ValueError(f"invalid database name {db!r}")
        d = os.path.join(self.root, db)
        if not os.path.isdir(d):
            return []
        out = []
        for tbl in sorted(os.listdir(d)):
            if self.table_exists(f"{db}.{tbl}"):
                out.append(f"{self.catalog_name}.{db}.{tbl}")
        return out

    # ------------------------------------------------------------ write
    def create_or_merge(
        self,
        qualified: str,
        df: DataFrame,
        keys: list[str],
        **merge_kwargs,
    ) -> int:
        """The reference's K7 write branch: CREATE when the existence
        probe says the table is absent, MERGE on ``keys`` otherwise
        (build_stock_fact_table.py:96-111).  Returns the committed
        version."""
        t = self.table(qualified)
        if not self.table_exists(qualified):
            return t.commit(df)
        return t.upsert(df, keys, **merge_kwargs)

    def read(self, qualified: str, version: int | None = None) -> DataFrame:
        if not self.table_exists(qualified):
            raise ValueError(f"table {qualified!r} does not exist")
        path = self.resolve(qualified)
        if self._is_versioned(path):
            return self.table(qualified).read(version=version)
        if version is not None:
            raise ValueError(
                f"table {qualified!r} is plain parquet — time travel "
                f"needs the versioned layout"
            )
        return self.spark.read.parquet(path)
