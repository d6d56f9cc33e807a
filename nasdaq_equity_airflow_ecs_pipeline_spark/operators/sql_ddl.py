"""SQL DDL/DML front over the name-addressed catalog — the last piece of
the "a user types SQL against named tables" story (reference K2/K3/K7:
``CREATE TABLE glue_catalog.db.t``, ``CREATE OR REPLACE``, the
existence-probed write branch; glue/jobs/build_stock_fact_table.py:84-111
and build_stock_dimensions.py:60-75).

Statements (regex-parsed like ``operators/merge_sql.py`` — a thin front,
not a SQL engine; anything heavier goes through ``spark.sql`` directly):

- ``CREATE [OR REPLACE] TABLE <name> AS <select>``      (CTAS)
- ``INSERT INTO <name> <select>``                       (append commit)
- ``ALTER TABLE <name> ADD COLUMN <col> <type>``       (metadata-only)
- ``DROP TABLE [IF EXISTS] <name>``
- ``OPTIMIZE <name> [INTO <n> PARTITIONS]``            (compaction)
- ``VACUUM <name> [RETAIN <n> VERSIONS]``              (snapshot expiry)
- ``SHOW TABLES [IN <db>]``
- ``DESCRIBE <name>`` / ``DESCRIBE HISTORY <name>``    (schema / commits)
- ``SELECT ... FROM <name> [FOR VERSION AS OF <n>] ...``(time travel)

Catalog-qualified names inside any SELECT body are resolved by
registering each referenced table as a temp view of its committed state
and rewriting the name — so a CTAS can read other catalog tables, and
plain ``spark.sql`` handles everything downstream of name resolution
(Catalyst sees one plan; pushdown/pruning apply as usual).

Versioning semantics ride ``operators/versioned.py``: CREATE commits
version 0, CREATE OR REPLACE and INSERT INTO commit new versions (old
snapshots stay readable — time travel works across both), and DROP is
the only operation that destroys history.
"""

from __future__ import annotations

import os
import re
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

from ..sources.catalog import NameCatalog

_CTAS = re.compile(
    r"^\s*CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+([\w.]+)\s+AS\s+(.*)$",
    re.IGNORECASE | re.DOTALL,
)
_INSERT = re.compile(
    r"^\s*INSERT\s+INTO\s+([\w.]+)\s+(.*)$", re.IGNORECASE | re.DOTALL
)
_DROP = re.compile(
    r"^\s*DROP\s+TABLE\s+(IF\s+EXISTS\s+)?([\w.]+)\s*$", re.IGNORECASE
)
_ALTER_ADD = re.compile(
    r"^\s*ALTER\s+TABLE\s+([\w.]+)\s+ADD\s+COLUMN\s+(\w+)\s+([\w()]+)\s*$",
    re.IGNORECASE,
)
_OPTIMIZE = re.compile(
    r"^\s*OPTIMIZE\s+([\w.]+)(?:\s+INTO\s+(\d+)\s+PARTITIONS)?\s*$",
    re.IGNORECASE,
)
_VACUUM = re.compile(
    r"^\s*VACUUM\s+([\w.]+)(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?\s*$",
    re.IGNORECASE,
)
_SHOW = re.compile(
    r"^\s*SHOW\s+TABLES(?:\s+IN\s+(\w+))?\s*$", re.IGNORECASE
)
_DESCRIBE = re.compile(
    r"^\s*DESCRIBE\s+(HISTORY\s+)?([\w.]+)\s*$", re.IGNORECASE
)
_SELECT = re.compile(r"^\s*(SELECT|WITH)\b", re.IGNORECASE)
_TIME_TRAVEL = re.compile(
    r"([\w.]+)\s+FOR\s+VERSION\s+AS\s+OF\s+(\d+)", re.IGNORECASE
)


class SqlFront:
    """Execute catalog-addressed SQL statements; every method returns a
    DataFrame (DDL returns a one-row status frame, like ``spark.sql``'s
    command output)."""

    def __init__(self, catalog: NameCatalog):
        self.cat = catalog
        self.spark: SparkSession = catalog.spark
        # session-unique prefix: temp views are session-GLOBAL, so two
        # SqlFront instances sharing a session must never reuse a name
        # (a lazily-held result frame would silently re-read the other
        # front's table)
        self._view_prefix = f"__cat_view_{uuid.uuid4().hex[:8]}"
        self._view_n = 0

    # ------------------------------------------------- name resolution
    def _resolve_names(self, body: str, created: list[str]) -> str:
        """Register temp views for every catalog table referenced in a
        SELECT body and rewrite the references. Handles optional
        ``FOR VERSION AS OF n`` time travel per reference. View names
        are appended to ``created`` so the caller can drop them once the
        statement is analyzed."""

        def sub_tt(m: re.Match) -> str:
            name, version = m.group(1), int(m.group(2))
            return self._as_view(name, created, version)

        body = _TIME_TRAVEL.sub(sub_tt, body)
        # longest (most-qualified) names first so `cat.db.t` never
        # partially matches as `db.t`
        pat = re.compile(
            rf"\b{re.escape(self.cat.catalog_name)}\.(\w+)\.(\w+)\b"
        )
        return pat.sub(
            lambda m: self._as_view(f"{m.group(1)}.{m.group(2)}", created),
            body,
        )

    def _as_view(
        self, name: str, created: list[str], version: int | None = None
    ) -> str:
        if not self.cat.table_exists(name):
            raise ValueError(f"table {name!r} does not exist")
        self._view_n += 1
        view = f"{self._view_prefix}_{self._view_n}"
        self.cat.read(name, version=version).createOrReplaceTempView(view)
        created.append(view)
        return view

    def _sql_resolved(self, body: str) -> DataFrame:
        """``spark.sql`` over a name-resolved body, dropping the statement's
        temp views right after analysis. ``spark.sql`` binds view plans
        eagerly during analysis, so the returned (still lazy) DataFrame
        stays valid — without the drop, a long-lived session (bench loop,
        REPL) accumulates one session-global view per table reference per
        statement, each pinning a snapshot's file listing (ADVICE r4)."""
        created: list[str] = []
        sql = self._resolve_names(body, created)
        try:
            return self.spark.sql(sql)
        finally:
            for v in created:
                self.spark.catalog.dropTempView(v)

    def _versioned_table(self, name: str):
        """VersionedTable handle for DML/maintenance, migrating a
        plain-parquet table (the pipeline's cow-upsert layout) into the
        versioned layout on first touch: its current content becomes
        version 0 and the loose files are removed once the commit is
        durable — after which every statement (INSERT/ALTER/OPTIMIZE/
        VACUUM/time travel) has the transaction log it needs."""
        if not self.cat.table_exists(name):
            raise ValueError(f"table {name!r} does not exist")
        path = self.cat.resolve(name)
        if not self.cat._is_versioned(path):
            df = self.spark.read.parquet(path)
            t = self.cat.table(name)
            t.commit(df)  # durable v0 of the existing content
            for entry in os.listdir(path):
                if entry.endswith(".parquet") or "=" in entry:
                    full = os.path.join(path, entry)
                    (shutil.rmtree if os.path.isdir(full) else os.remove)(full)
            return t
        return self.cat.table(name)

    def _status(self, **kv) -> DataFrame:
        cols = ", ".join(f"{k} string" for k in kv)
        return self.spark.createDataFrame([tuple(kv.values())], cols)

    # --------------------------------------------------------- execute
    def execute(self, sql: str) -> DataFrame:
        sql = sql.strip().rstrip(";")
        if m := _CTAS.match(sql):
            replace, name, body = bool(m.group(1)), m.group(2), m.group(3)
            if self.cat.table_exists(name) and not replace:
                raise ValueError(
                    f"table {name!r} already exists (use CREATE OR REPLACE)"
                )
            df = self._sql_resolved(body)
            v = self.cat.table(name).commit(df)
            return self._status(op="CREATE", table=name, version=str(v))
        if m := _INSERT.match(sql):
            name, body = m.group(1), m.group(2)
            t = self._versioned_table(name)
            df = self._sql_resolved(body)
            # SQL INSERT ... SELECT is by POSITION: arity must match, the
            # select's columns take the table's names (standard behavior)
            tcols = [f.name for f in t.schema().fields]
            if len(df.columns) != len(tcols):
                raise ValueError(
                    f"INSERT arity {len(df.columns)} does not match table "
                    f"{name!r} schema {tcols}"
                )
            v = t.append(df.toDF(*tcols))
            return self._status(op="INSERT", table=name, version=str(v))
        if m := _ALTER_ADD.match(sql):
            name, col, ddl_type = m.group(1), m.group(2), m.group(3)
            v = self._versioned_table(name).add_column(col, ddl_type)
            return self._status(op="ALTER", table=name, version=str(v))
        if m := _DROP.match(sql):
            if_exists, name = bool(m.group(1)), m.group(2)
            exists = self.cat.table_exists(name)
            if not exists and not if_exists:
                raise ValueError(f"table {name!r} does not exist")
            if exists:
                shutil.rmtree(self.cat.resolve(name), ignore_errors=True)
            return self._status(
                op="DROP", table=name, dropped=str(exists).lower()
            )
        if m := _OPTIMIZE.match(sql):
            name, nparts = m.group(1), int(m.group(2) or 8)
            v = self._versioned_table(name).compact(nparts)
            return self._status(op="OPTIMIZE", table=name, version=str(v))
        if m := _VACUUM.match(sql):
            name, keep = m.group(1), int(m.group(2) or 2)
            removed = self._versioned_table(name).vacuum(keep_last=keep)
            return self._status(
                op="VACUUM", table=name, files_removed=str(len(removed))
            )
        if m := _DESCRIBE.match(sql):
            history, name = bool(m.group(1)), m.group(2)
            if not self.cat.table_exists(name):
                raise ValueError(f"table {name!r} does not exist")
            if history:  # Delta DESCRIBE HISTORY analog: one row per commit
                # read-only statement: must NOT trigger the versioned-
                # layout migration (_versioned_table rewrites storage and
                # deletes the loose parquet files — reserved for actual
                # DML). An unversioned table simply has no commit log yet:
                # empty history frame (ADVICE r4).
                if not self.cat._is_versioned(self.cat.resolve(name)):
                    return self.spark.createDataFrame(
                        [],
                        "version int, commit_ts double, n_files int, "
                        "n_added_columns int",
                    )
                t = self.cat.table(name)
                rows = [
                    (
                        v,
                        float(t._manifest(v)["ts"]),
                        len(t._manifest(v)["files"]),
                        len(t._manifest(v).get("added_columns", [])),
                    )
                    for v in t.versions()
                ]
                return self.spark.createDataFrame(
                    rows,
                    "version int, commit_ts double, n_files int, n_added_columns int",
                )
            schema = self.cat.read(name).schema
            return self.spark.createDataFrame(
                [(f.name, f.dataType.simpleString()) for f in schema.fields],
                "col_name string, data_type string",
            )
        if m := _SHOW.match(sql):
            names = self.cat.list_tables(m.group(1))
            return self.spark.createDataFrame(
                [(n,) for n in names] or [], "table_name string"
            )
        if _SELECT.match(sql):
            return self._sql_resolved(sql)
        raise ValueError(f"unsupported statement: {sql[:60]!r}")
