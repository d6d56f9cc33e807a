"""SQL DDL front (operators/sql_ddl.py) over the name-addressed catalog:
CTAS / CREATE OR REPLACE / INSERT append / DROP / SHOW / time travel."""

from __future__ import annotations

import pytest

from nasdaq_equity_airflow_ecs_pipeline_spark.operators.sql_ddl import SqlFront
from nasdaq_equity_airflow_ecs_pipeline_spark.sources.catalog import NameCatalog


@pytest.fixture()
def front(spark, tmp_path):
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)],
        "id bigint, grp string, v double",
    ).createOrReplaceTempView("src_rows")
    return SqlFront(NameCatalog(spark, str(tmp_path), catalog_name="cat"))


def test_ctas_select_and_duplicate_rejected(front):
    st = front.execute(
        "CREATE TABLE cat.db1.t AS SELECT id, grp, v FROM src_rows"
    ).collect()[0]
    assert st["op"] == "CREATE" and st["version"] == "0"
    got = front.execute("SELECT sum(v) AS s FROM cat.db1.t").collect()[0]["s"]
    assert got == 60.0
    with pytest.raises(ValueError, match="already exists"):
        front.execute("CREATE TABLE cat.db1.t AS SELECT * FROM src_rows")
    # OR REPLACE commits a new version over the same name
    st = front.execute(
        "CREATE OR REPLACE TABLE cat.db1.t AS "
        "SELECT id, grp, v FROM src_rows WHERE grp = 'a'"
    ).collect()[0]
    assert st["version"] == "1"
    assert front.execute("SELECT count(*) AS n FROM cat.db1.t").collect()[0]["n"] == 2


def test_insert_appends_without_rewriting(front):
    front.execute("CREATE TABLE cat.db1.t AS SELECT id, grp, v FROM src_rows")
    t = front.cat.table("db1.t")
    files_v0 = set(t._manifest(0)["files"])
    front.execute(
        "INSERT INTO cat.db1.t SELECT id + 10, grp, v * 2 FROM src_rows"
    )
    files_v1 = set(t._manifest(1)["files"])
    # append = old files + new files, nothing rewritten
    assert files_v0 < files_v1
    assert front.execute("SELECT count(*) AS n FROM cat.db1.t").collect()[0]["n"] == 6
    # arity mismatch rejected up front
    with pytest.raises(ValueError, match="arity"):
        front.execute("INSERT INTO cat.db1.t SELECT id, grp FROM src_rows")


def test_time_travel_and_joins_across_catalog_tables(front):
    front.execute("CREATE TABLE cat.db1.t AS SELECT id, grp, v FROM src_rows")
    front.execute("INSERT INTO cat.db1.t SELECT id + 10, grp, v FROM src_rows")
    n0 = front.execute(
        "SELECT count(*) AS n FROM cat.db1.t FOR VERSION AS OF 0"
    ).collect()[0]["n"]
    assert n0 == 3
    # a second table + a join across catalog names in one statement
    front.execute(
        "CREATE TABLE cat.db1.dims AS SELECT DISTINCT grp FROM src_rows"
    )
    j = front.execute(
        "SELECT d.grp, count(*) AS n FROM cat.db1.t t "
        "JOIN cat.db1.dims d ON t.grp = d.grp GROUP BY d.grp"
    ).collect()
    assert {r["grp"]: r["n"] for r in j} == {"a": 4, "b": 2}


def test_drop_and_show(front):
    front.execute("CREATE TABLE cat.db1.t AS SELECT * FROM src_rows")
    front.execute("CREATE TABLE cat.db1.u AS SELECT * FROM src_rows")
    names = [r["table_name"] for r in front.execute("SHOW TABLES IN db1").collect()]
    assert names == ["cat.db1.t", "cat.db1.u"]
    assert front.execute("DROP TABLE cat.db1.u").collect()[0]["dropped"] == "true"
    assert [r["table_name"] for r in front.execute("SHOW TABLES IN db1").collect()] == [
        "cat.db1.t"
    ]
    with pytest.raises(ValueError, match="does not exist"):
        front.execute("DROP TABLE cat.db1.u")
    # IF EXISTS swallows the missing table
    assert (
        front.execute("DROP TABLE IF EXISTS cat.db1.u").collect()[0]["dropped"]
        == "false"
    )


def test_alter_add_column_is_metadata_only(front):
    front.execute("CREATE TABLE cat.db1.t AS SELECT id, grp, v FROM src_rows")
    t = front.cat.table("db1.t")
    st = front.execute("ALTER TABLE cat.db1.t ADD COLUMN score DOUBLE").collect()[0]
    assert st["op"] == "ALTER" and st["version"] == "1"
    # zero data rewritten: v1 references exactly v0's files
    assert t._manifest(1)["files"] == t._manifest(0)["files"]
    rows = front.execute("SELECT id, score FROM cat.db1.t").collect()
    assert all(r["score"] is None for r in rows) and len(rows) == 3
    # later INSERT populates the evolved column; historical rows stay NULL
    front.execute(
        "INSERT INTO cat.db1.t SELECT id + 10, grp, v, v * 0.1 FROM src_rows"
    )
    got = front.execute(
        "SELECT count(*) AS n, count(score) AS ns FROM cat.db1.t"
    ).collect()[0]
    assert got["n"] == 6 and got["ns"] == 3
    # old snapshot keeps the narrower schema
    v0 = front.execute("SELECT * FROM cat.db1.t FOR VERSION AS OF 0")
    assert "score" not in v0.columns
    with pytest.raises(ValueError, match="already exists"):
        front.execute("ALTER TABLE cat.db1.t ADD COLUMN score DOUBLE")


def test_unsupported_statement_rejected(front):
    with pytest.raises(ValueError, match="unsupported"):
        front.execute("TRUNCATE TABLE cat.db1.t")


def test_optimize_vacuum_and_table_changes(front, spark):
    front.execute("CREATE TABLE cat.db1.t AS SELECT id, grp, v FROM src_rows")
    front.execute("INSERT INTO cat.db1.t SELECT id + 10, grp, v FROM src_rows")
    front.execute(
        "CREATE OR REPLACE TABLE cat.db1.t AS "
        "SELECT id, grp, v * 2 AS v FROM src_rows"
    )
    t = front.cat.table("db1.t")
    # change data feed v1 -> v2 (head): every surviving id's v doubled
    # (update), the v1-appended ids (11..13) deleted by the replace
    ch = {
        (r["id"], r["change"])
        for r in t.table_changes("id", ["v"], from_version=1).collect()
    }
    assert (1, "update") in ch and (11, "delete") in ch
    # v0 -> v2: the appended ids never existed at v0 -> updates only
    ch0 = {r["change"] for r in t.table_changes("id", ["v"], 0).collect()}
    assert ch0 == {"update"}
    # OPTIMIZE compacts into the requested layout as a new version
    st = front.execute("OPTIMIZE cat.db1.t INTO 2 PARTITIONS").collect()[0]
    assert st["op"] == "OPTIMIZE"
    assert front.execute("SELECT count(*) AS n FROM cat.db1.t").collect()[0]["n"] == 3
    # VACUUM RETAIN 2 drops the older snapshots' files
    st = front.execute("VACUUM cat.db1.t RETAIN 2 VERSIONS").collect()[0]
    assert int(st["files_removed"]) > 0
    # head still readable after vacuum
    assert front.execute("SELECT count(*) AS n FROM cat.db1.t").collect()[0]["n"] == 3


def test_dml_migrates_plain_parquet_table(front, spark, tmp_path):
    """run_pipeline-style plain-parquet tables upgrade to the versioned
    layout on first DML: content becomes version 0, loose files are
    swept, and INSERT/OPTIMIZE/time travel work from then on."""
    path = front.cat.resolve("db9.plain")
    spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "id bigint, grp string, v double"
    ).write.parquet(path)
    assert front.cat.table_exists("db9.plain")
    front.execute("INSERT INTO cat.db9.plain SELECT id + 10, grp, v FROM src_rows")
    assert (
        front.execute("SELECT count(*) AS n FROM cat.db9.plain").collect()[0]["n"]
        == 5
    )
    # migration v0 preserved the pre-DML content for time travel
    assert (
        front.execute(
            "SELECT count(*) AS n FROM cat.db9.plain FOR VERSION AS OF 0"
        ).collect()[0]["n"]
        == 2
    )


def test_append_rebases_onto_concurrent_winner(spark, tmp_path):
    """Two interleaved appends must BOTH survive: when writer A loses the
    version CAS to writer B, A's retry rebases onto B's file list instead
    of republishing the stale pre-race head (which would silently drop
    B's rows)."""
    from nasdaq_equity_airflow_ecs_pipeline_spark.operators.versioned import (
        VersionedTable,
    )

    root = str(tmp_path / "t")
    a = VersionedTable(spark, root)
    a.commit(spark.createDataFrame([(0,)], "id bigint"))
    b = VersionedTable(spark, root)

    orig = a._try_publish
    state = {"raced": False}

    def racing(version, files, ts, added):
        if not state["raced"]:
            state["raced"] = True
            # concurrent writer B claims this exact version first
            b.append(spark.createDataFrame([(100,)], "id bigint"))
        return orig(version, files, ts, added)

    a._try_publish = racing
    a.append(spark.createDataFrame([(200,)], "id bigint"))

    got = sorted(r["id"] for r in a.read().collect())
    assert got == [0, 100, 200]  # nobody's rows vanished
    assert a.current_version() == 2  # v1 = B's win, v2 = A's rebase


def test_describe_table_and_history(front):
    front.execute("CREATE TABLE cat.db1.t AS SELECT id, grp, v FROM src_rows")
    front.execute("ALTER TABLE cat.db1.t ADD COLUMN score DOUBLE")
    cols = {r["col_name"]: r["data_type"]
            for r in front.execute("DESCRIBE cat.db1.t").collect()}
    assert cols == {"id": "bigint", "grp": "string", "v": "double",
                    "score": "double"}
    hist = front.execute("DESCRIBE HISTORY cat.db1.t").orderBy("version").collect()
    assert [r["version"] for r in hist] == [0, 1]
    assert hist[1]["n_added_columns"] == 1
    # metadata-only ALTER: same file count, no rewrite
    assert hist[0]["n_files"] == hist[1]["n_files"]


def test_describe_history_is_read_only_on_plain_parquet(front, spark):
    """ADVICE r4: DESCRIBE HISTORY must never trigger the destructive
    versioned-layout migration — a read-only statement returning an
    empty history frame, leaving the loose parquet files untouched."""
    import os

    path = front.cat.resolve("db9.plain")
    spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "id bigint, grp string, v double"
    ).write.parquet(path)
    before = sorted(os.listdir(path))
    hist = front.execute("DESCRIBE HISTORY cat.db9.plain")
    assert hist.count() == 0
    assert [f.name for f in hist.schema.fields] == [
        "version", "commit_ts", "n_files", "n_added_columns",
    ]
    assert sorted(os.listdir(path)) == before, "DESCRIBE HISTORY mutated storage"


def test_statement_temp_views_are_dropped(front, spark):
    """ADVICE r4: per-statement name-resolution views must not accumulate
    in the session catalog — a bench loop over SqlFront would otherwise
    pin one snapshot file listing per table reference per statement."""
    front.execute("CREATE TABLE cat.db1.t AS SELECT id, grp, v FROM src_rows")
    before = {v.name for v in spark.catalog.listTables() if v.isTemporary}
    for _ in range(3):
        df = front.execute(
            "SELECT t1.id FROM cat.db1.t t1 JOIN cat.db1.t t2 ON t1.id = t2.id"
        )
        # the lazily-returned frame still executes after the view drop
        assert df.count() == 3
    after = {v.name for v in spark.catalog.listTables() if v.isTemporary}
    assert after == before, f"leaked views: {sorted(after - before)}"


def test_ctas_from_time_traveled_read(front):
    """Time travel composes inside CTAS bodies: snapshot an old version
    into a new table."""
    front.execute("CREATE TABLE cat.db1.t AS SELECT id, grp, v FROM src_rows")
    front.execute("INSERT INTO cat.db1.t SELECT id + 10, grp, v FROM src_rows")
    front.execute(
        "CREATE TABLE cat.db1.snap AS "
        "SELECT * FROM cat.db1.t FOR VERSION AS OF 0"
    )
    assert (
        front.execute("SELECT count(*) AS n FROM cat.db1.snap").collect()[0]["n"]
        == 3
    )
