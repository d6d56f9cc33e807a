"""Real-Iceberg parity tests, gated on the runtime jar (VERDICT r4 #5).

Mirrors tests/test_versioned.py scenario-for-scenario against an actual
Iceberg hadoop catalog, so the ``operators/versioned.py`` emulation is
validated 1:1 the moment an ``iceberg-spark-runtime`` jar lands on the
classpath (it does not ship in this container — the module auto-skips,
exactly like the transformWithState protobuf gate):

- upsert + time travel        <-> test_versioned_upsert_and_time_travel
- rollback restores old state <-> same (rollback commits a new head)
- schema evolution on MERGE   <-> test_versioned_schema_evolution_on_merge
- snapshot expiry             <-> test_versioned_snapshot_expiry_retention

Reference semantics being matched: glue/jobs/build_stock_fact_table.py:
98-111 (MERGE INTO an Iceberg glue_catalog table keyed on symbol/date)
and terraform/modules/glue/main.tf:79 (SparkCatalog wiring).
"""

from __future__ import annotations

import pytest

from nasdaq_equity_airflow_ecs_pipeline_spark.sources.iceberg_compat import (
    ICEBERG_AVAILABLE,
    iceberg_session_conf,
)

pytestmark = pytest.mark.skipif(
    not ICEBERG_AVAILABLE,
    reason="no iceberg-spark-runtime jar on the classpath (see "
    "sources/iceberg_compat.py; set SPARK_GRAFT_EXTRA_JARS to enable)",
)


@pytest.fixture(scope="module")
def ice(tmp_path_factory):
    """Dedicated session with the Iceberg extension. Extensions cannot be
    injected into a running session, so if another test module already
    started one without them, skip rather than silently run un-extended
    (run this module in its own pytest process for full coverage)."""
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        ext = active.conf.get("spark.sql.extensions", "")
        if "IcebergSparkSessionExtensions" not in ext:
            pytest.skip("active session lacks the Iceberg extension; "
                        "run tests/test_iceberg_parity.py in its own process")
        yield active
        return
    wh = str(tmp_path_factory.mktemp("iceberg_wh"))
    builder = SparkSession.builder.master("local[4]").appName("iceberg_parity")
    for k, v in iceberg_session_conf(wh).items():
        builder = builder.config(k, v)
    spark = builder.config("spark.sql.shuffle.partitions", "4").getOrCreate()
    yield spark
    spark.stop()


def _rows(df):
    return sorted((r["k"], r["v"]) for r in df.collect())


def _snapshots(ice, table: str) -> list[int]:
    return [
        r["snapshot_id"]
        for r in ice.sql(
            f"SELECT snapshot_id FROM {table}.snapshots ORDER BY committed_at"
        ).collect()
    ]


def test_iceberg_upsert_and_time_travel(ice):
    ice.sql("DROP TABLE IF EXISTS local.db.t")
    ice.sql("CREATE TABLE local.db.t (k bigint, v string) USING iceberg")
    ice.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]).createOrReplaceTempView("s0")
    ice.sql(
        "MERGE INTO local.db.t t USING s0 s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
    )
    ice.createDataFrame([(2, "B"), (3, "c")], ["k", "v"]).createOrReplaceTempView("s1")
    ice.sql(
        "MERGE INTO local.db.t t USING s1 s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
    )
    assert _rows(ice.table("local.db.t")) == [(1, "a"), (2, "B"), (3, "c")]
    snaps = _snapshots(ice, "local.db.t")
    assert len(snaps) == 2
    old = ice.sql(f"SELECT * FROM local.db.t VERSION AS OF {snaps[0]}")
    assert _rows(old) == [(1, "a"), (2, "b")]


def test_iceberg_rollback_restores_old_state(ice):
    ice.sql("DROP TABLE IF EXISTS local.db.r")
    ice.sql("CREATE TABLE local.db.r (k bigint, v string) USING iceberg")
    ice.sql("INSERT INTO local.db.r VALUES (1, 'a'), (2, 'b')")
    ice.sql("INSERT INTO local.db.r VALUES (3, 'c')")
    snaps = _snapshots(ice, "local.db.r")
    ice.sql(
        f"CALL local.system.rollback_to_snapshot('db.r', {snaps[0]})"
    )
    assert _rows(ice.table("local.db.r")) == [(1, "a"), (2, "b")]


def test_iceberg_schema_evolution_on_merge(ice):
    ice.sql("DROP TABLE IF EXISTS local.db.e")
    ice.sql("CREATE TABLE local.db.e (k bigint, v string) USING iceberg")
    ice.sql("INSERT INTO local.db.e VALUES (1, 'a')")
    ice.sql("ALTER TABLE local.db.e ADD COLUMN score double")
    ice.createDataFrame(
        [(1, "A", 0.5), (2, "b", 0.7)], ["k", "v", "score"]
    ).createOrReplaceTempView("se")
    ice.sql(
        "MERGE INTO local.db.e t USING se s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
    )
    got = {r["k"]: (r["v"], r["score"]) for r in ice.table("local.db.e").collect()}
    assert got == {1: ("A", 0.5), 2: ("b", 0.7)}
    # old snapshot keeps the narrower schema's data readable
    snaps = _snapshots(ice, "local.db.e")
    first = ice.sql(f"SELECT * FROM local.db.e VERSION AS OF {snaps[0]}")
    assert [r["k"] for r in first.collect()] == [1]


def test_iceberg_snapshot_expiry(ice):
    ice.sql("DROP TABLE IF EXISTS local.db.x")
    ice.sql("CREATE TABLE local.db.x (k bigint, v string) USING iceberg")
    for i in range(4):
        ice.sql(f"INSERT INTO local.db.x VALUES ({i}, 'v{i}')")
    before = len(_snapshots(ice, "local.db.x"))
    assert before == 4
    ice.sql(
        "CALL local.system.expire_snapshots("
        "table => 'db.x', older_than => TIMESTAMP '9999-01-01 00:00:00', "
        "retain_last => 1)"
    )
    assert len(_snapshots(ice, "local.db.x")) == 1
    # head remains fully readable after expiry
    assert sorted(r["k"] for r in ice.table("local.db.x").collect()) == [0, 1, 2, 3]
