"""Auto-probe for a real Iceberg runtime (the TWS_AVAILABLE pattern).

The reference wires ``glue_catalog`` as an Iceberg SparkCatalog
(`terraform/modules/glue/main.tf:79`) and MERGEs through it
(`glue/jobs/build_stock_fact_table.py:98-111`). This repo emulates those
semantics locally (``operators/versioned.py``); when an
``iceberg-spark-runtime`` jar IS on the Spark classpath, the gated
contract tests (``tests/test_iceberg_parity.py``) run the SAME
upsert / time-travel / schema-evolution / rollback scenarios against the
real implementation — validating the emulation 1:1 — and skip cleanly
otherwise (no jar ships in this container).

``ICEBERG_AVAILABLE`` is a static classpath probe (no session needed),
so the test module's skip decision costs nothing at collection time.
"""

from __future__ import annotations

import glob
import os

__all__ = ["ICEBERG_AVAILABLE", "iceberg_jar_paths", "iceberg_session_conf"]


def _default_jar_roots() -> list[str]:
    """Jar directories already on the JVM classpath of any session this
    process builds: $SPARK_HOME/jars and the pyspark wheel's jars dir.
    One definition — the availability probe and the spark.jars
    computation must agree on what counts as the default classpath."""
    roots: list[str] = []
    if os.environ.get("SPARK_HOME"):
        roots.append(os.path.join(os.environ["SPARK_HOME"], "jars"))
    try:
        import pyspark

        roots.append(os.path.join(os.path.dirname(pyspark.__file__), "jars"))
    except ImportError:  # pragma: no cover - pyspark is a hard dep
        pass
    return roots


def iceberg_jar_paths() -> list[str]:
    """Every iceberg-spark-runtime jar visible to the JVM Spark will
    build: $SPARK_HOME/jars, the pyspark wheel's jars dir, and
    $SPARK_GRAFT_EXTRA_JARS (colon-separated, for ad-hoc runs)."""
    roots = _default_jar_roots()
    jars: list[str] = []
    for root in roots:
        jars.extend(glob.glob(os.path.join(root, "iceberg-spark-runtime*.jar")))
    for extra in os.environ.get("SPARK_GRAFT_EXTRA_JARS", "").split(":"):
        if extra and "iceberg-spark-runtime" in os.path.basename(extra):
            jars.append(extra)
    return sorted(set(jars))


ICEBERG_AVAILABLE = bool(iceberg_jar_paths())


def iceberg_session_conf(warehouse: str, catalog: str = "local") -> dict[str, str]:
    """Session confs for a hadoop-type Iceberg catalog rooted at
    ``warehouse`` — the local analog of the reference's glue_catalog
    wiring. Apply on a FRESH builder: extensions are ignored when set on
    an already-started session. Jars discovered OUTSIDE the default
    classpath (``SPARK_GRAFT_EXTRA_JARS``) are added via ``spark.jars``
    so enabling the probe through the env var actually loads them."""
    conf = {
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
    }
    default_roots = _default_jar_roots()
    extra = [
        j
        for j in iceberg_jar_paths()
        if os.path.dirname(os.path.abspath(j)) not in
        {os.path.abspath(r) for r in default_roots}
    ]
    if extra:
        conf["spark.jars"] = ",".join(extra)
    return conf
