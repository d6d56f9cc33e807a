"""Whole-surface plan audit: EVERY contract query's physical plan is
checked for the anti-patterns that kill 100 TB runs (cartesian products
outside the hand-verified bounded-broadcast whitelist, row-at-a-time
Python UDFs, DECIMAL leaking into a final schema). Complements the
per-query invariants in test_scale_plans.py with blanket coverage, so a
new query can't silently regress the scale story."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from plan_audit import (  # noqa: E402
    BROADCAST_OK,
    CARTESIAN_OK,
    audit,
    audit_broadcast_hints,
)


def test_no_unbounded_broadcast_hints():
    """Every explicit F.broadcast hint in the package must carry a
    boundedness justification in BROADCAST_OK (VERDICT r3 finding: an
    unbounded hint is a driver OOM at 100 TB that sf0.1 benches never
    see)."""
    assert audit_broadcast_hints() == []


def test_broadcast_lint_catches_injected_violation(tmp_path):
    (tmp_path / "evil.py").write_text(
        "from pyspark.sql import functions as F\n"
        "def per_doc_sizes_join(df, sizes):\n"
        "    return df.join(F.broadcast(sizes), 'id')\n"
    )
    violations = audit_broadcast_hints(str(tmp_path))
    assert len(violations) == 1
    assert "per_doc_sizes_join" in violations[0]


def test_broadcast_whitelist_does_not_rot():
    """Every BROADCAST_OK key must still name a real file + function."""
    import ast

    pkg = os.path.join(
        os.path.dirname(__file__), "..", "nasdaq_equity_airflow_ecs_pipeline_spark"
    )
    for key in BROADCAST_OK:
        rel, fname = key.split("::")
        path = os.path.join(pkg, rel)
        assert os.path.exists(path), f"stale lint entry: {key}"
        tree = ast.parse(open(path).read())
        names = {
            n.name
            for n in ast.walk(tree)
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
        }
        assert fname in names, f"stale lint entry: {key}"


def test_no_plan_antipatterns_anywhere(spark, sf_dir):
    report = audit(spark, sf_dir)
    errors = {n: e["error"] for n, e in report.items() if e["error"]}
    flagged = {n: e["flags"] for n, e in report.items() if e["flags"]}
    assert not errors, f"queries failed to build a plan: {errors}"
    assert not flagged, f"plan anti-patterns: {flagged}"
    # the whitelist must not rot: every entry still names a real query
    assert set(CARTESIAN_OK) <= set(report)
