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

from plan_audit import CARTESIAN_OK, audit  # noqa: E402


def test_no_plan_antipatterns_anywhere(spark, sf_dir):
    report = audit(spark, sf_dir)
    errors = {n: e["error"] for n, e in report.items() if e["error"]}
    flagged = {n: e["flags"] for n, e in report.items() if e["flags"]}
    assert not errors, f"queries failed to build a plan: {errors}"
    assert not flagged, f"plan anti-patterns: {flagged}"
    # the whitelist must not rot: every entry still names a real query
    assert set(CARTESIAN_OK) <= set(report)
