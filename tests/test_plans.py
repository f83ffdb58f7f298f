"""Physical-plan invariants (compile-only, no execution): the audit in
tools/audit_plans.py run as a test over every registered query."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from audit_plans import audit
from neo4j_blue_green_arrow_etl_spark.operators import REGISTRY

from conftest import SF_SMOKE


def test_all_plans_clean(spark):
    # full ReadSchema strings: truncation past maxMetadataStringLength
    # (default 100) makes the pruning check skip the scan (audit_plans
    # treats '...' schemas as unparseable), weakening the assertion
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    violations = {}
    for name, spec in sorted(REGISTRY.items()):
        if spec.alias_of:
            continue  # identical plan audited under the target name
        df = spec.spark(spark, SF_SMOKE)
        qe = df._jdf.queryExecution()
        plan = qe.toString()
        if "ReadSchema" not in plan:
            plan = qe.executedPlan().toString()
        problems = audit(name, plan)
        if problems:
            violations[name] = problems
    assert not violations, violations
