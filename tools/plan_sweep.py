#!/usr/bin/env python3
"""Registry-wide physical-plan tripwire CLI (r8 verdict directive #5).

Builds EVERY registry query at sf0.001 (plan shapes are scale-
invariant), checks the global invariants — zero CartesianProduct,
BroadcastNestedLoopJoin only on the vetted allowlist, zero row-at-a-
time BatchEvalPython — and writes PLAN_SWEEP.json. The invariant logic
and allowlist live in bigdatanycdiseasesurveillance_spark/plans/sweep.py
(shared with tests/test_plan_sweep.py, which runs the same loop in CI).

Usage: cd /tmp && python /root/repo/tools/plan_sweep.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_DIR)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from bigdatanycdiseasesurveillance_spark.plans.sweep import sweep_specs
    from bigdatanycdiseasesurveillance_spark.registry import all_specs
    from bigdatanycdiseasesurveillance_spark.session import get_spark

    spark = get_spark("plan-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    results, violations, stale = sweep_specs(spark, sf_dir, all_specs())
    with open(os.path.join(REPO_DIR, "PLAN_SWEEP.json"), "w") as fh:
        json.dump(
            {"results": results, "violations": violations, "stale_allowlist": stale},
            fh,
            indent=1,
            sort_keys=True,
        )
    n_bnlj = sum(1 for r in results.values() if r.get("bnlj"))
    print(
        f"swept {len(results)} plans: {len(violations)} violations, "
        f"{n_bnlj} allowlisted BNLJ plans, stale allowlist: {stale}"
    )
    for v in violations:
        print("VIOLATION", v)
    sys.exit(1 if violations else 0)


if __name__ == "__main__":
    main()
