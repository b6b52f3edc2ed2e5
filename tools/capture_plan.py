#!/usr/bin/env python
"""Capture `.explain("formatted")` for given query IDs into
plans/$SPARK_GRAFT_PLAN_ROUND/<qid>_<tag>.txt (tag = before/after;
round defaults to r12), the optimization-round deliverable. Uses
sf0.1 (the bench scale) so plan shapes (AQE initial plan, join
strategies by size estimate, PushedFilters) match what the bench
measures.

Usage: python tools/capture_plan.py <tag> <qid> [qid ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    tag = sys.argv[1]
    qids = sys.argv[2:]
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r12"),
    )
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as e
    from bitcoin_olap_spark.session import get_spark

    q = e.queries()
    spark = get_spark(app_name="capture-plan")
    spark.sparkContext.setLogLevel("ERROR")
    for qid in qids:
        path = os.path.join(out_dir, f"{qid}_{tag}.txt")
        try:
            df = q[qid](spark, SF)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # capture the failure, keep sweeping
            txt = f"EXPLAIN FAILED: {exc}\n"
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
