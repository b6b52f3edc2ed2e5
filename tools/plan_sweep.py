#!/usr/bin/env python
"""Registry-wide EXECUTED-plan audit: run every (or the given) registered
query at sf0.01, force it with a noop write, and report the joins in the
FINAL adaptive plan — SortMergeJoin / BroadcastNestedLoopJoin /
CartesianProduct sites with their keys.

Static `.explain` cannot see AQE's runtime join choice; this tool reads
`queryExecution().executedPlan()` after execution, which is how the
late-r8 audit found two real defects the static plan tests missed:
- incremental_lsh_pairs' exact-verify semi-join SHUFFLED THE CORPUS on
  doc_id to probe a batch-bounded candidate-id set (no shuffle boundary
  on the small side -> AQE could not re-plan -> static SMJ);
- pipeline_rag_e2e sorted the (query, chunk) score relation against a
  3-row query-norm relation; sim_ann_recall sort-merged two
  (query-batch x k)-row eval relations.
Every OTHER SortMergeJoin in the registry is a deliberate fact-scale
join (connected-components singleton anti-joins, ALS ratings/factor
joins, DBSCAN core-graph joins, vocab-x-vocab dictionary builds,
full-outer reconciliation) where sort-merge is the plan that survives
100 TB — broadcast hints there would be wrong.

Usage: python tools/plan_sweep.py [qid ...]   (default: whole registry,
streaming queries skipped — their returned batch relation is just the
memory-sink scan). Exits 0 always; the output is the audit.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.01"


def main() -> int:
    import __spark_entry__ as e
    from bitcoin_olap_spark.session import get_spark

    q = e.queries()
    qids = sys.argv[1:] or [
        k for k in sorted(q) if not k.startswith("stream_")
    ]
    spark = get_spark(app_name="plan-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    for qid in qids:
        try:
            df = q[qid](spark, SF)
            df.write.format("noop").mode("overwrite").save()
            ep = df._jdf.queryExecution().executedPlan().toString()
            smj = sorted(
                {
                    ln.strip()[:110]
                    for ln in ep.splitlines()
                    if "SortMergeJoin" in ln
                }
            )
            nlj = ep.count("BroadcastNestedLoopJoin") + ep.count(
                "CartesianProduct"
            )
            if smj or nlj:
                print(f"{qid}: smj={len(smj)} nlj={nlj}", flush=True)
                for ln in smj:
                    print(f"  {ln}", flush=True)
        except Exception as exc:  # noqa: BLE001 — audit, keep going
            print(f"{qid}: ERROR {str(exc)[:100]}", flush=True)
        finally:
            spark.catalog.clearCache()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
