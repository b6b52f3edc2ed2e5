#!/usr/bin/env python
"""Min-of-N per-query timer for optimization A/B work.

Same methodology as bench.py (shared warmed session, noop-sink
forcing, clearCache before each timed pass) but with a configurable
pass count: on a shared VM whose noisy-neighbor stalls run for
minutes, min-of-2 is not a reliable estimator — min-of-N (N>=5)
recovers the undisturbed cost unless the stall spans the whole run.

Usage: python tools/minbench.py N qid [qid ...]
Prints one line per query: min, all passes.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    n = int(sys.argv[1])
    qids = sys.argv[2:]
    import __spark_entry__ as e
    from bitcoin_olap_spark.session import get_spark

    q = e.queries()
    spark = get_spark(app_name="minbench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    for qid in qids:
        fn = q[qid]
        force(fn(spark, SF))  # warm
        passes = []
        for _ in range(n):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            force(fn(spark, SF))
            passes.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
        print(
            f"{qid}: min={min(passes):.3f}  "
            + " ".join(f"{p:.3f}" for p in passes),
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
