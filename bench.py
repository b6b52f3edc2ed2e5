#!/usr/bin/env python
"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:

    {"metric": "suite_wall_sec", "value": N, "unit": "sec",
     "queries": {qid: sec, ...}, "sf": 0.1}

Protocol (BASELINE.md): one shared warmed SparkSession; per-query time
excludes session startup; pass 1 warms (JIT, code cache, file footer
cache), then the MIN over 3-4 timed passes is reported (the host is a
shared VM whose noisy-neighbor stalls would otherwise land on random
queries; min estimates the undisturbed cost — r12 raised the uniform
pass count from 2 to 3 per VERDICT r11 item 7, same methodology, one
more sample). Each query is forced end-to-end
with a noop datasource write (full computation, no driver collect, no
pandas conversion skew).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def _force(df) -> None:
    """Fully execute the plan without materializing to the driver."""
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from bitcoin_olap_spark.registry import all_queries
    from bitcoin_olap_spark.session import get_spark

    queries = all_queries()
    # dev-only subset filter (comma-separated qids); the driver runs
    # the full registry (env unset)
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        keep = set(only.split(","))
        queries = {q: fn for q, fn in queries.items() if q in keep}
    spark = get_spark(app_name="bitcoin-olap-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the session itself
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for qid in sorted(queries):
        fn = queries[qid]
        try:
            _force(fn(spark, sf_dir))  # warm pass
            # The host is a shared VM: multi-second noisy-neighbor
            # stalls land on random queries (measured: the same query
            # swings 1 s <-> 40 s between suite runs with a healthy
            # JVM — code cache, compile queue, heap all clean). The
            # MIN over timed passes estimates the undisturbed cost.
            # r12 (VERDICT r11 item 7): UNIFORMLY 3 timed passes —
            # min-of-2 left sub-second queries inside the noise band
            # (PERF_r11 flagged 9 untouched queries as regressed on
            # plan-identical code); same methodology (min over
            # noop-forced passes), one more sample per query.
            passes = []
            for _ in range(3):
                # drop cached relations BEFORE each timed pass: a query
                # that caches an intermediate for within-plan reuse
                # (e.g. text_dedup_chunks) must not have its timed pass
                # read the previous pass's materialized cache — every
                # timed pass is the full computation the docstring
                # claims (within-pass cache reuse still applies)
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                _force(fn(spark, sf_dir))
                passes.append(time.perf_counter() - t0)
            # one extra pass when even 3 disagree badly (a stall
            # spanning multiple passes), same trigger rule as before
            if min(passes) > 0.2 and max(passes) > 1.5 * min(passes):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                _force(fn(spark, sf_dir))
                passes.append(time.perf_counter() - t0)
            timings[qid] = round(min(passes), 4)
        except Exception as exc:  # keep the suite going; surface on stderr
            print(f"bench: {qid} failed: {exc}", file=sys.stderr)
            timings[qid] = -1.0
        finally:
            # isolate queries: cached intermediates (shingle relations
            # etc.) are legitimate within a query's warm+timed passes,
            # but leaking them across queries distorts neighbors via
            # memory pressure
            spark.catalog.clearCache()

    total = round(sum(t for t in timings.values() if t >= 0), 4)

    # The driver captures only the TAIL of stdout; a single ~8 KB JSON
    # line holding all 307 per-query timings gets its head truncated and
    # parses as null (observed in BENCH_r07/BENCH_r08). Emit the full
    # per-query map to a FILE, and print a short (<2 KB) machine line
    # LAST so the tail capture always contains one complete JSON object.
    full = {
        "metric": "suite_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_full.json")
    with open(full_path, "w") as fh:
        json.dump(full, fh, indent=1, sort_keys=True)

    # Headline subset: one representative per operator family, kept small
    # enough that the final line stays well under the driver's tail window.
    headline_ids = [
        "tpch_q1", "tpch_q6", "tpch_q9", "tpch_q18",
        "agg_daily_sum", "agg_dedup_rownum", "join_hash_on_txid",
        "join_dim_broadcast", "win_moving_avg", "fn_unnest",
        "dedup_exact", "dedup_minhash_lsh", "dedup_embedding_cosine",
        "sim_topk_ivf", "text_tokens", "text_quality", "doc_chunk",
        "graph_pagerank", "ml_kmeans", "stream_dedup",
        "pipeline_ledger_e2e", "mm_decode_features",
        # r11 additions (headline entries are add-only per the driver
        # contract): the queries this optimization round touched
        "ml_als_rank4", "sim_dedup_recall", "ml_dbscan_grid",
    ]
    headline = {q: timings[q] for q in headline_ids if q in timings}
    print(
        json.dumps(
            {
                "metric": "suite_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": headline,
                "sf": sf,
                "n_queries": len(timings),
                "n_failed": sum(1 for t in timings.values() if t < 0),
                "full_map": "BENCH_full.json",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
