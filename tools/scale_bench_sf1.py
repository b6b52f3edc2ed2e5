"""Measure the >2x ('weak') queries at the sf1-equivalent scale
(sf1_data/, built by tools/make_sf1.py) on BOTH engines — the third
point of BASELINE.md's scaling-evidence table (sf0.01 -> sf0.1 ->
sf1). Same protocol as tools/regen_baseline.py: warm pass, then MIN
of N timed passes per engine, one session per engine.

Usage: python tools/scale_bench_sf1.py [passes] [qid ...]
With qid arguments, only those queries run (e.g. to add a new row to
the table without re-measuring the whole set). Prints one JSON line
{qid: {"duck": s, "spark": s}, ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QIDS = [
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_doc_clusters",
    "graph_triangles",
    "pipeline_mm_e2e",
    "sim_topk_ivf",
    "sim_topk_pq",
    "ml_logreg",
    "ml_kmeans_lloyd",
    "ml_pca_power",
    "join_salted_skew",
    "sim_containment",
    "agg_array_agg",
]
SF1 = os.environ.get(
    "SCALE_BENCH_DIR",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "sf1_data",
    ),
)
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    qids = sys.argv[2:] or QIDS

    import duckdb

    import __spark_entry__ as e

    oracles, queries = e.oracle_sql(), e.queries()
    out: dict[str, dict[str, float]] = {q: {} for q in qids}

    con = duckdb.connect()
    for t in TABLES:
        # a partial scale dir (sf3_data carries only the tables its
        # target queries read) registers what exists
        if os.path.exists(f"{SF1}/{t}.parquet"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{SF1}/{t}.parquet'"
            )
    for qid in qids:
        sql = oracles[qid]
        con.execute(sql).fetchall()  # warm
        runs = []
        for _ in range(passes):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            runs.append(time.perf_counter() - t0)
        out[qid]["duck"] = round(min(runs), 3)
        print(qid, "duck", out[qid]["duck"], file=sys.stderr)
    con.close()

    from bitcoin_olap_spark.session import get_spark

    spark = get_spark(app_name="scale-bench-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def force(df):
        # the bench.py protocol: full computation via noop datasource
        # write — no driver collect, no pandas conversion skew (r1-r5
        # sf1 passes used .collect(), which bills PySpark's row-pickle
        # driver handoff to queries with large outputs; the sf0.1
        # table this extends never included that cost on either side's
        # EXECUTION claim — DuckDB's fetchall stays, as at sf0.1)
        df.write.format("noop").mode("overwrite").save()

    for qid in qids:
        fn = queries[qid]
        force(fn(spark, SF1))  # warm
        runs = []
        for _ in range(passes):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            force(fn(spark, SF1))
            runs.append(time.perf_counter() - t0)
        out[qid]["spark"] = round(min(runs), 3)
        print(qid, "spark", out[qid]["spark"], file=sys.stderr)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
