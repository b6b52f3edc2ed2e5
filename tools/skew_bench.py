"""Measure salted_join's win case on a genuinely skewed key.

join_salted_skew's registered row runs on UNIFORM testdata keys, where
the S-way dim replication is pure overhead (the documented ~2x cost).
This tool measures the case the operator exists for: a hot key holding
half the fact rows, joined with AQE's skew-join splitting DISABLED —
the situations salting targets are exactly those AQE cannot fix
(aggregation hot keys, joins under a required partitioning, engines /
modes without runtime re-planning). With skew-splitting available AQE
handles shuffle-join skew on its own; session.py keeps it on.

Usage: python tools/skew_bench.py [fact_rows] [salt_buckets]
Prints one JSON line: plain vs salted wall seconds on the skewed
fixture, plus the uniform-key control (salting slower there, by
design).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    fact_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from pyspark.sql import functions as F

    from bitcoin_olap_spark.operators.skew import salted_join
    from bitcoin_olap_spark.session import get_spark

    spark = get_spark(app_name="skew-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # salting targets the cases AQE's runtime splitting cannot see;
    # disable it so the comparison isolates the operator itself
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    # force the shuffle join: at real scale the dim does not fit a
    # broadcast (a broadcastable dim has no skew problem to begin
    # with — the hot key never shuffles)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    n_keys = 100_000
    # skewed fact: half the rows on key 0, the rest uniform
    skewed = spark.range(fact_rows).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_keys)))
        .alias("k"),
        (F.col("id") % 97).alias("v"),
    )
    uniform = spark.range(fact_rows).select(
        F.pmod(F.xxhash64("id"), F.lit(n_keys)).alias("k"),
        (F.col("id") % 97).alias("v"),
    )
    dim = spark.range(n_keys).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("w")
    )

    def run(fact, salted: bool) -> float:
        if salted:
            j = salted_join(fact, dim, "k", salt_buckets=buckets)
        else:
            j = fact.join(dim, "k")
        # force a post-join shuffle-reduce so the join's output skew
        # (one reducer owning the hot key's rows) is actually paid,
        # as it would be in any real aggregate that follows
        out = j.select((F.col("v") + F.col("w")).alias("x"))
        t0 = time.perf_counter()
        out.agg(F.sum("x")).collect()
        return time.perf_counter() - t0

    results: dict[str, float] = {}
    for name, fact, salted in (
        ("skewed_plain", skewed, False),
        ("skewed_salted", skewed, True),
        ("uniform_plain", uniform, False),
        ("uniform_salted", uniform, True),
    ):
        run(skewed, salted)  # warm codegen on the same shapes
        results[name] = round(min(run(fact, salted) for _ in range(3)), 3)

    results["fact_rows"] = fact_rows
    results["salt_buckets"] = buckets
    results["speedup_on_skew"] = round(
        results["skewed_plain"] / results["skewed_salted"], 2
    )
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
