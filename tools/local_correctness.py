"""Registry-wide driver-format correctness file.

The external driver's correctness window is byte-capped at the first
50 registry IDs in sort order, so most of the registry never gets a
driver row. This tool produces the SAME evidence locally for ALL
registered queries, in the driver's exact record shape
(rows_match / schema_match / hash_match / spark_rows / oracle_rows /
err), so a reviewer can diff driver semantics across the full registry
in one file instead of trusting pytest transitively.

Comparison semantics mirror tests/oracle.py (itself a strict mirror of
the driver: columns sorted by name, rows sorted by all columns, values
normalized, exact match) at the driver's sf0.01 scale. Queries with no
oracle record err='no_oracle' and a rows-only check, exactly as the
driver does.

Usage: python tools/local_correctness.py [out.json]
Writes CORRECTNESS_local_r8.json (or the given path) at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
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
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "CORRECTNESS_local_r8.json",
    )

    import duckdb

    import __spark_entry__ as e
    from bitcoin_olap_spark.session import get_spark
    from tests.oracle import _canon, assert_scalar_schema

    queries, oracles = e.queries(), e.oracle_sql()
    spark = get_spark(app_name="local-correctness")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    results: dict[str, dict] = {}
    for qid in sorted(queries):
        rec = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            sdf = queries[qid](spark, SF_DIR)
            assert_scalar_schema(sdf, qid)
            spd = sdf.toPandas()
            rec["spark_rows"] = int(len(spd))
            if qid not in oracles:
                rec["err"] = "no_oracle"
            else:
                ddf = con.execute(oracles[qid]).df()
                rec["oracle_rows"] = int(len(ddf))
                rec["rows_match"] = len(spd) == len(ddf)
                rec["schema_match"] = sorted(spd.columns) == sorted(
                    ddf.columns
                )
                rec["hash_match"] = (
                    rec["rows_match"]
                    and rec["schema_match"]
                    and _canon(spd) == _canon(ddf)
                )
        except Exception as exc:  # noqa: BLE001 — record, keep going
            rec["err"] = f"{type(exc).__name__}: {exc}"[:300]
            traceback.print_exc(file=sys.stderr)
        results[qid] = rec
        status = (
            "pass"
            if rec["hash_match"]
            else (rec["err"] or "MISMATCH")
        )
        print(f"{qid}: {status}", file=sys.stderr, flush=True)

    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    n_pass = sum(1 for r in results.values() if r["hash_match"])
    n_no = sum(1 for r in results.values() if r["err"] == "no_oracle")
    n_bad = len(results) - n_pass - n_no
    print(
        f"{len(results)} queries: {n_pass} pass, {n_no} no_oracle, "
        f"{n_bad} failing -> {out_path}"
    )
    spark.stop()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
