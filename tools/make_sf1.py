"""Synthesize an sf1-equivalent testdata directory (10x sf0.1) for the
scaling-evidence table in BASELINE.md.

Ten key-shifted copies of each table the >2x queries touch, preserving
workload character:

- documents: doc_id += i*1e6; copies i>0 get a per-copy text prefix so
  near-duplicate structure stays WITHIN each copy (10 disjoint
  near-dup populations — cross-copy exact duplicates would change the
  candidate-pair distribution quadratically, which is a different
  workload, not a bigger one).
- embeddings: vec_id += i*1e6, vectors unchanged (10x corpus, same
  distribution; the fixed 5-query probe set stays in copy 0, matching
  how a production index grows under a fixed query load).
- lineitem/orders: orderkeys and partkeys += i*1e7 in both tables, so
  the join fans out 10x at the same selectivity and the co-purchase
  graph becomes 10 disjoint copies (10x nodes and edges, not 10x edge
  multiplicity).
- events (r6c): event_id += i*1e7, user_id += i*1e6, timestamps
  UNCHANGED — 10x the users and events inside the same 30-day window,
  so the time-grain queries keep their domain-bounded daily/weekly
  grain with 10x heavier rows (how a real event stream grows) and the
  feature-cell boosters see the same cell domains at 10x the counts.

Output: /root/repo/sf1_data/{table}.parquet, single files with 50k-row
row groups (splittable scans). Not committed — see .gitignore.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "sf1_data"
)
COPIES = 10


def shifted(tbl: pa.Table, col: str, delta: int) -> pa.Table:
    idx = tbl.column_names.index(col)
    return tbl.set_column(
        idx, col, pc.add(tbl.column(col), pa.scalar(delta, pa.int64()))
    )


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    jobs = {
        "documents": lambda t, i: shifted(
            t.set_column(
                t.column_names.index("text"),
                "text",
                pc.binary_join_element_wise(
                    pa.array([f"copy{i}"] * len(t)), t.column("text"), " "
                )
                if i
                else t.column("text"),
            ),
            "doc_id",
            i * 1_000_000,
        ),
        "embeddings": lambda t, i: shifted(t, "vec_id", i * 1_000_000),
        "lineitem": lambda t, i: shifted(
            shifted(t, "l_orderkey", i * 10_000_000),
            "l_partkey",
            i * 10_000_000,
        ),
        "orders": lambda t, i: shifted(t, "o_orderkey", i * 10_000_000),
        "events": lambda t, i: shifted(
            shifted(t, "event_id", i * 10_000_000),
            "user_id",
            i * 1_000_000,
        ),
        # part scales WITH lineitem (l_partkey is copy-shifted, so the
        # part side must shift identically or 9/10 of the probe rows
        # would dangle); the remaining dims stay FIXED single copies —
        # l_suppkey / o_custkey are NOT shifted, so supplier/customer/
        # nation/region keep matching, the classic facts-grow-dims-
        # don't production shape.
        "part": lambda t, i: shifted(t, "p_partkey", i * 10_000_000),
        "customer": lambda t, i: t if i == 0 else None,
        "supplier": lambda t, i: t if i == 0 else None,
        "nation": lambda t, i: t if i == 0 else None,
        "region": lambda t, i: t if i == 0 else None,
    }
    only = set(sys.argv[1:])
    for name, fn in jobs.items():
        if only and name not in only:
            continue
        src = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        parts = [
            p for p in (fn(src, i) for i in range(COPIES)) if p is not None
        ]
        out = pa.concat_tables(parts)
        pq.write_table(
            out,
            os.path.join(DST, f"{name}.parquet"),
            row_group_size=50_000,
            coerce_timestamps=None,
            version="2.6",
        )
        print(name, len(out), "rows")


if __name__ == "__main__":
    sys.exit(main())
