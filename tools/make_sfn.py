"""Synthesize an arbitrary sfN-equivalent directory (N/0.1 key-shifted
copies of sf0.1) for the scale-evidence measurements in BASELINE.md —
the generalization of make_sf1.py / make_sf3.py that produced the
sf10 / sf30 / sf100 decades (10x / 30x / 100x sf1; 100 / 300 / 1000
copies of sf0.1).

Copies are DISJOINT (key-shifted), not duplicated rows: N x orders /
parts / events, the same construction as make_sf1.shifted, so joins
fan out at unchanged selectivity and group multiplicity grows with
corpus size. Tables stream through a ParquetWriter one copy at a time
— concatenating 1000 shifted tables in memory OOMs (sf100 lesson).

Usage: python tools/make_sfn.py <copies> <out_dir> [table ...]
  e.g.  python tools/make_sfn.py 300  sf30_data  lineitem orders
        python tools/make_sfn.py 1000 sf100_data lineitem

Measured with tools/scale_bench_sf1.py via SCALE_BENCH_DIR=<out_dir>;
rows past ~sf30 need SPARK_GRAFT_DRIVER_MEM=64g (the fixed 16 GB heap
OOMs on fact-scale localCheckpoints at 180M+ rows).
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from make_sf1 import SRC, shifted  # noqa: E402

def _docs_shift(t, i):
    # same per-copy text prefix as make_sf1/make_sf3 so near-dup
    # structure stays within-copy
    import pyarrow as pa
    import pyarrow.compute as pc

    if i:
        t = t.set_column(
            t.column_names.index("text"),
            "text",
            pc.binary_join_element_wise(
                pa.array([f"copy{i}"] * len(t)), t.column("text"), " "
            ),
        )
    return shifted(t, "doc_id", i * 1_000_000)


SHIFTS = {
    "lineitem": lambda t, i: shifted(
        shifted(t, "l_orderkey", i * 10_000_000), "l_partkey", i * 10_000_000
    ),
    "orders": lambda t, i: shifted(t, "o_orderkey", i * 10_000_000),
    "events": lambda t, i: shifted(
        shifted(t, "event_id", i * 10_000_000), "user_id", i * 1_000_000
    ),
    "documents": _docs_shift,
}


def main() -> None:
    copies = int(sys.argv[1])
    dst = sys.argv[2]
    tables = sys.argv[3:] or ["lineitem"]
    os.makedirs(dst, exist_ok=True)
    for name in tables:
        fn = SHIFTS[name]
        src = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        writer = None
        for i in range(copies):
            t = fn(src, i)
            if writer is None:
                writer = pq.ParquetWriter(
                    os.path.join(dst, f"{name}.parquet"), t.schema, version="2.6"
                )
            writer.write_table(t, row_group_size=200_000)
        writer.close()
        print(name, copies * len(src), "rows")


if __name__ == "__main__":
    main()
