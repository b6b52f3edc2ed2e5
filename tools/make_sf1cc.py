"""Synthesize the MERGED-COMPONENT decade for graph operators
(BASELINE.md "r8d scaling points").

tools/make_sf1.py's disjoint key-shifted copies grow component COUNT
while keeping every component's SIZE fixed — the one dimension a
recursive reach-set oracle (O(sum comp^2)) is immune to, so it
measures the engine's per-round exchange overhead against an
unchanged oracle cost. A growing real corpus does the opposite:
components MERGE. This builder makes that decade: 10 copies of sf0.1
lineitem with l_orderkey shifted per copy but l_partkey SHARED, so
the co-purchase graph fuses into giant components (10x the orders
per part pair).

Measured r8d on this fixture (protocol: warm + min of 3, one session
per engine): Spark graph_connected_components 13.0 s; the DuckDB
reach-set oracle did not complete one run in 30 wall-clock minutes
(57 CPU-min, killed) — >= 140x inversion.

Usage: python tools/make_sf1cc.py
Writes /root/repo/sf1cc_data/lineitem.parquet (not committed).
Then: SCALE_BENCH_DIR=$PWD/sf1cc_data \
      python tools/scale_bench_sf1.py 1 graph_connected_components
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1/lineitem.parquet"
DST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "sf1cc_data",
)


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    t = pq.read_table(SRC)
    idx = t.column_names.index("l_orderkey")
    copies = [
        t.set_column(
            idx,
            "l_orderkey",
            pc.add(t.column("l_orderkey"), i * 10_000_000),
        )
        for i in range(10)
    ]
    out = pa.concat_tables(copies)
    pq.write_table(
        out, f"{DST}/lineitem.parquet", row_group_size=50_000
    )
    print("rows", out.num_rows)


if __name__ == "__main__":
    main()
