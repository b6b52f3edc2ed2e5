"""Synthesize an sf3-equivalent directory (30x sf0.1) for the two
tables the measured-non-inverting weak rows read — the crossover
evidence VERDICT r6 asked for (stat_spearman / graph_k_core on
lineitem, ml_gbt_stumps / ml_adaboost on events). Same key-shift
construction as make_sf1.py (disjoint copies: 30x nodes/edges/events,
not 30x multiplicity), one decade-and-a-half past sf0.1.

Output: /root/repo/sf3_data/{lineitem,events}.parquet. Not committed.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from make_sf1 import SRC, shifted  # noqa: E402

DST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "sf3_data",
)
COPIES = 30


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    jobs = {
        "lineitem": lambda t, i: shifted(
            shifted(t, "l_orderkey", i * 10_000_000),
            "l_partkey",
            i * 10_000_000,
        ),
        "events": lambda t, i: shifted(
            shifted(t, "event_id", i * 10_000_000),
            "user_id",
            i * 1_000_000,
        ),
        # r8: ml_als's sf3 point needs the orders dimension too —
        # same orderkey shift as lineitem so the join fans out 30x at
        # unchanged selectivity
        "orders": lambda t, i: shifted(t, "o_orderkey", i * 10_000_000),
        # r9: the text/dedup rows still over the bar at sf1 need the
        # documents corpus — same per-copy text prefix as make_sf1 so
        # near-dup structure stays within-copy
        "documents": lambda t, i: shifted(
            t.set_column(
                t.column_names.index("text"),
                "text",
                __import__("pyarrow").compute.binary_join_element_wise(
                    pa.array([f"copy{i}"] * len(t)), t.column("text"), " "
                )
                if i
                else t.column("text"),
            ),
            "doc_id",
            i * 1_000_000,
        ),
    }
    only = set(sys.argv[1:])
    for name, fn in jobs.items():
        if only and name not in only:
            continue
        src = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        out = pa.concat_tables([fn(src, i) for i in range(COPIES)])
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
