"""Rewrite a testdata directory with MULTI-ROW-GROUP parquet files —
the spread bench layout (VERDICT r9 ask #5).

BASELINE.md's floor analysis: every driver-written sf0.1 file is ONE
parquet row group, so neither engine can parallelize the scan (DuckDB
parallelizes across row groups; Spark's byte-range splits only yield
work where a row-group boundary falls). Production tables are
multi-file/multi-row-group, so the single-row-group fixture
UNDERSTATES both engines — and Spark (32 cores waiting on one scan
task) far more than DuckDB. This tool rewrites each table as the same
single file with ~ROW_GROUPS row groups, preserving types exactly
(timestamps uncoerced, version 2.6 — the same discipline as
catalog._sharded_copy), so both engines re-baseline on the identical
spread layout: file count, row order, and values all unchanged.

Usage: python tools/make_spread.py <src_dir> <dst_dir> [row_groups]
  e.g. python tools/make_spread.py /root/testdata/sf0.1 sf0.1_spread 16

Then: SPARK_GRAFT_SF_DIR=$PWD/sf0.1_spread python bench.py
      SPARK_GRAFT_SF_DIR=$PWD/sf0.1_spread python tools/regen_baseline.py ...
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    src, dst = sys.argv[1], sys.argv[2]
    row_groups = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    os.makedirs(dst, exist_ok=True)
    for name in TABLES:
        path = os.path.join(src, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        tbl = pq.read_table(path)
        # tiny dims keep one row group; facts split into ~row_groups
        per = max(-(-tbl.num_rows // row_groups), 4096)
        pq.write_table(
            tbl,
            os.path.join(dst, f"{name}.parquet"),
            row_group_size=per,
            coerce_timestamps=None,
            version="2.6",
        )
        meta = pq.read_metadata(os.path.join(dst, f"{name}.parquet"))
        print(name, tbl.num_rows, "rows,", meta.num_row_groups, "row groups")


if __name__ == "__main__":
    main()
