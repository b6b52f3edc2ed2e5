"""Testdata catalog: parquet table loaders.

The driver testdata (TESTDATA.md) is one parquet file per table under
/root/testdata/sf{0.001,0.01,0.1}/. At 100 TB each "table" is a
partitioned parquet/Delta dataset; `spark.read.parquet` takes globs and
directories identically, so these helpers are scale-transparent — the
vectorized reader gives split-per-rowgroup parallelism, and filters /
projections expressed on the returned DataFrame push down into the scan
(verify with .explain: PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

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

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


#: Columns stored as parquet TIMESTAMP(NANOS): Spark has no nanosecond
#: timestamp type, so the session reads them as long (nanosAsLong) and
#: we convert to microsecond timestamps here — integer DIV, not double
#: division (epoch-nanos exceed 2^53 so float math would lose precision).
_NANO_TS_COLS = {"events": ("ts",)}

#: Memoized base DataFrames keyed by (applicationId, sf_dir, name).
#: `spark.read.parquet` costs ~150 ms per call (file listing + footer
#: schema read through py4j); a suite run calls table() hundreds of
#: times on the same immutable testdata. This caches the LOGICAL plan
#: only — every action still scans the parquet data itself, so nothing
#: measured is skipped; it is the same reuse a metastore catalog gives
#: a production session (resolve the table once, plan many queries).
_DF_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def table(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = False
) -> DataFrame:
    """Load one testdata table. Accepts a file, directory, or glob.

    spread=True round-robins the rows across the cluster right after
    the scan. The testdata files each hold ONE parquet row group, and a
    row group is indivisible — so however small maxPartitionBytes is,
    the scan AND everything Spark fuses into the scan stage (partial
    aggregation, Expand for rollup/cube, regex/explode maps) runs on a
    single core. Queries with real per-row compute opt in; the added
    exchange costs one pass over the (small) table and buys 32-way
    parallelism. A production many-row-group table needs no spread —
    split planning already saturates the cluster — which is why it is
    opt-in rather than the default, and why trivial scan-project
    queries (whose output IS the table) never set it."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), name)
    df = _DF_CACHE.get(key)
    if df is None:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        for c in _NANO_TS_COLS.get(name, ()):
            if c in df.columns and isinstance(df.schema[c].dataType, LongType):
                df = df.withColumn(
                    c, F.timestamp_micros(F.expr(f"`{c}` DIV 1000"))
                )
        _DF_CACHE[key] = df
    if spread:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for spark.sql)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
