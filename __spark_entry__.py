"""Driver contract for the spark-graft builder (PySpark target).

Backed by `bitcoin_olap_spark`: every operator from SURVEY.md §2 (and
the LLM-data-pipeline extensions) registers a (PySpark query, DuckDB
oracle SQL) pair in `bitcoin_olap_spark.registry`; this module just
re-exports the registry in the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bitcoin_olap_spark.registry import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (daily signed flow aggregation,
    btc_logregression_pre.py:14-26 shape) at sf0.001."""
    return all_queries()["agg_daily_sum"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for each SQL-expressible query."""
    return all_oracles()
