"""Aggregation operators (SURVEY.md §2.4).

The flagship is `agg_daily_sum`, the reference's final analytical query
(btc_logregression_pre.py:14-26 ≡ btcolap.sql:453-463): scan -> filter
(ts range + type) -> group by day -> signed sum -> sort. On the driver
testdata `events` plays the ledger: `event_type` plays `type`, `value`
plays `val` (FIXTURES.md §B).

Scale notes: the group-by is a hash aggregate with map-side partial
aggregation (one shuffle on the day key, ~30 distinct days per month of
data — tiny reduce side). Filters and the 2-column projection push into
the parquet scan. At 100 TB the same plan holds: partial aggs shrink
each task's output to #days rows before the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions import day, exact_sum, oracle_exact_sum, ts_lit
from ..registry import query


@query(
    "agg_daily_sum",
    oracle=f"""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           {oracle_exact_sum('-value', 'daily_outflow')},
           COUNT(*) AS n_events
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
      AND event_type = 'purchase'
    GROUP BY 1
    """,
)
def agg_daily_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily signed flow totals: SUM(-val) by DATE_TRUNC('day', ts).

    Mirrors btc_logregression_pre.py:19-25 (`SUM(-val) AS txid_input ...
    GROUP BY DATE_TRUNC('day', block_timestamp)`), with the reference's
    input-side negation convention (btcolap.sql:331).
    """
    e = table(spark, sf_dir, "events")
    return (
        e.filter(
            (F.col("ts") >= ts_lit(e, "ts", "2024-01-05 00:00:00"))
            & (F.col("event_type") == "purchase")
        )
        .groupBy(day("ts").alias("day"))
        .agg(
            exact_sum(-F.col("value"), "daily_outflow"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
