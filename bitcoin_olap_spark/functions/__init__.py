"""Scalar-function helpers shared across queries.

These mirror the scalar surface the reference exercises (SURVEY.md §2.8)
plus oracle-parity helpers. All of them compile to built-in Catalyst
expressions — no Python UDFs — so they stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SATOSHI = 100_000_000


def ts_lit(df: DataFrame, colname: str, value: str) -> Column:
    """Timestamp literal cast to the column's own type.

    Parquet timestamps may surface as TIMESTAMP or TIMESTAMP_NTZ
    depending on writer metadata; casting the literal to the column's
    dtype makes comparisons valid either way (reference compares
    strings to timestamps at btcolap.sql:97).
    """
    return F.lit(value).cast(df.schema[colname].dataType)


#: DuckDB-side twin of `day` — DuckDB's date_trunc('day', ts) returns
#: DATE (which its pandas bridge renders as midnight datetime anyway),
#: Spark's returns TIMESTAMP; emit midnight TIMESTAMP on both sides so
#: the driver's value-hash sees identical cells.
ORACLE_DAY = "CAST(date_trunc('day', {col}) AS TIMESTAMP)"


def day(col: str | Column) -> Column:
    """DATE_TRUNC('day', ts) as a midnight timestamp.
    Mirrors btc_logregression_pre.py:20; pair with ORACLE_DAY."""
    return F.date_trunc("day", col)


def epoch_us(col: str | Column) -> Column:
    """Epoch microseconds from a timestamp of EITHER flavor.

    `unix_micros` rejects TIMESTAMP_NTZ (and numeric casts from any
    timestamp are disallowed in Spark 4), but the driver's parquet may
    surface `ts` as NTZ or LTZ depending on writer metadata. The
    session timezone is pinned to UTC (session.RUNTIME_CONF), so the
    NTZ->LTZ cast is value-preserving and this is safe for absolute
    epochs, not just differences.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def exact_sum(col: str | Column, alias: str, scale: int = 4) -> Column:
    """Order-independent double sum: accumulate as DECIMAL (exact,
    associative) then cast the final value to double. Sum order differs
    between Spark partial/final aggregation and DuckDB; decimal
    accumulation makes the result bit-stable on both engines."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal(18,{scale})")).cast("double").alias(alias)
    )


def btc_from_satoshi(value: str | Column, negate: bool = False) -> Column:
    """satoshi -> BTC with the reference's sign convention: inputs are
    negated (btcolap.sql:108 `-input.value/100000000`)."""
    c = F.col(value) if isinstance(value, str) else value
    c = -c if negate else c
    return c / F.lit(SATOSHI)


def oracle_exact_sum(expr: str, alias: str, scale: int = 4) -> str:
    """DuckDB-side twin of `exact_sum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE) AS {alias}"
