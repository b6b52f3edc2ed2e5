"""Local mirror of the driver's oracle comparison.

Runs a registered PySpark query and its DuckDB oracle SQL on the same
parquet tables, then compares row-count, column names, and an
order-insensitive value comparison (columns sorted by name, rows sorted
by all columns, values normalized). Tighter than the driver needs to
be — if this passes, the driver's hash compare should too.
"""

from __future__ import annotations

import math
from datetime import date, datetime

import pandas as pd


def _norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, float):
        # bit-stable queries should match exactly; tolerate ULP noise only
        return float(f"{v:.10g}")
    if isinstance(v, datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
        seq = v.tolist() if hasattr(v, "tolist") else v
        return tuple(_norm_cell(x) for x in seq)
    if isinstance(v, bytes):
        return v.hex()
    return v


def _canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows, key=repr)


def assert_scalar_schema(spark_df, qid: str) -> None:
    """The external driver's canonicalizer (pandas sort_values over all
    columns) crashes on array/struct/map cells — registered queries must
    emit scalar-only columns. DATE columns are also rejected: the two
    engines' pandas bridges render them differently (datetime.date vs
    midnight datetime64), which hash-mismatches — emit midnight
    TIMESTAMP instead (the ORACLE_DAY convention). Enforced locally so
    CI catches both classes before the driver does."""
    from pyspark.sql.types import ArrayType, DateType, MapType, StructType

    bad = [
        f"{f.name}:{f.dataType.simpleString()}"
        for f in spark_df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{qid}: non-scalar output columns break the driver "
        f"canonicalizer: {bad} — array_join/to_json them"
    )
    dates = [
        f.name
        for f in spark_df.schema.fields
        if isinstance(f.dataType, DateType)
    ]
    assert not dates, (
        f"{qid}: DATE output columns {dates} canonicalize differently "
        f"across engines — cast to TIMESTAMP (ORACLE_DAY convention)"
    )


def compare(spark_df, duck_df: pd.DataFrame, qid: str) -> None:
    assert_scalar_schema(spark_df, qid)
    spd = spark_df.toPandas()
    assert sorted(spd.columns) == sorted(duck_df.columns), (
        f"{qid}: column mismatch spark={sorted(spd.columns)} "
        f"duck={sorted(duck_df.columns)}"
    )
    assert len(spd) == len(duck_df), (
        f"{qid}: row count spark={len(spd)} duck={len(duck_df)}"
    )
    a, b = _canon(spd), _canon(duck_df)
    mism = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mism, f"{qid}: {len(mism)} differing rows; first: {mism[:3]}"
