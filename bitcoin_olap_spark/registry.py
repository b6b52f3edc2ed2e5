"""Query registry — the driver contract backbone.

Every operator ID from SURVEY.md §2 (plus the LLM-data-pipeline
extensions) registers here as a `QuerySpec`: a PySpark callable
`(spark, sf_dir) -> DataFrame` and, where SQL-expressible, the
equivalent ANSI SQL the DuckDB oracle runs on the same parquet tables.

Determinism rules (SURVEY.md §5.1) enforced by convention in every
registered query:
- every LIMIT is paired with a total-order ORDER BY;
- window ORDER BY always has a unique tiebreaker;
- collected lists are sorted (`sort_array` / `list_sort`) before compare;
- double aggregates go through exact DECIMAL accumulation then a final
  cast to double, so sum order (which Spark/DuckDB do not guarantee)
  cannot change the result;
- timestamp literals are cast to the column's own type (parquet
  timestamps may surface as TIMESTAMP_NTZ).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    qid: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


def query(qid: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a query under `qid` with its oracle SQL.

    `oracle=None` marks a genuinely non-SQL-expressible op — the driver
    records a weaker rows-only check for those.
    """

    def deco(fn: QueryFn) -> QueryFn:
        from .session import tune_session

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        if qid in REGISTRY:
            raise ValueError(f"duplicate query id: {qid}")
        REGISTRY[qid] = QuerySpec(qid, wrapped, oracle, fn.__doc__ or "", tuple(tags))
        return wrapped

    return deco


def _load_all() -> None:
    """Import every query module so registration side-effects run."""
    from .queries import ALL_MODULES  # noqa: F401


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return {qid: spec.fn for qid, spec in sorted(REGISTRY.items())}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {
        qid: spec.oracle for qid, spec in sorted(REGISTRY.items()) if spec.oracle
    }
