"""Composed logical plans: multi-stage pipelines expressed as one lazy
DataFrame DAG (SURVEY.md §3.1 — the reference's manually-staged CTAS
chain collapsed into a single Catalyst-visible plan)."""

from .ledger import (  # noqa: F401
    bitcoin_fixtures,
    ledger_daily_rollup,
    ledger_pipeline,
)
