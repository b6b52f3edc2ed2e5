"""Bounded session-scoped cache registry.

Several operators cache an intermediate relation that both sides of a
downstream self-join consume (hot-shingle vocabularies in
operators/dedup.py, weighted postings in operators/vectors.py). The
cache must outlive the builder function — the returned DataFrame is
LAZY and the cached relation is only materialized when the caller
finally runs an action — so a try/finally unpersist inside the builder
would defeat it. But a long-lived session that builds many such queries
would otherwise accumulate cached relations in executor storage
forever.

scoped_cache() is the middle ground: it caches the relation AND
registers it in a bounded FIFO keyed by SEMANTIC PLAN; once more than
MAX_LIVE distinct plans are live, the oldest is unpersisted
(non-blocking). Unpersisting an already-consumed relation is free;
unpersisting one that a still-lazy plan references is SAFE — Spark
silently recomputes it — so the bound trades at worst a recomputation
on a stale query handle for a hard cap on executor storage held by
this library.

The plan key matters: Spark's CacheManager is keyed by the LOGICAL
PLAN, so two queries caching the same relation (e.g. the df-capped
jaccard and containment tiers share `arrs`/`hot`) share ONE cache
entry, and unpersisting an old handle would kill the NEW query's live
cache mid-run (measured: a first FIFO draft evicted sim_jaccard_dfcap
to 4.15 s from 0.89 s in the bench suite because the plan-equal
handle registered by the previous query aged out while the current
query was consuming the shared entry). Re-registering a plan
therefore REFRESHES its position instead of appending a duplicate —
eviction only ever reaches plans no recent query has touched.
release_caches() drops everything eagerly for tests/benchmarks that
want a clean slate.
"""

from __future__ import annotations

from collections import OrderedDict

from pyspark.sql import DataFrame

#: most DISTINCT cached plans live at once; beyond this the least
#: recently registered unpersists. Sized well past the widest composed
#: query (pipeline_rag_e2e + the recall ops register <= ~8 plans).
MAX_LIVE = 24

_LIVE: "OrderedDict[int, DataFrame]" = OrderedDict()


def _plan_key(df: DataFrame) -> int:
    try:
        return df.semanticHash()
    except Exception:  # pragma: no cover — session torn down
        return id(df)


def scoped_cache(df: DataFrame) -> DataFrame:
    """cache() with a bounded lifetime: the relation registers in an
    LRU of at most MAX_LIVE distinct cached PLANS; re-registering a
    plan refreshes it (same CacheManager entry — never evict what the
    current query just asked for), and only plans beyond the bound
    unpersist."""
    df = df.cache()
    key = _plan_key(df)
    _LIVE.pop(key, None)
    _LIVE[key] = df
    while len(_LIVE) > MAX_LIVE:
        _, old = _LIVE.popitem(last=False)
        try:
            old.unpersist(blocking=False)
        except Exception:
            pass  # session already stopped — nothing to release
    return df


def release_caches() -> None:
    """Eagerly unpersist every scoped cache registered so far."""
    while _LIVE:
        _, old = _LIVE.popitem(last=False)
        try:
            old.unpersist(blocking=False)
        except Exception:
            pass
