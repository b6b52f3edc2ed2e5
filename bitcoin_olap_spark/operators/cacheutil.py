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
registers it in a bounded FIFO; once more than MAX_LIVE scoped caches
are live, the oldest is unpersisted (non-blocking). Unpersisting an
already-consumed relation is free; unpersisting one that a still-lazy
plan references is SAFE — Spark silently recomputes it — so the bound
trades at worst a recomputation on a stale query handle for a hard cap
on executor storage held by this library. release_caches() drops
everything eagerly for tests/benchmarks that want a clean slate.
"""

from __future__ import annotations

from collections import deque

from pyspark.sql import DataFrame

#: most scoped caches live at once; beyond this the oldest unpersists.
#: Sized for the widest composed query (pipeline_rag_e2e + recall ops
#: compose several dedup/vector builders, each caching 1-2 relations).
MAX_LIVE = 24

_LIVE: deque[DataFrame] = deque()


def scoped_cache(df: DataFrame) -> DataFrame:
    """cache() with a bounded lifetime: the relation is registered in
    a FIFO of at most MAX_LIVE live scoped caches; registering a new
    one past the bound unpersists the oldest."""
    df = df.cache()
    _LIVE.append(df)
    while len(_LIVE) > MAX_LIVE:
        old = _LIVE.popleft()
        try:
            old.unpersist(blocking=False)
        except Exception:
            pass  # session already stopped — nothing to release
    return df


def release_caches() -> None:
    """Eagerly unpersist every scoped cache registered so far."""
    while _LIVE:
        old = _LIVE.popleft()
        try:
            old.unpersist(blocking=False)
        except Exception:
            pass
