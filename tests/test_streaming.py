"""Structured Streaming operators: batch-oracle parity for the
converged stream results, plus plan-shape sanity (the queries really
are streaming plans with watermarks, not batch reads in disguise)."""

from __future__ import annotations

import pytest

SF_ORACLE = "/root/testdata/sf0.01"

STREAM_QIDS = [
    "stream_daily_agg",
    "stream_sessionize",
    "stream_dedup",
    "stream_ingest_partitioned",
]


@pytest.mark.parametrize("qid", STREAM_QIDS)
def test_oracle_parity(spark, duck, qid):
    from bitcoin_olap_spark.registry import all_oracles, all_queries

    from .oracle import compare

    sdf = all_queries()[qid](spark, SF_ORACLE)
    ddf = duck.execute(all_oracles()[qid]).df()
    compare(sdf, ddf, qid)


def test_stream_source_is_streaming(spark):
    from bitcoin_olap_spark.streaming import daily_window_agg, stream_events

    ev = stream_events(spark, SF_ORACLE)
    assert ev.isStreaming
    agg = daily_window_agg(ev)
    assert agg.isStreaming
    # watermark node must be present in the analyzed plan
    assert "EventTimeWatermark" in agg._jdf.queryExecution().analyzed().toString()


def test_session_window_state_bounded(spark):
    """Session windows under watermark: every session's span is within
    the data's time range and session_value aggregates all events."""
    from pyspark.sql import functions as F

    from bitcoin_olap_spark.catalog import table
    from bitcoin_olap_spark.registry import all_queries

    sess = all_queries()["stream_sessionize"](spark, SF_ORACLE)
    ev = table(spark, SF_ORACLE, "events")
    n_events_total = ev.count()
    agg = sess.agg(
        F.sum("n_events").alias("n"),
        F.min("session_start").alias("lo"),
        F.max("session_start").alias("hi"),
    ).collect()[0]
    assert agg["n"] == n_events_total
    bounds = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
    assert bounds["lo"] <= agg["lo"] and agg["hi"] <= bounds["hi"]
