"""Structured Streaming operators (SURVEY.md §2.9 / §7 Phase 5e).

The reference's stated future direction is streaming ingestion
(README.md:3 — Bitcoin Core + BitcoinETL feeding the ledger
continuously). Re-expressed Spark-first:

- file/Kafka source -> `readStream` -> the same DataFrame
  transformations the batch engine uses -> `writeStream` into the
  date-partitioned parquet ledger (`ingest_to_parquet`);
- event-time semantics via watermarks: tumbling daily windows
  (`daily_window_agg`, the streaming twin of agg_daily_sum), native
  session windows (`sessionize`), and bounded-state streaming dedup
  (`dedup_stream`);
- every operator runs identically under `trigger(availableNow=True)`
  — which is how the registered queries execute them to completion on
  static testdata and hand a batch result to the driver/oracle.

State posture at 100 TB: watermarks bound all state (windows and
dedup keys older than the watermark are evicted); the shuffle for a
windowed agg partitions by (window, keys) exactly like the batch
groupBy, so skew/AQE reasoning carries over; sinks are append-mode
parquet partitioned by day, making downstream partition pruning work
for free (replaces the reference's manual pre/post-SAFE table split,
btcolap.sql:322 vs :370).
"""

from .pipeline import (  # noqa: F401
    daily_window_agg,
    dedup_stream,
    dedup_within_watermark,
    ingest_to_parquet,
    purchase_view_join,
    run_to_batch,
    running_user_sequence,
    sessionize,
    sliding_window_agg,
    stream_events,
    upsert_foreachbatch,
)
