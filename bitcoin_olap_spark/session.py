"""SparkSession factory and runtime tuning.

Scale posture (100 TB / 1000-executor design, tested on local[32]):
- AQE on: runtime partition coalescing, skew-join splitting, dynamic
  join-strategy switch — exchange hot-wallets make join keys skewed
  (reference joins on transaction_hash / wallet, btcolap.sql:112-114,
  :429-430).
- Arrow on: columnar driver handoff for the `toPandas` exit surface
  (reference hands aggregates to pandas, btc_logregression_pre.py:26).
- UTC session timezone: date truncation must agree with the
  timezone-naive DuckDB oracle regardless of host TZ.
- shuffle.partitions defaults to the local core count; on a real
  cluster this is overridden (and AQE coalescing makes the initial
  number less critical).
"""

from __future__ import annotations

import atexit
import os
import shutil

from pyspark.sql import SparkSession

#: Runtime-settable confs applied even to an externally owned session
#: (the verify driver owns the session passed into `queries()`).
def scratch_root(kind: str) -> str:
    """Process-scoped scratch directory, on tmpfs when the host has one.

    Shuffle files, streaming checkpoints, and scratch sinks are I/O the
    engine does NOT want to pay disk latency for on a single box (a
    real cluster puts spark.local.dir on local NVMe); /dev/shm is the
    local stand-in. Falls back to the system tempdir."""
    import tempfile

    base = "/dev/shm" if os.path.isdir("/dev/shm") and os.access(
        "/dev/shm", os.W_OK
    ) else tempfile.gettempdir()
    path = os.path.join(base, f"bitcoin_olap_spark-{kind}-{os.getpid()}")
    if path not in _SCRATCH_DIRS:
        os.makedirs(path, exist_ok=True)
        _SCRATCH_DIRS.add(path)
        atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path


#: scratch dirs created by this process — removed at interpreter exit so
#: tmpfs does not accumulate leftovers across bench/test/driver runs
_SCRATCH_DIRS: set[str] = set()


RUNTIME_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # testdata events.ts is parquet TIMESTAMP(NANOS) which the Spark
    # reader rejects; read as long and convert in catalog.table (DuckDB
    # likewise truncates ns -> us on CAST to TIMESTAMP)
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # our streaming queries are one-shot availableNow runs: the
    # periodic state-store maintenance task (default 60s) only burns
    # CPU snapshotting already-finished stores — measured as periodic
    # multi-second slowdowns on whatever query runs when it fires. A
    # long-lived production stream would keep the default.
    "spark.sql.streaming.stateStore.maintenanceInterval": "3600s",
    # r10: split sizing for SMALL multi-row-group files. Spark's split
    # width is min(maxPartitionBytes, max(openCostInBytes,
    # bytes/defaultParallelism)); the 4 MB openCost default leaves a
    # 14 MB fact table at ~4 splits on a 32-core box. 1 MB fills the
    # cores on the spread sf0.1 layout — measured on lineitem queries
    # (min of 3): flt_ts_range 0.33 -> 0.15 s, join_hash_on_txid
    # 1.59 -> 0.72 s vs the spread default. Production-size files
    # (>= maxPartitionBytes) are unaffected; the tradeoff (more tasks
    # when packing many tiny files) is the right side to err on for
    # an engine whose scans should never be narrower than the cluster.
    "spark.sql.files.openCostInBytes": str(1024 * 1024),
}


def _runtime_conf() -> dict[str, str]:
    return {
        **RUNTIME_CONF,
        # default root for streaming checkpoints (each query still gets
        # its own subdirectory via queryName) — tmpfs, not disk
        "spark.sql.streaming.checkpointLocation": scratch_root("ckpt"),
        # runtime-settable (unlike most builder confs): a DRIVER-OWNED
        # session arrives with the 200-partition default, which is pure
        # scheduling overhead at local scale — tune_session resizes it
        # to the core count just like the builder path does. AQE
        # coalescing makes the exact number non-critical either way.
        "spark.sql.shuffle.partitions": str(default_parallelism()),
    }


def default_parallelism() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "") or 0) or os.cpu_count() or 8
    except ValueError:
        return os.cpu_count() or 8


def get_spark(
    app_name: str = "bitcoin-olap-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine."""
    cpus = default_parallelism()
    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        # shuffle/spill files on tmpfs — local[] has no NVMe-backed
        # spark.local.dir, and /tmp here is spinning-disk-backed
        .config("spark.local.dir", scratch_root("local"))
        # A long suite generates thousands of whole-stage-codegen
        # classes (streaming micro-batches especially); the JVM default
        # ~240 MB code cache fills, the JIT shuts off, and every later
        # query runs interpreted — measured 3-5x slowdown on shuffle-
        # heavy queries late in a 146-query run. 1 GB keeps the JIT
        # alive for the whole suite. JVM-launch-time option: applies
        # when this builder creates the JVM (bench/tests); a
        # driver-owned session keeps its own launch options.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g",
        )
    )
    for k, v in _runtime_conf().items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    tune_session(spark)
    return spark


from contextlib import contextmanager


@contextmanager
def bounded_reduce(spark: SparkSession, partitions: int = 1):
    """Scope for an iterative op's driver-loop jobs whose reduce side
    has BOUNDED cardinality (a gradient of 65 longs, k*dim centroid
    sums): one reduce partition is the correct shape at ANY corpus
    size — the map side stays as wide as the data, only the final
    merge of a few dozen groups is single-task — and adaptive
    re-planning has nothing to adapt on a fixed two-stage aggregate,
    it only adds per-stage scheduling (measured: ml_logreg's 4-job
    loop 1.19 s -> 0.73 s with AQE off + 1 reduce partition at
    sf0.1). Restores both confs on exit, so the surrounding query
    plans (joins, wide shuffles) keep AQE."""
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to any session, best-effort.

    Called at the top of every registered query so behavior is stable
    even when the driver constructed the session.
    """
    for k, v in _runtime_conf().items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on this build — builder path already set it
    return spark
