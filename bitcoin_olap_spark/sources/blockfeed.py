"""`blockfeed`: a custom batch data source modeling a block-by-block
chain feed (the BitcoinETL direction of README.md:3, SURVEY.md §2.9).

Implements the PySpark Python Data Source API (pyspark.sql.datasource):
the driver plans one InputPartition per contiguous block range, and
each executor synthesizes its range independently — embarrassingly
parallel, no driver bottleneck, exactly how a real feed reader would
shard block heights across a cluster. Content is a deterministic
function of the block number, which is what makes the source
oracle-checkable (DuckDB reconstructs the same rows from range()).

Options:
  n_blocks      total blocks to emit (default 1000)
  n_partitions  input partitions to plan (default 8)
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SCHEMA = "block_number bigint, block_hash string, n_tx bigint, fee_sat bigint"


def block_row(b: int) -> tuple[int, str, int, int]:
    """Deterministic synthetic block: md5 id, formulaic tx count/fees.
    DuckDB twin (over range(n)):
      md5(CAST(r AS VARCHAR)), (r*7)%100, (r*31)%100000."""
    return (
        b,
        hashlib.md5(str(b).encode()).hexdigest(),
        (b * 7) % 100,
        (b * 31) % 100_000,
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _BlockFeedReader(DataSourceReader):
    def __init__(self, options):
        self.n_blocks = int(options.get("n_blocks", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))

    def partitions(self):
        n, p = self.n_blocks, max(1, self.n_partitions)
        step = (n + p - 1) // p or 1
        return [
            _RangePartition(lo, min(lo + step, n))
            for lo in range(0, n, step)
        ]

    def read(self, partition: _RangePartition):
        for b in range(partition.start, partition.end):
            yield block_row(b)


class BlockFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "blockfeed"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> _BlockFeedReader:
        return _BlockFeedReader(self.options)

    def simpleStreamReader(self, schema) -> "_BlockFeedStreamReader":
        return _BlockFeedStreamReader(self.options)


def register_blockfeed(spark) -> None:
    """Idempotently register the source with a session."""
    try:
        spark.dataSource.register(BlockFeedDataSource)
    except Exception:
        pass  # already registered on this session


try:  # SimpleDataSourceStreamReader: pyspark >= 4.0
    from pyspark.sql.datasource import SimpleDataSourceStreamReader
except ImportError:  # pragma: no cover - batch-only fallback
    SimpleDataSourceStreamReader = object


class _BlockFeedStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch reader over the same deterministic feed: offsets are
    block heights, each `read` advances one chunk. Replays are exact —
    `readBetweenOffsets` regenerates any offset range — which is the
    Python-source contract for end-to-end exactly-once recovery (the
    engine persists offsets in the checkpoint and re-asks for the
    range after a failure)."""

    def __init__(self, options):
        self.n_blocks = int(options.get("n_blocks", 1000))
        self.chunk = int(options.get("chunk", 250))

    def initialOffset(self):
        return {"b": 0}

    def read(self, start):
        s = int(start["b"])
        e = min(s + self.chunk, self.n_blocks)
        return iter([block_row(b) for b in range(s, e)]), {"b": e}

    def readBetweenOffsets(self, start, end):
        return iter(
            [block_row(b) for b in range(int(start["b"]), int(end["b"]))]
        )
