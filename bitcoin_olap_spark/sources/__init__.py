"""Custom data sources (PySpark Python Data Source API).

The reference's stated future direction is feeding the ledger straight
from the Bitcoin P2P network via BitcoinETL (README.md:3) instead of
BigQuery exports. `blockfeed` models that seam as a first-class Spark
source: a DataSource plugin the engine registers once, after which any
consumer writes plain `spark.read.format("blockfeed")` — the idiomatic
Spark answer to "new external feed", rather than driver-side download
scripts.
"""

from .blockfeed import BlockFeedDataSource, register_blockfeed  # noqa: F401
from .cdcfeed import CdcFeedDataSource, register_cdcfeed  # noqa: F401
