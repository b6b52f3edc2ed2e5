"""Driver-side analytics surface moved in-engine (SURVEY.md §2.10):
stratified sampling and the log-log OLS regression tail.

The reference does both in pandas/numpy/statsmodels AFTER `.df()`
(btc_logregression_pre.py:28-86); here they are engine operators —
sampling as ntile windows, the regression as one exact-decimal moment
aggregation (map-side partials, tiny reduce) with closed-form math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table
from ..functions import ORACLE_DAY, day, exact_sum, oracle_exact_sum
from ..ml import loglog_ols_exact, loglog_ols_ml
from ..ml.regression import ORACLE_OLS
from ..registry import query

#: percentile bins / per-bin cap, mirroring smart_sampling's 20 bins +
#: cap (btc_logregression_pre.py:53-70)
N_BINS = 20
BIN_CAP = 50


@query(
    "sample_stratified",
    oracle=f"""
    SELECT event_id, value, bin FROM (
        SELECT event_id, value, bin,
               row_number() OVER (PARTITION BY bin ORDER BY event_id) AS rn
        FROM (
            SELECT event_id, value,
                   ntile({N_BINS}) OVER (ORDER BY value, event_id) AS bin
            FROM events
        )
    ) WHERE rn <= {BIN_CAP}
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling: `smart_sampling`'s 20-percentile-bin
    cap-per-bin scheme (btc_logregression_pre.py:53-70, np.percentile
    + per-bin cap) as deterministic ntile + row_number windows —
    distributed, reproducible (unique tiebreaker), no RNG."""
    e = table(spark, sf_dir, "events")
    binned = e.select(
        "event_id",
        "value",
        F.ntile(N_BINS)
        .over(Window.orderBy("value", "event_id"))
        .cast("long")
        .alias("bin"),
    )
    capped = binned.withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("bin").orderBy("event_id")),
    )
    return capped.filter(F.col("rn") <= BIN_CAP).drop("rn")


_DAILY_XY = f"""(
    SELECT x.day, x.x, y.y FROM (
        SELECT {ORACLE_DAY.format(col='CAST(ts AS TIMESTAMP)')} AS day,
               {oracle_exact_sum('value', 'x')}
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ) x JOIN (
        SELECT {ORACLE_DAY.format(col='CAST(ts AS TIMESTAMP)')} AS day,
               {oracle_exact_sum('value', 'y')}
        FROM events WHERE event_type = 'view' GROUP BY 1
    ) y ON x.day = y.day
    WHERE x.x > 1 AND y.y > 1
)"""


def _daily_xy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily purchase-flow (x) vs view-flow (y), joined on date with
    the reference's >1 thresholds — the pd.merge + threshold filters of
    btc_logregression_pre.py:28-49, in-engine."""
    e = table(spark, sf_dir, "events")
    dx = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(day("ts").alias("day"))
        .agg(exact_sum("value", "x"))
    )
    dy = (
        e.filter(F.col("event_type") == "view")
        .groupBy(day("ts").alias("day"))
        .agg(exact_sum("value", "y"))
    )
    return dx.join(dy, "day").filter((F.col("x") > 1) & (F.col("y") > 1))


@query(
    "ml_ols_loglog",
    oracle=ORACLE_OLS.format(rel=_DAILY_XY, x="x", y="y"),
)
def ml_ols_loglog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-log OLS of daily flows (the reference's regression,
    btc_logregression_pre.py:80-86) from exact-decimal moment sums +
    closed form: (n, slope, intercept, r2) in one aggregation."""
    return loglog_ols_exact(_daily_xy(spark, sf_dir), "x", "y")


@query("ml_linreg_fit", oracle=None)
def ml_linreg_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same regression through pyspark.ml LinearRegression (iterative
    solver — not SQL-expressible; tests pin it to the closed form
    within 1e-6)."""
    return loglog_ols_ml(_daily_xy(spark, sf_dir), "x", "y")


@query(
    "sample_hash_split",
    oracle="""
    SELECT doc_id, h2,
           CASE WHEN h2 < '0d' THEN 'val'
                WHEN h2 < '1a' THEN 'test'
                ELSE 'train' END AS split
    FROM (
        SELECT doc_id,
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS h2
        FROM documents
    )
    """,
)
def sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split by hashed id (~5/5/90 via
    md5-hex-prefix thresholds) — the reproducible, engine-portable way
    to partition a training corpus: no RNG state, stable under
    reshuffling/re-partitioning, and any engine that can md5 a string
    assigns identical splits. Map-only; the hash also load-balances
    a later partitionBy(split) write."""
    docs = table(spark, sf_dir, "documents")
    h2 = F.substring(
        F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2
    )
    return docs.select(
        "doc_id",
        h2.alias("h2"),
        F.when(h2 < "0d", "val")
        .when(h2 < "1a", "test")
        .otherwise("train")
        .alias("split"),
    )


@query("ml_kmeans", oracle=None)
def ml_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMeans(k=10) over the embedding corpus (ml/clustering.py):
    distributed Lloyd iterations, fixed seed, returns per-vector
    cluster assignment + centroid distance. Iterative — not
    SQL-expressible, so rows-only for the driver; tests pin totality,
    seed-determinism, and cluster-range invariants."""
    from ..catalog import table as _table
    from ..ml import kmeans_assign

    emb = _table(spark, sf_dir, "embeddings")
    return kmeans_assign(emb, "vec_id", "embedding", k=10)
