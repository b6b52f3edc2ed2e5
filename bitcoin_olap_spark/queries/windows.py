"""Window-analytics extensions (beyond SURVEY.md §2.5's single
ROW_NUMBER) plus ordered-statistics aggregates.

The reference touches this space three times without engine support:
ROW_NUMBER dedup (btcolap.sql:9,:295), np.percentile binning in
`smart_sampling` (btc_logregression_pre.py:56), and day-over-day flow
analysis feeding the OLS fit (btc_logregression_pre.py:14-49). Here the
full analytic family is in-engine: lag deltas, moving averages, rank /
dense_rank, percent_rank / cume_dist, running totals, gap-based
sessionization, per-group top-k, exact percentiles, correlation
moments, and fixed-width histograms.

Scale notes (100 TB posture):
- Every window here is PARTITIONed (user_id / event_type / returnflag)
  except the daily-series ones, whose input is post-aggregation daily
  grain — a few thousand rows at ANY scale factor, so a single-
  partition window is the right plan, not a bottleneck.
- Per-group top-k via row_number + filter lowers to WindowGroupLimit
  (Spark 3.5+): each map task keeps only its local top-k before the
  shuffle, so shuffle volume is O(k * partitions), not O(n).
- Running/moving sums accumulate as DECIMAL (exact, order-independent)
  and cast to double at the edge — the SURVEY.md §5.1 determinism rule;
  a raw double window sum would drift between engines.
- The histogram is a plain hash aggregate on a computed bin key — the
  two-pass "min/max then bin" shape is avoided by fixing bin width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table
from ..functions import ORACLE_DAY, day, epoch_us, exact_sum, oracle_exact_sum
from ..operators.temporal import gap_sessions, gapfill_locf
from ..registry import query
from .analytics import _DAILY_XY, _daily_xy

#: 30-minute session gap, in exact integer microseconds.
SESSION_GAP_US = 30 * 60 * 1_000_000

_DAILY_FLOW = f"""(
    SELECT {ORACLE_DAY.format(col='CAST(ts AS TIMESTAMP)')} AS day,
           {oracle_exact_sum('value', 'flow')}
    FROM events WHERE event_type = 'purchase' GROUP BY 1
)"""


def _daily_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily purchase-flow series (exact-decimal sums), the engine twin
    of the reference's daily aggregation (btc_logregression_pre.py:19-25)
    that the analytic windows below consume."""
    e = table(spark, sf_dir, "events")
    return (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(day("ts").alias("day"))
        .agg(exact_sum("value", "flow"))
    )


@query(
    "win_lag_delta",
    oracle=f"""
    SELECT day, flow,
           LAG(flow) OVER (ORDER BY day) AS prev_flow,
           flow - LAG(flow) OVER (ORDER BY day) AS delta
    FROM {_DAILY_FLOW} d
    """,
)
def win_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG: day-over-day flow delta on the daily series. The subtraction
    is one IEEE op on two 4dp-exact doubles — bit-stable across engines.
    Input is daily grain (tiny at any SF), so the unpartitioned window
    is the intended plan."""
    w = Window.orderBy("day")
    d = _daily_flow(spark, sf_dir)
    prev = F.lag("flow").over(w)
    return d.select(
        "day",
        "flow",
        prev.alias("prev_flow"),
        (F.col("flow") - prev).alias("delta"),
    )


@query(
    "win_moving_avg",
    oracle=f"""
    SELECT day, flow,
           CAST(SUM(CAST(flow AS DECIMAL(18,4))) OVER w AS DOUBLE)
               / COUNT(*) OVER w AS ma7
    FROM {_DAILY_FLOW} d
    WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day moving average of daily flow. The frame sum accumulates as
    DECIMAL (exact under any evaluation order — Spark's sliding-frame
    incremental update vs DuckDB's segment tree) and the single final
    division is bit-stable. Input is daily grain — cardinality bounded
    by calendar days, not data volume — so the unpartitioned window is
    the intended plan at any SF (same note as win_lag_delta)."""
    w = Window.orderBy("day").rowsBetween(-6, 0)
    d = _daily_flow(spark, sf_dir)
    ma7 = F.sum(F.col("flow").cast("decimal(18,4)")).over(w).cast(
        "double"
    ) / F.count(F.lit(1)).over(w)
    return d.select("day", "flow", ma7.alias("ma7"))


@query(
    "win_rank_dense",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(RANK() OVER w AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC)
    """,
)
def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK / DENSE_RANK of orders by price within priority class.
    Rank values are deterministic under ties by definition (equal keys
    get equal rank), so no tiebreaker column is needed — unlike
    row_number (SURVEY.md §2.5)."""
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice")
    )
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
    )


@query(
    "win_cume_pct",
    oracle="""
    SELECT event_id, event_type,
           PERCENT_RANK() OVER w AS pr,
           CUME_DIST() OVER w AS cd
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    """,
)
def win_cume_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENT_RANK / CUME_DIST within event type — the distribution
    functions behind percentile binning (the reference bins with
    np.percentile, btc_logregression_pre.py:56). Each value is a single
    integer division ((rank-1)/(n-1), peers/n) — bit-stable. event_id
    tiebreak makes ranks unique."""
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


@query(
    "win_running_total",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running
    FROM events
    """,
)
def win_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running total over the event stream — cumulative
    DECIMAL sum (exact at every prefix, so engine evaluation order
    cannot drift) cast to double at the edge. One shuffle on user_id."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("running"),
    )


@query(
    "sessionize_batch",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_id, ts, epoch_us(ts) AS us,
               LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        FROM events
    ), sess AS (
        SELECT user_id, event_id, us,
               CAST(SUM(CASE WHEN prev_us IS NULL
                              OR us - prev_us > {SESSION_GAP_US}
                             THEN 1 ELSE 0 END) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS session_id
        FROM seq
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(us) AS start_us, MAX(us) AS end_us,
           MAX(us) - MIN(us) AS duration_us
    FROM sess GROUP BY 1, 2
    """,
)
def sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gap-based sessionization (30-min gap): the batch twin of
    the streaming session_window query (queries/streaming.py), via
    operators/temporal.gap_sessions (lag start-flags + running sum).
    All integer-microsecond arithmetic — exact on both engines."""
    e = table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    s = gap_sessions(e, "user_id", "ts", "event_id", SESSION_GAP_US)
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("_us").alias("start_us"),
        F.max("_us").alias("end_us"),
        (F.max("_us") - F.min("_us")).alias("duration_us"),
    )


@query(
    "srt_topk_per_group",
    oracle="""
    SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice, rn
    FROM (
        SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY l_returnflag
                   ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber)
               AS BIGINT) AS rn
        FROM lineitem
    ) t WHERE rn <= 3
    """,
)
def srt_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 line items per return flag — the grouped top-k idiom.
    row_number + filter(rn <= k) lowers to WindowGroupLimit: every map
    task pre-prunes to its local top-k, so the shuffle carries
    O(k * tasks) rows regardless of input size. Full (price, orderkey,
    linenumber) tiebreak keeps the cut deterministic."""
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("l_extendedprice"), "l_orderkey", "l_linenumber"
    )
    li = table(spark, sf_dir, "lineitem", spread=True)
    return (
        li.select(
            "l_returnflag",
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "agg_percentile",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.9), 6) AS p90,
           MIN(l_extendedprice) AS lo,
           MAX(l_extendedprice) AS hi
    FROM lineitem GROUP BY 1
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median, p90) per group — the
    in-engine version of the reference's np.percentile binning
    (btc_logregression_pre.py:56).

    NOT Spark's percentile() aggregate (which collects every group
    value into one in-memory object — 2s+ at sf0.1 and a straight OOM
    at scale), and NOT a per-group window sort either: with 3 groups
    the row_number window runs every group's sort on one core — the
    same superlinear low-cardinality-partition blow-up
    stat_weighted_median measured (its one-window form: 0.64 s sf0.1
    -> 5.40 s sf1; this query's: 0.66 s -> 6.26 s, caught by the r9
    sf1 campaign). Same cure: the TWO-PHASE bucket rank-pick. Phase 1
    counts rows per (group, price div 65536) bucket — map-side
    combinable, output groups x ~160 rows — cumulates that tiny
    relation, and locates the bucket holding each of the <= 4 target
    ranks per group (the floor/ceil rows of the two interpolation
    positions, pos = (n-1)p + 1). Phase 2 broadcast-joins the target
    buckets back and ranks ONLY the in-bucket rows; global rank =
    bucket prefix + in-bucket row_number (exact: equal prices share a
    bucket, so the prefix is tie-consistent). The weighted sum of the
    two picked rows reproduces linear interpolation bit-identically
    to the one-window form (two-term double addition is commutative),
    rounded 6dp on both engines to absorb the one-ULP formula
    difference vs DuckDB's quantile_cont. Measured at sf1: 2.51 s
    (fixed stage latency of the extra phase-1 joins) vs the window
    form's 6.26 s — and the window form's cost is the per-group sort
    that grows superlinearly, while the bucket form's is flat."""
    li = table(spark, sf_dir, "lineitem", spread=True)
    v = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("xq"),
        "l_orderkey",
        "l_linenumber",
    ).withColumn("bkt", F.expr("xq div 65536"))
    stats = v.groupBy("flag").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("x").alias("lo"),
        F.max("x").alias("hi"),
    )

    def rank_structs(p: float, tag: str):
        pos = (F.col("n") - 1) * F.lit(p) + 1
        low = F.floor(pos)
        frac = pos - low
        return [
            F.struct(
                F.lit(tag).alias("p"),
                low.cast("long").alias("r"),
                (1 - frac).alias("wt"),
            ),
            F.struct(
                F.lit(tag).alias("p"),
                (low + 1).cast("long").alias("r"),
                frac.alias("wt"),
            ),
        ]

    targets = (
        stats.select(
            "flag",
            "n",
            F.explode(
                F.array(*rank_structs(0.5, "p50"), *rank_structs(0.9, "p90"))
            ).alias("t"),
        )
        .select("flag", "t.p", "t.r", "t.wt")
        .filter(F.col("r") <= F.col("n"))
    )
    hist = v.groupBy("flag", "bkt").agg(F.count(F.lit(1)).alias("c"))
    wcum = (
        Window.partitionBy("flag")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = hist.select(
        "flag",
        "bkt",
        F.sum("c").over(wcum).alias("cum"),
        (F.sum("c").over(wcum) - F.col("c")).alias("prev"),
    )
    located = targets.join(marked, "flag").filter(
        (F.col("prev") < F.col("r")) & (F.col("r") <= F.col("cum"))
    )
    tb = located.select("flag", "bkt", "prev").distinct()
    rn = F.row_number().over(
        Window.partitionBy("flag", "bkt").orderBy(
            "xq", "l_orderkey", "l_linenumber"
        )
    )
    picked = v.join(F.broadcast(tb), ["flag", "bkt"]).select(
        "flag", "bkt", "x", (F.col("prev") + rn).alias("g")
    )
    vals = located.join(
        picked,
        ["flag", "bkt"],
    ).filter(F.col("g") == F.col("r"))
    res = vals.groupBy("flag").agg(
        F.round(
            F.sum(F.when(F.col("p") == "p50", F.col("wt") * F.col("x"))), 6
        ).alias("p50"),
        F.round(
            F.sum(F.when(F.col("p") == "p90", F.col("wt") * F.col("x"))), 6
        ).alias("p90"),
    )
    return stats.join(res, "flag").select(
        F.col("flag").alias("l_returnflag"), "p50", "p90", "lo", "hi"
    )


@query(
    "agg_corr",
    oracle=f"""
    SELECT COUNT(*) AS n,
           ROUND(corr(x, y), 6) AS corr_xy,
           ROUND(covar_samp(x, y), 6) AS covar_xy,
           ROUND(stddev_samp(x), 6) AS sd_x,
           ROUND(stddev_samp(y), 6) AS sd_y
    FROM {_DAILY_XY} d
    """,
)
def agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation / covariance / stddev moments of the daily x-y flow
    series — the aggregate form of the regression's r (r² is the OLS
    fit metric, btc_logregression_pre.py:110). Daily grain input +
    6dp rounding absorbs partial-aggregation order differences."""
    d = _daily_xy(spark, sf_dir)
    return d.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.corr("x", "y"), 6).alias("corr_xy"),
        F.round(F.covar_samp("x", "y"), 6).alias("covar_xy"),
        F.round(F.stddev_samp("x"), 6).alias("sd_x"),
        F.round(F.stddev_samp("y"), 6).alias("sd_y"),
    )


@query(
    "agg_histogram",
    oracle="""
    SELECT CAST(floor(value / 50) AS BIGINT) AS bin,
           COUNT(*) AS n,
           MIN(value) AS lo,
           MAX(value) AS hi
    FROM events GROUP BY 1
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width-bin histogram of event values: one hash aggregate on
    a computed bin key (no two-pass min/max scan, no sort). floor() on
    a double is exact; min/max carry no accumulation error."""
    e = table(spark, sf_dir, "events")
    return e.groupBy(
        F.floor(F.col("value") / 50).alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )


@query(
    "ts_gapfill_locf",
    oracle="""
    WITH base AS (
        SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4))
                   AS flow
        FROM events WHERE event_type = 'signup' AND value > 150
        GROUP BY 1
    ), spine AS (
        SELECT unnest(generate_series(
            (SELECT MIN(hour) FROM base),
            (SELECT MAX(hour) FROM base),
            INTERVAL 1 HOUR)) AS hour
    )
    SELECT s.hour,
           CAST(b.flow AS DOUBLE) AS value,
           CAST(last_value(b.flow IGNORE NULLS) OVER (
               ORDER BY s.hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS DOUBLE) AS filled,
           CASE WHEN b.flow IS NULL THEN 1 ELSE 0 END AS is_gap
    FROM spine s LEFT JOIN base b ON s.hour = b.hour
    """,
)
def ts_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timeseries gap-fill with last-observation-carried-forward over a
    sparse hourly series (high-value signups — ~15-75% of hours are
    empty depending on sf): dense hour spine from one min/max
    aggregate, left join, LOCF window. The hypertable
    `time_bucket_gapfill + locf` shape as pure DataFrame ops
    (operators/temporal.gapfill_locf). Sums accumulate as DECIMAL so
    the filled values are bit-identical cross-engine; LOCF propagates
    the decimal and both engines cast to double at the edge."""
    e = table(spark, sf_dir, "events")
    hourly = (
        e.filter((F.col("event_type") == "signup") & (F.col("value") > 150))
        .groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("decimal(18,4)")
            .alias("flow")
        )
    )
    out = gapfill_locf(hourly, "hour", "flow", step="1 hour")
    return out.select(
        "hour",
        F.col("value").cast("double").alias("value"),
        F.col("filled").cast("double").alias("filled"),
        "is_gap",
    )


@query(
    "ts_resample_interp",
    oracle="""
    WITH base AS (
        SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,4)))
                    AS DECIMAL(18,4)) AS DOUBLE) AS flow
        FROM events WHERE event_type = 'signup' AND value > 150
        GROUP BY 1
    ), spine AS (
        SELECT unnest(generate_series(
            (SELECT MIN(hour) FROM base),
            (SELECT MAX(hour) FROM base),
            INTERVAL 1 HOUR)) AS hour
    ), ctx AS (
        SELECT s.hour, b.flow,
               last_value(b.flow IGNORE NULLS) OVER (
                   ORDER BY s.hour
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS pv,
               last_value(CASE WHEN b.flow IS NOT NULL THEN s.hour END
                          IGNORE NULLS) OVER (
                   ORDER BY s.hour
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS pt,
               first_value(b.flow IGNORE NULLS) OVER (
                   ORDER BY s.hour
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
               ) AS nv,
               first_value(CASE WHEN b.flow IS NOT NULL THEN s.hour END
                           IGNORE NULLS) OVER (
                   ORDER BY s.hour
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
               ) AS nt
        FROM spine s LEFT JOIN base b ON s.hour = b.hour
    )
    SELECT hour, flow AS value,
           CASE
             WHEN flow IS NOT NULL THEN flow
             WHEN pv IS NULL OR nv IS NULL THEN NULL
             ELSE pv + (nv - pv)
                  * (CAST(epoch_us(hour) - epoch_us(pt) AS DOUBLE)
                     / CAST(epoch_us(nt) - epoch_us(pt) AS DOUBLE))
           END AS interp,
           CASE WHEN flow IS NULL THEN 1 ELSE 0 END AS is_gap
    FROM ctx
    """,
)
def ts_resample_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill by LINEAR INTERPOLATION over the same sparse hourly
    series ts_gapfill_locf regularizes: each empty bucket gets the
    value linearly interpolated between its nearest observations on
    either side, time-weighted by exact epoch microseconds (buckets
    outside the observed range stay null — interpolation, not
    extrapolation). The hypertable `time_bucket_gapfill +
    interpolate()` shape.

    Two mirrored LOCF/NOCB windows (last-non-null looking back,
    first-non-null looking forward) carry both the neighbor VALUES and
    their TIMES; the blend is then map-side double arithmetic with an
    identical operation order in both engines, so results are
    bit-exact — the only non-window work after the spine join. The
    unpartitioned window is the documented bucket-grain exception
    (calendar-bounded input, same argument as gapfill_locf); a per-key
    variant adds partitionBy(key) to the same frames."""
    e = table(spark, sf_dir, "events")
    hourly = (
        e.filter((F.col("event_type") == "signup") & (F.col("value") > 150))
        .groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("decimal(18,4)")
            .cast("double")
            .alias("flow")
        )
    )
    bounds = hourly.agg(F.min("hour").alias("_lo"), F.max("hour").alias("_hi"))
    spine = bounds.select(
        F.explode(F.sequence("_lo", "_hi", F.expr("INTERVAL 1 hour"))).alias(
            "hour"
        )
    )
    back = Window.orderBy("hour").rowsBetween(Window.unboundedPreceding, 0)
    fwd = Window.orderBy("hour").rowsBetween(0, Window.unboundedFollowing)
    obs_hour = F.when(F.col("flow").isNotNull(), F.col("hour"))
    ctx = (
        spine.join(hourly, "hour", "left")
        .withColumn("pv", F.last("flow", ignorenulls=True).over(back))
        .withColumn("pt", F.last(obs_hour, ignorenulls=True).over(back))
        .withColumn("nv", F.first("flow", ignorenulls=True).over(fwd))
        .withColumn("nt", F.first(obs_hour, ignorenulls=True).over(fwd))
    )
    frac = epoch_us("hour") - epoch_us("pt")
    span = epoch_us("nt") - epoch_us("pt")
    return ctx.select(
        "hour",
        F.col("flow").alias("value"),
        F.when(F.col("flow").isNotNull(), F.col("flow"))
        .when(F.col("pv").isNull() | F.col("nv").isNull(), F.lit(None))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (frac.cast("double") / span.cast("double"))
        )
        .alias("interp"),
        F.when(F.col("flow").isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("is_gap"),
    )


@query(
    "win_range_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
                PARTITION BY user_id
                ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
                RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS hour_sum
    FROM events
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-framed window: per user, the rolling sum of value over the
    trailing hour of *event time* (not row count) — the time-decayed
    feature shape row-framed windows cannot express. Ordered by exact
    epoch microseconds so the frame bound is integer arithmetic on both
    engines (an INTERVAL bound on a timestamp ORDER BY is the same
    frame); RANGE includes ts-ties as peers identically in both. The
    sum accumulates as DECIMAL (exact at every frame, so peer order
    cannot drift the value) and casts to double at the edge. One
    shuffle on user_id; frames never cross partitions."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_us("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("hour_sum"),
    )


@query(
    "win_ntile",
    oracle="""
    SELECT event_id, event_type,
           CAST(NTILE(4) OVER (
               PARTITION BY event_type ORDER BY value, event_id)
               AS BIGINT) AS quartile
    FROM events
    """,
)
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE(4) — equi-count quartile assignment within each event
    type. The window ORDER BY carries the unique event_id tiebreaker so
    tile boundaries are identical on both engines (SURVEY.md §5.1).
    Partitioned by event_type, so each window is one shuffle partition
    — the per-key-distribution shape; the corpus-wide unpartitioned
    variant is sample_stratified's percentile-boundary formulation,
    which avoids the single-reducer sort this one would have without
    PARTITION BY."""
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@query(
    "ts_ohlc",
    oracle=f"""
    SELECT {ORACLE_DAY.format(col='ts')} AS day, event_type,
           arg_min(value, printf('%020d-%012d',
                                 epoch_us(CAST(ts AS TIMESTAMP)),
                                 event_id)) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           arg_max(value, printf('%020d-%012d',
                                 epoch_us(CAST(ts AS TIMESTAMP)),
                                 event_id)) AS close,
           {oracle_exact_sum('value', 'volume')},
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
    """,
)
def ts_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC resample per event type — the canonical timeseries
    downsampling shape (the reference's daily-flow exit,
    btc_logregression_pre.py:14-26, keeps only a SUM; OHLC needs
    order statistics too). open/close are `min_by`/`max_by` against a
    zero-padded (epoch_us, event_id) string key — ordered-pick
    aggregates with mergeable partials (each map task keeps one
    candidate row, the reducer picks among candidates), NOT a sort: one
    hash aggregate, no window, no per-group array. The key is a string
    because DuckDB's arg_min cannot order by a struct; zero-padding
    makes lexicographic order = numeric order, and the unique event_id
    suffix keeps the pick deterministic on ts ties (SURVEY.md §5.1).
    Volume accumulates as exact decimal. Same single-shuffle shape at
    any scale."""
    e = table(spark, sf_dir, "events")
    key = F.format_string(
        "%020d-%012d", epoch_us("ts"), F.col("event_id")
    )
    return e.groupBy(day("ts").alias("day"), "event_type").agg(
        F.min_by("value", key).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", key).alias("close"),
        exact_sum("value", "volume"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "win_first_last",
    oracle="""
    SELECT event_id, user_id,
           first_value(value) OVER w AS first_val,
           last_value(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING
                        AND UNBOUNDED FOLLOWING) AS last_val,
           nth_value(value, 3) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING
                        AND UNBOUNDED FOLLOWING) AS third_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE / LAST_VALUE / NTH_VALUE — per user, the first,
    last, and third event value in time order attached to every row
    (the classic user-journey feature: "value at signup vs now").
    last/nth use an explicit unbounded-both-ways frame — the SQL
    default frame stops at CURRENT ROW, which silently turns
    last_value into "current value"; stating the frame makes both
    engines compute the same thing. Unique (ts, event_id) ordering, one
    user_id-partitioned window, one shuffle."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        "user_id",
        F.first("value").over(w).alias("first_val"),
        F.last("value").over(wfull).alias("last_val"),
        F.nth_value("value", 3).over(wfull).alias("third_val"),
    )


@query(
    "ts_ewma",
    oracle="""
    WITH seq AS (
        SELECT user_id, list(value ORDER BY ts, event_id) AS xs
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(xs) AS BIGINT) AS n_events,
           round(list_reduce(
               xs, (acc, x) -> 0.9 * acc + 0.1 * x), 6) AS ewma
    FROM seq
    """,
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially weighted moving average of event values
    (alpha=0.1, time order) — a genuinely sequential recurrence
    (y_t = 0.9*y_{t-1} + 0.1*x_t) that window frames cannot express.
    Implemented as a JVM-side left fold: ordered per-user array via one
    hash aggregate, then the SQL higher-order `aggregate` runs the
    recurrence — zero Python in the plan; DuckDB's list_reduce folds
    the identical ordered list with the identical arithmetic, so values
    are bit-identical before the defensive 6dp round
    (operators/temporal.ewma_per_group, incl. the scale argument and
    the applyInPandas seam for non-foldable kernels)."""
    from ..operators.temporal import ewma_per_group

    e = table(spark, sf_dir, "events")
    return ewma_per_group(
        e, key_col="user_id", order_cols=("ts", "event_id"),
        value_col="value", alpha=0.1,
    )


@query(
    "win_gaps_islands",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id,
               CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
        FROM events
    ),
    anch AS (
        SELECT user_id, day,
               day - CAST(ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY day) AS INTEGER) AS anchor
        FROM days
    )
    SELECT user_id,
           CAST(MIN(day) AS TIMESTAMP) AS start_day,
           CAST(MAX(day) AS TIMESTAMP) AS end_day,
           COUNT(*) AS n_days
    FROM anch GROUP BY user_id, anchor
    """,
)
def win_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: collapse each user's active days into maximal
    runs of consecutive dates — (user_id, start_day, end_day, n_days)
    per streak. The classic trick: day minus its per-user row_number is
    constant within a consecutive run, so the anchor date keys the
    island and a plain hash aggregate folds each run. One user_id
    shuffle shared by the distinct, the window, and the aggregate
    (identical partitioning — Catalyst reuses the exchange); no self-
    join or recursive walk, which is why the shape survives 100 TB of
    activity data where the LAG-based island-walk would need iterative
    passes. Powers streak features (retention, engagement-run length)
    in training-data pipelines."""
    days = (
        table(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    anch = days.withColumn(
        "anchor", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    return (
        anch.groupBy("user_id", "anchor")
        .agg(
            # midnight-TIMESTAMP convention (ORACLE_DAY): DuckDB's
            # pandas bridge renders DATE as midnight datetime64, Spark's
            # renders DATE as datetime.date — casting both sides to
            # TIMESTAMP makes the canonicalized cells identical
            F.min("day").cast("timestamp").alias("start_day"),
            F.max("day").cast("timestamp").alias("end_day"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .drop("anchor")
    )


@query(
    "agg_regr_stats",
    oracle="""
    SELECT l_returnflag,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
           ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 6)
               AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           ROUND(regr_avgx(l_extendedprice, l_quantity), 6) AS avg_x,
           ROUND(regr_avgy(l_extendedprice, l_quantity), 6) AS avg_y
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_regr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI regression-aggregate family (REGR_SLOPE / INTERCEPT / R2 /
    COUNT / AVGX / AVGY): per-group least-squares line of price vs
    quantity in ONE hash aggregate — the in-SQL form of the
    closed-form OLS the reference runs driver-side via statsmodels
    (btc_logregression_pre.py:80-86; engine twin ml_ols_loglog). All
    six are second-moment sketches (sum, sum_sq, sum_xy folds), so
    map-side partials merge exactly like sum/count — one tiny shuffle
    regardless of group size, the property that makes per-segment
    trend fits free at 100 TB. 6dp rounding on both engines absorbs
    partial-aggregation float-order differences (agg_corr's rule);
    regr_count is exact."""
    li = table(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.regr_count(y, x).cast("long").alias("n"),
        F.round(F.regr_slope(y, x), 6).alias("slope"),
        F.round(F.regr_intercept(y, x), 6).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.round(F.regr_avgx(y, x), 6).alias("avg_x"),
        F.round(F.regr_avgy(y, x), 6).alias("avg_y"),
    )


@query(
    "ts_seasonal_decompose",
    oracle=f"""
    WITH daily AS (
        SELECT {ORACLE_DAY.format(col='CAST(ts AS TIMESTAMP)')} AS day,
               SUM(CAST(value AS DECIMAL(18,4))) AS td
        FROM events GROUP BY 1
    ), tr AS (
        SELECT day, td,
               SUM(td) OVER (ORDER BY day
                             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                   AS t7,
               COUNT(*) OVER (ORDER BY day
                              ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                   AS c7
        FROM daily
    ), resid AS (
        SELECT day, td, t7, c7,
               date_part('dow', day) AS wd,
               CASE WHEN c7 = 7 THEN td * 7 - t7 END AS r7
        FROM tr
    ), seas AS (
        SELECT wd,
               SUM(r7) AS s_sum,
               COUNT(r7) AS s_n
        FROM resid GROUP BY 1
    )
    SELECT r.day,
           CAST(r.td AS DOUBLE) AS total,
           CASE WHEN r.c7 = 7 THEN CAST(r.t7 AS DOUBLE) / 7 END AS trend,
           CASE WHEN s.s_n > 0
                THEN CAST(s.s_sum AS DOUBLE) / (7 * s.s_n) END AS seasonal,
           CASE WHEN r.c7 = 7 AND s.s_n > 0
                THEN CAST(r.td AS DOUBLE) - CAST(r.t7 AS DOUBLE) / 7
                     - CAST(s.s_sum AS DOUBLE) / (7 * s.s_n) END
               AS remainder
    FROM resid r JOIN seas s ON s.wd = r.wd
    """,
)
def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of the daily flow
    series: trend = centered 7-day moving average (NULL at edges),
    seasonal = per-weekday mean residual, remainder = the rest — the
    time-series triage every metrics pipeline runs before anomaly
    rules. Determinism: every accumulation is an exact DECIMAL sum
    (residuals scaled by 7 to stay in integer-exact decimal space —
    no intermediate division), and each output is ONE final division
    of exact operands, which is bit-stable across engines. The input
    is post-aggregation daily grain, so the unpartitioned ordered
    window is a few-thousand-row series at any scale factor (module
    docstring rule); the weekday aggregate is a 7-group hash agg."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(day("ts").alias("day")).agg(
        F.sum(F.col("value").cast("decimal(18,4)")).alias("td")
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    tr = daily.select(
        "day",
        "td",
        F.sum("td").over(w7).alias("t7"),
        F.count(F.lit(1)).over(w7).alias("c7"),
    )
    resid = tr.select(
        "day",
        "td",
        "t7",
        "c7",
        (F.dayofweek("day") - 1).alias("wd"),
        F.when(F.col("c7") == 7, F.col("td") * 7 - F.col("t7")).alias("r7"),
    )
    seas = resid.groupBy("wd").agg(
        F.sum("r7").alias("s_sum"), F.count("r7").alias("s_n")
    )
    trend = F.when(
        F.col("c7") == 7, F.col("t7").cast("double") / 7
    )
    seasonal = F.when(
        F.col("s_n") > 0,
        F.col("s_sum").cast("double") / (7 * F.col("s_n")),
    )
    return resid.join(F.broadcast(seas), "wd").select(
        "day",
        F.col("td").cast("double").alias("total"),
        trend.alias("trend"),
        seasonal.alias("seasonal"),
        F.when(
            (F.col("c7") == 7) & (F.col("s_n") > 0),
            F.col("td").cast("double")
            - F.col("t7").cast("double") / 7
            - F.col("s_sum").cast("double") / (7 * F.col("s_n")),
        ).alias("remainder"),
    )


@query(
    "win_interval_merge",
    oracle="""
    WITH iv AS (
        SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 300000000 AS e
        FROM events
    ), flagged AS (
        SELECT user_id, s, e,
               CASE WHEN max(e) OVER (
                        PARTITION BY user_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) >= s
                    THEN 0 ELSE 1 END AS new_iv
        FROM iv
    ), islands AS (
        SELECT user_id, s, e,
               SUM(new_iv) OVER (
                   PARTITION BY user_id ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS island
        FROM flagged
    )
    SELECT user_id,
           CAST(COUNT(DISTINCT island) AS BIGINT) AS n_intervals,
           CAST(SUM(span) AS BIGINT) AS covered_us
    FROM (
        SELECT user_id, island, MAX(e) - MIN(s) AS span
        FROM islands GROUP BY user_id, island
    ) GROUP BY 1
    """,
)
def win_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-interval merging (interval union): each event opens
    a 5-minute activity interval; touching/overlapping intervals per
    user coalesce into maximal covered spans — the classic stacked-
    booking / uptime-coverage shape. One user_id shuffle serves both
    windows (running max-end flags a new island when the gap is real;
    a running sum numbers islands) and the island rollup; covered time
    is exact epoch-microsecond integer arithmetic. Rows with equal
    start order arbitrarily but merge unconditionally (equal starts
    always overlap), so the output is deterministic regardless of
    intra-tie ordering — the property that makes the op safe under
    any partitioning. At 100 TB this is one keyed exchange + two
    WindowExec passes over sorted runs, no self-join (the naive
    overlap formulation is a range self-join that explodes
    quadratically on busy keys)."""
    ev = table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        epoch_us("ts").alias("s"),
        (epoch_us("ts") + 300_000_000).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = iv.withColumn(
        "new_iv",
        F.when(F.max("e").over(w_prev) >= F.col("s"), 0).otherwise(1),
    )
    islands = flagged.withColumn("island", F.sum("new_iv").over(w_run))
    spans = islands.groupBy("user_id", "island").agg(
        (F.max("e") - F.min("s")).alias("span")
    )
    return spans.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
        F.sum("span").cast("long").alias("covered_us"),
    )


@query(
    "ts_changepoint",
    oracle=f"""
    WITH v AS (
        SELECT {ORACLE_DAY.format(col='CAST(ts AS TIMESTAMP)')} AS day,
               CAST(round(value * 10000) AS BIGINT) AS v4
        FROM events
    ), daily AS (
        SELECT day, CAST(SUM(v4) AS BIGINT) AS dv FROM v GROUP BY 1
    ), cum AS (
        SELECT day, dv,
               SUM(dv) OVER (ORDER BY day
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS s,
               ROW_NUMBER() OVER (ORDER BY day) AS t,
               SUM(dv) OVER () AS sn,
               COUNT(*) OVER () AS n
        FROM daily
    ), dev AS (
        SELECT day, dv, CAST(abs(n * s - t * sn) AS BIGINT) AS cusum_dev
        FROM cum
    )
    SELECT day, dv AS daily_total_scaled, cusum_dev,
           CAST(CASE WHEN cusum_dev = MAX(cusum_dev) OVER () THEN 1
                     ELSE 0 END AS BIGINT) AS is_changepoint
    FROM dev
    """,
)
def ts_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM mean-shift changepoint detection over the daily value
    series: the cumulative-sum deviation |n*S_t - t*S_n| peaks at the
    point where the series' mean shifts (the classic offline CUSUM
    statistic, kept as pure cross-multiplied integers — no division,
    no floats — so the argmax is engine-exact; values ride at 1e4
    fixed point, |n*S_t| < 2^42 at sf0.1). One daily aggregation
    shuffle does the heavy lifting; the cumulative/total windows are
    unpartitioned but run on the POST-AGGREGATION daily series
    (tens of rows at any corpus size — same documented posture as
    ts_seasonal_decompose), so the single-partition window is
    driver-sized, not data-sized. Emits the full deviation curve plus
    the argmax flag (ties all flagged, deterministically)."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(day("ts").alias("day")).agg(
        F.sum(F.round(F.col("value") * 10000).cast("long")).alias("dv")
    )
    w_run = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = daily.select(
        "day",
        "dv",
        F.sum("dv").over(w_run).alias("s"),
        F.row_number().over(Window.orderBy("day")).alias("t"),
        F.sum("dv").over(w_all).alias("sn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    dev = cum.select(
        "day",
        F.col("dv").alias("daily_total_scaled"),
        F.abs(F.col("n") * F.col("s") - F.col("t") * F.col("sn"))
        .cast("long")
        .alias("cusum_dev"),
    )
    mx = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return dev.select(
        "day",
        "daily_total_scaled",
        "cusum_dev",
        F.when(F.col("cusum_dev") == F.max("cusum_dev").over(mx), 1)
        .otherwise(0)
        .cast("long")
        .alias("is_changepoint"),
    )


@query(
    "ts_mad_outlier",
    oracle="""
    WITH v AS (
        SELECT event_type,
               CAST(round(value * 10000) AS BIGINT) AS v4
        FROM events
    ), r AS (
        SELECT event_type, v4,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY v4) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM v
    ), med AS (
        SELECT event_type, MAX(n) AS n,
               MAX(CASE WHEN rn = (n + 1) // 2 THEN v4 END) AS med4
        FROM r GROUP BY event_type
    ), dev AS (
        SELECT v.event_type, v.v4, m.n, m.med4,
               abs(v.v4 - m.med4) AS d4
        FROM v JOIN med m USING (event_type)
    ), rd AS (
        SELECT event_type, v4, n, med4, d4,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY d4) AS rn
        FROM dev
    ), mad AS (
        SELECT event_type, MAX(n) AS n, MAX(med4) AS med4,
               MAX(CASE WHEN rn = (n + 1) // 2 THEN d4 END) AS mad4
        FROM rd GROUP BY event_type
    )
    SELECT d.event_type,
           CAST(m.n AS BIGINT) AS n,
           CAST(m.med4 AS BIGINT) AS med4,
           CAST(m.mad4 AS BIGINT) AS mad4,
           CAST(COUNT(CASE WHEN d.d4 > 3 * m.mad4 THEN 1 END)
                AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY 1, 2, 3, 4
    """,
)
def ts_mad_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection by median absolute deviation — the
    heavy-tail-safe complement to anomaly_zscore's mean/std flags
    (one corrupted burst shifts a mean but not a median). Medians are
    EXACT lower-median rank picks ((n+1)//2 over the sorted 1e4
    fixed-point values — never an interpolating percentile, whose
    float blend engines disagree on).

    Plan shape (r5): the ENTIRE op is one event_type exchange and
    zero joins — median pick, deviation, MAD pick, and the final flag
    count all run as chained window/aggregate operators over the same
    partitioning (the med4/mad4 rank picks are partition-wide
    window MAXes instead of groupBy+join-back, so nothing ever leaves
    the exchange; verified: the physical plan has exactly one
    Exchange). Cost per group is two in-partition sorts of the
    group's values — exact ranks, deterministic, partitioned.

    100 TB note: an exact rank pick sorts every row of a group inside
    one partition, so a single hot event_type is a straggler/spill
    magnet at extreme scale. The escape hatch is
    approx_percentile(v4, 0.5) (and of d4) — same pipeline, sketch
    medians, fully mergeable map-side — traded here for exact
    oracle-checkable ranks, same as sample_stratified documents."""
    e = table(spark, sf_dir, "events")
    v = e.select(
        "event_type",
        F.round(F.col("value") * 10000).cast("long").alias("v4"),
    )
    wv = Window.partitionBy("event_type").orderBy("v4")
    wn = Window.partitionBy("event_type")
    is_med = lambda rn_col, n_col: rn_col == F.floor((n_col + 1) / 2)  # noqa: E731
    r = v.select(
        "event_type",
        "v4",
        F.row_number().over(wv).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    r2 = r.select(
        "event_type",
        "v4",
        "n",
        F.max(F.when(is_med(F.col("rn"), F.col("n")), F.col("v4")))
        .over(wn)
        .alias("med4"),
    )
    d = r2.select(
        "event_type",
        "n",
        "med4",
        F.abs(F.col("v4") - F.col("med4")).alias("d4"),
    )
    wd = Window.partitionBy("event_type").orderBy("d4")
    rd = d.select(
        "event_type",
        "n",
        "med4",
        "d4",
        F.row_number().over(wd).alias("rn2"),
    )
    rd2 = rd.select(
        "event_type",
        "n",
        "med4",
        "d4",
        F.max(F.when(is_med(F.col("rn2"), F.col("n")), F.col("d4")))
        .over(wn)
        .alias("mad4"),
    )
    return rd2.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.max("med4").cast("long").alias("med4"),
        F.max("mad4").cast("long").alias("mad4"),
        F.count(F.when(F.col("d4") > 3 * F.col("mad4"), F.lit(1)))
        .cast("long")
        .alias("n_outliers"),
    )


@query(
    "ts_autocorr",
    oracle=f"""
    WITH v AS (
        SELECT {ORACLE_DAY.format(col='CAST(ts AS TIMESTAMP)')} AS day,
               CAST(round(value * 10000) AS BIGINT) AS v4
        FROM events
    ), daily AS (
        SELECT day, CAST(SUM(v4) AS BIGINT) AS x,
               ROW_NUMBER() OVER (ORDER BY day) AS t
        FROM v GROUP BY day
    ), st AS (
        SELECT COUNT(*) AS n, SUM(x) AS sx FROM daily
    ), m AS (
        SELECT (sx - ((sx % n) + n) % n) // n AS xbar FROM st
    ), dev AS (
        SELECT t, x - m.xbar AS d FROM daily, m
    ), den AS (
        SELECT SUM(d * d) AS dd FROM dev
    ), pairs AS (
        SELECT k.k AS lag, a.d * b.d AS prod
        FROM dev a
        CROSS JOIN (SELECT unnest(range(1, 8)) AS k) k
        JOIN dev b ON b.t = a.t - k.k
    )
    SELECT CAST(lag AS BIGINT) AS lag,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           round(CAST(SUM(prod) AS DOUBLE) / CAST(den.dd AS DOUBLE), 6)
             AS autocorr
    FROM pairs, den
    GROUP BY lag, den.dd
    """,
)
def ts_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1..7 autocorrelation of the daily value series — the
    statistic that QUANTIFIES the weekly periodicity
    ts_seasonal_decompose models (a lag-7 peak = weekly cycle; the
    ACF is the first tool of any forecasting pipeline). Deviations
    are taken from the FLOOR-integer mean (sign-safe pmod division,
    identical in both engines), so every cross-product is an exact
    int64 and the single final division + 6 dp round is the only
    float op. One daily aggregation shuffle; the lag pairing runs on
    the post-aggregation daily series (tens of rows at any corpus
    scale — the documented ts_seasonal_decompose posture), here as a
    1-row-offset self-join exploded over the 7 lags."""
    e = table(spark, sf_dir, "events")
    daily = (
        e.groupBy(day("ts").alias("day"))
        .agg(
            F.sum(F.round(F.col("value") * 10000).cast("long")).alias("x")
        )
        .withColumn("t", F.row_number().over(Window.orderBy("day")))
    )
    st = daily.agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx")
    ).select(
        "n",
        F.expr(
            "(sx - ((sx % n) + n) % n) div n"
        ).alias("xbar"),
    )
    dev = daily.crossJoin(F.broadcast(st)).select(
        "t", (F.col("x") - F.col("xbar")).alias("d")
    )
    den = dev.agg(F.sum(F.col("d") * F.col("d")).alias("dd"))
    lags = spark.range(1, 8).select(F.col("id").cast("long").alias("lag"))
    a = dev.alias("a")
    b = dev.alias("b")
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            F.col("b.t") == F.col("a.t") - F.col("lag"),
        )
        .select("lag", (F.col("a.d") * F.col("b.d")).alias("prod"))
    )
    return (
        pairs.crossJoin(F.broadcast(den))
        .groupBy("lag", "dd")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.round(
                F.sum("prod").cast("double") / F.col("dd").cast("double"),
                6,
            ).alias("autocorr"),
        )
        .select("lag", "n_pairs", "autocorr")
    )


def _fd2_duck(a: str) -> str:
    """operators/temporal._fd2's oracle twin: exact floor division by
    2 spelled with DuckDB's `//` on an exactly-divisible numerator."""
    return f"((({a}) - (((({a}) % 2) + 2) % 2)) // 2)"


def _oracle_holt_sql() -> str:
    lvl = _fd2_duck("r.xq + s.l + s.b")
    return f"""
    WITH RECURSIVE base AS (
        SELECT event_type,
               {ORACLE_DAY.format(col='CAST(ts AS TIMESTAMP)')} AS day,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT)
                 AS xq
        FROM events GROUP BY 1, 2
    ),
    r AS (
        SELECT event_type, xq,
               row_number() OVER (PARTITION BY event_type ORDER BY day)
                 AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM base
    ),
    s AS (
        SELECT event_type, rn, n, xq AS l, CAST(0 AS BIGINT) AS b
        FROM r WHERE rn = 1
        UNION ALL
        SELECT r.event_type, r.rn, r.n,
               {lvl} AS l,
               {_fd2_duck(lvl + " - s.l + s.b")} AS b
        FROM s JOIN r
          ON r.event_type = s.event_type AND r.rn = s.rn + 1
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_pts, l AS level_q,
           b AS trend_q, l + b AS forecast_q
    FROM s WHERE rn = n"""


@query("ts_holt", oracle=_oracle_holt_sql())
def ts_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear (double-exponential) smoothing of each event type's
    daily flow, alpha = beta = 1/2, EXACT integer arithmetic
    (operators/temporal.holt_linear_per_group): the daily series
    accumulates as DECIMAL (order-independent) and lands on a 1e4
    fixed-point grid with no float in the recurrence at all; the
    coupled (level, trend) recurrence — which no window frame and no
    single-value fold can express — runs as a JVM struct-accumulator
    fold over each group's ordered array. One shuffle for the daily
    aggregate, one for the per-type collect; the fold is map-side.
    Returns (event_type, n_pts, level_q, trend_q, forecast_q) with
    forecast_q the one-step-ahead level+trend. The oracle replays the
    recurrence as a recursive CTE (DuckDB's list_reduce cannot carry
    a 2-field accumulator) — states hash-match exactly."""
    from ..operators.temporal import holt_linear_per_group

    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", day("ts").alias("day")
    ).agg(
        (F.sum(F.col("value").cast("decimal(18,4)")) * 10000)
        .cast("long")
        .alias("xq")
    )
    return holt_linear_per_group(
        daily, "event_type", ("day",), "xq"
    )


def _oracle_holt_winters_sql(m: int = 7) -> str:
    """Recursive-CTE twin of operators/temporal.holt_winters_per_group:
    the m seasonal slots ride as m explicit BIGINT columns updated by
    CASE on t mod m (DuckDB recursion cannot do the array surgery the
    Spark fold's circular buffer uses), every state the same sign-safe
    floor-div integers."""
    R = range(1, m + 1)
    xcols = ", ".join(
        f"SUM(CASE WHEN rn = {i} THEN xq END) AS x{i}" for i in R
    )
    sinit = ", ".join(f"x{i} - l0 AS s{i}" for i in R)
    scols = ", ".join(f"s{i}" for i in R)
    spd = (
        f"CASE ((rec.t % {m}) + {m}) % {m} "
        + " ".join(f"WHEN {i - 1} THEN rec.s{i}" for i in R)
        + " END"
    )
    lnew = _fd2_duck("r.xq - sp + rec.l + rec.b")
    scase = ", ".join(
        f"CASE WHEN ((t0 % {m}) + {m}) % {m} = {i - 1} "
        f"THEN s_new ELSE s{i} END AS s{i}"
        for i in R
    )
    sfinal = (
        f"CASE WHEN n >= {m} THEN (CASE ((n % {m}) + {m}) % {m} "
        + " ".join(f"WHEN {i - 1} THEN s{i}" for i in R)
        + " END) ELSE 0 END"
    )
    return f"""
    WITH RECURSIVE base AS (
        SELECT event_type,
               {ORACLE_DAY.format(col='CAST(ts AS TIMESTAMP)')} AS day,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT)
                 AS xq
        FROM events GROUP BY 1, 2
    ), r AS (
        SELECT event_type, xq,
               row_number() OVER (PARTITION BY event_type ORDER BY day)
                 AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM base
    ), init AS (
        SELECT event_type, ANY_VALUE(n) AS n, {xcols},
               CAST(SUM(CASE WHEN rn <= {m} THEN xq END) AS BIGINT)
                 AS s0,
               LEAST(ANY_VALUE(n), {m}) AS mm
        FROM r GROUP BY event_type
    ), init2 AS (
        SELECT event_type, n,
               ((s0 - ((s0 % mm) + mm) % mm) // mm) AS l0
        FROM init
    ), init3 AS (
        SELECT i2.event_type, i2.n, i2.l0, {sinit}
        FROM init2 i2 JOIN init i ON i.event_type = i2.event_type
    ), rec AS (
        SELECT event_type, n, CAST({m} AS BIGINT) AS t, l0 AS l,
               CAST(0 AS BIGINT) AS b, {scols}
        FROM init3
        UNION ALL
        SELECT event_type, n, t0 + 1 AS t, l_new AS l, b_new AS b,
               {scase}
        FROM (
          SELECT rec.event_type, rec.n, rec.t AS t0,
                 {", ".join(f"rec.s{i} AS s{i}" for i in R)},
                 {spd} AS sp,
                 {lnew} AS l_new,
                 {_fd2_duck("l_new - rec.l + rec.b")} AS b_new,
                 {_fd2_duck("r.xq - l_new + sp")} AS s_new
          FROM rec JOIN r
            ON r.event_type = rec.event_type AND r.rn = rec.t + 1
        ) rec0
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_pts, l AS level_q,
           b AS trend_q, CAST({sfinal} AS BIGINT) AS season_q,
           CAST(l + b + ({sfinal}) AS BIGINT) AS forecast_q
    FROM rec WHERE t = n"""


@query("ts_holt_winters", oracle=_oracle_holt_winters_sql())
def ts_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters (triple-exponential) smoothing of each
    event type's daily flow, alpha = beta = gamma = 1/2, season
    length 7, EXACT integer arithmetic
    (operators/temporal.holt_winters_per_group): ts_holt's coupled
    (level, trend) recurrence extended with the weekly seasonal state
    ts_seasonal_decompose models statically — here it updates
    recursively, which no window frame can express. The seasonal
    slots ride inside the JVM fold's struct accumulator as a
    length-7 circular buffer; the oracle carries them as 7 explicit
    recursive-CTE columns (list_reduce cannot hold a struct
    accumulator and recursive SQL has no array surgery). One shuffle
    for the daily aggregate, one for the per-type collect; the fold
    is map-side. Returns (event_type, n_pts, level_q, trend_q,
    season_q, forecast_q) with forecast_q = level + trend + s_{n+1-7}
    — the one-step-ahead seasonal forecast, all states
    hash-identical to the oracle's."""
    from ..operators.temporal import holt_winters_per_group

    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", day("ts").alias("day")
    ).agg(
        (F.sum(F.col("value").cast("decimal(18,4)")) * 10000)
        .cast("long")
        .alias("xq")
    )
    return holt_winters_per_group(
        daily, "event_type", ("day",), "xq", m=7
    )


@query(
    "ts_xcorr",
    oracle=f"""
    WITH v AS (
        SELECT {ORACLE_DAY.format(col='CAST(ts AS TIMESTAMP)')} AS day,
               event_type,
               CAST(round(value * 10000) AS BIGINT) AS v4
        FROM events WHERE event_type IN ('purchase', 'view')
    ), dx AS (
        SELECT day, CAST(SUM(CASE WHEN event_type = 'purchase'
                                  THEN v4 ELSE 0 END) AS BIGINT) AS x,
               CAST(SUM(CASE WHEN event_type = 'view'
                             THEN v4 ELSE 0 END) AS BIGINT) AS y,
               ROW_NUMBER() OVER (ORDER BY day) AS t
        FROM v GROUP BY day
    ), st AS (
        SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy FROM dx
    ), m AS (
        SELECT (sx - ((sx % n) + n) % n) // n AS xbar,
               (sy - ((sy % n) + n) % n) // n AS ybar
        FROM st
    ), dev AS (
        SELECT t, x - m.xbar AS a, y - m.ybar AS b FROM dx, m
    ), den AS (
        SELECT sqrt(CAST(SUM(a * a) AS DOUBLE) *
                    CAST(SUM(b * b) AS DOUBLE)) AS dd
        FROM dev
    ), pairs AS (
        SELECT k.k AS lag, p.a * q.b AS prod
        FROM dev p
        CROSS JOIN (SELECT unnest(range(-7, 8)) AS k) k
        JOIN dev q ON q.t = p.t - k.k
    )
    SELECT CAST(lag AS BIGINT) AS lag,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           round(CAST(SUM(prod) AS DOUBLE) / den.dd, 6) AS xcorr
    FROM pairs, den
    GROUP BY lag, den.dd
    """,
)
def ts_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged CROSS-correlation (-7..+7 days) between the daily
    purchase flow and the daily view flow — the lead/lag question
    underneath the reference's purchase-vs-view regression
    (btc_logregression_pre.py:28-49 fits the contemporaneous
    relation; the XCF says WHICH series leads and by how many days,
    the standard pre-check before fitting any flow-on-flow model).
    Same exact-integer machinery as ts_autocorr: both series share
    ONE daily aggregation (conditional sums — one shuffle, not two),
    deviations from each series' floor-integer mean are exact int64,
    every lagged cross-product is exact, and the one float edge is
    sqrt(ddx*ddy) + the final division + a 6 dp round — IEEE
    correctly-rounded ops, identical in both engines. The lag
    pairing runs on the post-aggregation daily series (tens of rows
    at any corpus scale)."""
    e = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    v4 = F.round(F.col("value") * 10000).cast("long")
    daily = (
        e.groupBy(day("ts").alias("day"))
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", v4).otherwise(
                    F.lit(0).cast("long")
                )
            ).alias("x"),
            F.sum(
                F.when(F.col("event_type") == "view", v4).otherwise(
                    F.lit(0).cast("long")
                )
            ).alias("y"),
        )
        .withColumn("t", F.row_number().over(Window.orderBy("day")))
    )
    st = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
    ).select(
        F.expr("(sx - ((sx % n) + n) % n) div n").alias("xbar"),
        F.expr("(sy - ((sy % n) + n) % n) div n").alias("ybar"),
    )
    dev = daily.crossJoin(F.broadcast(st)).select(
        "t",
        (F.col("x") - F.col("xbar")).alias("a"),
        (F.col("y") - F.col("ybar")).alias("b"),
    )
    den = dev.agg(
        F.sqrt(
            F.sum(F.col("a") * F.col("a")).cast("double")
            * F.sum(F.col("b") * F.col("b")).cast("double")
        ).alias("dd")
    )
    lags = spark.range(-7, 8).select(
        F.col("id").cast("long").alias("lag")
    )
    p, q2 = dev.alias("p"), dev.alias("q")
    pairs = (
        p.crossJoin(F.broadcast(lags))
        .join(q2, F.col("q.t") == F.col("p.t") - F.col("lag"))
        .select("lag", (F.col("p.a") * F.col("q.b")).alias("prod"))
    )
    return (
        pairs.crossJoin(F.broadcast(den))
        .groupBy("lag", "dd")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.round(
                F.sum("prod").cast("double") / F.col("dd"), 6
            ).alias("xcorr"),
        )
        .select("lag", "n_pairs", "xcorr")
    )


@query(
    "win_fifo_lots",
    oracle="""
    WITH v AS (
        SELECT user_id, event_id, event_type,
               CAST(round(value * 10000) AS BIGINT) AS v4
        FROM events WHERE event_type IN ('purchase', 'view')
    ), b AS (
        SELECT user_id, event_id AS buy_id,
               SUM(v4) OVER (PARTITION BY user_id ORDER BY event_id
                             ROWS UNBOUNDED PRECEDING) AS hi,
               SUM(v4) OVER (PARTITION BY user_id ORDER BY event_id
                             ROWS UNBOUNDED PRECEDING) - v4 AS lo
        FROM v WHERE event_type = 'purchase'
    ), s AS (
        SELECT user_id, event_id AS sell_id,
               SUM(v4) OVER (PARTITION BY user_id ORDER BY event_id
                             ROWS UNBOUNDED PRECEDING) AS hi,
               SUM(v4) OVER (PARTITION BY user_id ORDER BY event_id
                             ROWS UNBOUNDED PRECEDING) - v4 AS lo
        FROM v WHERE event_type = 'view'
    )
    SELECT b.user_id, b.buy_id, s.sell_id,
           CAST(LEAST(b.hi, s.hi) - GREATEST(b.lo, s.lo) AS BIGINT)
             AS qty_q
    FROM b JOIN s
      ON s.user_id = b.user_id AND b.lo < s.hi AND s.lo < b.hi
    """,
)
def win_fifo_lots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO lot matching — the cost-basis accounting op a ledger like
    the reference's exchange-flow table feeds (btcolap.sql builds the
    in/out flows; FIFO decides WHICH acquisition each disposal
    consumes): every 'view' disposal consumes the oldest unconsumed
    'purchase' quantity per user. The procedural queue is rewritten
    relationally as CUMULATIVE-INTERVAL OVERLAP: each side's running
    sum (one window per side, same user-keyed exchange) places every
    event on the key's quantity axis as the interval
    (cum - qty, cum]; a matched lot is exactly a nonempty
    intersection of a buy and a sell interval, and its quantity is
    least(hi) - greatest(lo). One equi-join on user with the range
    predicate refining inside the hash match (never a nested loop);
    output is O(buys + sells) lots per key — the FIFO queue walk's
    own output size — produced with zero iteration, which is what
    makes the shape work at 100 TB where a per-key sequential queue
    cannot. Quantities on the exact 1e4 integer grid; ordering by the
    unique event_id makes the match deterministic on both engines."""
    from ..operators.temporal import fifo_match

    e = table(spark, sf_dir, "events")
    v = e.filter(
        F.col("event_type").isin("purchase", "view")
    ).select(
        "user_id",
        "event_id",
        "event_type",
        F.round(F.col("value") * 10000).cast("long").alias("v4"),
    )
    return fifo_match(
        v.filter(F.col("event_type") == "purchase"),
        v.filter(F.col("event_type") == "view"),
        "user_id",
        "event_id",
        "v4",
    )


@query(
    "ts_theil_sen",
    oracle=f"""
    WITH daily AS (
        SELECT {ORACLE_DAY.format(col='CAST(ts AS TIMESTAMP)')} AS day,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT)
                 AS x
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), pts AS (
        SELECT x, row_number() OVER (ORDER BY day) AS t FROM daily
    ), pairs AS (
        SELECT a.t AS ta, b.t AS tb,
               CAST(b.x - a.x AS DOUBLE) / (b.t - a.t) AS slope
        FROM pts a JOIN pts b ON b.t > a.t
    ), rk AS (
        SELECT slope,
               row_number() OVER (ORDER BY slope, ta, tb) AS r,
               COUNT(*) OVER () AS np
        FROM pairs
    ), med AS (
        SELECT slope AS slope_med, np FROM rk WHERE r = (np + 1) // 2
    ), resid AS (
        SELECT p.x - m.slope_med * p.t AS ic, p.t,
               row_number() OVER (ORDER BY p.x - m.slope_med * p.t,
                                  p.t) AS r,
               COUNT(*) OVER () AS n
        FROM pts p, med m
    )
    SELECT CAST(r2.n AS BIGINT) AS n_pts,
           CAST(m.np AS BIGINT) AS n_pairs,
           round(m.slope_med / 10000, 6) AS slope,
           round(r2.ic / 10000, 6) AS intercept
    FROM med m, (SELECT * FROM resid WHERE r = (n + 1) // 2) r2
    """,
)
def ts_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of the daily purchase flow — the
    outlier-immune complement of the reference's least-squares tail
    (btc_logregression_pre.py:80-86; one corrupted day moves OLS
    arbitrarily, moves the pairwise-slope median not at all). Slope =
    the LOWER MEDIAN of all O(days^2) pairwise slopes, intercept =
    the lower median of the residuals x_i - slope*t_i — both exact
    rank PICKS (never interpolation, the ts_mad_outlier posture), so
    engines agree: slopes are IEEE doubles from identical exact-int
    inputs, ordered with a (ta, tb) tiebreak. The pair grid is built
    on the POST-AGGREGATION daily grain (tens of rows at any corpus
    scale — the documented ts_seasonal_decompose boundedness
    posture), so the non-equi self-join is a broadcast loop over a
    driver-scale relation, while the corpus-scale work remains the
    single daily-aggregate shuffle."""
    e = table(spark, sf_dir, "events")
    daily = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(day("ts").alias("day"))
        .agg(
            (F.sum(F.col("value").cast("decimal(18,4)")) * 10000)
            .cast("long")
            .alias("x")
        )
    )
    pts = daily.select(
        "x", F.row_number().over(Window.orderBy("day")).alias("t")
    )
    a, b = pts.alias("a"), pts.alias("b")
    pairs = a.join(b, F.col("b.t") > F.col("a.t")).select(
        F.col("a.t").alias("ta"),
        F.col("b.t").alias("tb"),
        (
            (F.col("b.x") - F.col("a.x")).cast("double")
            / (F.col("b.t") - F.col("a.t"))
        ).alias("slope"),
    )
    rk = pairs.select(
        "slope",
        F.row_number()
        .over(Window.orderBy("slope", "ta", "tb"))
        .alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("np"),
    )
    med = rk.filter(
        F.col("r") == F.expr("(np + 1) div 2")
    ).select(F.col("slope").alias("slope_med"), "np")
    resid = pts.crossJoin(F.broadcast(med)).select(
        (F.col("x") - F.col("slope_med") * F.col("t")).alias("ic"),
        "t",
        "np",
        F.col("slope_med"),
    )
    r2 = resid.select(
        "ic",
        "np",
        "slope_med",
        F.row_number().over(Window.orderBy("ic", "t")).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    ).filter(F.col("r") == F.expr("(n + 1) div 2"))
    return r2.select(
        F.col("n").cast("long").alias("n_pts"),
        F.col("np").cast("long").alias("n_pairs"),
        F.round(F.col("slope_med") / 10000, 6).alias("slope"),
        F.round(F.col("ic") / 10000, 6).alias("intercept"),
    )


@query(
    "ts_bollinger",
    oracle=f"""
    WITH daily AS (
        SELECT {ORACLE_DAY.format(col='CAST(ts AS TIMESTAMP)')} AS day,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT)
                 AS x
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), m AS (
        SELECT day, x,
            CAST(SUM(x) OVER w AS BIGINT) AS s,
            CAST(SUM(x * x) OVER w AS BIGINT) AS ss,
            CAST(COUNT(*) OVER w AS BIGINT) AS n
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING
                     AND CURRENT ROW)
    ), b AS (
        SELECT day, x, n,
            CAST(s AS DOUBLE) / n AS mu,
            sqrt(GREATEST((CAST(ss AS DOUBLE)
                 - CAST(s AS DOUBLE) * s / n) / n, 0.0)) AS sigma
        FROM m
    )
    SELECT day, round(x / 10000.0, 6) AS flow,
           round(mu / 10000.0, 6) AS ma7,
           round((mu + 2 * sigma) / 10000.0, 6) AS upper_band,
           round((mu - 2 * sigma) / 10000.0, 6) AS lower_band,
           (x > mu + 2 * sigma) AS breakout_up,
           (x < mu - 2 * sigma) AS breakout_down
    FROM b WHERE n = 7
    """,
)
def ts_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands (7-day rolling mean +/- 2 population sigma)
    over the daily purchase flow, with breakout flags — the
    volatility-band signal every market-analytics stack computes over
    exactly the daily-flow series the reference builds
    (btc_logregression_pre.py:14-26). Rolling sum and sum-of-squares
    accumulate as exact int64 inside ONE ROWS-framed window (the
    fixed-point grid), so mu and sigma are IEEE doubles of identical
    integers on both engines; rows emit only once the frame is full
    (n = 7), and every output rounds to 6 dp. One daily-aggregate
    shuffle; the window runs on the post-aggregation daily grain."""
    e = table(spark, sf_dir, "events")
    daily = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(day("ts").alias("day"))
        .agg(
            (F.sum(F.col("value").cast("decimal(18,4)")) * 10000)
            .cast("long")
            .alias("x")
        )
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    m = daily.select(
        "day",
        "x",
        F.sum("x").over(w).alias("s"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("ss"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    mu = F.col("s").cast("double") / F.col("n")
    sigma = F.sqrt(
        F.greatest(
            (
                F.col("ss").cast("double")
                - F.col("s").cast("double") * F.col("s") / F.col("n")
            )
            / F.col("n"),
            F.lit(0.0),
        )
    )
    b = m.select(
        "day", "x", "n", mu.alias("mu"), sigma.alias("sigma")
    ).filter(F.col("n") == 7)
    up = F.col("mu") + 2 * F.col("sigma")
    dn = F.col("mu") - 2 * F.col("sigma")
    return b.select(
        "day",
        F.round(F.col("x") / 10000.0, 6).alias("flow"),
        F.round(F.col("mu") / 10000.0, 6).alias("ma7"),
        F.round(up / 10000.0, 6).alias("upper_band"),
        F.round(dn / 10000.0, 6).alias("lower_band"),
        (F.col("x") > up).alias("breakout_up"),
        (F.col("x") < dn).alias("breakout_down"),
    )


@query(
    "ts_drawdown",
    oracle=f"""
    WITH daily AS (
        SELECT {ORACLE_DAY.format(col='CAST(ts AS TIMESTAMP)')} AS day,
               event_type,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT)
                 AS x
        FROM events GROUP BY 1, 2
    ), c AS (
        SELECT event_type, day, x,
               CAST(MAX(x) OVER (PARTITION BY event_type ORDER BY day
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS peak
        FROM daily
    ), d AS (
        SELECT event_type, day,
               round(CAST(peak - x AS DOUBLE) / peak, 6) AS drawdown
        FROM c
    )
    SELECT event_type,
           round(MAX(drawdown), 6) AS max_drawdown,
           CAST(COUNT(*) FILTER (WHERE drawdown > 0.5) AS BIGINT)
             AS days_below_half_peak
    FROM d GROUP BY 1
    """,
)
def ts_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per event type's daily flow — THE downside
    risk metric of financial analytics (how far below the running
    peak did the series fall): running max via one cumulative window
    on exact integers, per-day drawdown one division rounded to 6 dp,
    then a per-type max + threshold count. One daily shuffle + one
    per-type window on the daily grain; everything after is
    driver-scale."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", day("ts").alias("day")
    ).agg(
        (F.sum(F.col("value").cast("decimal(18,4)")) * 10000)
        .cast("long")
        .alias("x")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = daily.select(
        "event_type",
        "day",
        "x",
        F.max("x").over(w).alias("peak"),
    )
    dd = F.round(
        (F.col("peak") - F.col("x")).cast("double") / F.col("peak"), 6
    )
    d = c.select("event_type", dd.alias("drawdown"))
    return d.groupBy("event_type").agg(
        F.round(F.max("drawdown"), 6).alias("max_drawdown"),
        F.sum(F.when(F.col("drawdown") > 0.5, 1).otherwise(0))
        .cast("long")
        .alias("days_below_half_peak"),
    )


@query(
    "win_funnel_windowed",
    oracle="""
    WITH e AS (
        SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
               event_id
        FROM events
        WHERE event_type IN ('view', 'click', 'purchase')
    ), triples AS (
        SELECT p.user_id, p.ts AS p_ts
        FROM e v
        JOIN e c ON c.user_id = v.user_id AND c.event_type = 'click'
               AND c.ts >= v.ts
        JOIN e p ON p.user_id = v.user_id
               AND p.event_type = 'purchase'
               AND p.ts >= c.ts
               AND p.ts <= v.ts + INTERVAL 12 HOUR
        WHERE v.event_type = 'view'
    )
    SELECT user_id, MIN(p_ts) AS first_conversion_ts,
           CAST(COUNT(*) AS BIGINT) AS n_qualifying_paths
    FROM triples GROUP BY 1
    """,
)
def win_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-BOUNDED conversion funnel — win_funnel with the
    conversion-window constraint real funnel analytics impose
    (view -> click -> purchase counts only when the whole path
    completes within 12 hours; an unconstrained funnel credits
    conversions weeks apart). Per converted user: the earliest
    qualifying purchase and the number of qualifying paths. The path
    search is a user-keyed equi-join chain with the ordering and
    window constraints refining inside the hash matches (never a
    nested loop across users — each user's event list is the only
    join scope, the same per-key boundedness the funnel fold relies
    on); ties and ordering are exact timestamp comparisons, so both
    engines count identical paths."""
    e = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click", "purchase")
    ).select("user_id", "event_type", "ts")
    v = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("u"), F.col("ts").alias("v_ts")
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("u"), F.col("ts").alias("c_ts")
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u"), F.col("ts").alias("p_ts")
    )
    from ..functions import epoch_us

    triples = (
        v.join(c, "u")
        .filter(F.col("c_ts") >= F.col("v_ts"))
        .join(p, "u")
        .filter(
            (F.col("p_ts") >= F.col("c_ts"))
            & (
                epoch_us("p_ts") - epoch_us("v_ts")
                <= 12 * 3600 * 1_000_000
            )
        )
    )
    return triples.groupBy(F.col("u").alias("user_id")).agg(
        F.min("p_ts").alias("first_conversion_ts"),
        F.count(F.lit(1)).cast("long").alias("n_qualifying_paths"),
    )


@query(
    "ts_rsi",
    oracle=f"""
    WITH daily AS (
        SELECT {ORACLE_DAY.format(col='CAST(ts AS TIMESTAMP)')} AS day,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT)
                 AS x
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), d AS (
        SELECT day, x,
               x - lag(x) OVER (ORDER BY day) AS delta
        FROM daily
    ), gl AS (
        SELECT day, x,
               GREATEST(delta, 0) AS gain,
               GREATEST(-delta, 0) AS loss
        FROM d WHERE delta IS NOT NULL
    ), m AS (
        SELECT day, x,
               CAST(SUM(gain) OVER w AS BIGINT) AS sg,
               CAST(SUM(loss) OVER w AS BIGINT) AS sl,
               CAST(COUNT(*) OVER w AS BIGINT) AS n
        FROM gl
        WINDOW w AS (ORDER BY day ROWS BETWEEN 13 PRECEDING
                     AND CURRENT ROW)
    )
    SELECT day, round(x / 10000.0, 6) AS flow,
           round(CASE WHEN sg + sl > 0
                      THEN 100.0 * sg / (sg + sl)
                      ELSE 50.0 END, 6) AS rsi,
           (sg + sl > 0 AND 100.0 * sg / (sg + sl) > 70) AS overbought,
           (sg + sl > 0 AND 100.0 * sg / (sg + sl) < 30) AS oversold
    FROM m WHERE n = 14
    """,
)
def ts_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-day Relative Strength Index (Cutler's SMA variant — the
    window-expressible member of the RSI family; Wilder's smoothed
    variant is a recurrence and would ride the ts_holt JVM-fold seam)
    over the daily purchase flow: momentum oscillator flagging
    overbought (>70) / oversold (<30) days, completing the
    market-analytics tier next to ts_bollinger / ts_drawdown.

    Exactness: gains and losses are differences of the int64
    fixed-point daily series (one lag window), their 14-day rolling
    sums stay int64 inside ONE ROWS-framed window, and RSI =
    100*sg/(sg+sl) is a single IEEE division of identical integers
    on both engines (sg+sl = 0 pins RSI to 50), rounded 6dp. Flags
    compare BEFORE rounding so band edges can't flip between
    engines. One daily-aggregate shuffle; both windows run on the
    post-aggregation daily grain."""
    e = table(spark, sf_dir, "events")
    daily = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(day("ts").alias("day"))
        .agg(
            (F.sum(F.col("value").cast("decimal(18,4)")) * 10000)
            .cast("long")
            .alias("x")
        )
    )
    wl = Window.orderBy("day")
    d = daily.select(
        "day", "x", (F.col("x") - F.lag("x").over(wl)).alias("delta")
    ).filter(F.col("delta").isNotNull())
    gl = d.select(
        "day",
        "x",
        F.greatest(F.col("delta"), F.lit(0)).alias("gain"),
        F.greatest(-F.col("delta"), F.lit(0)).alias("loss"),
    )
    w = Window.orderBy("day").rowsBetween(-13, 0)
    m = gl.select(
        "day",
        "x",
        F.sum("gain").over(w).alias("sg"),
        F.sum("loss").over(w).alias("sl"),
        F.count(F.lit(1)).over(w).alias("n"),
    ).filter(F.col("n") == 14)
    tot = F.col("sg") + F.col("sl")
    rsi = F.lit(100.0) * F.col("sg") / tot
    return m.select(
        "day",
        F.round(F.col("x") / 10000.0, 6).alias("flow"),
        F.round(
            F.when(tot > 0, rsi).otherwise(F.lit(50.0)), 6
        ).alias("rsi"),
        ((tot > 0) & (rsi > 70)).alias("overbought"),
        ((tot > 0) & (rsi < 30)).alias("oversold"),
    )


def _oracle_kalman_sql() -> str:
    from ..operators.temporal import KALMAN_Q, KALMAN_R

    def fdv(a: str, b: str) -> str:
        return (
            f"((({a}) - (((({a}) % ({b})) + ({b})) % ({b}))) // ({b}))"
        )

    pp = f"(s.p + {KALMAN_Q})"
    den = f"({pp} + {KALMAN_R})"
    return f"""
    WITH RECURSIVE base AS (
        SELECT event_type,
               {ORACLE_DAY.format(col='CAST(ts AS TIMESTAMP)')} AS day,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT)
                 AS xq
        FROM events GROUP BY 1, 2
    ), r AS (
        SELECT event_type, xq,
               row_number() OVER (PARTITION BY event_type ORDER BY day)
                 AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM base
    ), s AS (
        SELECT event_type, 1 AS t, CAST(n AS BIGINT) AS n,
               xq AS x, CAST({KALMAN_R} AS BIGINT) AS p
        FROM r WHERE rn = 1
        UNION ALL
        SELECT s.event_type, s.t + 1, s.n,
               s.x + {fdv(f"{pp} * (r.xq - s.x)", den)},
               {fdv(f"{pp} * CAST({KALMAN_R} AS BIGINT)", den)}
        FROM s JOIN r ON r.event_type = s.event_type
                     AND r.rn = s.t + 1
    )
    SELECT event_type, n AS n_pts, x AS x_q, p AS p_q
    FROM s WHERE t = n
"""


@query("ts_kalman", oracle=_oracle_kalman_sql())
def ts_kalman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Kalman filter over each event type's daily flow
    (random-walk state, Q/R = 0.1) — the adaptive-gain smoother
    completing the recurrence tier (ts_ewma: fixed alpha; ts_holt:
    level+trend; ts_holt_winters: +seasonality; Kalman: the gain
    itself is state). EXACT integers end to end: both update
    equations multiply through by the denominator and floor-divide,
    so the gain never exists as a float and the recursive-CTE oracle
    hash-matches the final (x, p) states
    (operators/temporal.kalman_per_group). One daily-aggregate
    shuffle, one per-type collect; the fold runs map-side in the
    JVM."""
    from ..operators.temporal import kalman_per_group

    e = table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", day("ts").alias("day")).agg(
        (F.sum(F.col("value").cast("decimal(18,4)")) * 10000)
        .cast("long")
        .alias("xq")
    )
    return kalman_per_group(daily, "event_type", ("day",), "xq")


@query(
    "win_pareto_abc",
    oracle="""
    WITH rev AS (
        SELECT l_partkey,
               CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                    AS BIGINT) AS r4
        FROM lineitem GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(CAST(r4 AS HUGEINT)) AS HUGEINT) AS total FROM rev
    ), cum AS (
        SELECT l_partkey, r4,
               SUM(CAST(r4 AS HUGEINT)) OVER (
                   ORDER BY r4 DESC, l_partkey
                   ROWS UNBOUNDED PRECEDING) AS c
        FROM rev
    ), cls AS (
        SELECT CASE WHEN c * 100 <= total * 80 THEN 'A'
                    WHEN c * 100 <= total * 95 THEN 'B'
                    ELSE 'C' END AS abc_class,
               r4
        FROM cum, tot
    )
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           round(SUM(CAST(r4 AS HUGEINT)) / 10000.0, 2) AS revenue
    FROM cls GROUP BY 1 ORDER BY 1
    """,
)
def win_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC inventory classification — the 80/15/5 cumulative-
    revenue cut every ops dashboard runs: parts sort by revenue, the
    running share assigns A (first 80% of total), B (to 95%), C (the
    tail), and the query reports each class's part count and revenue.

    Exactness: revenue per part is an integer (cents x discount
    basis points), the running total accumulates in decimal(38,0)/
    HUGEINT, and the class boundaries compare CROSS-MULTIPLIED
    integers (c*100 <= total*80) — no share division ever happens, so
    boundary rows classify identically in both engines; the only
    double is the final display sum, rounded 2dp. Order is total
    (revenue desc, partkey), so ties are deterministic.

    Scale: the part-grain aggregate is the one fact-scale shuffle;
    the cumulative window runs on the PART grain (200k rows/sf — at
    100 TB this is the two-phase distributed prefix-sum
    sample_stratified uses; the single-partition window is the
    sf-scale specialization)."""
    li = table(spark, sf_dir, "lineitem", spread=True)
    rev = li.select(
        "l_partkey",
        (
            F.round(F.col("l_extendedprice") * 100).cast("long")
            * (100 - F.round(F.col("l_discount") * 100).cast("long"))
        ).alias("cents"),
    ).groupBy("l_partkey").agg(
        F.sum("cents").cast("long").alias("r4")
    )
    dec = "decimal(38,0)"
    tot = rev.agg(F.sum(F.col("r4").cast(dec)).cast(dec).alias("total"))
    w = Window.orderBy(F.desc("r4"), "l_partkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = rev.select(
        "r4", F.sum(F.col("r4").cast(dec)).over(w).alias("c")
    ).crossJoin(F.broadcast(tot))
    cls = cum.select(
        F.when(
            F.col("c") * 100 <= F.col("total") * 80, F.lit("A")
        )
        .when(F.col("c") * 100 <= F.col("total") * 95, F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("abc_class"),
        "r4",
    )
    return (
        cls.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.round(
                F.sum(F.col("r4").cast(dec)) / 10000.0, 2
            ).alias("revenue"),
        )
        .orderBy("abc_class")
    )


_DTW_BIG = 10**17

_DTW_ORACLE = f"""
    WITH RECURSIVE wkv AS (
        SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                   AS isp,
               (CAST(CAST(ts AS TIMESTAMP) AS DATE)
                - DATE '1970-01-01') // 7 AS wk,
               CAST(round(value * 10000) AS BIGINT) AS v4
        FROM events WHERE event_type IN ('purchase', 'view')
    ), sa AS (
        SELECT wk, CAST(SUM(v4) AS BIGINT) AS v FROM wkv
        WHERE isp = 1 GROUP BY 1
    ), sb AS (
        SELECT wk, CAST(SUM(v4) AS BIGINT) AS v FROM wkv
        WHERE isp = 0 GROUP BY 1
    ), arrs AS (
        SELECT (SELECT list(v ORDER BY wk) FROM sa) AS a,
               (SELECT list(v ORDER BY wk) FROM sb) AS b
    ), dp AS (
        SELECT 1 AS i,
               list_transform(range(1, len(b) + 1), j ->
                 list_sum(list_transform(b[1:j],
                                         x -> abs(a[1] - x)))) AS dpr,
               a, b
        FROM arrs
        UNION ALL
        SELECT i + 1,
               list_transform(range(1, len(b) + 1), j ->
                 s[j] + list_min(g[1:j])),
               a, b
        FROM (
          SELECT i, a, b, s,
                 list_transform(range(1, len(b) + 1), k ->
                   mk[k] - CASE WHEN k > 1 THEN s[k - 1]
                           ELSE 0 END) AS g
          FROM (
            SELECT i, a, b, s,
                   list_transform(range(1, len(b) + 1), k ->
                     least(dpr[k],
                           CASE WHEN k > 1 THEN dpr[k - 1]
                                ELSE {_DTW_BIG} END)) AS mk
            FROM (
              SELECT dp.i, dp.a, dp.b, dp.dpr,
                     list_transform(range(1, len(dp.b) + 1), j ->
                       list_sum(list_transform(dp.b[1:j],
                         x -> abs(dp.a[dp.i + 1] - x)))) AS s
              FROM dp WHERE dp.i < len(dp.a)
            )
          )
        )
    )
    SELECT CAST(len(a) AS BIGINT) AS n_a,
           CAST(len(b) AS BIGINT) AS n_b,
           round(CAST(dpr[len(b)] AS DOUBLE) / 10000.0, 4) AS dtw
    FROM dp WHERE i = len(a)
"""


@query("ts_dtw", oracle=_DTW_ORACLE)
def ts_dtw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-time-warping distance between the weekly purchase and
    view value series — THE elastic similarity measure for time
    series (Sakoe-Chiba 1978): unlike ts_xcorr's fixed-lag alignment,
    DTW warps the time axis so shape similarity registers even when
    phases drift. Integer-exact throughout: weekly sums stay in the
    v4 fixed point, cell costs |a_i - b_j| and all DP sums are int64.

    Shape: the O(n*m) DP is inherently sequential in BOTH indices, so
    it rides the ts_holt/ts_kalman JVM-fold seam one size up — the
    fold state is the whole DP ROW (array<long>), one step per outer-
    series week. The within-row recurrence row[j] = e_j +
    min(m_j, row[j-1]) — normally itself sequential — factors into
    prefix sums + a prefix min via row[j] = S_j + min_k<=j(m_k -
    S_(k-1)), which both engines express with pure array ops
    (transform/slice/array_min here, list_transform/list_min in the
    oracle's recursive CTE). The series grain is DOMAIN-bounded
    (weeks, not events): the two corpus-scale aggregates are ordinary
    weekly rollups, and the fold runs on a ~hundreds-length array in
    one task regardless of corpus size."""
    e = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    day = F.datediff(
        F.col("ts").cast("timestamp").cast("date"),
        F.lit("1970-01-01").cast("date"),
    )
    wk = e.select(
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("isp"),
        (day / 7).cast("long").alias("wk"),
        F.round(F.col("value") * 10000).cast("long").alias("v4"),
    )

    def series(flag: int, name: str) -> DataFrame:
        return (
            wk.filter(F.col("isp") == flag)
            .groupBy("wk")
            .agg(F.sum("v4").cast("long").alias("v"))
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("wk", "v"))
                    ),
                    lambda s: s["v"],
                ).alias(name)
            )
        )

    from ..operators.temporal import dtw_final_row

    arrs = series(1, "a").crossJoin(series(0, "b"))
    fold = dtw_final_row(F.col("a"), F.col("b"))
    return arrs.select(
        F.size("a").cast("long").alias("n_a"),
        F.size("b").cast("long").alias("n_b"),
        F.round(
            F.element_at(fold, F.size("b")).cast("double") / 10000.0, 4
        ).alias("dtw"),
    )


@query(
    "ts_sax",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
               CAST(SUM(CAST(round(value * 10000) AS BIGINT))
                    AS BIGINT) AS v4
        FROM events WHERE event_type IN ('purchase', 'view')
        GROUP BY 1, 2
    ), idx AS (
        SELECT event_type, v4,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY day) - 1 AS i,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM daily
    ), seg AS (
        SELECT event_type, (i * 8) // n AS s,
               CAST(SUM(v4) AS BIGINT) AS ssum,
               CAST(COUNT(*) AS BIGINT) AS scnt
        FROM idx GROUP BY 1, 2
    ), stats AS (
        SELECT event_type,
               CAST(SUM(v4) AS BIGINT) AS tsum,
               CAST(SUM(CAST(v4 AS HUGEINT) * v4) AS HUGEINT) AS tssq,
               CAST(COUNT(*) AS BIGINT) AS tcnt
        FROM daily GROUP BY 1
    ), sym AS (
        SELECT s.event_type, s.s,
               CASE WHEN sig = 0.0 THEN 'b'
                    WHEN paa - mu < -0.6745 * sig THEN 'a'
                    WHEN paa - mu < 0.0 THEN 'b'
                    WHEN paa - mu < 0.6745 * sig THEN 'c'
                    ELSE 'd' END AS sym
        FROM (
          SELECT s.event_type, s.s,
                 CAST(s.ssum AS DOUBLE) / s.scnt AS paa,
                 CAST(t.tsum AS DOUBLE) / t.tcnt AS mu,
                 sqrt(CAST(t.tssq AS DOUBLE) / t.tcnt
                      - (CAST(t.tsum AS DOUBLE) / t.tcnt)
                        * (CAST(t.tsum AS DOUBLE) / t.tcnt)) AS sig
          FROM seg s JOIN stats t USING (event_type)
        ) s
    )
    SELECT event_type,
           string_agg(sym, '' ORDER BY s) AS sax,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM daily d
            WHERE d.event_type = sym.event_type) AS n_days
    FROM sym GROUP BY 1
    """,
)
def ts_sax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolic discretization (Lin et al. 2003) of the daily
    purchase/view flows: PAA into 8 equal-count segments, each
    segment's mean z-scored against the series and mapped to a 4-
    letter alphabet at the standard N(0,1) breakpoints (+/-0.6745,
    0) — the representation that turns time series into strings so
    the TEXT tier (shingles, fingerprints, edit distance) can index
    them; motif discovery and HOT SAX anomaly mining run on exactly
    this. Shape: one daily rollup, segment assignment (i*8)//n as
    integer floor arithmetic, one segment-grain aggregate, and the
    per-series moment row joined back — no window wider than the
    DOMAIN-bounded daily grain. Determinism: every compared quantity
    until the symbols is exact int64; paa/mu/sigma are IEEE doubles
    of identical integers with the comparison stated in identical
    form both sides (paa - mu < b * sigma), so the banding — and
    therefore the string — is engine-identical (the ts_rsi flag
    posture); constant series guard to 'b'."""
    from .analytics import _fdiv_sql

    e = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    daily = (
        e.select(
            "event_type",
            F.col("ts").cast("timestamp").cast("date").alias("day"),
            F.round(F.col("value") * 10000).cast("long").alias("v"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("v").cast("long").alias("v4"))
    )
    idx = daily.select(
        "event_type",
        "v4",
        (
            F.row_number().over(
                Window.partitionBy("event_type").orderBy("day")
            )
            - 1
        ).alias("i"),
        F.count(F.lit(1))
        .over(Window.partitionBy("event_type"))
        .alias("n"),
    )
    dec = "decimal(38,0)"
    seg = idx.groupBy(
        "event_type",
        F.expr(_fdiv_sql("i * 8", "n").format(DIV="div")).alias("s"),
    ).agg(
        F.sum("v4").cast("long").alias("ssum"),
        F.count(F.lit(1)).cast("long").alias("scnt"),
    )
    stats = daily.groupBy("event_type").agg(
        F.sum("v4").cast("long").alias("tsum"),
        F.sum(F.col("v4").cast(dec) * F.col("v4"))
        .cast(dec)
        .alias("tssq"),
        F.count(F.lit(1)).cast("long").alias("tcnt"),
    )
    paa = F.col("ssum").cast("double") / F.col("scnt")
    mu = F.col("tsum").cast("double") / F.col("tcnt")
    sig = F.sqrt(
        F.col("tssq").cast("double") / F.col("tcnt") - mu * mu
    )
    sym = (
        seg.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            "s",
            F.when(sig == 0.0, F.lit("b"))
            .when(paa - mu < -0.6745 * sig, F.lit("a"))
            .when(paa - mu < 0.0, F.lit("b"))
            .when(paa - mu < 0.6745 * sig, F.lit("c"))
            .otherwise(F.lit("d"))
            .alias("sym"),
        )
    )
    return (
        sym.groupBy("event_type")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("s", "sym"))),
                    lambda x: x["sym"],
                ),
                "",
            ).alias("sax")
        )
        .join(
            stats.select(
                "event_type", F.col("tcnt").alias("n_days")
            ),
            "event_type",
        )
    )


@query(
    "win_attribution",
    oracle="""
    WITH carried AS (
        SELECT event_type,
               CAST(round(value * 10000) AS BIGINT) AS v4,
               last_value(CASE WHEN event_type IN ('click', 'view')
                          THEN event_type END IGNORE NULLS)
                 OVER (PARTITION BY user_id
                       ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS touch
        FROM events
    )
    SELECT COALESCE(touch, 'direct') AS touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           round(CAST(SUM(v4) AS BIGINT) / 10000.0, 4) AS credited
    FROM carried WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def win_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAST-TOUCH marketing attribution — the canonical funnel-credit
    query: every purchase credits its value to the user's most recent
    preceding touch (click or view), or 'direct' when none precedes.
    The asof-join shape expressed as ONE user-keyed window: a
    conditional last(ignorenulls) carries the latest touch type
    forward (purchases themselves emit NULL into the carry, so the
    current row never self-attributes), the purchase rows read the
    carried value, and one aggregate rolls credit up per touch type.
    Total order (ts, event_id) makes same-timestamp races
    deterministic. Exact v4 credit sums; one fact-scale exchange on
    user_id shared by the window and nothing else."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        "ts", "event_id"
    ).rowsBetween(Window.unboundedPreceding, 0)
    carried = e.select(
        "event_type",
        F.round(F.col("value") * 10000).cast("long").alias("v4"),
        F.last(
            F.when(
                F.col("event_type").isin("click", "view"),
                F.col("event_type"),
            ),
            ignorenulls=True,
        )
        .over(w)
        .alias("touch"),
    )
    return (
        carried.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.coalesce(F.col("touch"), F.lit("direct")).alias(
                "touch_type"
            )
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.round(
                F.sum("v4").cast("long") / 10000.0, 4
            ).alias("credited"),
        )
    )


@query(
    "ts_hurst",
    oracle="""
    WITH daily AS (
        SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
               CAST(SUM(CAST(round(value * 10000) AS BIGINT))
                    AS BIGINT) AS x
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1
    ), idx AS (
        SELECT x, row_number() OVER (ORDER BY day) - 1 AS i,
               COUNT(*) OVER () AS n
        FROM daily
    ), expanded AS (
        SELECT w.w, idx.x, idx.i, idx.n,
               idx.i // w.w AS ck,
               idx.i % w.w + 1 AS t
        FROM idx, (SELECT unnest([4, 8, 16]) AS w) w
        WHERE idx.i < (idx.n // w.w) * w.w
    ), z AS (
        SELECT w, ck, t,
               w * SUM(x) OVER (PARTITION BY w, ck ORDER BY t
                                ROWS UNBOUNDED PRECEDING)
                 - t * SUM(x) OVER (PARTITION BY w, ck) AS zw,
               SUM(x) OVER (PARTITION BY w, ck) AS csum,
               SUM(CAST(x AS HUGEINT) * x)
                 OVER (PARTITION BY w, ck) AS csq
        FROM expanded
    ), chunk AS (
        SELECT w, ck,
               GREATEST(MAX(zw), 0) - LEAST(MIN(zw), 0) AS rw,
               CAST(w * MAX(csq) - CAST(MAX(csum) AS HUGEINT)
                    * MAX(csum) AS HUGEINT) AS sw2
        FROM z GROUP BY 1, 2
    ), rs AS (
        SELECT w,
               CAST(COUNT(*) AS BIGINT) AS n_chunks,
               SUM(CAST(rw AS DOUBLE) / sqrt(CAST(sw2 AS DOUBLE)))
                 / COUNT(*) AS rs_mean
        FROM chunk WHERE sw2 > 0 GROUP BY 1
    ), piv AS (
        SELECT
          MAX(CASE WHEN w = 4 THEN rs_mean END) AS rs4,
          MAX(CASE WHEN w = 8 THEN rs_mean END) AS rs8,
          MAX(CASE WHEN w = 16 THEN rs_mean END) AS rs16,
          CAST(SUM(n_chunks) AS BIGINT) AS n_chunks
        FROM rs
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n_days,
           n_chunks,
           round(rs4, 6) AS rs4,
           round(rs8, 6) AS rs8,
           round(rs16, 6) AS rs16,
           round((ln(rs16) - ln(rs4)) / (2.0 * ln(2.0)), 6) AS hurst
    FROM piv
    """,
)
def ts_hurst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent by RESCALED-RANGE (R/S) analysis of the daily
    purchase flow — the long-memory diagnostic (H > 0.5 trending,
    < 0.5 mean-reverting, 0.5 random walk) behind fractal market
    analysis, here on the same daily grid the reference's regression
    consumes. Window sizes 4/8/16 days (the driver corpus spans ~30 days, so
    every size has complete chunks); H = the log-log R/S slope,
    closed-form (ln(rs16) - ln(rs4)) / (2 ln 2) since the sizes are
    log-equally spaced.

    Exactness: cumulative deviations stay INTEGER by cross-
    multiplication — Z*w = w*prefix - t*chunk_sum, R*w = range of
    that int64, and S*w = sqrt(w*sum(x^2) - sum(x)^2) (HUGEINT/
    decimal inside the root), so each chunk's R/S is ONE double
    division of integer-derived values; per-size means average <=
    n/8 such doubles (identical structure both engines) and round at
    6 dp. Shape: one daily rollup, a 3x size fan-out on the DOMAIN-
    bounded daily grain, two windows per (size, chunk) partition —
    never a fact-scale window. Zero-variance chunks drop on both
    sides."""
    from .analytics import _fdiv_sql

    e = table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    daily = (
        e.select(
            F.col("ts").cast("timestamp").cast("date").alias("day"),
            F.round(F.col("value") * 10000).cast("long").alias("v"),
        )
        .groupBy("day")
        .agg(F.sum("v").cast("long").alias("x"))
    )
    idx = daily.select(
        "x",
        (F.row_number().over(Window.orderBy("day")) - 1).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    sizes = F.explode(F.array(F.lit(4), F.lit(8), F.lit(16))).alias(
        "w"
    )
    expanded = idx.select("x", "i", "n", sizes).filter(
        F.col("i")
        < (F.col("n") - F.pmod(F.col("n"), F.col("w")))
    ).select(
        "w",
        "x",
        F.expr(_fdiv_sql("i", "w").format(DIV="div")).alias("ck"),
        (F.pmod(F.col("i"), F.col("w")) + 1).alias("t"),
    )
    dec = "decimal(38,0)"
    wo = Window.partitionBy("w", "ck").orderBy("t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wp = Window.partitionBy("w", "ck")
    z = expanded.select(
        "w",
        "ck",
        (
            F.col("w") * F.sum("x").over(wo)
            - F.col("t") * F.sum("x").over(wp)
        ).alias("zw"),
        F.sum("x").over(wp).alias("csum"),
        F.sum(F.col("x").cast(dec) * F.col("x")).over(wp).alias("csq"),
    )
    chunk = z.groupBy("w", "ck").agg(
        (
            F.greatest(F.max("zw"), F.lit(0))
            - F.least(F.min("zw"), F.lit(0))
        ).alias("rw"),
        (
            F.max("csq").cast(dec) * F.col("w")
            - F.max("csum").cast(dec) * F.max("csum")
        ).alias("sw2"),
    )
    rs = (
        chunk.filter(F.col("sw2") > 0)
        .groupBy("w")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            (
                F.sum(
                    F.col("rw").cast("double")
                    / F.sqrt(F.col("sw2").cast("double"))
                )
                / F.count(F.lit(1))
            ).alias("rs_mean"),
        )
    )
    piv = rs.agg(
        F.max(F.when(F.col("w") == 4, F.col("rs_mean"))).alias("rs4"),
        F.max(F.when(F.col("w") == 8, F.col("rs_mean"))).alias("rs8"),
        F.max(F.when(F.col("w") == 16, F.col("rs_mean"))).alias(
            "rs16"
        ),
        F.sum("n_chunks").cast("long").alias("n_chunks"),
    )
    nd = daily.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    return piv.crossJoin(F.broadcast(nd)).select(
        "n_days",
        "n_chunks",
        F.round("rs4", 6).alias("rs4"),
        F.round("rs8", 6).alias("rs8"),
        F.round("rs16", 6).alias("rs16"),
        F.round(
            (F.log("rs16") - F.log("rs4")) / (2.0 * F.log(F.lit(2.0))),
            6,
        ).alias("hurst"),
    )
