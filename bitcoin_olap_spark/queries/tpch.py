"""TPC-H-shaped heavyweight analytics over the driver testdata
(the tables are TPC-H-ish by construction, TESTDATA.md).

These are the engine's throughput workhorses — multi-way joins +
wide aggregations where executor parallelism, broadcast planning, and
partial aggregation actually move the needle (the per-operator queries
elsewhere are semantics-focused and mostly fixed-cost at test scale).
Shapes follow TPC-H Q1/Q3/Q4/Q5/Q6/Q12/Q14/Q18, adapted to the driver
schema (o_orderpriority stands in for o_shippriority and l_shipmode;
"late" in Q4 is shipdate > orderdate + 60d since commit/receipt dates
don't exist; Q5 groups revenue by supplier nation without the
customer-nation equality, which synthetic FKs would make degenerate).

Determinism (SURVEY.md §5.1): every money/discount/tax/qty column is
exact at 4 decimal places, so `round(x * 10^4)` recovers the exact
integer numerator on both engines; all products and sums then run in
integer space (BIGINT terms; 128-bit-safe accumulation: DECIMAL(38,0)
on Spark, HUGEINT on DuckDB) and only the final scale-back division is
floating point — one IEEE op on identical integers, bit-identical
everywhere. No rounding tolerance needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query

#: 4-decimal fixed-point scale shared by both engines.
_S = 10_000


def _fx(col: str) -> Column:
    """Exact 4dp fixed-point integer of a <=4dp double column."""
    return F.round(F.col(col) * _S).cast("long")


def _fx_sql(col: str) -> str:
    """DuckDB twin of _fx."""
    return f"CAST(round({col} * {_S}) AS BIGINT)"


@query(
    "tpch_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM({_fx_sql('l_quantity')}) AS DOUBLE) / {_S} AS sum_qty,
           CAST(SUM({_fx_sql('l_extendedprice')}) AS DOUBLE) / {_S}
               AS sum_base_price,
           CAST(SUM({_fx_sql('l_extendedprice')}
                    * ({_S} - {_fx_sql('l_discount')})) AS DOUBLE)
               / {_S}::DOUBLE / {_S} AS sum_disc_price,
           CAST(SUM({_fx_sql('l_extendedprice')}
                    * ({_S} - {_fx_sql('l_discount')})
                    * ({_S} + {_fx_sql('l_tax')})) AS DOUBLE)
               / {_S}::DOUBLE / {_S} / {_S} AS sum_charge,
           CAST(SUM({_fx_sql('l_quantity')}) AS DOUBLE) / {_S}
               / COUNT(*) AS avg_qty,
           CAST(SUM({_fx_sql('l_extendedprice')}) AS DOUBLE) / {_S}
               / COUNT(*) AS avg_price,
           CAST(SUM({_fx_sql('l_discount')}) AS DOUBLE) / {_S}
               / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS TIMESTAMP) <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY 1, 2
    """,
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary report): one wide scan -> hash
    aggregate with map-side partials over 6 measures. The scan reads
    exactly the 7 referenced columns (ReadSchema) with the shipdate
    filter pushed to rowgroup stats; everything else is one shuffle of
    4 grouped rows per map task."""
    li = table(spark, sf_dir, "lineitem", spread=True).filter(
        F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp")
    )
    qty, price, disc, tax = (
        _fx("l_quantity"),
        _fx("l_extendedprice"),
        _fx("l_discount"),
        _fx("l_tax"),
    )
    n = F.count(F.lit(1))
    disc_term = price * (_S - disc)
    charge_term = (disc_term * (_S + tax)).cast("decimal(38,0)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(qty).cast("double") / _S).alias("sum_qty"),
            (F.sum(price).cast("double") / _S).alias("sum_base_price"),
            (F.sum(disc_term).cast("double") / float(_S) / _S).alias(
                "sum_disc_price"
            ),
            (
                F.sum(charge_term).cast("double") / float(_S) / _S / _S
            ).alias("sum_charge"),
            (F.sum(qty).cast("double") / _S / n).alias("avg_qty"),
            (F.sum(price).cast("double") / _S / n).alias("avg_price"),
            (F.sum(disc).cast("double") / _S / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@query(
    "tpch_q3",
    oracle=f"""
    SELECT l_orderkey,
           CAST(SUM({_fx_sql('l_extendedprice')}
                    * ({_S} - {_fx_sql('l_discount')})) AS DOUBLE)
               / {_S}::DOUBLE / {_S} AS revenue,
           CAST(o_orderdate AS TIMESTAMP) AS o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND CAST(o_orderdate AS TIMESTAMP) < TIMESTAMP '1998-06-01 00:00:00'
      AND CAST(l_shipdate AS TIMESTAMP) > TIMESTAMP '1998-06-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): filtered dim -> fact -> fact join
    chain, revenue aggregate, top-10. The BUILDING-segment customer
    side is small after its filter — broadcast both it and the
    date-filtered orders' keys side would be wrong at 100 TB, so only
    the customer dim is hinted; orders⋈lineitem stays a shuffle join
    AQE can re-plan. Ordered LIMIT fuses to TakeOrderedAndProject
    (orderkey tiebreak keeps the cut deterministic)."""
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01 00:00:00").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem", spread=True).filter(
        F.col("l_shipdate") > F.lit("1998-06-01 00:00:00").cast("timestamp")
    )
    revenue_term = _fx("l_extendedprice") * (_S - _fx("l_discount"))
    return (
        li.join(
            o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
                "o_orderkey", "o_orderdate", "o_orderpriority"
            ),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            (F.sum(revenue_term).cast("double") / float(_S) / _S).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "tpch_q5",
    oracle=f"""
    SELECT n_name,
           CAST(SUM({_fx_sql('l_extendedprice')}
                    * ({_S} - {_fx_sql('l_discount')})) AS DOUBLE)
               / {_S}::DOUBLE / {_S} AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND CAST(o_orderdate AS TIMESTAMP) >= TIMESTAMP '1996-01-01 00:00:00'
      AND CAST(o_orderdate AS TIMESTAMP) < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1
    ORDER BY revenue DESC, n_name
    """,
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume): 5-way join — two facts
    shuffle-joined on orderkey, then supplier -> nation -> region all
    broadcast (each dim is tiny; the region filter prunes through the
    broadcast chain before any fact row is touched)."""
    li = table(spark, sf_dir, "lineitem", spread=True).select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    ).select("r_regionkey")
    dims = s.join(
        F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
        s.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "n_name")
    revenue_term = _fx("l_extendedprice") * (_S - _fx("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(dims), li.l_suppkey == dims.s_suppkey)
        .groupBy("n_name")
        .agg(
            (F.sum(revenue_term).cast("double") / float(_S) / _S).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


@query(
    "tpch_q6",
    oracle=f"""
    SELECT CAST(SUM({_fx_sql('l_extendedprice')} * {_fx_sql('l_discount')})
                AS DOUBLE) / {_S}::DOUBLE / {_S} AS revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE CAST(l_shipdate AS TIMESTAMP) >= TIMESTAMP '1996-01-01 00:00:00'
      AND CAST(l_shipdate AS TIMESTAMP) < TIMESTAMP '1997-01-01 00:00:00'
      AND {_fx_sql('l_discount')} BETWEEN 500 AND 700
      AND l_quantity < 24
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): pure scan-filter-sum.
    Every predicate pushes to the parquet scan; the discount band
    compares in exact fixed-point (BETWEEN 500 AND 700) instead of the
    classic between-doubles footgun. One row out."""
    li = table(spark, sf_dir, "lineitem")
    disc_i = _fx("l_discount")
    filtered = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & disc_i.between(500, 700)
        & (F.col("l_quantity") < 24)
    )
    return filtered.agg(
        (
            F.sum(_fx("l_extendedprice") * disc_i).cast("double")
            / float(_S)
            / _S
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "tpch_q18",
    oracle=f"""
    SELECT c_name, c_custkey, o_orderkey,
           CAST(o_orderdate AS TIMESTAMP) AS o_orderdate, o_totalprice,
           CAST(SUM({_fx_sql('l_quantity')}) AS DOUBLE) / {_S} AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY 1 HAVING SUM({_fx_sql('l_quantity')}) > 200 * {_S})
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 100
    """,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customer): aggregate -> HAVING ->
    semi-join back into the fact -> enrich -> re-aggregate -> top-100.
    The HAVING keep-list is distributed as a left-semi join on
    orderkey (same shuffle partitioning as the main lineitem aggregate,
    so AQE can reuse the exchange); customer is broadcast. Quantity
    sums in exact fixed-point, top-100 cut tiebroken on orderkey."""
    li = table(spark, sf_dir, "lineitem", spread=True).select(
        "l_orderkey", "l_quantity"
    )
    qty = _fx("l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty).alias("qty_i"))
        .filter(F.col("qty_i") > 200 * _S)
        .select("l_orderkey")
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    kept = li.join(
        big.withColumnRenamed("l_orderkey", "k"),
        li.l_orderkey == F.col("k"),
        "left_semi",
    )
    return (
        kept.join(o, kept.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
        )
        .agg((F.sum(qty).cast("double") / _S).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )


@query(
    "tpch_q4",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE CAST(o_orderdate AS TIMESTAMP) >= TIMESTAMP '1996-01-01 00:00:00'
      AND CAST(o_orderdate AS TIMESTAMP) < TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND CAST(l.l_shipdate AS TIMESTAMP) >
                CAST(o.o_orderdate AS TIMESTAMP) + INTERVAL '60 days')
    GROUP BY 1 ORDER BY 1
    """,
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order priority checking): orders in a quarter
    with at least one late-shipping line item (testdata has no
    commit/receipt dates, so "late" is shipdate > orderdate + 60d).
    The correlated EXISTS is a left-semi join whose probe condition
    references both sides — Spark plans it as a semi hash join with
    the date comparison as a post-join predicate."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.timestamp_add("DAY", F.lit(60), o.o_orderdate)),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "tpch_q12",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE CAST(l_shipdate AS TIMESTAMP) >= TIMESTAMP '1996-01-01 00:00:00'
      AND CAST(l_shipdate AS TIMESTAMP) < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1 ORDER BY 1
    """,
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping priority mix): fact-fact join + CASE
    pivot counts per line status (l_linestatus stands in for
    l_shipmode, which the testdata lacks). Integer conditional sums —
    exact everywhere."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = table(spark, sf_dir, "lineitem", spread=True).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_linestatus")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "tpch_q14",
    oracle=f"""
    SELECT CAST(100 * SUM(CASE WHEN p_type = 'PROMO'
                    THEN {_fx_sql('l_extendedprice')}
                         * ({_S} - {_fx_sql('l_discount')})
                    ELSE 0 END) AS DOUBLE)
           / CAST(SUM({_fx_sql('l_extendedprice')}
                      * ({_S} - {_fx_sql('l_discount')})) AS DOUBLE)
               AS promo_revenue_pct,
           COUNT(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE CAST(l_shipdate AS TIMESTAMP) >= TIMESTAMP '1996-09-01 00:00:00'
      AND CAST(l_shipdate AS TIMESTAMP) < TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): fact ⋈ broadcast part dim, promo
    revenue share. Both sums are exact fixed-point integers; the final
    percentage is one double division of identical numerators, so no
    tolerance is needed despite being a ratio."""
    li = table(spark, sf_dir, "lineitem", spread=True).filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _fx("l_extendedprice") * (_S - _fx("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                (100 * F.sum(promo)).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n"),
        )
    )
