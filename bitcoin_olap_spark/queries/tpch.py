"""TPC-H-shaped heavyweight analytics over the driver testdata
(the tables are TPC-H-ish by construction, TESTDATA.md).

These are the engine's throughput workhorses — multi-way joins +
wide aggregations where executor parallelism, broadcast planning, and
partial aggregation actually move the needle (the per-operator queries
elsewhere are semantics-focused and mostly fixed-cost at test scale).
Shapes follow all 22 TPC-H queries, adapted to the driver schema
(o_orderpriority stands in for o_shippriority, l_shipmode, and the
comment filters; "late" in Q4/Q21 is shipdate > orderdate + 60d since
commit/receipt dates don't exist; Q5 groups revenue by supplier nation
without the customer-nation equality, which synthetic FKs would make
degenerate; Q2/Q9/Q11/Q16/Q17/Q20 derive the part-supplier link /
supply cost from lineitem and p_retailprice since there is no partsupp
table; Q22's phone country code becomes a nationkey group).

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


@query(
    "tpch_q2",
    oracle=f"""
    WITH partcost AS (
        SELECT l_partkey, l_suppkey,
               MIN({_fx_sql('l_extendedprice')}) AS cost
        FROM lineitem GROUP BY 1, 2
    )
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name,
           CAST(pc.cost AS DOUBLE) / {_S} AS supply_cost
    FROM part p
    JOIN partcost pc ON pc.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = pc.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE p.p_type = 'LARGE' AND p.p_size < 15 AND r.r_name = 'EUROPE'
      AND pc.cost = (
          SELECT MIN(pc2.cost)
          FROM partcost pc2
          JOIN supplier s2 ON s2.s_suppkey = pc2.l_suppkey
          JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
          JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
          WHERE pc2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 100
    """,
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): the correlated SCALAR
    subquery — for each qualifying part, keep only the region suppliers
    whose cost equals the per-part regional minimum. The testdata has
    no partsupp, so the part-supplier link with its "supply cost" is
    derived from lineitem: MIN exact-fixed-point extendedprice per
    (partkey, suppkey) — BIGINT, so the `cost = (SELECT MIN ...)`
    equality is exact on both engines.

    Entered through spark.sql so Catalyst performs the decorrelation
    itself: the scalar subquery becomes an aggregate-then-join on
    p_partkey (the same plan a hand-decorrelated DataFrame version
    would build), dims broadcast, and the ORDER BY ... LIMIT 100 (total
    tiebreak: acctbal desc, nation, supplier, part) fuses to
    TakeOrderedAndProject."""
    partcost = (
        table(spark, sf_dir, "lineitem", spread=True)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(_fx("l_extendedprice")).alias("cost"))
    )
    partcost.createOrReplaceTempView("v_q2_partcost")
    for t in ("part", "supplier", "nation", "region"):
        table(spark, sf_dir, t).createOrReplaceTempView(f"v_q2_{t}")
    return spark.sql(
        f"""
        SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name,
               CAST(pc.cost AS DOUBLE) / {_S} AS supply_cost
        FROM v_q2_part p
        JOIN v_q2_partcost pc ON pc.l_partkey = p.p_partkey
        JOIN v_q2_supplier s ON s.s_suppkey = pc.l_suppkey
        JOIN v_q2_nation n ON n.n_nationkey = s.s_nationkey
        JOIN v_q2_region r ON r.r_regionkey = n.n_regionkey
        WHERE p.p_type = 'LARGE' AND p.p_size < 15 AND r.r_name = 'EUROPE'
          AND pc.cost = (
              SELECT MIN(pc2.cost)
              FROM v_q2_partcost pc2
              JOIN v_q2_supplier s2 ON s2.s_suppkey = pc2.l_suppkey
              JOIN v_q2_nation n2 ON n2.n_nationkey = s2.s_nationkey
              JOIN v_q2_region r2 ON r2.r_regionkey = n2.n_regionkey
              WHERE pc2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
        ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
        LIMIT 100
        """
    )


@query(
    "tpch_q13",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c LEFT OUTER JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    ) t
    GROUP BY c_count
    """,
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): outer join
    keeping zero-order customers, then a distribution over the counts
    (o_orderpriority <> '1-URGENT' stands in for the comment NOT LIKE
    filter).

    Spark cannot broadcast the PRESERVED side of a left-outer join, so
    the naive customer-LEFT-JOIN-orders shuffles both sides on custkey.
    Instead the fact is pre-aggregated to per-customer counts FIRST
    (one shuffle over orders, map-side partials), and that tiny
    aggregate broadcasts as the right side of the outer join — at
    100 TB the orders shuffle is the only wide exchange, and the
    customer table is never moved at all."""
    c = table(spark, sf_dir, "customer").select("c_custkey")
    oc = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    per_cust = c.join(
        F.broadcast(oc), c.c_custkey == oc.o_custkey, "left_outer"
    ).select(F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("c_count"))
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


@query(
    "tpch_q16",
    oracle="""
    SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#45'
      AND p_type <> 'MEDIUM'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): anti-join against
    an excluded-supplier list + per-(brand, type, size) COUNT DISTINCT
    of suppliers. lineitem stands in for partsupp as the part-supplier
    link; "complaint" suppliers are those with negative account balance
    (the testdata lacks comments). Both the part filter and the
    exclusion list broadcast (dims are tiny relative to the fact at any
    scale); the count-distinct is the only wide aggregation."""
    li = table(spark, sf_dir, "lineitem", spread=True).select(
        "l_partkey", "l_suppkey"
    )
    p = (
        table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#45")
            & (F.col("p_type") != "MEDIUM")
            & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(
            F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti"
        )
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q20",
    oracle=f"""
    SELECT s_name, s_acctbal FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (
              SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
          AND CAST(l_shipdate AS TIMESTAMP) >=
              TIMESTAMP '1996-01-01 00:00:00'
          AND CAST(l_shipdate AS TIMESTAMP) <
              TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_suppkey, l_partkey
        HAVING SUM({_fx_sql('l_quantity')}) > 30 * {_S}
    )
    AND s_nationkey IN (
        SELECT n_nationkey FROM nation WHERE n_name LIKE 'NATION_1%')
    """,
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): the nested
    semi-join chain — suppliers who shipped > 30 units of some red part
    in 1996, restricted to a nation group. part-keys semi-restrict the
    fact (broadcast), the HAVING runs on the (suppkey, partkey) grain
    in exact fixed-point, and the surviving supplier keys semi-restrict
    the supplier dim; the nation filter is a second broadcast semi.
    Original availqty predicate (partsupp) is restated over shipped
    quantity since the testdata has no partsupp."""
    red = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = (
        table(spark, sf_dir, "lineitem", spread=True)
        .filter(
            (F.col("l_shipdate")
             >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate")
               < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .join(F.broadcast(red), F.col("l_partkey") == red.p_partkey, "left_semi")
    )
    heavy = (
        li.groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_fx("l_quantity")).alias("qty_fx"))
        .filter(F.col("qty_fx") > 30 * _S)
        .select("l_suppkey")
        .distinct()
    )
    nat = (
        table(spark, sf_dir, "nation")
        .filter(F.col("n_name").like("NATION_1%"))
        .select("n_nationkey")
    )
    s = table(spark, sf_dir, "supplier")
    return (
        s.join(
            F.broadcast(heavy), s.s_suppkey == heavy.l_suppkey, "left_semi"
        )
        .join(
            F.broadcast(nat), s.s_nationkey == nat.n_nationkey, "left_semi"
        )
        .select("s_name", "s_acctbal")
    )


@query(
    "tpch_q7",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM({_fx_sql('l_extendedprice')}
                    * ({_S} - {_fx_sql('l_discount')})) AS DOUBLE)
               / {_S}::DOUBLE / {_S} AS revenue
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND CAST(l_shipdate AS TIMESTAMP) >= TIMESTAMP '1995-01-01 00:00:00'
      AND CAST(l_shipdate AS TIMESTAMP) < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bilateral trade — revenue between a
    nation pair in either direction, by supplier nation / customer
    nation / ship year. Both nation lookups resolve through broadcast
    dims on the fact BEFORE the fact-fact join, and the symmetric pair
    predicate ((A,B) or (B,A)) prunes with them, so the only wide
    exchange is lineitem ⋈ orders on orderkey over pre-filtered rows."""
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    pair = F.col("n_name").isin("NATION_1", "NATION_2")
    s = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(n.filter(pair)), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(n.filter(pair)), F.col("c_nationkey") == n.n_nationkey)
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    o = (
        table(spark, sf_dir, "orders")
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .select("o_orderkey", "cust_nation")
    )
    li = table(spark, sf_dir, "lineitem", spread=True).filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    rev = _fx("l_extendedprice") * (_S - _fx("l_discount"))
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg((F.sum(rev).cast("double") / float(_S) / _S).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "tpch_q8",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CASE WHEN n1.n_name = 'NATION_7'
                         THEN {_fx_sql('l_extendedprice')}
                              * ({_S} - {_fx_sql('l_discount')})
                         ELSE 0 END) AS DOUBLE)
           / CAST(SUM({_fx_sql('l_extendedprice')}
                      * ({_S} - {_fx_sql('l_discount')})) AS DOUBLE)
               AS mkt_share
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN part ON p_partkey = l_partkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    JOIN region ON r_regionkey = n2.n_regionkey
    WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
      AND CAST(o_orderdate AS TIMESTAMP) >= TIMESTAMP '1995-01-01 00:00:00'
      AND CAST(o_orderdate AS TIMESTAMP) < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1 ORDER BY 1
    """,
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): NATION_7's share of STANDARD-
    part revenue sold into ASIA-nation customers, by order year. The
    share is a ratio of two exact fixed-point sums computed in ONE
    aggregation pass (conditional numerator), divided once at the end —
    bit-stable despite being a percentage. part / supplier+nation /
    customer+nation+region all broadcast against the fact; the one wide
    exchange is again lineitem ⋈ orders."""
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    s = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    asia_cust = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey")
    )
    o = (
        table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate")
             >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate")
               < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .join(F.broadcast(asia_cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "o_orderdate")
    )
    p = table(spark, sf_dir, "part").filter(
        F.col("p_type") == "STANDARD"
    ).select("p_partkey")
    li = table(spark, sf_dir, "lineitem", spread=True)
    rev = _fx("l_extendedprice") * (_S - _fx("l_discount"))
    target = F.when(F.col("supp_nation") == "NATION_7", rev).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                F.sum(target).cast("double") / F.sum(rev).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "tpch_q9",
    oracle=f"""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM({_fx_sql('l_extendedprice')}
                    * ({_S} - {_fx_sql('l_discount')})
                    - {_fx_sql('p_retailprice')} * {_fx_sql('l_quantity')})
                AS DOUBLE) / {_S}::DOUBLE / {_S} AS profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): profit per supplier nation
    per order year over parts matching a name pattern. The testdata has
    no partsupp, so supply cost is p_retailprice * quantity (same S²
    fixed-point grid as the revenue term, so the difference is an exact
    BIGINT per row accumulated in DECIMAL(38,0)/HUGEINT). The profit
    expression subtracts INSIDE the row — one aggregate, not two joined
    aggregates."""
    p = table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    ).select("p_partkey", "p_retailprice")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = table(spark, sf_dir, "lineitem", spread=True)
    amount = (
        _fx("l_extendedprice") * (_S - _fx("l_discount"))
        - _fx("p_retailprice") * _fx("l_quantity")
    ).cast("decimal(38,0)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            "nation", F.year("o_orderdate").cast("long").alias("o_year")
        )
        .agg(
            (F.sum(amount).cast("double") / float(_S) / _S).alias("profit")
        )
        .orderBy("nation", "o_year")
    )


@query(
    "tpch_q10",
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST(SUM({_fx_sql('l_extendedprice')}
                    * ({_S} - {_fx_sql('l_discount')})) AS DOUBLE)
               / {_S}::DOUBLE / {_S} AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON n_nationkey = c_nationkey
    WHERE CAST(o_orderdate AS TIMESTAMP) >= TIMESTAMP '1996-10-01 00:00:00'
      AND CAST(o_orderdate AS TIMESTAMP) < TIMESTAMP '1997-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned item reporting): lost revenue per customer
    from returned ('R') lines on a quarter's orders, top 20. Orders and
    lineitem pre-filter BEFORE their shuffle join on orderkey; the
    customer+nation enrichment broadcasts; ordered LIMIT fuses to
    TakeOrderedAndProject with custkey tiebreak."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cn = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_custkey", "c_name", "c_acctbal", "n_name"
    )
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem", spread=True).filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    rev = _fx("l_extendedprice") * (_S - _fx("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cn), o.o_custkey == cn.c_custkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg((F.sum(rev).cast("double") / float(_S) / _S).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "tpch_q11",
    oracle=f"""
    WITH partvalue AS (
        SELECT l_partkey,
               SUM({_fx_sql('l_extendedprice')} * {_fx_sql('l_quantity')})
                   AS value_fx
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        WHERE n_name LIKE 'NATION_1%'
        GROUP BY 1
    )
    SELECT l_partkey,
           CAST(value_fx AS DOUBLE) / {_S} / {_S} AS part_value
    FROM partvalue
    WHERE value_fx * 1000 > (SELECT SUM(value_fx) FROM partvalue)
    ORDER BY part_value DESC, l_partkey
    """,
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): per-part inventory value
    restricted to a supplier-nation group, keeping parts whose value
    exceeds a fixed fraction (1/1000) of the group total. No partsupp
    in the testdata, so value = Σ extendedprice × quantity from
    lineitem. The global-total scalar subquery is a 1-row broadcast
    cross join; the threshold compares INTEGERS (value_fx * 1000 >
    total_fx) — no floating-point fraction, exact on both engines.
    HUGEINT/DECIMAL(38,0) accumulation: S² per-row terms over the whole
    fact can exceed 64 bits."""
    n = table(spark, sf_dir, "nation").filter(
        F.col("n_name").like("NATION_1%")
    ).select("n_nationkey")
    s = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey")
    )
    li = table(spark, sf_dir, "lineitem", spread=True)
    term = (_fx("l_extendedprice") * _fx("l_quantity")).cast("decimal(38,0)")
    # localCheckpoint: pv feeds BOTH the scalar total and the main
    # filter; without materialization the broadcast-total subtree
    # re-executes the whole scan+join+aggregate (verified in the
    # physical plan — no ReusedExchange across the broadcast boundary,
    # its subtree gets fresh expression ids). pv is part-cardinality —
    # safe to pin at any scale.
    pv = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(term).alias("value_fx"))
        .localCheckpoint()
    )
    total = pv.agg(F.sum("value_fx").alias("total_fx"))
    return (
        pv.join(F.broadcast(total))
        .filter(F.col("value_fx") * 1000 > F.col("total_fx"))
        .select(
            "l_partkey",
            (F.col("value_fx").cast("double") / _S / _S).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "l_partkey")
    )


@query(
    "tpch_q15",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               SUM({_fx_sql('l_extendedprice')}
                   * ({_S} - {_fx_sql('l_discount')})) AS total_fx
        FROM lineitem
        WHERE CAST(l_shipdate AS TIMESTAMP) >= TIMESTAMP '1996-01-01 00:00:00'
          AND CAST(l_shipdate AS TIMESTAMP) < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY 1
    )
    SELECT s_suppkey, s_name,
           CAST(total_fx AS DOUBLE) / {_S}::DOUBLE / {_S} AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_fx = (SELECT MAX(total_fx) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): quarter revenue per supplier, keep the
    supplier(s) achieving the maximum. The `= (SELECT MAX(...))`
    equality is on the exact fixed-point BIGINT revenue — double
    round-off can't split ties differently across engines. The max is a
    1-row broadcast; the revenue view is localCheckpoint()ed because a
    broadcast subtree does NOT reuse the main plan's exchange (fresh
    expression ids) — without it the quarter scan+aggregate runs
    twice. Supplier-cardinality relation: safe to pin at any scale."""
    li = table(spark, sf_dir, "lineitem", spread=True).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    rev = _fx("l_extendedprice") * (_S - _fx("l_discount"))
    per_supp = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(rev).alias("total_fx")
    ).localCheckpoint()
    best = per_supp.agg(F.max("total_fx").alias("best_fx"))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_supp.join(F.broadcast(best))
        .filter(F.col("total_fx") == F.col("best_fx"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("total_fx").cast("double") / float(_S) / _S).alias(
                "total_revenue"
            ),
        )
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q17",
    oracle=f"""
    WITH partavg AS (
        SELECT l_partkey AS pk,
               SUM({_fx_sql('l_quantity')}) AS sum_qty_fx,
               COUNT(*) AS cnt
        FROM lineitem GROUP BY 1
    )
    SELECT CAST(SUM({_fx_sql('l_extendedprice')}) AS DOUBLE)
               / {_S} / 7.0 AS avg_yearly,
           COUNT(*) AS n
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN partavg ON pk = l_partkey
    WHERE p_brand = 'Brand#23' AND p_type = 'MEDIUM'
      AND {_fx_sql('l_quantity')} * cnt * 5 < sum_qty_fx
    """,
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): lines of a brand/type
    whose quantity is below 20% of that part's average quantity. The
    correlated per-part AVG decorrelates to a pre-aggregate joined back
    on partkey; `qty < 0.2 * avg` is restated as the INTEGER cross-
    multiplication qty_fx * cnt * 5 < sum_qty_fx — no division, no
    floating-point threshold, exact on both engines. The per-part
    aggregate and the probe join share the l_partkey shuffle key."""
    li = table(spark, sf_dir, "lineitem", spread=True)
    qty_fx = _fx("l_quantity")
    partavg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(qty_fx).alias("sum_qty_fx"), F.count(F.lit(1)).alias("cnt")
    )
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_type") == "MEDIUM")
    ).select("p_partkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(partavg, li.l_partkey == partavg.pk)
        .filter(qty_fx * F.col("cnt") * 5 < F.col("sum_qty_fx"))
        .agg(
            (F.sum(_fx("l_extendedprice")).cast("double") / _S / 7.0).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "tpch_q19",
    oracle=f"""
    SELECT CAST(SUM({_fx_sql('l_extendedprice')}
                    * ({_S} - {_fx_sql('l_discount')})) AS DOUBLE)
               / {_S}::DOUBLE / {_S} AS revenue,
           COUNT(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 21)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 40)
    """,
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): the disjunctive-predicate join —
    three OR'd conjunctions mixing part attributes (brand, size) with
    lineitem attributes (quantity bands). The join stays a single
    equi-join on partkey (broadcast part side); the disjunction is a
    post-join filter Catalyst can't split, but the common
    `p_size >= 1` / brand membership conjuncts are pushed to the part
    scan as an OR-of-brands filter."""
    li = table(spark, sf_dir, "lineitem", spread=True).select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
    ).select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & q.between(1, 21))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
           & q.between(10, 30))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35)
           & q.between(20, 40))
    )
    rev = _fx("l_extendedprice") * (_S - _fx("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            (F.sum(rev).cast("double") / float(_S) / _S).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "tpch_q21",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier, lineitem l1, orders
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND CAST(l1.l_shipdate AS TIMESTAMP) >
          CAST(o_orderdate AS TIMESTAMP) + INTERVAL '60 days'
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3, orders o3
          WHERE o3.o_orderkey = l3.l_orderkey
            AND l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND CAST(l3.l_shipdate AS TIMESTAMP) >
                CAST(o3.o_orderdate AS TIMESTAMP) + INTERVAL '60 days')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): on finished
    orders, the supplier who shipped late (shipdate > orderdate + 60d —
    the testdata has no commit/receipt dates) while every OTHER supplier
    on the order shipped on time, and the order is genuinely
    multi-supplier. Instead of the EXISTS / NOT-EXISTS pair (two more
    passes over the fact), ONE aggregation per order computes
    n_suppliers, n_late_suppliers, and the sole late supplier; the
    qualifying orders (n_supp > 1, n_late = 1) then count per supplier
    — numwait counts LATE LINES (the oracle's l1 grain), accumulated
    per order during the same aggregation. One orderkey shuffle
    replaces the correlated-subquery double scan — the formulation a
    100 TB plan needs. The supplier-distinct counts stack as TWO hash
    aggregates — (order, supplier) grain first, then order grain — so
    no multi-countDistinct Expand ever multiplies the joined fact; the
    second aggregate reuses the first's hash partitioning (orderkey is
    a prefix of its grouping key)."""
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = table(spark, sf_dir, "lineitem", spread=True).select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = F.col("l_shipdate") > F.timestamp_add(
        "DAY", F.lit(60), F.col("o_orderdate")
    )
    per_supp = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.sum(F.when(late, 1).otherwise(0)).alias("supp_late_lines"))
    )
    is_late = F.col("supp_late_lines") > 0
    per_order = (
        per_supp.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_supp"),
            F.sum(F.when(is_late, 1).otherwise(0)).alias("n_late"),
            F.max(F.when(is_late, F.col("l_suppkey"))).alias("late_supp"),
            F.sum("supp_late_lines").alias("late_lines"),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_order.join(F.broadcast(s), F.col("late_supp") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("late_lines").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


@query(
    "tpch_q22",
    oracle=f"""
    WITH avgbal AS (
        SELECT SUM({_fx_sql('c_acctbal')}) AS sum_fx, COUNT(*) AS cnt
        FROM customer
        WHERE c_acctbal > 0 AND c_nationkey % 5 IN (1, 2, 3)
    )
    SELECT CAST(c_nationkey AS BIGINT) AS cntrycode,
           COUNT(*) AS numcust,
           CAST(SUM({_fx_sql('c_acctbal')}) AS DOUBLE) / {_S} AS totacctbal
    FROM customer, avgbal
    WHERE c_nationkey % 5 IN (1, 2, 3)
      AND {_fx_sql('c_acctbal')} * cnt > sum_fx
      AND NOT EXISTS (
          SELECT 1 FROM orders WHERE o_custkey = c_custkey
            AND CAST(o_orderdate AS TIMESTAMP) >=
                TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY 1
    ORDER BY 1
    """,
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): well-funded
    customers in a country group with no RECENT orders (every testdata
    customer has SOME order, so the classic never-ordered predicate is
    restated with a date cutoff — same anti-join shape, non-degenerate
    result). The phone-prefix country code becomes c_nationkey % 5
    membership (no phone column); `acctbal > (SELECT AVG ...)` is
    restated as the integer cross-multiplication bal_fx * cnt > sum_fx
    (exact, no division); the no-recent-orders test is a left-anti join
    against the date-filtered orders fact — the only wide operation,
    and the filter pushes below it."""
    grp = (F.col("c_nationkey") % 5).isin(1, 2, 3)
    c = table(spark, sf_dir, "customer").filter(grp)
    avgbal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            F.sum(_fx("c_acctbal")).alias("sum_fx"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    o = (
        table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate")
            >= F.lit("2000-01-01 00:00:00").cast("timestamp")
        )
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(avgbal))
        .filter(_fx("c_acctbal") * F.col("cnt") > F.col("sum_fx"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").cast("long").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum(_fx("c_acctbal")).cast("double") / _S).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
