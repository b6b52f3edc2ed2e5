"""Window functions, sorts/limits, and set operations
(SURVEY.md §2.5-2.7).

Scale notes: global ORDER BY lowers to a range-partitioned total sort
(sampled boundaries, one shuffle); ORDER BY + LIMIT fuses to
TakeOrderedAndProject (per-partition top-k, tiny driver merge — no full
sort at any scale); UNION ALL is a zero-shuffle concatenation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table
from ..registry import query


@query(
    "win_row_number",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROW_NUMBER() OVER (
               PARTITION BY l_orderkey
               ORDER BY l_shipdate, l_linenumber) AS rn
    FROM lineitem
    """,
)
def win_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROW_NUMBER() OVER (PARTITION BY ... ORDER BY ...) — the
    reference's only window function, its dedup primitive
    (btcolap.sql:9, :295; dupedeleter.sql:5,10). The window ORDER BY
    carries a unique tiebreaker (l_linenumber) so rank assignment is
    deterministic, unlike the reference's degenerate ORDER BY
    (SURVEY.md §2.5)."""
    w = Window.partitionBy("l_orderkey").orderBy("l_shipdate", "l_linenumber")
    return table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.row_number().over(w).cast("long").alias("rn"),
    )


@query(
    "srt_multicol",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice
    FROM orders
    ORDER BY o_orderdate, o_orderkey
    """,
)
def srt_multicol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column global ORDER BY (btcolap.sql:58-59 `ORDER BY
    block_timestamp, wallet`): a range-partitioned total sort — Spark
    samples key boundaries so each of N output partitions holds a
    contiguous range; no single-node sort even at 100 TB."""
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy("o_orderdate", "o_orderkey")
    )


@query(
    "srt_by_agg",
    oracle="""
    SELECT event_type, COUNT(*) AS occurrence_count
    FROM events
    GROUP BY event_type
    ORDER BY occurrence_count DESC, event_type
    """,
)
def srt_by_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY an aggregated value, largest first (the dup-checker's
    `ORDER BY occurrence_count DESC`, btcolap.sql:30-31), with a key
    tiebreaker for total determinism."""
    return (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("occurrence_count"))
        .orderBy(F.desc("occurrence_count"), "event_type")
    )


@query(
    "lim_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def lim_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT n (the reference's debug bound, btcolap.sql:153, :204) —
    paired with a total ORDER BY for determinism (SURVEY.md §2.6).
    Catalyst fuses sort+limit into TakeOrderedAndProject: each task
    keeps its local top-10, the driver merges — no global sort."""
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
    )


@query(
    "set_union_all",
    oracle="""
    SELECT l_orderkey AS txid, l_linenumber AS line_no,
           'input' AS type, -l_extendedprice AS val
    FROM lineitem WHERE l_returnflag = 'R'
    UNION ALL
    SELECT l_orderkey AS txid, l_linenumber AS line_no,
           'output' AS type, l_extendedprice AS val
    FROM lineitem WHERE l_returnflag != 'R'
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of tagged input/output branches into one ledger — the
    reference's core flow construction (negative-val inputs stacked
    with positive-val outputs, btcolap.sql:136-140 with the sign
    convention of :108/:126). Pure concatenation: no shuffle."""
    li = table(spark, sf_dir, "lineitem")
    inputs = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("txid"),
        F.col("l_linenumber").alias("line_no"),
        F.lit("input").alias("type"),
        (-F.col("l_extendedprice")).alias("val"),
    )
    outputs = li.filter(F.col("l_returnflag") != "R").select(
        F.col("l_orderkey").alias("txid"),
        F.col("l_linenumber").alias("line_no"),
        F.lit("output").alias("type"),
        F.col("l_extendedprice").alias("val"),
    )
    return inputs.unionByName(outputs)


@query(
    "set_union_distinct",
    oracle="""
    SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_quantity > 40
    UNION
    SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_discount > 0.07
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-column UNION DISTINCT (btcolap.sql:280, :308): overlapping
    branch predicates make real cross-branch duplicates, deduped by a
    hash aggregate with map-side partials."""
    li = table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") > 40).select("l_orderkey", "l_suppkey")
    b = li.filter(F.col("l_discount") > 0.07).select("l_orderkey", "l_suppkey")
    return a.unionByName(b).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics): nations present on both the
    customer and supplier side. Not used by the reference
    (SURVEY.md §2.7) but part of the complete set-op surface; plans as
    a left-semi hash join over distincts."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


@query(
    "set_except",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    EXCEPT
    SELECT c_custkey AS custkey FROM customer WHERE c_custkey % 2 = 0
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics): ordering customers minus the
    even-keyed half of the customer dimension — real survivors on both
    the matched and unmatched side. Plans as a left-anti hash join over
    distincts."""
    o = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey")
    )
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 2 == 0)
        .select(F.col("c_custkey").alias("custkey"))
    )
    return o.subtract(c)


@query(
    "set_except_all",
    oracle="""
    SELECT event_type, user_id FROM events
    EXCEPT ALL
    SELECT event_type, user_id FROM events WHERE value > 100
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics): multiplicities SUBTRACT instead of
    rows vanishing — a (event_type, user_id) pair occurring 9 times
    minus 4 high-value occurrences survives 5 times, which distinct
    EXCEPT cannot express. Spark plans exceptAll as a generated-column
    trick (tag each side +1/-1, sum counts per row value, replicate by
    the positive remainder) — one hash aggregate, no join; the same
    multiset algebra DuckDB applies."""
    e = table(spark, sf_dir, "events").select("event_type", "user_id")
    hi = (
        table(spark, sf_dir, "events")
        .filter(F.col("value") > 100)
        .select("event_type", "user_id")
    )
    return e.exceptAll(hi)


@query(
    "set_intersect_all",
    oracle="""
    SELECT event_type, user_id FROM events WHERE value > 50
    INTERSECT ALL
    SELECT event_type, user_id FROM events WHERE value < 150
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics): each (event_type, user_id) pair
    survives min(multiplicity_left, multiplicity_right) times — the
    overlap of the two value bands keeps per-pair counts that distinct
    INTERSECT (set_intersect) collapses to one. Completes the bag-
    semantics set family next to set_except_all: Spark plans
    intersectAll as the same tag-and-count hash aggregate (per-side
    counts, replicate by the minimum), one shuffle on the row value,
    no join — identical multiset algebra to DuckDB's."""
    ev = table(spark, sf_dir, "events")
    a = ev.filter(F.col("value") > 50).select("event_type", "user_id")
    b = (
        table(spark, sf_dir, "events")
        .filter(F.col("value") < 150)
        .select("event_type", "user_id")
    )
    return a.intersectAll(b)
