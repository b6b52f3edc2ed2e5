"""Scalar functions (SURVEY.md §2.8): casts, date truncation, signed
satoshi scaling, unnest, array indexing, struct row-values, log.

All JVM-side Catalyst expressions inside whole-stage codegen — no
Python UDFs. Non-associative float ops (ln) are rounded on both sides;
exact IEEE ops (negate/divide) are left raw.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query(
    "fn_timestamp_cast",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS VARCHAR) AS TIMESTAMP) AS order_ts
    FROM orders
    """,
)
def fn_timestamp_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIMESTAMP(string) cast (mirrors `TIMESTAMP(block_timestamp)`,
    btcolap.sql:97): round-trip timestamp -> string -> timestamp."""
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderdate").cast("string").cast("timestamp").alias("order_ts"),
    )


@query(
    "fn_date_trunc",
    oracle="""
    SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS ship_month,
           COUNT(*) AS n_lines
    FROM lineitem
    GROUP BY 1
    """,
)
def fn_date_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATE_TRUNC (btcolap.sql:458; btc_logregression_pre.py:20) at
    month grain — note the arg-order dialect flip: Spark is
    date_trunc(fmt, ts), DuckDB is date_trunc(part, ts)."""
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month"))
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )


@query(
    "fn_neg_div",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           -l_extendedprice / 100000000 AS val_btc
    FROM lineitem
    """,
)
def fn_neg_div(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unary negation + division — the satoshi->BTC scaling with the
    input-negative sign convention (`-input.value/100000000 AS val`,
    btcolap.sql:108). Negate and divide are exactly-rounded IEEE ops,
    bit-identical across engines, so no rounding is needed."""
    from ..functions import btc_from_satoshi

    return table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        btc_from_satoshi("l_extendedprice", negate=True).alias("val_btc"),
    )


@query(
    "fn_unnest",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS word
    FROM documents
    """,
)
def fn_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNNEST(array) -> rows (btcolap.sql:53 etc.) over a real array
    built by split; explode drops empty arrays exactly like BigQuery's
    CROSS JOIN UNNEST (SURVEY.md §4)."""
    return table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )


@query(
    "fn_array_offset",
    oracle="""
    SELECT l_orderkey,
           list_sort(list(l_partkey))[1] AS first_part,
           list_sort(list(l_partkey))[-1] AS last_part
    FROM lineitem GROUP BY l_orderkey
    """,
)
def fn_array_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array indexing (`input_addresses[OFFSET(0)]`, btcolap.sql:230).
    BigQuery OFFSET(0) is zero-based; Spark element_at and DuckDB [n]
    are 1-based; element_at(-1) / [-1] take the last element.
    Scale classification (r8, min of 3): 3.33x sf0.1 -> **0.49x sf1**
    — inverts outright one decade up; the sf0.1 ratio was a
    scheduling floor on a 0.15 s duck pass."""
    parts = F.sort_array(F.collect_list("l_partkey"))
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.element_at(parts, 1).alias("first_part"),
            F.element_at(parts, -1).alias("last_part"),
        )
    )


@query(
    "fn_struct_ctor",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE struct_pack(k1 := l_orderkey, k2 := l_linenumber) IN (
        SELECT struct_pack(k1 := l_orderkey, k2 := l_linenumber)
        FROM lineitem WHERE l_quantity > 45)
    """,
)
def fn_struct_ctor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRUCT(a, b) row-value construction used in an IN-subquery
    (mirrors `STRUCT(wallet, address) IN (SELECT STRUCT(...))`,
    btcolap.sql:3-4): a left-semi join on a struct-typed key column.
    The struct is a named column on both sides so Catalyst treats it as
    an equi-join key (hash join) — a raw `struct(...) == struct(...)`
    predicate inside the condition degrades to a nested-loop join."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    with_k = li.withColumn("k", F.struct("l_orderkey", "l_linenumber"))
    keys = with_k.filter(F.col("l_quantity") > 45).select("k")
    return with_k.join(keys, "k", "left_semi").drop("k")


@query(
    "fn_log",
    oracle="""
    SELECT o_orderkey, ROUND(LN(o_totalprice), 6) AS log_price
    FROM orders WHERE o_totalprice > 0
    """,
)
def fn_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Natural log (the reference's np.log regression transform,
    btc_logregression_pre.py:77-78) kept in-engine. ln is not required
    to be correctly rounded by IEEE, so both sides round to 6 dp."""
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 0)
        .select(
            "o_orderkey", F.round(F.log("o_totalprice"), 6).alias("log_price")
        )
    )


@query(
    "fn_str_literal_cmp",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_mktsegment != 'BUILDING' AND c_name >= 'Customer#000000100'
    """,
)
def fn_str_literal_cmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String literal comparisons incl. != and ordering (btcolap.sql:230,
    btc_logregression_post.py:38); both engines default to binary
    collation so lexicographic ordering agrees."""
    return (
        table(spark, sf_dir, "customer")
        .filter(
            (F.col("c_mktsegment") != "BUILDING")
            & (F.col("c_name") >= "Customer#000000100")
        )
        .select("c_custkey", "c_name", "c_mktsegment")
    )


@query(
    "fn_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
    """,
)
def fn_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-path extraction over the semi-structured props column
    (beyond the reference's surface — SURVEY.md §2.8 notes it uses no
    JSON functions — but table stakes for an events pipeline). Stays
    JVM-side via get_json_object; the extracted predicate filters
    post-scan (JSON paths cannot push into parquet row groups — at
    scale, hot keys get materialized into typed columns instead)."""
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.select("event_id", k.alias("k"))
        .filter(F.col("k") >= 50)
    )


@query(
    "fn_date_arith",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS due_date,
           date_diff('day', DATE '1995-01-01',
                     CAST(o_orderdate AS DATE)) AS days_since,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP)
               AS month_end,
           CAST(month(o_orderdate) AS BIGINT) AS order_month
    FROM orders
    """,
)
def fn_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic family: offset (+30 days), day difference from
    an epoch, month-end snap, month extraction — the calendar ops a
    time-partitioned ledger needs beyond the reference's date_trunc
    (btcolap.sql:458). All integer calendar math, exact on both
    engines."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_add(F.col("o_orderdate"), 30).cast("timestamp").alias("due_date"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.month("o_orderdate").cast("long").alias("order_month"),
    )


@query(
    "fn_string_funcs",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS uname,
           CAST(length(c_name) AS BIGINT) AS name_len,
           substring(c_name, 1, 8) AS prefix,
           concat(c_mktsegment, ':', c_name) AS tagged,
           CAST(levenshtein(c_name, c_mktsegment) AS BIGINT) AS edit_dist
    FROM customer
    """,
)
def fn_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar family: case fold, length, substring, concat, and
    Levenshtein edit distance (the fuzzy-match primitive behind entity
    resolution on dirty dimensions like the reference's wallet names,
    wallet_location2.ndjson). All JVM-side codegen'd expressions."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.length("c_name").cast("long").alias("name_len"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.concat(F.col("c_mktsegment"), F.lit(":"), F.col("c_name")).alias(
            "tagged"
        ),
        F.levenshtein("c_name", "c_mktsegment").cast("long").alias(
            "edit_dist"
        ),
    )


@query(
    "fn_try_cast",
    oracle="""
    SELECT event_id,
           TRY_CAST(s AS BIGINT) AS as_int,
           CAST(TRY_CAST(s AS DATE) AS TIMESTAMP) AS as_date
    FROM (
        SELECT event_id,
               CASE WHEN event_id % 3 = 0 THEN CAST(user_id AS VARCHAR)
                    WHEN event_id % 3 = 1 THEN '2024-01-' ||
                         lpad(CAST((event_id % 28) + 1 AS VARCHAR), 2, '0')
                    ELSE event_type END AS s
        FROM events
    )
    """,
)
def fn_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe casts: TRY_CAST returns NULL on malformed input
    where CAST would throw (ANSI mode) or silently corrupt — the
    ingest-hygiene primitive for semi-trusted feeds. The synthetic
    string column interleaves clean integers, ISO dates, and plain
    words; each salvage expression keeps its own slice and nulls the
    rest, all JVM-side inside codegen.

    The date salvage is format-pinned (try_to_timestamp 'yyyy-MM-dd')
    rather than a bare try_cast to DATE: Spark's string->date cast
    parses bare 4+-digit integers as YEAR dates where DuckDB's
    TRY_CAST nulls them — a dialect divergence invisible at the
    sf0.01 compare (user_id < 1000 there) that both diverges the
    engines at sf0.1+ and CRASHES at sf1, where 7-digit user_ids
    parse as year ~1e6 dates whose midnight timestamp overflows
    daysToMicros (measured: the r9 sf1 campaign died here). The
    pinned format states the intended semantics — only the ISO slice
    is a date — identically at every scale."""
    e = table(spark, sf_dir, "events")
    s = (
        F.when(
            F.col("event_id") % 3 == 0, F.col("user_id").cast("string")
        )
        .when(
            F.col("event_id") % 3 == 1,
            F.concat(
                F.lit("2024-01-"),
                F.lpad(((F.col("event_id") % 28) + 1).cast("string"), 2, "0"),
            ),
        )
        .otherwise(F.col("event_type"))
    )
    return e.select(
        "event_id",
        s.try_cast("long").alias("as_int"),
        # date -> midnight timestamp: a DATE column's nulls surface as
        # object-dtype None in Spark's toPandas but NaT in DuckDB's —
        # timestamp-typed nulls canonicalize identically on both sides
        F.try_to_timestamp(s, F.lit("yyyy-MM-dd")).alias("as_date"),
    )


@query(
    "fn_unnest_ordinal",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    SELECT doc_id, u.i AS idx, u.w AS word FROM (
        SELECT doc_id,
               unnest(list_transform(
                   range(len(ws)),
                   i -> struct_pack(i := CAST(i AS BIGINT),
                                    w := ws[i + 1]))) AS u
        FROM w)
    """,
)
def fn_unnest_ordinal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNNEST WITH ORDINALITY — position-preserving explode
    (posexplode): downstream reassembly and windowing need the
    element's source position, which plain explode discards (fn_unnest)
    and aggregation order cannot recover. The 0-based index matches
    BigQuery's `WITH OFFSET`; DuckDB lacks the clause, so the oracle
    states it via an indexed struct expansion."""
    return table(spark, sf_dir, "documents").select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("idx", "word"),
    ).select("doc_id", F.col("idx").cast("long").alias("idx"), "word")


@query(
    "fn_map_ops",
    oracle="""
    WITH c AS (
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS cnt
        FROM orders GROUP BY 1, 2
    )
    SELECT o_orderpriority,
           string_agg(o_orderstatus || '=' || cnt, ','
                      ORDER BY o_orderstatus) AS status_counts,
           COALESCE(MAX(CASE WHEN o_orderstatus = 'O' THEN cnt END), 0)
               AS open_count,
           CAST(COUNT(*) AS BIGINT) AS n_statuses
    FROM c GROUP BY 1
    """,
)
def fn_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-typed column family: build a status->count map per priority
    with map_from_entries over a sorted entry list, then consume it
    with map_entries / element_at / map_keys — the key-value shape
    feature stores and per-entity counters use. The map stays internal
    (registered queries emit scalar-only columns): entries serialize to
    a sorted 'k=v' CSV, element_at probes one key, size(map_keys)
    counts them. All JVM-side Catalyst map expressions inside codegen;
    deterministic because the entry list is sort_array'ed before the
    map is built (map iteration order follows insertion). DuckDB lacks
    Spark's map surface, so the oracle states the same facts with
    string_agg + conditional MAX over the count relation."""
    c = (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    m = c.groupBy("o_orderpriority").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("o_orderstatus", "cnt")))
        ).alias("m")
    )
    return m.select(
        "o_orderpriority",
        F.array_join(
            F.transform(
                F.map_entries("m"),
                lambda e: F.concat_ws(
                    "=", e["key"], e["value"].cast("string")
                ),
            ),
            ",",
        ).alias("status_counts"),
        F.coalesce(F.element_at("m", F.lit("O")), F.lit(0))
        .cast("long")
        .alias("open_count"),
        F.size(F.map_keys("m")).cast("long").alias("n_statuses"),
    )


@query(
    "fn_url_parse",
    oracle="""
    SELECT event_id,
           CASE WHEN event_id % 11 = 0 THEN NULL
                ELSE 'ex' || CAST(user_id % 5 AS VARCHAR)
                     || '.example.com' END AS host,
           CASE WHEN event_id % 11 = 0 THEN NULL
                ELSE '/' || event_type || '/item' END AS path,
           CASE WHEN event_id % 11 = 0 THEN NULL
                ELSE 'id=' || CAST(event_id AS VARCHAR)
                     || '&u=' || CAST(user_id AS VARCHAR) END AS query,
           CASE WHEN event_id % 11 = 0 THEN NULL
                ELSE CAST(user_id AS VARCHAR) END AS user_param
    FROM events
    """,
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition with parse_url (HOST / PATH / QUERY / single
    query parameter) — the log-and-clickstream scalar family every
    web-data pipeline leans on (and a crawl-curation primitive:
    domain-level filtering and URL dedup both start here). The URL is
    synthesized in-query from events columns (the fn_try_cast
    posture), with every 11th row NULL to pin null propagation; the
    oracle, knowing the construction, states each component directly,
    so this checks Spark's parser against ground truth rather than
    against another parser's quirks. Map-only, JVM-side, inside
    whole-stage codegen."""
    e = table(spark, sf_dir, "events")
    url = F.when(
        F.col("event_id") % 11 != 0,
        F.concat(
            F.lit("https://ex"),
            (F.col("user_id") % 5).cast("string"),
            F.lit(".example.com/"),
            F.col("event_type"),
            F.lit("/item?id="),
            F.col("event_id").cast("string"),
            F.lit("&u="),
            F.col("user_id").cast("string"),
        ),
    )
    return e.select(
        "event_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("u")).alias(
            "user_param"
        ),
    )


@query(
    "fn_transform_lambda",
    oracle="""
    SELECT l_orderkey,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
               AS total_qty,
           CAST(SUM(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_big,
           CAST(SUM(CAST(round(l_quantity) AS BIGINT)
                    * CAST(round(l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS qty_price_c,
           CAST(MAX(CAST(round(l_discount * 100) AS BIGINT))
                AS BIGINT) AS max_disc_pct
    FROM lineitem
    GROUP BY 1
    """,
)
def fn_transform_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array lambdas — transform / filter / aggregate /
    zip_with over per-order line arrays, the SQL-lambda surface
    (Spark's HOFs run INSIDE codegen on the JVM: a lambda over an
    array column is a tight loop in generated Java, never a Python
    round-trip — the idiomatic replacement for every per-row UDF that
    walks a collection). The oracle states each lambda's algebraic
    meaning directly on the flat relation, pinning the HOF pipeline to
    ground truth rather than to another list implementation.

    Shape: ONE l_orderkey hash aggregate builds the line arrays
    (collect_list of structs, map-side partials); every lambda then
    runs map-side on the grouped row — zero further exchanges. All
    arithmetic is exact int64 (qty units, price/discount cents);
    array order inside a group is made irrelevant by reducing with
    commutative folds (sum / count / max)."""
    li = table(spark, sf_dir, "lineitem", spread=True).select(
        "l_orderkey",
        F.round("l_quantity").cast("long").alias("qty"),
        F.round(F.col("l_extendedprice") * 100)
        .cast("long")
        .alias("price_c"),
        F.round(F.col("l_discount") * 100)
        .cast("long")
        .alias("disc_pct"),
    )
    g = li.groupBy("l_orderkey").agg(
        F.collect_list(F.struct("qty", "price_c", "disc_pct")).alias(
            "lines"
        )
    )
    qtys = F.transform(F.col("lines"), lambda x: x["qty"])
    prices = F.transform(F.col("lines"), lambda x: x["price_c"])
    zero = F.lit(0).cast("long")
    return g.select(
        "l_orderkey",
        F.size("lines").cast("long").alias("n_lines"),
        F.aggregate(qtys, zero, lambda acc, x: acc + x).alias(
            "total_qty"
        ),
        F.size(F.filter(qtys, lambda x: x > 25))
        .cast("long")
        .alias("n_big"),
        F.aggregate(
            F.zip_with(qtys, prices, lambda q, p: q * p),
            zero,
            lambda acc, x: acc + x,
        ).alias("qty_price_c"),
        F.array_max(
            F.transform(F.col("lines"), lambda x: x["disc_pct"])
        )
        .cast("long")
        .alias("max_disc_pct"),
    )
