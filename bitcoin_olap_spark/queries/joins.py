"""Joins, including the reference's distinctive nested-array shapes
(SURVEY.md §2.3).

Scale notes per join:
- dim joins are explicitly `F.broadcast` (no shuffle of the fact side;
  the reference's wallet_location dim is 121 rows, btcolap.sql:429-430);
- fact-fact joins shuffle on the join key and rely on AQE for runtime
  sort-merge/broadcast choice and skew splitting (exchange hot wallets
  make transaction_hash/wallet skewed);
- explode-then-join keeps the explode *before* the join so the join key
  is the exploded element — the dim side is broadcast, so the exploded
  fact never shuffles (btcolap.sql:52-57's UNNEST(addresses) JOIN addr).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions import ORACLE_DAY, day, exact_sum, oracle_exact_sum
from ..registry import query


@query(
    "join_unnest_addr",
    oracle="""
    SELECT l_orderkey, l_suppkey AS suppkey, s_name
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    """,
)
def join_unnest_addr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode-then-join: array element joined against a small dim
    (mirrors `UNNEST(addresses) AS iaddress JOIN addr ON iaddress =
    addr.address`, btcolap.sql:52-57). The array is built in-query
    (testdata has no address arrays, FIXTURES.md §B): per-order supplier
    lists, exploded back to elements, joined to the broadcast supplier
    dim. collect_list/explode is multiset-faithful, so the oracle is the
    flat equivalent join."""
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    order_supps = li.groupBy("l_orderkey").agg(
        F.collect_list("l_suppkey").alias("supps")
    )
    exploded = order_supps.select(
        "l_orderkey", F.explode("supps").alias("suppkey")
    )
    return exploded.join(
        F.broadcast(supp), exploded.suppkey == supp.s_suppkey
    ).select("l_orderkey", "suppkey", "s_name")


@query(
    "join_hash_on_txid",
    oracle="""
    SELECT o_orderkey, o_orderdate, l_linenumber, l_extendedprice
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    """,
)
def join_hash_on_txid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact x fact equi join on the transaction key (mirrors
    `JOIN txid_filter ON txid_filter.transaction_hash = tx.hash`,
    btcolap.sql:112-114). Both sides shuffle on the key; AQE picks the
    physical strategy and splits skewed partitions."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    return o.join(li, o.o_orderkey == li.l_orderkey, "inner").select(
        "o_orderkey", "o_orderdate", "l_linenumber", "l_extendedprice"
    )


@query(
    "join_inner_explicit",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer INNER JOIN orders ON o_custkey = c_custkey
    WHERE o_orderstatus = 'F'
    """,
)
def join_inner_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit INNER JOIN (btcolap.sql:216-217) with a pushed filter on
    the probe side."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, o.o_custkey == c.c_custkey, "inner").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "join_dim_broadcast",
    oracle=f"""
    SELECT r_name, COUNT(*) AS n_customers,
           {oracle_exact_sum('c_acctbal', 'total_acctbal')}
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def join_dim_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-enrichment join with explicit broadcast (mirrors
    ledger x wallet_location ON wallet, btcolap.sql:428-430; the dim is
    121 rows there, 25/5 here). Broadcasting both dims means the fact
    table never shuffles for the join — only the final tiny group-by
    exchanges."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            exact_sum("c_acctbal", "total_acctbal"),
        )
    )


@query(
    "join_lateral_structs",
    oracle="""
    SELECT l_orderkey, l_linenumber AS line_no, l_returnflag AS flag
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber AS line_no, l_linestatus AS flag
    FROM lineitem
    """,
)
def join_lateral_structs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated two-level unnest of array-of-struct (mirrors
    `FROM transactions AS tx, tx.inputs AS input, UNNEST(input.addresses)`,
    btcolap.sql:109-111): build array<struct<line_no, flags:array>> per
    order, explode the struct array, then explode the inner array.
    Default `explode` (not explode_outer) matches BigQuery's CROSS JOIN
    UNNEST semantics of dropping empty arrays (SURVEY.md §4)."""
    li = table(spark, sf_dir, "lineitem")
    nested = li.groupBy("l_orderkey").agg(
        F.collect_list(
            F.struct(
                F.col("l_linenumber").alias("line_no"),
                F.array("l_returnflag", "l_linestatus").alias("flags"),
            )
        ).alias("items")
    )
    lvl1 = nested.select("l_orderkey", F.explode("items").alias("item"))
    return lvl1.select(
        "l_orderkey",
        F.col("item.line_no").alias("line_no"),
        F.explode("item.flags").alias("flag"),
    )


@query(
    "join_pd_merge_date",
    oracle=f"""
    WITH daily_in AS (
        SELECT {ORACLE_DAY.format(col='ts')} AS day,
               {oracle_exact_sum('-value', 'txid_input')}
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), daily_out AS (
        SELECT {ORACLE_DAY.format(col='ts')} AS day,
               {oracle_exact_sum('value', 'txid_output')}
        FROM events WHERE event_type = 'view' GROUP BY 1
    )
    SELECT daily_in.day AS day, txid_input, txid_output
    FROM daily_in JOIN daily_out ON daily_in.day = daily_out.day
    """,
)
def join_pd_merge_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's driver-side `pd.merge(daily_inputs, daily_outputs,
    on='date', how='inner')` (btc_logregression_pre.py:49) pushed into
    the engine: join the two daily aggregates before any collect. Both
    inputs are day-grain (tiny), so the join is a broadcast at runtime
    via AQE."""
    e = table(spark, sf_dir, "events")
    daily_in = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(day("ts").alias("day"))
        .agg(exact_sum(-F.col("value"), "txid_input"))
    )
    daily_out = (
        e.filter(F.col("event_type") == "view")
        .groupBy(day("ts").alias("day"))
        .agg(exact_sum(F.col("value"), "txid_output"))
    )
    return daily_in.join(daily_out, "day", "inner").select(
        "day", "txid_input", "txid_output"
    )


@query(
    "join_salted_skew",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, o_totalprice
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact⋈dim join (operators/skew.py): the explicit skew
    mitigation for hot keys (exchange hot-wallets skew the reference's
    wallet / transaction_hash joins, btcolap.sql:112-114, :429-430).
    Row-identical to the plain join — the oracle states the unsalted
    form — but a hot orderkey spreads across S reducers instead of
    stalling one. S=4 here: the demonstration carries the full
    mechanics while paying the minimum replication tax on this
    (unskewed) testdata; production sizes S to hot-key row count /
    target-partition size."""
    from ..operators.skew import salted_join

    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"), "l_linenumber", "l_quantity"
    )
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), "o_totalprice"
    )
    return salted_join(li, o, "k", salt_buckets=4).select(
        F.col("k").alias("l_orderkey"),
        "l_linenumber",
        "l_quantity",
        "o_totalprice",
    )


@query(
    "join_asof",
    oracle="""
    WITH l AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
        FROM events WHERE event_type = 'purchase'
    ), r AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
               MAX(value) AS view_value
        FROM events WHERE event_type = 'view' GROUP BY 1, 2
    )
    SELECT l.event_id, l.user_id, l.ts, l.value, r.view_value
    FROM l ASOF LEFT JOIN r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/temporal.py): each purchase event picks up
    the user's most recent view value at-or-before its timestamp — the
    tick-join shape Spark lacks natively, as union + one shuffle +
    last(ignoreNulls) running window. DuckDB states the semantics with
    its native ASOF LEFT JOIN. The right side is pre-aggregated to one
    row per (user, ts): as-of ties would be nondeterministic in any
    engine."""
    from ..operators.temporal import asof_join

    e = table(spark, sf_dir, "events")
    left = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    right = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
    )
    return asof_join(left, right, "user_id", "ts", ["view_value"])


@query(
    "join_range_interval",
    oracle="""
    WITH ranges AS (
        SELECT i AS range_id,
               TIMESTAMP '2024-01-01' + INTERVAL (i * 5) DAY AS start_ts,
               TIMESTAMP '2024-01-01'
                   + INTERVAL (i * 5 + 1 + (i * 7) % 11) DAY AS end_ts
        FROM (SELECT unnest(range(0, 60)) AS i)
    )
    SELECT e.event_id, r.range_id
    FROM events e JOIN ranges r
      ON CAST(e.ts AS TIMESTAMP) >= r.start_ts
     AND CAST(e.ts AS TIMESTAMP) < r.end_ts
    """,
)
def join_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval-containment) join (operators/temporal.py):
    events against 60 irregular, overlapping time windows. Spark plans
    a raw inequality join as BroadcastNestedLoopJoin (quadratic); the
    banded rewrite makes it a hash equi-join on coarse time bands plus
    an exact refine filter. The oracle states the plain inequality
    join."""
    from ..operators.temporal import range_join_banded

    e = table(spark, sf_dir, "events").select("event_id", "ts")
    base = F.lit("2024-01-01 00:00:00").cast("timestamp")
    ranges = spark.range(0, 60).select(
        F.col("id").alias("range_id"),
        F.timestamp_add("DAY", (F.col("id") * 5).cast("int"), base).alias(
            "start_ts"
        ),
        F.timestamp_add(
            "DAY",
            (F.col("id") * 5 + 1 + (F.col("id") * 7) % 11).cast("int"),
            base,
        ).alias("end_ts"),
    )
    joined = range_join_banded(
        e, ranges, "ts", "start_ts", "end_ts", band_seconds=12 * 86400
    )
    return joined.select("event_id", "range_id")


@query(
    "join_left_outer",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_custkey, c.c_name
    FROM orders o
    LEFT JOIN (SELECT c_custkey, c_name FROM customer
               WHERE c_custkey % 3 = 0) c
      ON o.o_custkey = c.c_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join with real unmatched rows (dim filtered to a
    third of its keys -> nulls on the probe side). The reference uses
    only inner joins (SURVEY.md §2.3); an engine a user can switch to
    needs the full outer-join family. Same shuffle/broadcast physical
    menu as inner — null-producing side just can't be the build side
    of a broadcast."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 3 == 0)
        .select("c_custkey", "c_name")
    )
    return o.join(c, o.o_custkey == c.c_custkey, "left").select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_name"
    )


@query(
    "join_full_outer",
    oracle="""
    SELECT a.o_orderkey, a.o_totalprice, b.l_orderkey, b.qty
    FROM (SELECT o_orderkey, o_totalprice FROM orders
          WHERE o_orderkey % 3 = 0) a
    FULL OUTER JOIN (
          SELECT l_orderkey,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                     AS qty
          FROM lineitem WHERE l_orderkey % 2 = 0 GROUP BY 1) b
      ON a.o_orderkey = b.l_orderkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two disjointly-filtered sides (mod-3 vs
    mod-2 keys): unmatched rows survive from BOTH sides. Forces a
    shuffle join — full-outer cannot broadcast either side."""
    a = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 3 == 0)
        .select("o_orderkey", "o_totalprice")
    )
    b = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 2 == 0)
        .groupBy("l_orderkey")
        .agg(exact_sum("l_quantity", "qty"))
    )
    return a.join(b, a.o_orderkey == b.l_orderkey, "full").select(
        "o_orderkey", "o_totalprice", "l_orderkey", "qty"
    )


@query(
    "join_left_anti",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_orderkey NOT IN (
        SELECT l_orderkey FROM lineitem WHERE l_quantity >= 49)
    """,
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join — orders with no high-quantity line item. The
    NOT-IN complement of flt_in_subquery's semi join (btcolap.sql:3-15
    expresses dedup-DELETE through the same shape). Plans as a
    broadcast/shuffled hash anti join, never a nested loop, because the
    key is non-nullable."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    hot = table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") >= 49
    ).select("l_orderkey")
    return o.join(hot, o.o_orderkey == hot.l_orderkey, "left_anti")


@query(
    "join_levenshtein_fuzzy",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM names a JOIN names b
      ON a.p_name < b.p_name
     AND abs(length(a.p_name) - length(b.p_name)) <= 1
    WHERE levenshtein(a.p_name, b.p_name) <= 1
    """,
)
def join_levenshtein_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy self-join: part-name pairs within Levenshtein
    distance 1. The edit-distance filter only needs candidate pairs
    whose lengths differ by <=1 (a necessary condition for dist<=1), so
    each distinct name emits two blocking keys (len, len-1) and the
    self-join is an EQUI-join on the key — pairs with |len diff|<=1
    collide on min(len_a, len_b), equal-length pairs collide twice and
    dedup. That turns the quadratic all-pairs compare into
    per-length-bucket work — the standard blocking shape for fuzzy
    matching at scale (same idea as LSH banding, with length as the
    band). Dictionary-first: distances compute over DISTINCT names
    (vocabulary-sized, tiny vs the row count), never per fact row. The
    oracle states the same semantics as a naive length-banded join —
    blocking provably loses nothing at dist<=1."""
    names = table(spark, sf_dir, "part").select("p_name").distinct()
    banded = names.select(
        "p_name",
        F.length("p_name").alias("len"),
        F.explode(
            F.array(F.length("p_name"), F.length("p_name") - 1)
        ).alias("band"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .filter(
            (F.abs(F.col("a.len") - F.col("b.len")) <= 1) & (dist <= 1)
        )
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            dist.cast("long").alias("dist"),
        )
        .distinct()
    )


@query(
    "join_null_safe",
    oracle="""
    WITH l AS (
        SELECT event_id, NULLIF(event_type, 'error') AS k FROM events
    ),
    r AS (
        SELECT DISTINCT NULLIF(event_type, 'error') AS k FROM events
    )
    SELECT l.event_id, COALESCE(r.k, '__null__') AS matched_tag
    FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL
    keys MATCH each other instead of vanishing — the semantics a
    dimension lookup needs when "unknown" is itself a category (here
    'error' events are nulled out and still land on the right's NULL
    row). Catalyst extracts EqualNullSafe as a hash-join key (it
    coalesces both sides under the hood), so this stays a plain
    shuffle/broadcast hash join — NOT the nested-loop a raw non-equi
    predicate would force; at 100 TB that distinction is the whole
    game."""
    e = table(spark, sf_dir, "events")
    k = F.nullif(F.col("event_type"), F.lit("error"))
    left = e.select("event_id", k.alias("k"))
    right = e.select(k.alias("rk")).distinct()
    return (
        left.join(right, left.k.eqNullSafe(right.rk))
        .select(
            "event_id",
            F.coalesce("rk", F.lit("__null__")).alias("matched_tag"),
        )
    )


@query(
    "join_bloom_prune",
    oracle=f"""
    SELECT s.s_nationkey,
           COUNT(*) AS n,
           {oracle_exact_sum('l.l_extendedprice', 'total')}
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE s.s_acctbal > 9000
    GROUP BY 1
    """,
)
def join_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join reduction (operators/bloom.py): the
    selective supplier subset's keys build an in-plan Bloom filter
    (xxhash64 K-hash bits, one bit_or aggregate, map<int,long> word
    table in a single broadcast row), the lineitem probe side tests
    membership MAP-SIDE and drops ~91% of its rows before any join
    shuffle, and the exact join on the surviving superset discards the
    ~5e-5 false-positive tail — results identical to the plain join
    the oracle states. This is Spark's own runtime bloom-filter join
    optimization composed explicitly from public primitives
    (bloom_filter_agg is not user-facing); at 100 TB it is the
    difference between shuffling the whole fact table and shuffling
    the matching fraction. Deterministic end to end (seeded xxhash64,
    sorted map entries). tests/test_properties.py pins the prefilter's
    superset + selectivity behavior."""
    from ..operators.bloom import bloom_prefilter

    dim = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .select("s_suppkey", "s_nationkey")
    )
    fact = table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice"
    )
    prefiltered = bloom_prefilter(fact, dim, "l_suppkey", "s_suppkey")
    return (
        prefiltered.join(
            F.broadcast(dim), prefiltered["l_suppkey"] == dim["s_suppkey"]
        )
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum("l_extendedprice", "total"),
        )
    )


@query(
    "join_asof_nearest",
    oracle="""
    WITH l AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us,
               -epoch_us(CAST(ts AS TIMESTAMP)) AS nus
        FROM events WHERE event_type = 'purchase'
    ), r AS (
        SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
               -epoch_us(CAST(ts AS TIMESTAMP)) AS nus,
               MAX(value) AS view_value
        FROM events WHERE event_type = 'view' GROUP BY 1, 2, 3
    ), b AS (
        SELECT l.event_id, r.view_value AS bv, r.us AS bus
        FROM l ASOF LEFT JOIN r
          ON l.user_id = r.user_id AND l.us >= r.us
    ), f AS (
        SELECT l.event_id, r.view_value AS fv, r.us AS fus
        FROM l ASOF LEFT JOIN r
          ON l.user_id = r.user_id AND l.nus >= r.nus
    )
    SELECT l.event_id, l.user_id, l.ts, l.value,
           CASE WHEN f.fus IS NULL
                  OR (b.bus IS NOT NULL
                      AND (l.us - b.bus) <= (f.fus - l.us))
                THEN b.bv ELSE f.fv END AS view_value
    FROM l
    JOIN b USING (event_id)
    JOIN f USING (event_id)
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-neighbor as-of join
    (operators/temporal.asof_join_nearest): each purchase picks the
    user's view value closest in time in EITHER direction (distance
    ties toward the earlier view) — the alignment shape when the
    reference stream may lag or lead the probe. Both directional
    passes ride one user_id exchange (two in-partition sorts, no
    second shuffle); the final choice is a map-side integer compare
    of microsecond distances. The oracle states it as two DuckDB ASOF
    joins (the forward pass on negated epochs) combined by the same
    distance rule."""
    from ..operators.temporal import asof_join_nearest

    e = table(spark, sf_dir, "events")
    left = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    right = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
    )
    return asof_join_nearest(
        left, right, "user_id", "ts", ["view_value"]
    )


@query(
    "join_interval_overlap",
    oracle=f"""
    WITH spans AS (
        SELECT user_id, event_type,
               {ORACLE_DAY.format(col='CAST(ts AS TIMESTAMP)')} AS day,
               CAST(epoch_us(MIN(CAST(ts AS TIMESTAMP))) AS BIGINT)
                 AS s,
               CAST(epoch_us(MAX(CAST(ts AS TIMESTAMP))) AS BIGINT)
                 AS e
        FROM events GROUP BY 1, 2, 3
    )
    SELECT a.user_id, a.day, a.event_type AS type_a,
           b.event_type AS type_b,
           LEAST(a.e, b.e) - GREATEST(a.s, b.s) AS overlap_us
    FROM spans a JOIN spans b
      ON a.user_id = b.user_id AND a.day = b.day
     AND a.event_type < b.event_type
     AND a.s <= b.e AND b.s <= a.e
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL x INTERVAL overlap join — the second temporal-join
    shape Spark lacks natively (join_range_interval covers point-in-
    interval; this covers two interval SETS, the OVERLAPS predicate):
    per (user, event_type, day) activity spans [first ts, last ts],
    emit every same-user same-day pair of event types whose spans
    overlap, with the exact overlap duration in integer microseconds.

    A raw `a.s <= b.e AND b.s <= a.e` join would plan as a nested-
    loop; the scale-correct form is the banded equi-join
    (operators/temporal.range_join_banded's strategy): equi-keys
    (user_id, day) bound each interval — spans cannot cross their
    containment band by construction, the general case replicates
    each interval over ceil(len/band) band keys — and the overlap
    inequality refines AFTER the hash join. One shuffle on the band
    key for each side (shared grain with the span aggregate, so
    Catalyst reuses the exchange), AQE sizes the physical join.
    Self-join pairs dedup by event_type ordering, never DISTINCT.
    All arithmetic is epoch microseconds — engine-exact."""
    from ..functions import epoch_us

    e = table(spark, sf_dir, "events")
    spans = e.groupBy(
        "user_id", "event_type", day("ts").alias("day")
    ).agg(
        F.min(epoch_us("ts")).alias("s"),
        F.max(epoch_us("ts")).alias("e"),
    )
    a, b = spans.alias("a"), spans.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.day") == F.col("b.day"))
            & (F.col("a.event_type") < F.col("b.event_type"))
            & (F.col("a.s") <= F.col("b.e"))
            & (F.col("b.s") <= F.col("a.e")),
        )
        .select(
            F.col("a.user_id").alias("user_id"),
            F.col("a.day").alias("day"),
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
            (F.least("a.e", "b.e") - F.greatest("a.s", "b.s")).alias(
                "overlap_us"
            ),
        )
    )


@query(
    "join_asof_tolerance",
    oracle="""
    WITH l AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
        FROM events WHERE event_type = 'purchase'
    ), r AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
               MAX(value) AS view_value
        FROM events WHERE event_type = 'view' GROUP BY 1, 2
    ), j AS (
        SELECT l.event_id, l.user_id, l.ts, l.value,
               r.view_value, r.ts AS match_ts
        FROM l ASOF LEFT JOIN r
          ON l.user_id = r.user_id AND l.ts >= r.ts
    )
    SELECT event_id, user_id, ts, value,
           CASE WHEN match_ts IS NOT NULL
                 AND ts - match_ts <= INTERVAL 1 HOUR
                THEN view_value END AS view_value,
           CASE WHEN match_ts IS NOT NULL
                 AND ts - match_ts <= INTERVAL 1 HOUR
                THEN match_ts END AS match_ts
    FROM j
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a MATCH TOLERANCE (pandas merge_asof's
    `tolerance`, kdb's wj window): the most recent view at-or-before
    each purchase counts only if it is at most 1 hour stale —
    beyond that the match nulls out (stale context is worse than no
    context, the feature-freshness rule every point-in-time feature
    store enforces). Built on the SAME single-exchange asof machinery
    (operators/temporal.asof_join) by carrying the matched right
    timestamp inside the struct payload — the whole-row-struct shape
    guarantees view_value and match_ts null out TOGETHER, never a
    half-expired row; the tolerance is then one map-side epoch
    comparison, no second join, no extra shuffle."""
    from ..functions import epoch_us
    from ..operators.temporal import asof_join

    e = table(spark, sf_dir, "events")
    left = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    right = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
        .withColumn("match_ts", F.col("ts"))
    )
    j = asof_join(
        left, right, "user_id", "ts", ["view_value", "match_ts"]
    )
    ok = F.col("match_ts").isNotNull() & (
        epoch_us("ts") - epoch_us("match_ts") <= 3600 * 1_000_000
    )
    return j.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.when(ok, F.col("view_value")).alias("view_value"),
        F.when(ok, F.col("match_ts")).alias("match_ts"),
    )


@query(
    "join_geo_grid",
    oracle="""
    WITH c AS (
        SELECT c_custkey,
               (c_custkey * 7919) % 1000 AS x,
               (c_custkey * 104729) % 1000 AS y
        FROM customer
    ), s AS (
        SELECT s_suppkey,
               (s_suppkey * 4409 + 11) % 1000 AS x,
               (s_suppkey * 2287 + 5) % 1000 AS y
        FROM supplier
    )
    SELECT c.c_custkey, s.s_suppkey,
           CAST((c.x - s.x) * (c.x - s.x)
                + (c.y - s.y) * (c.y - s.y) AS BIGINT) AS dist2
    FROM c, s
    WHERE (c.x - s.x) * (c.x - s.x)
          + (c.y - s.y) * (c.y - s.y) <= 225
    """,
)
def join_geo_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial distance join via GRID-CELL BLOCKING — all
    (customer, supplier) point pairs within Euclidean radius 15 on a
    deterministic synthetic 1000x1000 plane (coordinates are affine
    hashes of the keys so the oracle can state them; a real deployment
    reads lat/lon). The oracle is the quadratic formulation; the
    operator is the scale shape: with cell size = radius, each left
    point maps to its HOME cell only and each right point replicates
    to its 3x3 cell neighborhood, so every qualifying pair meets in
    EXACTLY one cell (the left point's home) and the join is a plain
    hash equi-join on the cell key — the GeoSpark/Sedona partitioned
    spatial-join pattern, O(n * density) instead of O(n^2), and the
    exact integer dist^2 <= r^2 refine runs inside the hash match.
    Replication factor is a constant 9x on the smaller (build) side;
    skew follows point density per cell, which AQE's skew splitting
    handles because the blocking key is a shuffle key, not an array
    membership."""
    R = 15
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") * 7919) % 1000).alias("x"),
        ((F.col("c_custkey") * 104729) % 1000).alias("y"),
    )
    supp = table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        ((F.col("s_suppkey") * 4409 + 11) % 1000).alias("x"),
        ((F.col("s_suppkey") * 2287 + 5) % 1000).alias("y"),
    )
    cgrid = cust.select(
        "c_custkey",
        F.col("x").alias("cx_pt"),
        F.col("y").alias("cy_pt"),
        F.floor(F.col("x") / R).alias("gx"),
        F.floor(F.col("y") / R).alias("gy"),
    )
    offs = F.array(
        *[
            F.struct(
                F.lit(dx).alias("dx"), F.lit(dy).alias("dy")
            )
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    sgrid = supp.select(
        "s_suppkey",
        F.col("x").alias("sx_pt"),
        F.col("y").alias("sy_pt"),
        F.explode(offs).alias("o"),
        F.floor(F.col("x") / R).alias("hgx"),
        F.floor(F.col("y") / R).alias("hgy"),
    ).select(
        "s_suppkey",
        "sx_pt",
        "sy_pt",
        (F.col("hgx") + F.col("o.dx")).alias("gx"),
        (F.col("hgy") + F.col("o.dy")).alias("gy"),
    )
    d2 = (F.col("cx_pt") - F.col("sx_pt")) * (
        F.col("cx_pt") - F.col("sx_pt")
    ) + (F.col("cy_pt") - F.col("sy_pt")) * (
        F.col("cy_pt") - F.col("sy_pt")
    )
    return (
        cgrid.join(sgrid, ["gx", "gy"])
        .filter(d2 <= R * R)
        .select(
            "c_custkey",
            "s_suppkey",
            d2.cast("long").alias("dist2"),
        )
    )
