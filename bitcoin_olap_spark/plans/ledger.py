"""End-to-end ledger pipeline — the reference's whole 6-stage DAG
(SURVEY.md §3.1) as ONE lazy DataFrame chain.

Reference chain (each stage a separate BigQuery CTAS, a machine
boundary per stage):

1. dedup `address_table2` in place              — btcolap.sql:1-15
2. `txid_input2`  = inputs x UNNEST ⋈ addr      — btcolap.sql:35-59
3. `txid_output2` = outputs x UNNEST ⋈ addr     — btcolap.sql:62-85
4. `txid_sum3`    = UNION DISTINCT of 2+3       — btcolap.sql:301-313
5. `simple_flow*` = transactions lateral-unnest ⋈ txid_sum, signed
   satoshi→BTC, pre/post split on the SAFE date — btcolap.sql:316-408
6. `*_walletlocation` = ⋈ wallet_location dim   — btcolap.sql:412-451

Here the six stages are plain DataFrame compositions over ONE
SparkSession: Catalyst sees the full DAG (column pruning through every
stage, predicate pushdown into the scans, broadcast for both dims) and
nothing is materialized until the caller acts. The reference's
pre/post-SAFE *table split* becomes a `period` column — at scale the
ledger write is `partitionBy(day)`, so period/date predicates prune
partitions instead of needing two tables (SURVEY.md §4).

The Bitcoin-shaped fixture tables (FIXTURES.md §A) are derived
deterministically (no RNG) from the driver's `orders`/`customer`
testdata so the DuckDB oracle can construct byte-identical fixtures
from the same parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table

#: the '2021-09-24' SAFE-policy split (btcolap.sql:322,:370) mapped into
#: the orders date range
SPLIT_TS = "1995-06-17 00:00:00"

_STRUCT_T = "array<struct<value:bigint,addresses:array<string>>>"


def bitcoin_fixtures(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(transactions, address_table_with_dupes, wallet_location) —
    FIXTURES.md §A1/§A3/§A4 derived deterministically from
    orders/customer. Array lengths vary 0..2 (empty arrays pin
    explode-vs-explode_outer semantics, SURVEY.md §4 last para);
    address_table carries exact duplicate pairs (every 5th customer
    re-added) to exercise the dedup stage."""
    o = table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    sat = F.floor(F.col("o_totalprice") * 100).cast("long")
    a1 = F.concat(F.lit("a"), ((k * 2 + 1) % 2000).cast("string"))
    a2 = F.concat(F.lit("a"), ((k * 3 + 2) % 2000).cast("string"))
    in1 = F.struct((sat + 1).alias("value"), F.array(a1).alias("addresses"))
    in2 = F.struct(
        (sat + 2).alias("value"), F.array(a1, a2).alias("addresses")
    )
    out1 = F.struct((sat + 3).alias("value"), F.array(a2).alias("addresses"))
    out2 = F.struct(
        (sat + 4).alias("value"), F.array(a2, a1).alias("addresses")
    )
    empty = F.array().cast(_STRUCT_T)
    inputs = (
        F.when(k % 97 == 0, empty)
        .when(k % 2 == 0, F.array(in1))
        .otherwise(F.array(in1, in2))
    )
    outputs = (
        F.when(k % 89 == 0, empty)
        .when(k % 3 == 0, F.array(out1))
        .otherwise(F.array(out1, out2))
    )
    tx = o.select(
        k.cast("string").alias("hash"),
        F.col("o_orderdate").alias("block_timestamp"),
        inputs.alias("inputs"),
        outputs.alias("outputs"),
        F.size(inputs).cast("long").alias("input_count"),
        F.size(outputs).cast("long").alias("output_count"),
    )

    c = table(spark, sf_dir, "customer")
    ck = F.col("c_custkey")
    pair = c.select(
        F.concat(F.lit("w"), ((ck * 7) % 50).cast("string")).alias("wallet"),
        F.concat(F.lit("a"), (ck % 1999).cast("string")).alias("address"),
    )
    addr_raw = pair.unionByName(
        c.filter(ck % 5 == 0).select(
            F.concat(F.lit("w"), ((ck * 7) % 50).cast("string")).alias(
                "wallet"
            ),
            F.concat(F.lit("a"), (ck % 1999).cast("string")).alias("address"),
        )
    )

    wid = F.col("wid")
    wloc = (
        c.select(((ck * 7) % 50).alias("wid"))
        .distinct()
        .select(
            F.concat(F.lit("w"), wid.cast("string")).alias("wallet"),
            F.when(wid % 7 == 0, "China")
            .when(wid % 7 == 1, "Russia")
            .when(wid % 7 == 2, "US")
            .when(wid % 7 == 3, "?")
            .when(wid % 7 == 4, F.lit(None).cast("string"))
            .when(wid % 7 == 5, "Brazil,Zibralter,Mexico")
            .otherwise("Germany")
            .alias("location"),
        )
    )
    return tx, addr_raw, wloc


def _explode_side(tx: DataFrame, side: str) -> DataFrame:
    """Two-level lateral unnest of one side (btcolap.sql:109-111 shape):
    (hash, block_timestamp, sat_value, addr)."""
    return (
        tx.select(
            "hash",
            "block_timestamp",
            F.explode(side).alias("txo"),
        )
        .select(
            "hash",
            "block_timestamp",
            F.col("txo.value").alias("sat_value"),
            F.explode("txo.addresses").alias("addr"),
        )
    )


def ledger_pipeline(
    tx: DataFrame,
    addr_raw: DataFrame,
    wloc: DataFrame,
    broadcast_max_rows: int = 20_000_000,
) -> DataFrame:
    """Stages 1-6 as one (near-)lazy DAG. Returns the located ledger:
    (block_timestamp, txid, type, addr, sat, wallet, location, period).

    Scale shape: `wallet_location` (121 rows in the reference,
    wallet_location2.ndjson) is a genuinely bounded dimension and is
    always broadcast. `addr` (exchange wallet→address mapping) and
    `txid_sum` (every tx touching a known exchange address) are NOT
    bounded — on real Bitcoin data the reference materializes txid_sum
    as a fact table (btcolap.sql:271-313, hundreds of millions of
    rows), and exchange address tables reach tens of millions. Forcing
    a broadcast on either is an executor OOM at 100× scale, so:

    - `addr` is cached (three joins read it) and counted ONCE — the
      pagerank `broadcast_max_nodes` gate pattern; at or below
      `broadcast_max_rows` it broadcasts, above it the hint is dropped
      and the joins shuffle (AQE skew-handling applies).
    - `txid_sum` carries NO hint at all: it is fact-derived, its
      cardinality is unknowable before execution, and counting it
      would eagerly run the whole discovery subplan. AQE picks the
      strategy from the MEASURED shuffle size at runtime — broadcast
      when it turns out small, plain shuffle semi join when not.

    The only other shuffles are the UNION-DISTINCT / dedup hash
    aggregates and the final rollup."""
    # 1. dedup (btcolap.sql:1-15): row_number over the full key; ORDER BY
    #    the key itself is the reference's (degenerate) choice — rows in
    #    a dup group are identical so survivor choice is well-defined.
    w = Window.partitionBy("wallet", "address").orderBy("wallet", "address")
    addr = (
        addr_raw.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    ).cache()
    # one tiny action decides the join strategy (pagerank gate pattern);
    # the count also populates the cache all three addr joins read
    addr_side = (
        F.broadcast(addr) if addr.count() <= broadcast_max_rows else addr
    )

    ins = _explode_side(tx, "inputs")
    outs = _explode_side(tx, "outputs")

    # 2+3. explode-then-join txid discovery (btcolap.sql:35-59, :62-85)
    #    as PER-SIDE DISTINCTs + union DISTINCT (three hash-keyed
    #    exchanges). r11 folded these into one distinct over the
    #    unioned join outputs (one exchange, identical set semantics)
    #    on an interleaved in-session A/B (6.99 -> 6.55 s) — but the
    #    driver's own protocol said otherwise both rounds: BENCH_r11
    #    regressed 4.35 -> 7.33 s, and the r12 fresh-process
    #    alternating bench.py A/B (32 cores, 6 pairs) had this
    #    per-side form faster in 5 of 6 pairs (min 4.53 vs 5.28 s),
    #    so the fold is REVERTED. Scale note: the per-side form's
    #    third exchange carries already-deduplicated hashes — strictly
    #    fewer bytes than either side's join output — so the fold was
    #    never a byte win, only an exchange-count one; the driver
    #    evidence says the two smaller independent exchanges (which
    #    AQE sizes separately and whose jobs overlap) are the faster
    #    plan at every measured point.
    txid_in = (
        ins.join(addr_side, ins.addr == addr.address)
        .select("hash")
        .distinct()
    )
    txid_out = (
        outs.join(addr_side, outs.addr == addr.address)
        .select("hash")
        .distinct()
    )
    # 4. UNION DISTINCT (btcolap.sql:301-313). txid_sum is FACT-derived
    #    (the reference materializes it as a table for the same reason,
    #    btcolap.sql:271-313) — never force-broadcast; AQE decides from
    #    the measured size at runtime.
    txid_sum = txid_in.unionByName(txid_out).distinct()
    txid_keys = txid_sum.select(F.col("hash").alias("txid"))

    # 5. signed flows restricted to tracked txids (btcolap.sql:316-408);
    #    inputs negative (btcolap.sql:331), outputs positive (:346)
    flows = (
        ins.select(
            "block_timestamp",
            F.col("hash").alias("txid"),
            F.lit("input").alias("type"),
            "addr",
            (-F.col("sat_value")).alias("sat"),
        )
        .unionByName(
            outs.select(
                "block_timestamp",
                F.col("hash").alias("txid"),
                F.lit("output").alias("type"),
                "addr",
                F.col("sat_value").alias("sat"),
            )
        )
        .join(txid_keys, "txid", "left_semi")
    )

    # 6. wallet + location enrichment (btcolap.sql:412-451); the
    #    pre/post-SAFE table split becomes a period column (SURVEY.md §4).
    #    wloc is the one true bounded dimension (121 rows) — always
    #    broadcast.
    return (
        flows.join(addr_side, flows.addr == addr.address)
        .join(F.broadcast(wloc), "wallet")
        .select(
            "block_timestamp",
            "txid",
            "type",
            flows.addr,
            "sat",
            "wallet",
            "location",
            F.when(
                F.col("block_timestamp") >= F.lit(SPLIT_TS).cast("timestamp"),
                "post",
            )
            .otherwise("pre")
            .alias("period"),
        )
    )


def ledger_daily_rollup(ledger: DataFrame) -> DataFrame:
    """The analytical endpoint over the ledger (btcolap.sql:453-463 /
    btc_logregression_pre.py:14-26 shape): daily flow by location,
    period, and side. Satoshi sums stay BIGINT (exact, associative);
    BTC conversion is one final double divide."""
    return (
        ledger.groupBy(
            F.date_trunc("day", "block_timestamp").alias("day"),
            "location",
            "period",
            "type",
        )
        .agg(
            (F.sum("sat").cast("double") / F.lit(100000000.0)).alias(
                "flow_btc"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
