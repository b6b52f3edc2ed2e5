"""End-to-end ledger pipeline + analytics tail: oracle parity, the
reference's own invariants (SURVEY.md §5.2), and MLlib-vs-closed-form
agreement."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_ORACLE = "/root/testdata/sf0.01"


@pytest.mark.parametrize(
    "qid", ["pipeline_ledger_e2e", "sample_stratified", "ml_ols_loglog"]
)
def test_oracle_parity(spark, duck, qid):
    from bitcoin_olap_spark.registry import all_oracles, all_queries

    from .oracle import compare

    sdf = all_queries()[qid](spark, SF_ORACLE)
    ddf = duck.execute(all_oracles()[qid]).df()
    compare(sdf, ddf, qid)


@pytest.fixture(scope="module")
def ledger(spark):
    from bitcoin_olap_spark.plans import bitcoin_fixtures, ledger_pipeline

    tx, addr_raw, wloc = bitcoin_fixtures(spark, SF_ORACLE)
    return ledger_pipeline(tx, addr_raw, wloc).cache()


def test_ledger_sign_invariant(ledger):
    """Every type='input' row is negative, every 'output' positive —
    the reference's sign convention (btcolap.sql:331 vs :346)."""
    bad = ledger.filter(
        ((F.col("type") == "input") & (F.col("sat") >= 0))
        | ((F.col("type") == "output") & (F.col("sat") <= 0))
    )
    assert bad.count() == 0


def test_addr_dedup_invariant(spark):
    """Post-dedup address table has no duplicate (wallet, address) —
    the reference's own data-quality check (btcolap.sql:19-31)."""
    from pyspark.sql.window import Window

    from bitcoin_olap_spark.plans import bitcoin_fixtures

    _, addr_raw, _ = bitcoin_fixtures(spark, SF_ORACLE)
    assert addr_raw.count() > addr_raw.dropDuplicates(
        ["wallet", "address"]
    ).count(), "fixture must contain duplicates for the stage to matter"
    w = Window.partitionBy("wallet", "address").orderBy("wallet", "address")
    deduped = (
        addr_raw.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    dupes = deduped.groupBy("wallet", "address").count().filter("count > 1")
    assert dupes.count() == 0


def test_period_split_matches_timestamp(ledger):
    from bitcoin_olap_spark.plans.ledger import SPLIT_TS

    split = F.lit(SPLIT_TS).cast("timestamp")
    bad = ledger.filter(
        ((F.col("period") == "post") & (F.col("block_timestamp") < split))
        | ((F.col("period") == "pre") & (F.col("block_timestamp") >= split))
    )
    assert bad.count() == 0


def test_mllib_matches_closed_form(spark):
    from bitcoin_olap_spark.registry import all_queries

    q = all_queries()
    ml = q["ml_linreg_fit"](spark, SF_ORACLE).collect()[0]
    exact = q["ml_ols_loglog"](spark, SF_ORACLE).collect()[0]
    assert ml["n"] == exact["n"]
    for k in ("slope", "intercept", "r2"):
        assert abs(ml[k] - exact[k]) < 1e-5, (k, ml[k], exact[k])


def test_sample_stratified_caps(spark):
    from bitcoin_olap_spark.queries.analytics import BIN_CAP, N_BINS
    from bitcoin_olap_spark.registry import all_queries

    s = all_queries()["sample_stratified"](spark, SF_ORACLE)
    per_bin = s.groupBy("bin").count().collect()
    assert 0 < len(per_bin) <= N_BINS
    assert all(r["count"] <= BIN_CAP for r in per_bin)
