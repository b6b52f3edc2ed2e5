"""Skew mitigation: salted joins.

Exchange hot-wallets make the reference's join keys skewed
(`transaction_hash` / `wallet`, btcolap.sql:112-114, :429-430): one
reducer gets the hot key's entire partition and the stage runs at the
speed of that straggler. AQE's skew-join splitting
(`spark.sql.adaptive.skewJoin.enabled`, on in session.py) handles this
at runtime for shuffle joins; salting is the *explicit* form — needed
when AQE can't see the skew (aggregation hot keys, or joins under a
required partitioning).

`salted_join`: fact rows get a deterministic salt in [0, S); the dim
side is replicated S times; the join key becomes (key, salt), spreading
a hot key over S reducers. Replication factor S multiplies only the
SMALL side — the classic trade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `fact` ⋈ `dim` on `key`, salted S ways.

    The salt is xxhash64 of the whole fact row (deterministic, no RNG,
    uniform even when all rows share the hot key); dim rows are
    replicated via explode(sequence(0, S-1)). Result is row-identical
    to the unsalted join."""
    s = F.lit(salt_buckets)
    fact_s = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), s)
    )
    dim_s = dim.withColumn(
        "_salt",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"), F.lit(salt_buckets - 1).cast("long")
            )
        ),
    )
    out = fact_s.join(dim_s, [key, "_salt"], how)
    return out.drop("_salt")
