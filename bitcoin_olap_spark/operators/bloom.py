"""In-plan Bloom-filter semi-join reduction (join_bloom_prune).

The runtime-filter technique Spark's optimizer applies to shuffle joins
(spark.sql.optimizer.runtime.bloomFilter), composed explicitly from
public primitives because `bloom_filter_agg` is not a user-facing SQL
function: xxhash64 K-hash bit positions, ONE bit_or aggregate packing
the bit array into a map<int,long> of <= M/64 words, a broadcast of
that single row (a few KB at ANY build-side size), and a map-side
membership test on the probe side BEFORE its shuffle. False positives
only ever ADD rows to the prefiltered superset; the exact join after
it discards them, so downstream results are identical to the plain
join. Every step JVM-side; no driver collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default geometry: 8192 bits (128 longs), 3 hashes. For n build keys
#: fp-rate ~ (1 - e^(-3n/8192))^3 — ~5e-5 at n=100, ~2e-2 at n=2000.
DEFAULT_M, DEFAULT_K = 8192, 3


def _hash_pos(key: str, j: int, m: int) -> Column:
    """Bit position j for one key value. The key is cast to STRING
    before xxhash64 because xxhash64 is type-sensitive: the same value
    stored as int32 on one side and int64 on the other would hash
    differently, producing false NEGATIVES — silently dropped join rows
    — which violates the module's 'false positives only ever ADD rows'
    guarantee. A string cast is width-invariant for integers (5 ->
    '5' from either width) and passes string keys through unchanged;
    both sides MUST go through this one helper."""
    return F.pmod(F.xxhash64(F.col(key).cast("string"), F.lit(j)), F.lit(m))


def _bit_mask(pos: Column) -> Column:
    """1L << (pos % 64), derived from the already-computed position
    Column so build and probe can never disagree on the mask."""
    return F.call_function(
        "shiftleft",
        F.lit(1).cast("long"),
        F.pmod(pos, F.lit(64)).cast("int"),
    )


def bloom_build(
    dim: DataFrame, key: str, m: int = DEFAULT_M, k: int = DEFAULT_K
) -> DataFrame:
    """ONE-row DataFrame holding the dim keys' Bloom bit array as a
    map<int,long> word table (column `bf`). Deterministic: xxhash64 is
    seeded and the entry list is sorted before the map is built."""
    positions = dim.select(
        F.explode(
            F.array(*[_hash_pos(key, j, m) for j in range(k)])
        ).alias("pos")
    )
    words = positions.select(
        (F.col("pos") / 64).cast("int").alias("w"),
        _bit_mask(F.col("pos")).alias("m"),
    )
    return (
        words.groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("w", "bits")))
            ).alias("bf")
        )
    )


def _might_contain(key: str, m: int, k: int) -> Column:
    hit = None
    for j in range(k):
        pos = _hash_pos(key, j, m)
        word = F.coalesce(
            F.element_at("bf", (pos / 64).cast("int")), F.lit(0)
        )
        test = word.bitwiseAND(_bit_mask(pos)) != 0
        hit = test if hit is None else (hit & test)
    return hit


def bloom_prefilter(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m: int = DEFAULT_M,
    k: int = DEFAULT_K,
) -> DataFrame:
    """fact rows whose key MIGHT be in dim's key set (superset of the
    true semi-join; fp-rate per the geometry above). The broadcast of
    the one-row filter makes the membership test map-side — at 100 TB
    the probe side drops its non-matching rows BEFORE the exchange,
    where a plain join would shuffle all of them and a broadcast
    semi-join would need the whole dim collected."""
    bloom = bloom_build(dim, dim_key, m, k)
    return (
        fact.crossJoin(F.broadcast(bloom))
        .filter(_might_contain(fact_key, m, k))
        .drop("bf")
    )
