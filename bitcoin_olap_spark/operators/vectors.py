"""Vector-similarity operators over embedding columns (array<float>).

Two formulations, both pure DataFrame ops:

- Oracle-parity path (`*_exact`): explode embeddings to (id, pos, x)
  rows, join on position, accumulate dot products as DECIMAL — exact,
  associative, therefore bit-identical between Spark and DuckDB
  regardless of summation order. Used for correctness checks.
- Scale path (`cosine_col`): per-pair `F.zip_with` + `F.aggregate`
  fold, no explode — one row per pair, whole-stage codegen. Float sum
  order is the fold order (deterministic within Spark, not across
  engines), so this is the production operator and the exact path its
  verifier.

Brute-force top-k cross-joins queries x corpus: O(Q*N) rows — fine for
small Q (point lookups). The LSH-bucketed variant prunes candidates by
random-hyperplane signature so each query only scores its bucket
neighborhood; at 100 TB you'd persist the bucketed corpus, bucket the
queries, and co-partition both on the signature (an IVF-style layout).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: exact decimal accumulator for products of unit-scale floats
_DEC = "decimal(30,20)"


def _positions(df: DataFrame, id_col: str, vec_col: str, alias: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias(alias),
        F.posexplode(vec_col).alias("pos", f"x_{alias}"),
    ).withColumn(f"x_{alias}", F.col(f"x_{alias}").cast("double"))


def norms_exact(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, norm_sq DECIMAL): exact sum of squares."""
    pos = _positions(df, id_col, vec_col, "v")
    return pos.groupBy(F.col("v").alias(id_col)).agg(
        F.sum((F.col("x_v") * F.col("x_v")).cast(_DEC)).alias("norm_sq")
    )


def cosine_pairs_exact(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    queries: DataFrame | None = None,
) -> DataFrame:
    """All-pairs (or queries x corpus) cosine similarity, exact-decimal
    dot products: (id_a, id_b, cosine double).

    If `queries` is None: self-pairs with id_a < id_b. Otherwise
    `queries` is a same-schema DataFrame and all (query, corpus) pairs
    with id_a != id_b are scored.
    """
    corpus_pos = _positions(df, id_col, vec_col, "b")
    corpus_norm = norms_exact(df, id_col, vec_col).select(
        F.col(id_col).alias("id_b"), F.col("norm_sq").alias("nb")
    )
    qdf = df if queries is None else queries
    q_pos = _positions(qdf, id_col, vec_col, "a")
    q_norm = norms_exact(qdf, id_col, vec_col).select(
        F.col(id_col).alias("id_a"), F.col("norm_sq").alias("na")
    )
    pair_cond = (
        (F.col("a") < F.col("b"))
        if queries is None
        else (F.col("a") != F.col("b"))
    )
    dot = (
        q_pos.join(corpus_pos, "pos")
        .filter(pair_cond)
        .groupBy(F.col("a").alias("id_a"), F.col("b").alias("id_b"))
        .agg(F.sum((F.col("x_a") * F.col("x_b")).cast(_DEC)).alias("dot"))
    )
    cos = F.col("dot").cast("double") / F.sqrt(
        F.col("na").cast("double") * F.col("nb").cast("double")
    )
    return (
        dot.join(q_norm, "id_a")
        .join(corpus_norm, "id_b")
        .select("id_a", "id_b", cos.alias("cosine"))
    )


def cosine_col(vec_a: Column, vec_b: Column) -> Column:
    """Production cosine: zip_with products, sequential F.aggregate
    fold, double math — one codegen'd expression per pair."""
    dot = F.aggregate(
        F.zip_with(vec_a, vec_b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.aggregate(
        F.transform(vec_a, lambda x: (x * x).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    nb = F.aggregate(
        F.transform(vec_b, lambda x: (x * x).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return dot / F.sqrt(na * nb)


def topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine for each query vector (query_id, vec_id,
    cosine, rank). Ranks on round(cosine, 6) with vec_id tiebreak so the
    cut at rank k is stable across engines."""
    from pyspark.sql.window import Window

    pairs = cosine_pairs_exact(corpus, id_col, vec_col, queries=queries)
    ranked = pairs.select(
        F.col("id_a").alias("query_id"),
        F.col("id_b").alias("vec_id"),
        F.round("cosine", 6).alias("cosine"),
    ).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(
                F.desc("cosine"), F.asc("vec_id")
            )
        ),
    )
    return ranked.filter(F.col("rank") <= k)


def lsh_bucket_signature(vec_col: Column, num_planes: int = 8) -> Column:
    """Random-hyperplane LSH signature: bit i = sign of <v, plane_i>
    where plane_i components are derived deterministically from
    xxhash64(pos, i) — no stored projection matrix, reproducible
    everywhere. Returns an int bucket id in [0, 2^num_planes)."""
    sig = F.lit(0)
    for i in range(num_planes):
        # pseudo-random ±1 plane component per position, seeded by (pos, i)
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.transform(
                    F.sequence(F.lit(0), F.size(vec_col) - 1),
                    lambda pos: F.when(
                        F.xxhash64(pos, F.lit(i)).bitwiseAND(F.lit(1)) == 1,
                        F.lit(1.0),
                    ).otherwise(F.lit(-1.0)),
                ),
                lambda x, p: (x * p).cast("double"),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig + F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return sig


def topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    num_planes: int = 6,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's LSH
    bucket (plus Hamming-1 neighbor buckets via multi-probe on the
    query side). Recall < 1 by construction; the brute-force operator
    is its verifier."""
    sig = lsh_bucket_signature(F.col(vec_col), num_planes)
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("cvec"),
        sig.alias("bucket"),
    )
    # multi-probe: query probes its own bucket and all Hamming-1 buckets
    probes = F.array(
        F.lit(0), *[F.lit(1 << i) for i in range(num_planes)]
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode(
            F.transform(probes, lambda m: sig.bitwiseXOR(m))
        ).alias("bucket"),
    )
    from pyspark.sql.window import Window

    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_col(F.col("qvec"), F.col("cvec")), 6).alias(
                "cosine"
            ),
        )
        .distinct()
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("cosine"), F.asc("vec_id")
                )
            ),
        )
    )
    return scored.filter(F.col("rank") <= k)
