"""Distributed clustering over embedding columns.

KMeans is the coarse-quantization workhorse of a vector pipeline: the
same centroids that cluster a corpus also shard it into IVF inverted
lists (operators/vectors.ivf_topk builds its own lightweight variant).
Here the full pyspark.ml estimator runs in-engine: Arrow-free
array->vector conversion, distributed Lloyd iterations (each a map +
tree-aggregate of partial centroid sums — no per-point driver traffic),
fixed seed for reproducibility.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kmeans_centroids(
    df: DataFrame,
    vec_col: str,
    k: int,
    seed: int = 42,
    max_iter: int = 20,
    spherical: bool = True,
) -> DataFrame:
    """Fit KMeans and return just the centroids as (cid INT, center
    ARRAY<DOUBLE>) — the coarse-quantizer feed for IVF inverted lists
    (operators/vectors.ivf_topk takes this through its centroid seam).
    Deterministic for a fixed seed + input.

    spherical=True L2-normalizes vectors before fitting (spherical
    k-means): the IVF probe ranks lists by COSINE, and Euclidean
    clustering of unnormalized vectors optimizes a different metric —
    measured as a ~40-point recall drop on the synthetic corpus when
    the quantizer and probe disagree."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    xs = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    if spherical:
        norm = F.sqrt(
            F.aggregate(
                F.transform(xs, lambda x: x * x),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )
        xs = F.transform(xs, lambda x: x / F.greatest(norm, F.lit(1e-30)))
    feat = df.select(array_to_vector(xs).alias("features"))
    model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(feat)
    return df.sparkSession.createDataFrame(
        [
            (i, [float(x) for x in c])
            for i, c in enumerate(model.clusterCenters())
        ],
        "cid int, center array<double>",
    )


def kmeans_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    seed: int = 42,
    max_iter: int = 20,
) -> DataFrame:
    """Cluster `vec_col` (array<float>) into k clusters; returns
    (id_col, cluster, dist) with dist = Euclidean distance to the
    assigned centroid. Deterministic for a fixed seed + input."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feat = df.select(
        F.col(id_col),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias(
            "features"
        ),
    )
    model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(feat)
    assigned = model.transform(feat).withColumnRenamed(
        "prediction", "cluster"
    )
    centers = assigned.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cluster int, center array<double>",
    )
    with_center = assigned.join(F.broadcast(centers), "cluster")
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(
                vector_to_array("features"),
                "center",
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return with_center.select(
        id_col,
        F.col("cluster").cast("long").alias("cluster"),
        dist.alias("dist"),
    )


# ---- fixed-point Lloyd (engine-exact twin machinery) --------------
#: feature/centroid scale for the exact path; |x| < 1 on the unit-norm
#: embedding corpus, so |xq| < 2^20 and per-vector squared distances
#: stay below 2^48 (argmin keys d*K + cid < 2^53, exact in int64 and
#: in any engine's float64 widening)
KM_SCALE = 1 << 20


def quantize_fixed(df, id_col: str, vec_col: str, scale: int = KM_SCALE):
    """(id_col, original vec_col, xq ARRAY<BIGINT>) — features floored
    onto the fixed-point grid. floor(x * scale) is one IEEE multiply +
    floor per element, identical in any engine."""
    return df.select(
        F.col(id_col),
        F.col(vec_col),
        F.transform(
            vec_col, lambda e: F.floor(e.cast("double") * scale).cast("long")
        ).alias("xq"),
    )


def key_array_fixed(cents: list[list[int]], k: int):
    """Per-centroid integer keys for a row's `xq` column: key[cid] =
    squared-L2 distance * k + cid — the composite breaks distance
    ties toward the lower cid, and both the distances and the keys
    fit int64 (see KM_SCALE note). array_min of it is the argmin
    assignment; array_sort + slice is a map-side top-nprobe (how the
    IVF probe stage ranks lists without any shuffle). ONE expr-parsed
    nested-array literal + a runtime loop keeps the generated code
    small and constant-shaped in k (per-centroid unrolling costs
    ~0.5 s of Catalyst/codegen per plan; individual F.lit Columns
    cost ~1 s of py4j round trips)."""
    clit = F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(f"{int(v)}L" for v in c) + ")"
            for c in cents
        )
        + ")"
    )
    return F.transform(
        F.sequence(F.lit(0).cast("long"), F.lit(k - 1)),
        lambda i: F.aggregate(
            F.zip_with(
                "xq",
                F.element_at(clit, (i + 1).cast("int")),
                lambda x, cv: (x - cv) * (x - cv),
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        * k
        + i,
    )


def assign_key_fixed(cents: list[list[int]], k: int):
    """argmin assignment key: min over key_array_fixed — cluster =
    key % k, scaled squared distance = key // k."""
    return F.array_min(key_array_fixed(cents, k))


def lloyd_fixed(
    base, id_col: str, k: int, iters: int, dim: int
) -> list[list[int]]:
    """Fixed-point Lloyd: init = the k lowest-id vectors, then `iters`
    rounds of (map-only integer argmin assignment -> ONE
    posexplode/groupBy(cid, j) hash aggregate -> floor-division
    means). Returns the k integer centroid vectors (k*dim longs of
    driver control plane per iteration — the tree-aggregated posture
    of any distributed Lloyd; pyspark.ml's KMeans does exactly this
    internally). Empty clusters keep their previous centroid. The
    recurrence is deliberately SQL-expressible: floor division is the
    sign-safe pmod form, so an unrolled-CTE oracle replays it
    exactly. `base` must carry (id_col, xq).

    The driver-loop jobs run under session.bounded_reduce: every
    reduce here is <= k*dim groups however large the corpus, so one
    reduce partition with no adaptive re-planning is the right shape
    at any scale (the map side stays wide)."""
    from ..operators.vectors import lloyd_partials_arrow
    from ..session import bounded_reduce

    spark = base.sparkSession
    with bounded_reduce(spark):
        seeds = base.orderBy(id_col).limit(k).collect()
        if len(seeds) < k:
            raise ValueError(
                f"lloyd_fixed: corpus has only {len(seeds)} vectors but "
                f"k={k}; reduce k to at most the corpus size"
            )
        cents = [list(r["xq"]) for r in seeds]
        for _ in range(iters):
            # one job per iteration: the Arrow combine emits <= k*dim
            # partial rows per chunk, the reduce SUMs them — integer
            # addition is associative, so the totals equal the
            # oracle's direct per-(cid, j) SUM bit for bit
            sums = (
                lloyd_partials_arrow(base, cents, k)
                .groupBy("cid", "j")
                .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
                .collect()
            )
            got = {(int(r["cid"]), int(r["j"])): r for r in sums}
            cents = [
                [
                    int(got[(c, j)]["s"]) // int(got[(c, j)]["n"])
                    if (c, j) in got
                    else cents[c][j]
                    for j in range(dim)
                ]
                for c in range(k)
            ]
    return cents


def pq_lloyd_fixed(
    base, id_col: str, k: int, m: int, iters: int, dim: int
) -> list[list[int]]:
    """Per-subspace fixed-point Lloyd for a product quantizer: init =
    the k lowest-id vectors (each subspace seeded from the same
    rows), then `iters` rounds where ALL m subspace codebooks update
    from ONE job (operators/vectors.pq_lloyd_partials_arrow — the
    bounded reduce is <= k*dim groups regardless of m or corpus
    size). Same recurrence as lloyd_fixed per subspace — integer
    argmin with low-cid ties, floor-division means, empty codewords
    keep their previous value — so the unrolled-CTE oracle replays
    every subspace exactly. Returns (k, dim) integer codewords; row
    c's subspace-s slice is codeword c of subspace s."""
    from ..operators.vectors import pq_lloyd_partials_arrow
    from ..session import bounded_reduce

    sub = dim // m
    spark = base.sparkSession
    with bounded_reduce(spark):
        seeds = base.orderBy(id_col).limit(k).collect()
        if len(seeds) < k:
            raise ValueError(
                f"pq_lloyd_fixed: corpus has only {len(seeds)} vectors "
                f"but k={k}; reduce k to at most the corpus size"
            )
        cents = [list(r["xq"]) for r in seeds]
        for _ in range(iters):
            sums = (
                pq_lloyd_partials_arrow(base, cents, k, m)
                .groupBy("sub", "cid", "jj")
                .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
                .collect()
            )
            got = {
                (int(r["sub"]), int(r["cid"]), int(r["jj"])): r
                for r in sums
            }
            cents = [
                [
                    int(got[(j // sub, c, j % sub)]["s"])
                    // int(got[(j // sub, c, j % sub)]["n"])
                    if (j // sub, c, j % sub) in got
                    else cents[c][j]
                    for j in range(dim)
                ]
                for c in range(k)
            ]
    return cents
