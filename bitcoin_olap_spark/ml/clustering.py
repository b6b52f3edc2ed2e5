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
