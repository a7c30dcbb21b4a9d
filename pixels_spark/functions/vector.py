"""Vector similarity operators over ``ArrayType(FloatType)`` embedding columns.

Maps the reference's VECTOR type
(``pixels-core/.../TypeDescription.java:218``, ``VectorColumnVector.java``,
``proto/pixels.proto:127`` dimension) to Spark array columns, and adds the
similarity-search operators the reference lacks.

All similarity math uses ``F.zip_with`` / ``F.aggregate`` — JVM higher-order
functions, no Python. Element order in the fold is fixed (left→right), so
results are bit-deterministic and match DuckDB's sequential
list_inner_product.

Scale design (100 TB):
- brute-force top-k: per-partition scan + TakeOrderedAndProject — one pass,
  no shuffle of the corpus; k results per partition merge on the driver.
- LSH (random hyperplanes): deterministic planes from a seeded RNG; bucket =
  sign-bit string. Candidate generation is an equi-join on bucket — the
  shuffle carries only (bucket, id, vec), and probing B buckets multiplies
  work by B, not by corpus size.
- IVF: k centroid rows broadcast; assignment is a map-side argmin; probe
  reads only the partition(s) of the nearest centroid(s). Cluster the
  corpus by `ivf_cell` partitioning on write for locality.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two equal-length array columns (double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def query_vector(df: DataFrame, id_col: str, vec_col: str, qid: int) -> DataFrame:
    """1-row DataFrame holding the query vector (broadcast by callers)."""
    return df.filter(F.col(id_col) == qid).select(F.col(vec_col).alias("_qvec"))


def knn_brute_force(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: DataFrame,
    k: int = 10,
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k nearest neighbors to the 1-row ``query`` DataFrame.

    Plan shape: broadcast 1-row query → map-side similarity → global top-k
    (TakeOrderedAndProject). No corpus shuffle; scales to any corpus size.
    """
    sim_fn = cosine if metric == "cosine" else dot
    sim = sim_fn(F.col(vec_col), F.col("_qvec"))
    return (
        df.crossJoin(F.broadcast(query))
        .select(F.col(id_col), sim.alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# LSH: random-hyperplane signatures


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket(vec: Column, dim: int, n_planes: int = 8, seed: int = 42) -> Column:
    """Random-hyperplane LSH bucket id (0..2^n_planes-1) for a vector column.

    Hyperplanes are generated driver-side from a fixed seed and inlined as
    literal arrays — identical on every executor, no shuffle, no UDF.
    """
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(v)) for v in plane])
        bit = F.when(dot(vec, p) >= 0, 1).otherwise(0)
        bucket = bucket + (bit * (1 << i))
    return bucket.cast("int")


def lsh_candidate_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Candidate near-neighbor pairs: equi-join on LSH bucket.

    Returns (id_a, id_b, sim) for id_a < id_b sharing a bucket. The bucket
    join shuffles only (bucket, id, vec); cosine is evaluated on candidates
    only — the 1/2^n_planes collision rate is what makes this sub-quadratic.
    """
    from .dedup import spread

    b = spread(df, id_col).select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
        lsh_bucket(F.col(vec_col), dim, n_planes, seed).alias("_bucket"),
    )
    left = b.select(
        F.col("_id").alias("id_a"), F.col("_vec").alias("_vec_a"), "_bucket"
    )
    right = b.select(
        F.col("_id").alias("id_b"), F.col("_vec").alias("_vec_b"), "_bucket"
    )
    return (
        left.join(right, "_bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            cosine(F.col("_vec_a"), F.col("_vec_b")).alias("sim"),
        )
    )


# ---------------------------------------------------------------------------
# IVF: inverted-file index over broadcast centroids


def ivf_assign(
    df: DataFrame,
    vec_col: str,
    centroids: DataFrame,
    centroid_id: str = "cell_id",
    centroid_vec: str = "cell_vec",
) -> DataFrame:
    """Assign each vector to its nearest centroid (max cosine).

    ``centroids`` is small (k rows) and broadcast; assignment is a map-side
    argmin via min_by over the k-expanded rows — one narrow broadcast join,
    no corpus shuffle. Persist the result partitioned by ``ivf_cell`` to get
    data locality for probes.
    """
    from .dedup import spread

    sim = cosine(F.col(vec_col), F.col(centroid_vec))
    joined = (
        spread(df, df.columns[0])
        .crossJoin(F.broadcast(centroids))
        .withColumn("_sim", sim)
    )
    return (
        joined.groupBy(*df.columns)
        .agg(F.max_by(F.col(centroid_id), F.col("_sim")).alias("ivf_cell"))
    )


def ivf_probe(
    assigned: DataFrame,
    vec_col: str,
    id_col: str,
    query: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    n_probe: int = 1,
    centroid_id: str = "cell_id",
    centroid_vec: str = "cell_vec",
) -> DataFrame:
    """ANN search: rank centroids by similarity to the query, scan only the
    ``n_probe`` nearest cells, exact top-k within them."""
    q_cells = (
        centroids.crossJoin(F.broadcast(query))
        .select(
            F.col(centroid_id),
            cosine(F.col(centroid_vec), F.col("_qvec")).alias("_csim"),
        )
        .orderBy(F.col("_csim").desc())
        .limit(n_probe)
        .select(F.col(centroid_id).alias("_probe_cell"))
    )
    probed = assigned.join(
        F.broadcast(q_cells), assigned["ivf_cell"] == F.col("_probe_cell"), "left_semi"
    )
    return knn_brute_force(probed, vec_col, id_col, query, k)


def make_centroids(
    df: DataFrame, vec_col: str, id_col: str, n_cells: int
) -> DataFrame:
    """Deterministic seed centroids: the ``n_cells`` lowest-id vectors.

    (Production path would run k-means||; a fixed seed set keeps the declared
    queries deterministic while exercising the identical plan shape.)
    """
    return (
        df.orderBy(id_col)
        .limit(n_cells)
        .select(
            F.col(id_col).cast("int").alias("cell_id"),
            F.col(vec_col).alias("cell_vec"),
        )
    )
