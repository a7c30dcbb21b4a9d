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

import math

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import cut_lineage


def stable_mean(col: Column) -> Column:
    """Order-independent mean for Lloyd updates: values are quantized to
    DECIMAL(28,9) before summing (decimal addition is exact → the sum is
    independent of partitioning/merge order), then divided as double.
    This makes trained centroids bit-reproducible across cluster layouts
    AND exactly replayable by a SQL oracle — the property vec_kmeans_round
    proved for one round, applied to every round of every trainer.

    Precondition: |x| < 1e19 per value (embedding/centroid components are
    O(1)). 28 integer+fraction digits keep the CAST exact-in-range where
    the earlier DECIMAL(18,9) overflowed-to-NULL at |x| ≥ 1e9 — a
    silently biased mean, since F.sum skips NULLs while the count(*)
    divisor still counted them. The divisor stays count(*) deliberately:
    it matches the SQL oracles' count(*) bit-for-bit, and Lloyd inputs
    are never NULL. For in-range values (28,9) and (18,9) quantize
    identically at 9 fractional digits, so every existing oracle result
    is unchanged."""
    return F.sum(col.cast("double").cast("decimal(28,9)")).cast(
        "double"
    ) / F.count(F.lit(1))


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


def quantize_int8(vec: Column, levels: float = 127.0) -> Column:
    """Symmetric int8 quantization: struct(scale double, q array<int>) with
    ``scale = max|x|/levels`` and ``q_i = floor(x_i/scale + 0.5)`` — the 4×
    memory reduction that makes a 100 TB embedding corpus servable from a
    quarter of the storage/cache footprint. Dequantized value = q_i·scale.
    ``levels`` defaults to int8's 127; levels=1.0 gives TERNARY
    quantization (q_i ∈ {−1, 0, 1}, ~1.6 bits/dim — the 16× extreme
    compression whose retrieval loss eval_mrr_ternary measures).

    floor(x+0.5) instead of round(): Spark's HALF_UP and DuckDB's
    half-away-from-zero disagree on exact .5 for negatives; the floor form
    is identical in both engines, so quantized search is exactly
    SQL-oracle-able. A zero vector quantizes to scale=0, q=0.
    """
    scale_expr = (
        F.aggregate(
            vec, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x.cast("double")))
        )
        / F.lit(levels)
    )

    # bind scale as a LAMBDA VARIABLE (transform over a 1-element array):
    # referenced as a subtree inside the per-element lambda it would be
    # re-evaluated — an O(d) max-abs aggregate — twice per vector element,
    # O(d²) per row (same defect as word_shingles' token binding; see
    # functions/dedup.py). Bound once, each element only divides by it.
    def _quant(scale: Column) -> Column:
        q = F.transform(
            vec,
            lambda x: F.when(scale == 0, F.lit(0))
            .otherwise(F.floor(x.cast("double") / scale + F.lit(0.5)).cast("int"))
            .cast("int"),
        )
        return F.struct(scale.alias("scale"), q.alias("q"))

    return F.element_at(F.transform(F.array(scale_expr), _quant), 1)


def knn_int8(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Top-k cosine over the int8-quantized corpus against an exact (float)
    query vector — the memory-bound serving path: the corpus is stored/
    scanned quantized; similarity uses the dequantized values, so
    ``sim = (Σ q_i·scale·qv_i) / (‖q·scale‖·‖qv‖)``. Same broadcast +
    TakeOrderedAndProject shape as the exact kNN (no corpus shuffle)."""
    quant = df.select(
        F.col(id_col), quantize_int8(F.col(vec_col)).alias("_z")
    ).select(
        F.col(id_col),
        F.transform(
            F.col("_z.q"), lambda x: x.cast("double") * F.col("_z.scale")
        ).alias("_deq"),
    )
    corpus = quant.select(
        F.col(id_col), F.col("_deq"), l2_norm(F.col("_deq")).alias("_vnorm")
    )
    q = query.select(F.col("_qvec"), l2_norm(F.col("_qvec")).alias("_qnorm"))
    sim = dot(F.col("_deq"), F.col("_qvec")) / (F.col("_vnorm") * F.col("_qnorm"))
    return (
        corpus.join(F.broadcast(q))
        .select(F.col(id_col), sim.alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
    )


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

    Norms are projected once per side before the expansion (HOFs are
    interpreted and not CSE'd, so ``cosine()`` inline would fold three
    dim-length aggregates per pair where one suffices — the corpus norm is a
    per-row constant and the query norm a per-query constant).
    """
    if metric == "cosine":
        corpus = df.select(F.col(id_col), F.col(vec_col), l2_norm(F.col(vec_col)).alias("_vnorm"))
        q = query.select(F.col("_qvec"), l2_norm(F.col("_qvec")).alias("_qnorm"))
        sim = dot(F.col(vec_col), F.col("_qvec")) / (F.col("_vnorm") * F.col("_qnorm"))
    else:
        corpus = df.select(F.col(id_col), F.col(vec_col))
        q = query
        sim = dot(F.col(vec_col), F.col("_qvec"))
    return (
        corpus.crossJoin(F.broadcast(q))
        .select(F.col(id_col), sim.alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# LSH: random-hyperplane signatures


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim))


def _bucket_from_planes(vec: Column, planes_col: Column, n_planes: int) -> Column:
    """Sign-bit bucket of ``vec`` against an ``array<array<double>>`` planes
    column: a fold over plane indices — JVM-side, no UDF.

    Up to 30 planes the bucket is the packed bit integer (0..2^n-1); beyond
    that (packing would overflow) it is a deterministic hash of the sign-bit
    vector — equal signatures still collide, which is all the equi-join
    blocking needs."""
    idx = F.sequence(F.lit(1), F.lit(int(n_planes)))
    if n_planes <= 30:
        return F.aggregate(
            idx,
            F.lit(0),
            lambda acc, i: acc
            + F.when(
                dot(vec, F.element_at(planes_col, i)) >= 0,
                F.pow(F.lit(2.0), (i - F.lit(1)).cast("double")).cast("int"),
            ).otherwise(F.lit(0)),
        ).cast("int")
    signs = F.transform(
        idx,
        lambda i: F.when(dot(vec, F.element_at(planes_col, i)) >= 0, 1).otherwise(0),
    )
    return F.xxhash64(signs)  # bigint; equi-join key only


def lsh_bucket(vec: Column, dim: int, n_planes: int = 8, seed: int = 42) -> Column:
    """Random-hyperplane LSH bucket id (0..2^n_planes-1) for a vector column.

    Hyperplanes are generated driver-side from a fixed seed and inlined as
    literal arrays — identical on every executor, no shuffle, no UDF. The
    expression tree grows with dim×n_planes, so this Column form is for
    small/moderate dims; at production dims (e.g. 1536×64) use
    ``with_lsh_bucket``, which ships the planes as broadcast DATA (one tiny
    relation, O(1) expression size) instead of literals.
    """
    planes = _hyperplanes(dim, n_planes, seed)
    planes_lit = F.lit([[float(v) for v in p] for p in planes])
    return _bucket_from_planes(vec, planes_lit, n_planes)


def with_lsh_bucket(
    df: DataFrame,
    vec_col: str,
    out_col: str = "_bucket",
    dim: int | None = None,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Attach an LSH bucket column, planes shipped as broadcast data.

    The hyperplane matrix rides in a ONE-ROW broadcast relation
    (``array<array<double>>``), joined map-side onto every partition —
    expression size stays constant no matter the dimensionality, the planes
    are materialized once (not re-evaluated per row as literals would be at
    1536×64 ≈ 100K Catalyst nodes), and there is no shuffle: a broadcast
    nested-loop join against one row is a map-side zip.
    """
    spark = df.sparkSession
    if dim is None:
        dim = df.select(F.size(F.col(vec_col))).first()[0]
    planes = _hyperplanes(dim, n_planes, seed)
    planes_df = spark.createDataFrame(
        [([[float(v) for v in p] for p in planes],)],
        "_planes: array<array<double>>",
    )
    return (
        df.crossJoin(F.broadcast(planes_df))
        .withColumn(
            out_col, _bucket_from_planes(F.col(vec_col), F.col("_planes"), n_planes)
        )
        .drop("_planes")
    )


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

    b = with_lsh_bucket(
        spread(df, id_col), vec_col, "_bucket", dim, n_planes, seed
    ).select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
        "_bucket",
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
    id_col: str | None = None,
    n_assign: int = 1,
) -> DataFrame:
    """Assign each vector to its ``n_assign`` nearest centroids (max cosine).

    ``centroids`` is small (k rows) and broadcast; assignment is argmax via
    ``max_by`` over the k-expanded rows, grouped ON THE ID ONLY — other
    columns (including the float-array vector, whose hash/compare as a
    grouping key was both heavy and FP-equality-fragile) ride along via
    ``first``, valid because all k replicas of a row are identical. Ties on
    similarity break to the lowest cell id (struct ordering), so assignment
    is deterministic. Persist the result partitioned by ``ivf_cell`` to get
    data locality for probes.

    ``n_assign > 1`` is spill assignment: each vector is stored in its
    top-n cells (one output row per assignment), trading n× storage for
    recall — the standard counter to kNN neighborhoods that straddle cell
    boundaries. ``ivf_probe`` de-duplicates, so results stay one-row-per-id.
    """
    from .dedup import spread

    id_col = id_col or df.columns[0]
    carry = [c for c in df.columns if c != id_col]
    # Norms projected BEFORE the k-way expansion: cosine() inline would
    # re-fold both norms per (row, centroid) pair — 3 interpreted HOF
    # aggregates where 1 (the pair dot) suffices.
    cents = centroids.withColumn("_cnorm", l2_norm(F.col(centroid_vec)))
    sim = dot(F.col(vec_col), F.col(centroid_vec)) / (
        F.col("_vnorm") * F.col("_cnorm")
    )
    joined = (
        spread(df, id_col)
        .withColumn("_vnorm", l2_norm(F.col(vec_col)))
        .crossJoin(F.broadcast(cents))
        .withColumn("_sim", sim)
    )
    if n_assign <= 1:
        best = F.max_by(
            F.col(centroid_id),
            F.struct(F.col("_sim"), (-F.col(centroid_id)).alias("_neg")),
        )
        return (
            joined.groupBy(id_col)
            .agg(best.alias("ivf_cell"), *[F.first(c).alias(c) for c in carry])
            .select(*df.columns, "ivf_cell")
        )
    from pyspark.sql.window import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("_sim").desc(), F.col(centroid_id).asc()
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_assign)
        .select(*df.columns, F.col(centroid_id).alias("ivf_cell"))
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
    ``n_probe`` nearest cells, exact top-k within them. Safe under spill
    assignment (``ivf_assign(n_assign>1)``): vectors stored in several
    probed cells are de-duplicated before ranking."""
    q_cells = (
        centroids.crossJoin(F.broadcast(query))
        .select(
            F.col(centroid_id),
            cosine(F.col(centroid_vec), F.col("_qvec")).alias("_csim"),
        )
        .orderBy(F.col("_csim").desc(), F.col(centroid_id))
        .limit(n_probe)
        .select(F.col(centroid_id).alias("_probe_cell"))
    )
    probed = assigned.join(
        F.broadcast(q_cells), assigned["ivf_cell"] == F.col("_probe_cell"), "left_semi"
    ).dropDuplicates([id_col])
    return knn_brute_force(probed, vec_col, id_col, query, k)


def write_ivf_index(
    assigned: DataFrame,
    path: str,
    cell_col: str = "ivf_cell",
) -> None:
    """Materialize an IVF-assigned corpus partitioned by cell.

    One directory per cell (`ivf_cell=<n>/`) — the physical layout that
    turns ``ivf_probe_index`` into an O(probed cells) read: partition
    pruning keeps unprobed cells' files out of the scan entirely, which is
    the property that makes IVF pay at 100 TB (probe cost scales with
    n_probe × cell size, not corpus size).
    """
    assigned.write.mode("overwrite").partitionBy(cell_col).parquet(path)


def ivf_probe_index(
    spark,
    path: str,
    vec_col: str,
    id_col: str,
    query: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    n_probe: int = 1,
    centroid_id: str = "cell_id",
    centroid_vec: str = "cell_vec",
) -> DataFrame:
    """ANN search against a ``write_ivf_index`` layout.

    The probe cells are resolved driver-side (ranking k centroid rows
    against the query — O(k), the standard ANN index lookup), then the
    corpus scan carries ``ivf_cell IN (probed)`` as a STATIC partition
    filter: only the probed cells' directories are listed or read
    (asserted via inputFiles in tests). Spill-assigned duplicates are
    collapsed before ranking, as in ``ivf_probe``.
    """
    ranked = (
        centroids.crossJoin(F.broadcast(query))
        .select(
            F.col(centroid_id),
            cosine(F.col(centroid_vec), F.col("_qvec")).alias("_csim"),
        )
        .orderBy(F.col("_csim").desc(), F.col(centroid_id))
        .limit(n_probe)
        .collect()
    )
    cells = [r[centroid_id] for r in ranked]
    corpus = (
        spark.read.parquet(path)
        .filter(F.col("ivf_cell").isin(cells))
        .dropDuplicates([id_col])
    )
    return knn_brute_force(corpus, vec_col, id_col, query, k)


def make_centroids(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_cells: int,
    iterations: int = 2,
    max_train_rows: int | None = 65536,
    reliable: bool = False,
) -> DataFrame:
    """K-means centroids (Lloyd's algorithm), fully over DataFrame ops.

    Init is deterministic — the ``n_cells`` lowest-id vectors, relabeled
    0..k-1 — then each Lloyd round is (a) nearest-centroid assignment
    (broadcast join + max_by, see ``ivf_assign``) and (b) element-wise mean
    per cell via posexplode → groupBy(cell, dim) → re-assemble, so the wide
    vector never becomes a grouping key and each round is two shuffles whose
    width is k×dim rows, independent of corpus size. Centroids are
    lineage-cut between rounds (``functions.dedup.cut_lineage`` —
    ``reliable=True`` for the fault-tolerant variant on long runs).

    Lloyd trains on a deterministic hash-sample capped at
    ``max_train_rows`` (k-means quality saturates far below full-corpus
    size; training over 100 TB of embeddings would pay ``iterations``
    full-corpus passes for no recall gain). The cap only engages when the
    corpus exceeds it, so small-fixture results are unchanged;
    ``max_train_rows=None`` always trains on everything.

    ``iterations=0`` reproduces the pure seed behavior.
    """
    from pyspark.sql.window import Window

    pts = df.select(id_col, vec_col)
    if iterations > 0 and max_train_rows is not None:
        n = pts.count()
        if n > max_train_rows:
            m = -(-n // max_train_rows)  # ceil
            train = pts.filter(
                F.pmod(F.xxhash64(F.col(id_col)), F.lit(m)) == 0
            )
        else:
            train = pts
    else:
        train = pts
    w = Window.orderBy(id_col)
    cents = (
        pts.orderBy(id_col)
        .limit(n_cells)
        .select(
            (F.row_number().over(w) - 1).alias("cell_id"),
            F.col(vec_col).cast("array<double>").alias("cell_vec"),
        )
    )
    for _ in range(iterations):
        assigned = ivf_assign(train, vec_col, cents, id_col=id_col)
        means = (
            assigned.select("ivf_cell", F.posexplode(F.col(vec_col)))
            .groupBy("ivf_cell", "pos")
            .agg(stable_mean(F.col("col")).alias("m"))
            .groupBy("ivf_cell")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("cell_vec")
            )
            .select(F.col("ivf_cell").alias("cell_id"), "cell_vec")
        )
        # empty cells keep their previous centroid
        cents = cut_lineage(
            cents.select("cell_id", F.col("cell_vec").alias("_prev"))
            .join(means, "cell_id", "left_outer")
            .select(
                "cell_id",
                F.coalesce(F.col("cell_vec"), F.col("_prev")).alias("cell_vec"),
            ),
            reliable,
        )
    return cents


# ---------------------------------------------------------------------------
# product quantization (PQ) — the 16-32× memory serving path


def pq_codebooks(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    m: int = 16,
    k: int = 16,
    iterations: int = 2,
    reliable: bool = False,
) -> list[list[list[float]]]:
    """Train PQ codebooks: the D-dim space splits into ``m`` coordinate
    blocks of D/m dims; each block gets its own ``k``-centroid L2 k-means.
    Returns ``books[sub][code] -> centroid`` as plain lists (m·k·D/m
    floats — a few KB, deliberately driver-side: codebooks are broadcast
    constants at serving time, exactly like IVF's centroid table).

    All ``m`` subspace k-means run as ONE grouped Lloyd over
    (sub, id, subvector) rows — each iteration is a broadcast join +
    argmin and a per-(sub,code,pos) mean, two small shuffles total,
    instead of m sequential ``make_centroids`` jobs (~6 Spark jobs vs ~80
    at m=16). Assignment is L2 (what ``pq_encode`` uses), init is
    deterministic (the k lowest-id subvectors per subspace), ties break to
    the lowest code.

    Beyond-reference ANN serving tier: int8 is 4× smaller than float32; PQ
    at m=16,k=32 stores 16 codes per 64-dim vector — 16× smaller than
    float32, and the ratio grows linearly with D.
    """
    from pyspark.sql.window import Window

    dim = df.select(F.size(F.col(vec_col)).alias("d")).first()["d"]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    n = df.count()
    if n < k:
        raise ValueError(f"k={k} codebook entries need >= k vectors, got {n}")
    d_sub = dim // m
    pts = df.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("sub"),
                        F.slice(F.col(vec_col), j * d_sub + 1, d_sub)
                        .cast("array<double>")
                        .alias("sv"),
                    )
                    for j in range(m)
                ]
            )
        ).alias("_e"),
    ).select("_id", F.col("_e.sub").alias("sub"), F.col("_e.sv").alias("sv"))

    w = Window.partitionBy("sub").orderBy("_id")
    cents = (
        pts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("sub", (F.col("_rn") - 1).alias("code"), F.col("sv").alias("cv"))
    )
    l2 = F.aggregate(
        F.zip_with(F.col("sv"), F.col("cv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    for _ in range(iterations):
        assigned = (
            pts.join(F.broadcast(cents), "sub")
            .select("sub", "_id", "sv", F.struct(l2.alias("d"), F.col("code")).alias("_dc"))
            .groupBy("sub", "_id")
            .agg(F.min("_dc")["code"].alias("code"), F.first("sv").alias("sv"))
        )
        means = (
            assigned.select("sub", "code", F.posexplode("sv"))
            .groupBy("sub", "code", "pos")
            .agg(stable_mean(F.col("col")).alias("mv"))
            .groupBy("sub", "code")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "mv"))),
                    lambda s: s["mv"],
                ).alias("mcv")
            )
        )
        # empty codes keep their previous centroid
        cents = (
            cents.join(means, ["sub", "code"], "left_outer")
            .select(
                "sub", "code", F.coalesce(F.col("mcv"), F.col("cv")).alias("cv")
            )
        )
        cents = cut_lineage(cents, reliable)
    got = {}
    for r in cents.collect():
        got[(r["sub"], r["code"])] = [float(x) for x in r["cv"]]
    return [[got[(j, c)] for c in range(k)] for j in range(m)]


def pq_encode(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    books: list[list[list[float]]],
) -> DataFrame:
    """(id, codes array<int>) — each vector reduced to one code per
    subspace (nearest codebook centroid by L2). Pure column expressions:
    per subspace an array<struct(dist,code)> over the k candidates,
    ``array_min`` picks the argmin (ties → lowest code, deterministic).
    m·k small aggregate exprs, all whole-stage codegen; no shuffle."""
    m, k = len(books), len(books[0])
    d_sub = len(books[0][0])

    def code_for(j: int) -> Column:
        sv = F.slice(F.col(vec_col), j * d_sub + 1, d_sub)
        cands = F.array(
            *[
                F.struct(
                    F.aggregate(
                        F.zip_with(
                            sv,
                            F.array(*[F.lit(float(x)) for x in books[j][c]]),
                            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ).alias("dist"),
                    F.lit(c).alias("code"),
                )
                for c in range(k)
            ]
        )
        return F.array_min(cands)["code"]

    return df.select(
        F.col(id_col), F.array(*[code_for(j) for j in range(m)]).alias("codes")
    )


def pq_knn(
    encoded: DataFrame,
    id_col: str,
    books: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
) -> DataFrame:
    """Top-k approximate cosine via Asymmetric Distance Computation: the
    query is NOT quantized — per (sub, code) we precompute on the driver
    the partial dot ``<q_sub, centroid>`` and the centroid's squared norm
    (coordinate blocks are disjoint, so reconstructed ``‖v̂‖² = Σ_sub
    ‖centroid‖²``), ship both as literal lookup tables (m·k doubles each),
    and score each row with two element_at folds over its code array —
    sim(q, v̂) exactly, computed without ever touching a float vector.
    Same no-shuffle TakeOrderedAndProject shape as the exact kNN.
    """
    import math

    m, kk = len(books), len(books[0])
    d_sub = len(books[0][0])
    dot_lut, n2_lut = [], []
    for j in range(m):
        q_sub = query_vec[j * d_sub : (j + 1) * d_sub]
        for c in range(kk):
            cent = books[j][c]
            dot_lut.append(sum(a * b for a, b in zip(q_sub, cent)))
            n2_lut.append(sum(x * x for x in cent))
    qnorm = math.sqrt(sum(x * x for x in query_vec))

    idx = F.sequence(F.lit(0), F.lit(m - 1))

    def fold(lut: list[float]) -> Column:
        arr = F.array(*[F.lit(float(v)) for v in lut])
        return F.aggregate(
            F.zip_with(
                F.col("codes"), idx, lambda c, i: F.element_at(arr, i * kk + c + 1)
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    sim = fold(dot_lut) / (F.sqrt(fold(n2_lut)) * F.lit(qnorm))
    return (
        encoded.select(F.col(id_col), sim.alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
    )


def ivf_append(
    new_df: DataFrame,
    vec_col: str,
    centroids: DataFrame,
    path: str,
    id_col: str,
    n_assign: int = 1,
    cell_col: str = "ivf_cell",
) -> None:
    """Incrementally absorb a NEW vector batch into an existing IVF index:
    assign against the index's FROZEN centroids and append into the
    cell-partitioned layout — no retrain, no rewrite of the existing
    cells' files (``dedup_incremental``'s registry pattern applied to ANN
    serving). Probes immediately see old ∪ new through the same partition
    pruning.

    The standard serving trade: assignment quality degrades as the corpus
    drifts from the trained centroids — monitor (e.g. txt_kl_drift on the
    embedding source) and rebuild when drift warrants; between rebuilds,
    appends are O(new batch) writes while a full rebuild is O(corpus).
    """
    assigned = ivf_assign(
        new_df, vec_col, centroids, id_col=id_col, n_assign=n_assign
    )
    assigned.write.mode("append").partitionBy(cell_col).parquet(path)


def batch_knn(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    queries: DataFrame,
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    k: int = 10,
) -> DataFrame:
    """Exact top-k for a SET of query vectors at once — the evaluation /
    retrieval shape (N probes against the corpus, top-k each) that the
    single-query ``knn_brute_force`` cannot express without N passes.

    Scale shape — the corpus is NEVER shuffled at its own volume:

    1. broadcast the query set; score map-side (corpus × |Q| rows exist
       only inside each task, one Arrow batch at a time);
    2. TRUE map-side per-partition top-k via ``mapInPandas``: a running
       ≤k-rows-per-query pool is folded across the partition's Arrow
       batches, so task memory is bounded by one batch + k×|Q| kept rows
       and the exchange that follows carries only ≤k rows per
       (query, partition) — never a partition's full corpus×|Q| scores
       (a plain ``collect_list``+slice aggregate would buffer those in
       its partial-aggregation buffers crossing the shuffle);
    3. final per-query top-k merges those k-lists.

    Ordering is total — (sim DESC, id ASC), encoded as an ascending
    sort on (-sim, id) — and sims fold left→right exactly like the
    single-query path (the pandas stage only *selects* rows, it never
    recomputes scores), so results are engine-reproducible."""
    from .dedup import spread

    # single-row-group fixtures arrive as one partition; the per-partition
    # top-k phase (and the scoring itself) should use every core
    corpus = spread(df.select(id_col, vec_col), id_col).select(
        F.col(id_col), F.col(vec_col), l2_norm(F.col(vec_col)).alias("_vnorm")
    )
    q = queries.select(
        F.col(q_id_col), F.col(q_vec_col), l2_norm(F.col(q_vec_col)).alias("_qnorm")
    )
    sim = dot(F.col(vec_col), F.col(q_vec_col)) / (
        F.col("_vnorm") * F.col("_qnorm")
    )
    scored = (
        corpus.crossJoin(F.broadcast(q))
        .select(
            F.col(q_id_col),
            (-sim).alias("_neg"),
            F.col(id_col).alias("_cid"),
        )
    )
    out_schema = scored.schema

    def _part_topk(batches):
        import pandas as pd

        kept = None
        for pdf in batches:
            pool = pdf if kept is None else pd.concat(
                [kept, pdf], ignore_index=True
            )
            # global (neg, id) sort then head(k) per query: NaNs sort
            # last (matching Spark's NaN-greatest double ordering)
            kept = (
                pool.sort_values(["_neg", "_cid"])
                .groupby(q_id_col, sort=False)
                .head(k)
            )
        if kept is not None:
            yield kept

    pre = scored.mapInPandas(_part_topk, out_schema)
    top_expr = F.slice(
        F.sort_array(
            F.collect_list(
                F.struct(F.col("_neg").alias("neg"), F.col("_cid").alias("id"))
            )
        ),
        1,
        k,
    )
    merged = pre.groupBy(q_id_col).agg(top_expr.alias("_top"))
    return merged.select(
        q_id_col, F.posexplode("_top").alias("_r", "_s")
    ).select(
        q_id_col,
        (F.col("_r") + 1).cast("bigint").alias("rank"),
        F.col("_s.id").alias(id_col),
        (-F.col("_s.neg")).alias("sim"),
    )


def rrf_fuse(
    cands_a: DataFrame,
    cands_b: DataFrame,
    id_col: str,
    k: int = 10,
    rrf_k: int = 60,
    score_col: str = "score",
) -> DataFrame:
    """Reciprocal Rank Fusion over two BOUNDED candidate lists — the
    production hybrid-retrieval shape: each retriever contributes its
    top-N candidates ``(id, score)`` (a TakeOrdered, never a corpus-wide
    rank), and the fusion touches only the ≤2N candidate rows.

    Ranks are assigned WITHOUT a window: each list collapses to ONE row
    via ``collect_list`` (safe — the list is bounded by construction),
    is sorted as an ascending struct array on (-score, id), and
    ``posexplode`` yields rank = position+1. An id absent from a list
    contributes 0 to its RRF sum (the standard candidate-list
    convention); ``rrf = Σ 1/(rrf_k + rank)`` over the lists that
    returned it. Output: (id, rank_a, rank_b, rrf), top-``k`` by
    (rrf DESC, id) — fully deterministic, hence SQL-oracle-able."""

    def ranked(df: DataFrame, rank_name: str) -> DataFrame:
        s = df.select(
            F.struct(
                (-F.col(score_col)).alias("neg"), F.col(id_col).alias("id")
            ).alias("_s")
        )
        return (
            s.agg(F.sort_array(F.collect_list("_s")).alias("_l"))
            .select(F.posexplode("_l").alias("_r", "_s"))
            .select(
                F.col("_s.id").alias(id_col),
                (F.col("_r") + 1).cast("bigint").alias(rank_name),
            )
        )

    a = ranked(cands_a, "rank_a")
    b = ranked(cands_b, "rank_b")
    term = lambda c: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.lit(rrf_k) + F.col(c)), F.lit(0.0)
    )
    return (
        a.join(b, id_col, "full_outer")
        .select(
            id_col,
            "rank_a",
            "rank_b",
            (term("rank_a") + term("rank_b")).cast("double").alias("rrf"),
        )
        .orderBy(F.col("rrf").desc(), id_col)
        .limit(k)
    )


# ---------------------------------------------------------------------------
# distributed PCA — exact-integer co-moment matrix + power iteration
# ---------------------------------------------------------------------------

PCA_SCALE = 1_000_000  # component quantization: 6 decimal digits


def comoment_matrix(
    emb: DataFrame, id_col: str, vec_col: str, scale: int = PCA_SCALE
) -> DataFrame:
    """Exact centered co-moment matrix of an embedding column in ONE pass:
    returns the upper triangle (i <= j) of M = n²·Cov as (i, j, m, n) with
    m an exact DECIMAL(38,0) — M[i][j] = n·Σ qᵢqⱼ − (Σ qᵢ)(Σ qⱼ) over
    components quantized to q = floor(x·scale + 0.5) (the repo's
    engine-portable rounding: floor(x+0.5), not round(), because Spark
    HALF_UP and DuckDB half-away disagree on negative halves). Centering
    stays integer-exact because the mean is never materialized: n²·cov
    needs no division.

    Scale shape: the d(d+1)/2 pair products, the d linear sums, and the
    row count all ride ONE flattened array per vector
    (``comoment_partials``) — one explode, one partial-aggregated
    groupBy, ONE corpus scan (plan-asserted in tests/test_vector.py; the
    earlier separate-branch form re-scanned the corpus per aggregate
    branch). The partials agg output is O(d²) and persisted, so the
    triple reuse in the assembly joins is cache-local. At 100 TB the
    wire carries O(partitions · d²), never O(rows)."""
    parts = comoment_partials(emb, id_col, vec_col, scale).persist()
    return comoment_from_partials(parts)


def pca_power(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    rounds: int = 3,
    scale: int = PCA_SCALE,
) -> DataFrame:
    """Top principal direction by power iteration run ENTIRELY in exact
    integer arithmetic, so the result is bit-identical on every engine:
    the centered co-moment matrix M (``comoment_matrix``) is rescaled once
    to ≤10¹² via integer division (both engines truncate toward zero —
    verified, so no sign decomposition games are needed, but we keep
    operands positive anyway), then ``rounds`` iterations of
    w = M_s·v (DECIMAL(38,0) exact sums) and v' = sign(w)·(|w|·scale DIV
    max|w|) re-normalize v to the fixed ±scale grid. The only doubles are
    the final loadings v/√(Σv²), computed from ONE exact decimal sum —
    a fixed chain of correctly-rounded IEEE ops.

    Returns one row per dimension: (dim, v_scaled BIGINT, loading DOUBLE).

    Scale shape: after the single corpus pass inside ``comoment_matrix``,
    everything operates on d²-row frames (tiny broadcast joins and 1-row
    scalar crossJoins) — iteration cost is independent of corpus size.
    The rescale-to-10¹² bound also caps every intermediate below 10²⁶
    regardless of n, so DECIMAL(38,0) never overflows at any corpus."""
    return pca_power_from_comoment(
        comoment_matrix(emb, id_col, vec_col, scale), rounds, scale
    )


def pca_power_from_comoment(
    m_up_src: DataFrame, rounds: int = 3, scale: int = PCA_SCALE
) -> DataFrame:
    """Iteration stage of ``pca_power`` over a precomputed upper-triangle
    co-moment frame ``(i, j, m DECIMAL(38,0), n)`` — factored out because
    the co-moment sums are LINEAR in the corpus (Σq, Σqq, n add across
    batches), so a streaming maintainer can fold partial sums per
    micro-batch and run the IDENTICAL iteration over the assembled
    matrix, matching the batch oracle bit-for-bit.

    r12 optimization: the co-moment frame is O(d²) BY CONSTRUCTION (d is
    fixed by the embedding schema — 64 here — never by corpus size), so
    the iteration runs DRIVER-SIDE over collected rows in Python's
    arbitrary-precision ints: the same truncating-division /
    sign-decomposition recursion, exactly (Python ``//`` on the
    non-negative operands used here == both engines' ``div``), and the
    loadings are the same one IEEE chain (float division + correctly-
    rounded sqrt). The previous all-in-plan form spent ~30 scheduler
    round-trips on d²-row frames per query (the 3 matvec joins, their
    rescale windows, Σv²) — measured 2.0-2.9 s of tiny-stage churn at
    sf0.1 for microseconds of arithmetic. Bounded driver state per the
    repo's collect policy (same class as the KMV ⊕-merge and centroid
    collects); the corpus-sized pass stays fully distributed inside
    ``comoment_matrix``."""
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    spark = m_up_src.sparkSession
    schema = StructType(
        [
            StructField("dim", IntegerType(), True),
            StructField("v_scaled", LongType(), True),
            StructField("loading", DoubleType(), True),
        ]
    )
    rows = m_up_src.select("i", "j", "m").collect()  # ≤ d(d+1)/2 rows
    if not rows:
        return spark.createDataFrame([], schema)
    m: dict[tuple[int, int], int] = {}
    for r in rows:
        mi = int(r["m"])
        m[(r["i"], r["j"])] = mi
        if r["i"] < r["j"]:
            m[(r["j"], r["i"])] = mi
    dims = sorted({i for i, _ in m})
    # rescale to |m| ≤ 10¹² (truncating division, sign split — matches
    # _rescale_matrix / the oracle's HUGEINT form bit for bit)
    div = max(abs(x) for x in m.values()) // 10**12 + 1
    ms = {k: (-1 if x < 0 else 1) * (abs(x) // div) for k, x in m.items()}
    v = {i: scale for i in dims}
    for _ in range(rounds):
        w = {
            i: sum(ms[(i, j)] * v[j] for j in dims if (i, j) in ms)
            for i in dims
        }
        vm = max(1, max(abs(x) for x in w.values()))
        v = {
            i: (-1 if w[i] < 0 else 1) * (abs(w[i]) * scale // vm)
            for i in dims
        }
    n2 = math.sqrt(float(sum(x * x for x in v.values())))
    data = [(i, v[i], float(v[i]) / n2) for i in dims]
    return spark.createDataFrame(data, schema).orderBy("dim")


def _rescale_matrix(m_full: DataFrame) -> DataFrame:
    """Rescale a full (i, j, m) integer matrix to |m| ≤ 10¹² via
    truncating integer division (identical on both engines) — bounds
    every downstream matvec term below DECIMAL(38,0) overflow at ANY
    corpus size."""
    from pyspark.sql.window import Window

    return m_full.withColumn(
        "_ms",
        F.expr("max(abs(m))").over(Window.partitionBy())
        .cast("decimal(38,0)"),
    ).select(
        "i",
        "j",
        F.expr(
            "CAST(CASE WHEN m < 0 THEN -1 ELSE 1 END AS BIGINT)"
            " * (abs(m) div (_ms div CAST(1000000000000 AS DECIMAL(38,0))"
            " + 1))"
        ).alias("m"),
    )


def _power_rounds(
    ms: DataFrame, dims: DataFrame, rounds: int, scale: int
) -> DataFrame:
    """``rounds`` exact-integer power iterations of the rescaled matrix
    ``ms`` from the all-ones start: w = ms·v (exact decimal sums),
    v' = sign(w)·(|w|·scale DIV max|w|). Returns (i, v BIGINT)."""
    from pyspark.sql.window import Window

    everything = Window.partitionBy()
    v = dims.select("i", F.lit(scale).cast("bigint").alias("v"))
    for _ in range(rounds):
        w = (
            ms.join(
                v.select(F.col("i").alias("j"), F.col("v").alias("vj")), "j"
            )
            .groupBy("i")
            .agg(
                F.sum(F.col("m").cast("decimal(38,0)") * F.col("vj")).alias(
                    "w"
                )
            )
        )
        v = w.withColumn(
            "_vm",
            F.greatest(
                F.expr("max(abs(w))").over(everything),
                F.lit(1).cast("decimal(38,0)"),
            ),
        ).select(
            "i",
            F.expr(
                "CAST(CASE WHEN w < 0 THEN -1 ELSE 1 END AS BIGINT)"
                f" * ((abs(w) * {scale}) div _vm)"
            ).alias("v"),
        )
    return v


def _with_loading(v: DataFrame, suffix: str = "") -> DataFrame:
    """(i, v) → (dim, v_scaled{suffix}, loading{suffix}): unit-norm
    loadings from ONE exact decimal Σv² (a fixed IEEE chain)."""
    from pyspark.sql.window import Window

    return v.withColumn(
        "_n2",
        F.sum(F.col("v").cast("decimal(38,0)") * F.col("v")).over(
            Window.partitionBy()
        ),
    ).select(
        F.col("i").alias("dim"),
        F.col("v").alias(f"v_scaled{suffix}"),
        (
            F.col("v").cast("double") / F.sqrt(F.col("_n2").cast("double"))
        ).alias(f"loading{suffix}"),
    )


def pca_scores(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    rounds: int = 3,
    scale: int = PCA_SCALE,
    k: int = 10,
) -> DataFrame:
    """Project every vector onto the learned top principal direction and
    return the k most extreme documents — the outlier/typicality screen a
    curation pipeline runs after PCA. score = Σ qᵢ·vᵢ is an exact decimal
    sum of integer products (bit-identical cross-engine); ``proj``
    de-scales it to the unit-direction projection in one fixed IEEE chain.

    Scale shape: training is ``pca_power`` (one corpus pass + O(d²)
    iteration); the projection is a SECOND corpus pass — exploded
    components joined to the broadcast 64-row direction, partial-agg'd
    map-side per vector; the top-k is a TakeOrderedAndProject (per-
    partition heaps, no global sort)."""
    from .dedup import spread

    # r12 optimization: pca_power's direction is now a driver-local
    # 64-row result (see pca_power_from_comoment), so the projection
    # inlines it as an array LITERAL and folds score = Σ qᵢ·vᵢ IN-ROW
    # (zip_with + decimal aggregate) — the previous per-component
    # posexplode (corpus×d rows), broadcast join, and per-id hash
    # aggregate disappear; the second corpus pass is now a pure map
    # feeding a TakeOrderedAndProject. The decimal fold accumulates the
    # same exact integer sum, and the de-scaling denominator is the same
    # one IEEE chain (scale · √Σv², correctly rounded), so scores and
    # the oracle hash are unchanged.
    vrows = pca_power(emb, id_col, vec_col, rounds, scale).collect()
    vmap = {r["dim"]: r["v_scaled"] for r in vrows}
    varr = F.array(
        *[F.lit(vmap.get(i, 0)).cast("bigint") for i in range(len(vmap))]
    )
    n2 = sum(x * x for x in vmap.values())
    denom = float(scale) * math.sqrt(float(n2)) if vmap else float(scale)
    qarr = F.expr(
        f"transform({vec_col}, x -> "
        f"CAST(floor(CAST(x AS DOUBLE) * {scale}.0 + 0.5) AS BIGINT))"
    )
    score = F.aggregate(
        F.zip_with(
            qarr, varr, lambda x, y: x.cast("decimal(38,0)") * y
        ),
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, t: acc + t,
    )
    sc = spread(emb, id_col).select(F.col(id_col), score.alias("_score"))
    return (
        sc.select(
            id_col,
            F.col("_score").cast("double").alias("score"),
            (F.col("_score").cast("double") / F.lit(denom)).alias("proj"),
        )
        .orderBy(F.abs(F.col("score")).desc(), F.col(id_col))
        .limit(k)
    )


def comoment_partials(
    emb: DataFrame, id_col: str, vec_col: str, scale: int = PCA_SCALE
) -> DataFrame:
    """The LINEAR sufficient statistics of ``comoment_matrix`` as one
    uniform (i, j, p DECIMAL(38,0)) frame — rows (i, j≥i) carry Σ qᵢqⱼ,
    rows (i, −1) carry Σ qᵢ, and the (−1, −1) row carries n. Because every
    entry is a plain sum, partials from disjoint corpus slices merge by
    groupBy-SUM — the property a streaming PCA maintainer folds on."""
    from .dedup import spread

    qarr = F.expr(
        f"transform({vec_col}, x -> "
        f"CAST(floor(CAST(x AS DOUBLE) * {scale}.0 + 0.5) AS BIGINT))"
    )
    base = spread(emb, id_col).select(qarr.alias("q"))
    # Pair products, linear sums, AND the row count ride ONE flattened
    # array per vector (sentinel (i,-1) / (-1,-1) rows) -> one explode,
    # one partial-aggregated groupBy, ONE corpus scan. Emitting them as
    # separate aggregate branches would re-scan the corpus per branch
    # (a lazy-plan subtree is re-evaluated per reference, not CSE'd).
    return (
        base.select(
            F.explode(
                F.expr(
                    "flatten(transform(q, (xi, i) -> "
                    "transform(slice(q, i + 1, size(q) - i), (xj, jj) -> "
                    "named_struct('i', i, 'j', i + jj, "
                    "'p', CAST(xi AS DECIMAL(38,0)) * xj))))"
                    " || transform(q, (x, i) -> named_struct("
                    "'i', i, 'j', -1, 'p', CAST(x AS DECIMAL(38,0))))"
                    " || array(named_struct('i', -1, 'j', -1, "
                    "'p', CAST(1 AS DECIMAL(38,0))))"
                )
            ).alias("e")
        )
        .select("e.i", "e.j", "e.p")
        .groupBy("i", "j")
        .agg(F.sum("p").alias("p"))
    )


def comoment_from_partials(parts: DataFrame) -> DataFrame:
    """Assemble the (i, j, m, n) upper-triangle co-moment frame from
    merged ``comoment_partials`` rows — the identical M = n·Σqq − Σq·Σq
    formula over the identical exact sums, so a maintainer's result is
    bit-equal to ``comoment_matrix`` over the union of its batches."""
    from pyspark.sql.window import Window

    # n rides a global window over the O(d²)-bounded partials frame (the
    # pca_power lesson: a broadcast-scalar crossJoin would duplicate the
    # subtree per reference)
    parts2 = parts.withColumn(
        "_n",
        F.max(F.when(F.col("i") == -1, F.col("p"))).over(
            Window.partitionBy()
        ),
    )
    p = parts2.filter(F.col("j") >= 0)
    s = parts2.filter((F.col("j") == -1) & (F.col("i") >= 0)).select(
        "i", F.col("p").alias("s")
    )
    return (
        p.join(s.select(F.col("i"), F.col("s").alias("si")), "i")
        .join(s.select(F.col("i").alias("j"), F.col("s").alias("sj")), "j")
        .select(
            "i",
            "j",
            (F.col("_n") * F.col("p") - F.col("si") * F.col("sj")).alias(
                "m"
            ),
            F.col("_n").cast("bigint").alias("n"),
        )
    )


def pca_top2(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    rounds: int = 3,
    scale: int = PCA_SCALE,
) -> DataFrame:
    """Top TWO principal directions — the second via Hotelling deflation
    kept in exact integers: with v₁ truncated to the 10⁴ grid,
    c₁ = v₁ᵀv₁ and c₂ = v₁ᵀM_s v₁ are exact, and
    N = c₁²·M_s − c₂·(v₁v₁ᵀ) is an INTEGER matrix proportional to the
    deflated operator (for an exact eigenvector, N·v₁ = 0 — the v₁
    component of any start vector is annihilated in one multiply), so the
    second component is the same bit-identical ``_power_rounds`` kernel
    over the re-rescaled N. Magnitude audit (d=64): c₁ ≤ d·10⁸ = 6.4·10⁹,
    c₁²·M_s ≤ ~4·10³¹ and c₂·vᵢvⱼ ≤ ~4·10³¹ — inside DECIMAL(38,0) at any
    corpus.

    Returns (dim, v_scaled, loading, v_scaled2, loading2). Deflation is
    exact only up to v₁'s grid truncation — tests pin numpy alignment of
    BOTH components (and near-orthogonality) on a separated spectrum.

    Scale shape: one corpus pass (the co-moment), then O(d²) frame ops;
    the intermediate d-row frames are persisted (v₁, N) so the iterated
    lazy plans don't recompute prior rounds per reuse."""
    m_up = comoment_matrix(emb, id_col, vec_col, scale).persist()
    m_full = m_up.select("i", "j", "m").union(
        m_up.filter(F.col("i") < F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "m"
        )
    )
    ms = _rescale_matrix(m_full).persist()
    dims = m_up.select("i").distinct()
    v1 = _power_rounds(ms, dims, rounds, scale).persist()
    v1s = v1.select(
        "i",
        F.expr(
            "CAST(CASE WHEN v < 0 THEN -1 ELSE 1 END AS BIGINT)"
            " * (abs(v) div 100)"
        ).alias("v"),
    )
    mv = (
        ms.join(v1s.select(F.col("i").alias("j"), F.col("v").alias("vj")), "j")
        .groupBy("i")
        .agg(F.sum(F.col("m").cast("decimal(38,0)") * F.col("vj")).alias("mv"))
    )
    sc = (
        v1s.join(mv, "i")
        .agg(
            F.sum(F.col("v").cast("decimal(38,0)") * F.col("v")).alias("c1"),
            F.sum(F.col("v").cast("decimal(38,0)") * F.col("mv")).alias("c2"),
        )
    )
    n_full = (
        ms.join(v1s.select("i", F.col("v").alias("vi")), "i")
        .join(v1s.select(F.col("i").alias("j"), F.col("v").alias("vj")), "j")
        .crossJoin(F.broadcast(sc))
        .select(
            "i",
            "j",
            (
                F.col("c1") * F.col("c1") * F.col("m").cast("decimal(38,0)")
                - F.col("c2") * F.col("vi") * F.col("vj")
            ).alias("m"),
        )
    )
    ns = _rescale_matrix(n_full).persist()
    v2 = _power_rounds(ns, dims, rounds, scale)
    return (
        _with_loading(v1)
        .join(_with_loading(v2, "2"), "dim")
        .orderBy("dim")
    )
