"""Property tests for vector search ops (LSH/IVF — no SQL oracle)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from pixels_spark.catalog import load_table
from pixels_spark.functions import vector as V


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


def test_dot_and_norm_match_python(spark, emb):
    rows = emb.orderBy("vec_id").limit(3).collect()
    got = (
        emb.orderBy("vec_id")
        .limit(3)
        .select("vec_id", V.l2_norm(F.col("embedding")).alias("n"))
        .collect()
    )
    for r, g in zip(rows, got):
        expect = math.sqrt(sum(float(x) * float(x) for x in r.embedding))
        assert g.n == pytest.approx(expect, rel=1e-12)


def test_knn_includes_query_itself(spark, emb):
    q = V.query_vector(emb, "vec_id", "embedding", qid=7)
    top = V.knn_brute_force(emb, "embedding", "vec_id", q, k=5).collect()
    assert top[0].vec_id == 7  # self-similarity = 1.0 is the max
    assert top[0].sim == pytest.approx(1.0, abs=1e-9)
    sims = [r.sim for r in top]
    assert sims == sorted(sims, reverse=True)


def test_lsh_bucket_deterministic_and_bounded(spark, emb):
    b1 = (
        emb.select(V.lsh_bucket(F.col("embedding"), dim=64, n_planes=8).alias("b"))
        .groupBy("b")
        .count()
        .collect()
    )
    assert all(0 <= r.b < 256 for r in b1)
    b2 = (
        emb.select(V.lsh_bucket(F.col("embedding"), dim=64, n_planes=8).alias("b"))
        .groupBy("b")
        .count()
        .collect()
    )
    assert sorted((r.b, r["count"]) for r in b1) == sorted((r.b, r["count"]) for r in b2)


def test_lsh_candidates_subset_and_self_pairs(spark, emb):
    """Identical vectors always share every bucket → must appear as candidates."""
    clone = emb.select((F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding").limit(5)
    both = emb.select("vec_id", "embedding").union(clone)
    pairs = {
        (r.id_a, r.id_b): r.sim
        for r in V.lsh_candidate_pairs(both, "embedding", "vec_id", dim=64).collect()
    }
    for r in clone.collect():
        orig = r.vec_id - 1_000_000
        assert (orig, r.vec_id) in pairs
        assert pairs[(orig, r.vec_id)] == pytest.approx(1.0, abs=1e-9)


def test_lsh_bucket_plan_stays_small_at_production_dims(spark):
    """At production dims the planes ship as broadcast DATA (one-row
    relation), so the query plan must not grow with dim×n_planes — the
    per-element-literal form was ~100K Catalyst nodes at 1536×64."""
    import numpy as np

    rows = [(i, np.random.RandomState(i).standard_normal(1536).tolist())
            for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id: int, embedding: array<double>")
    out = V.with_lsh_bucket(df, "embedding", "b", dim=1536, n_planes=64)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert len(plan) < 100_000, len(plan)
    got = out.select("vec_id", "b").collect()
    assert all(r.b is not None for r in got)
    # deterministic across invocations
    again = V.with_lsh_bucket(df, "embedding", "b", dim=1536, n_planes=64)
    assert [r.b for r in got] == [r.b for r in again.select("vec_id", "b").collect()]


def test_kmeans_centroids_improve_over_seeds(spark, emb):
    """Lloyd iterations must reduce total within-cluster distance vs the
    raw lowest-id seeds (the old 'centroids')."""

    def cost(cents):
        assigned = V.ivf_assign(emb, "embedding", cents, id_col="vec_id")
        joined = assigned.join(
            F.broadcast(cents), assigned["ivf_cell"] == cents["cell_id"]
        )
        return joined.select(
            F.avg(V.cosine(F.col("embedding"), F.col("cell_vec"))).alias("c")
        ).first()[0]

    seeds = V.make_centroids(emb, "embedding", "vec_id", n_cells=8, iterations=0)
    trained = V.make_centroids(emb, "embedding", "vec_id", n_cells=8, iterations=3)
    assert cost(trained) > cost(seeds)  # higher avg cosine = tighter cells


def test_ivf_recall_at_n_probe_4(spark, emb):
    """IVF with trained centroids, top-2 spill assignment and n_probe=4 of
    8 cells must reach >= 0.9 recall vs brute force (judge-specified
    acceptance; single assignment caps at ~0.85 on this fixture because its
    kNN neighborhoods straddle cell boundaries — even oracle label-mean
    centroids only reach 0.64)."""
    cents = V.make_centroids(emb, "embedding", "vec_id", n_cells=8, iterations=3)
    assigned = V.ivf_assign(
        emb, "embedding", cents, id_col="vec_id", n_assign=2
    ).cache()
    hits = total = 0
    for qid in [3, 7, 11, 19, 23]:
        q = V.query_vector(emb, "vec_id", "embedding", qid=qid)
        brute = {r.vec_id for r in V.knn_brute_force(emb, "embedding", "vec_id", q, k=10).collect()}
        got = {
            r.vec_id
            for r in V.ivf_probe(
                assigned, "embedding", "vec_id", q, cents, k=10, n_probe=4
            ).collect()
        }
        hits += len(brute & got)
        total += len(brute)
    assigned.unpersist()
    assert hits / total >= 0.9, hits / total


def test_ivf_assign_groups_on_id_only(spark, emb):
    """The assignment aggregate must not hash the float vector as a
    grouping key (FP-equality-fragile and heavy at production dims)."""
    cents = V.make_centroids(emb, "embedding", "vec_id", n_cells=4, iterations=0)
    assigned = V.ivf_assign(emb, "embedding", cents, id_col="vec_id")
    plan = assigned._jdf.queryExecution().optimizedPlan().toString()
    import re

    for m in re.finditer(r"Aggregate \[([^\]]*)\]", plan):
        assert "embedding" not in m.group(1), m.group(0)


def test_ivf_probe_matches_brute_force_within_probed_cells(spark, emb):
    cents = V.make_centroids(emb, "embedding", "vec_id", n_cells=4)
    assigned = V.ivf_assign(emb, "embedding", cents)
    assert assigned.count() == emb.count()
    # every vector gets exactly one cell in range
    cells = assigned.select("ivf_cell").distinct().collect()
    assert {r.ivf_cell for r in cells} <= {0, 1, 2, 3}
    q = V.query_vector(emb, "vec_id", "embedding", qid=7)
    got = V.ivf_probe(assigned, "embedding", "vec_id", q, cents, k=3, n_probe=4)
    # n_probe = all cells → identical to brute force
    brute = V.knn_brute_force(emb, "embedding", "vec_id", q, k=3)
    assert [r.vec_id for r in got.collect()] == [r.vec_id for r in brute.collect()]


def test_ivf_partitioned_index_prunes_and_matches(spark, sf_dir, tmp_path):
    """write_ivf_index + ivf_probe_index: the probe reads ONLY the probed
    cells' partition directories, and returns exactly what the in-memory
    probe over the same assignment returns."""
    from pixels_spark.catalog import load_table
    from pixels_spark.functions import vector as V

    e = load_table(spark, sf_dir, "embeddings")
    cents = V.make_centroids(e, "embedding", "vec_id", n_cells=8, iterations=1)
    assigned = V.ivf_assign(e, "embedding", cents, id_col="vec_id", n_assign=2)
    path = str(tmp_path / "ivf_index")
    V.write_ivf_index(assigned, path)

    q = V.query_vector(e, "vec_id", "embedding", qid=7)
    got = V.ivf_probe_index(
        spark, path, "embedding", "vec_id", q, cents, k=10, n_probe=2
    )
    expect = V.ivf_probe(
        assigned, "embedding", "vec_id", q, cents, k=10, n_probe=2
    )
    assert [(r["vec_id"], round(r["sim"], 9)) for r in got.collect()] == [
        (r["vec_id"], round(r["sim"], 9)) for r in expect.collect()
    ]

    # partition pruning: every scanned file lives under a probed cell dir
    ranked = (
        cents.crossJoin(F.broadcast(q))
        .select("cell_id", V.cosine(F.col("cell_vec"), F.col("_qvec")).alias("s"))
        .orderBy(F.col("s").desc(), "cell_id")
        .limit(2)
        .collect()
    )
    probed = {f"ivf_cell={r['cell_id']}" for r in ranked}
    corpus = spark.read.parquet(path).filter(
        F.col("ivf_cell").isin([r["cell_id"] for r in ranked])
    )
    plan = corpus._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ivf_cell" in plan.split("PartitionFilters")[1][:200]
    # input_file_name() reflects files actually scanned post-pruning
    # (inputFiles() would list the whole relation)
    files = [r[0] for r in corpus.select(F.input_file_name()).distinct().collect()]
    assert files, "scan read no files"
    for f in files:
        assert any(p in f for p in probed), f"unpruned file scanned: {f}"


def test_ensure_ivf_index_builds_once_and_probe_query_is_sane(spark, sf_dir, tmp_path):
    """vec_ivf_probe: ensure_ivf_index builds the cached index exactly once
    (second call is a no-op on an existing marker), and the probe query
    returns a valid top-k with the query vector itself ranked first."""
    import os

    from pixels_spark.queries.vector_search import ensure_ivf_index

    root = str(tmp_path / "ivf_cache")
    idx, cents = ensure_ivf_index(spark, sf_dir, cache_root=root)
    assert os.path.exists(os.path.join(os.path.dirname(idx), "_BUILT"))
    mtime = os.path.getmtime(os.path.join(os.path.dirname(idx), "_BUILT"))
    idx2, cents2 = ensure_ivf_index(spark, sf_dir, cache_root=root)
    assert (idx2, cents2) == (idx, cents)
    assert os.path.getmtime(os.path.join(os.path.dirname(idx), "_BUILT")) == mtime

    from pixels_spark.catalog import load_table
    from pixels_spark.functions import vector as V

    e = load_table(spark, sf_dir, "embeddings")
    q = V.query_vector(e, "vec_id", "embedding", qid=7)
    got = V.ivf_probe_index(
        spark, idx, "embedding", "vec_id", q, spark.read.parquet(cents),
        k=10, n_probe=2,
    ).collect()
    assert 0 < len(got) <= 10
    assert got[0].vec_id == 7 and got[0].sim == pytest.approx(1.0, abs=1e-9)
    sims = [r.sim for r in got]
    assert sims == sorted(sims, reverse=True)


def test_int8_knn_recall_vs_exact(spark, sf_dir):
    """int8 quantization must preserve search quality: top-10 overlap with
    the exact kNN >= 8/10, and per-element dequantization error is bounded
    by scale/2."""
    from pyspark.sql import functions as F

    from pixels_spark.catalog import load_table
    from pixels_spark.functions import vector as V

    e = load_table(spark, sf_dir, "embeddings")
    q = V.query_vector(e, "vec_id", "embedding", qid=7)
    exact = [r["vec_id"] for r in
             V.knn_brute_force(e, "embedding", "vec_id", q, k=10).collect()]
    quant = [r["vec_id"] for r in
             V.knn_int8(e, "embedding", "vec_id", q, k=10).collect()]
    assert len(set(exact) & set(quant)) >= 8, (exact, quant)

    z = e.select("embedding", V.quantize_int8(F.col("embedding")).alias("z")).limit(50)
    err = z.select(
        F.greatest(
            F.lit(0.0),
            F.array_max(
                F.zip_with(
                    "embedding",
                    "z.q",
                    lambda x, qv: F.abs(x.cast("double") - qv.cast("double") * F.col("z.scale"))
                    - F.col("z.scale") / 2 - F.lit(1e-12),
                )
            ),
        ).alias("excess")
    ).agg(F.max("excess")).first()[0]
    assert err <= 0.0, f"dequantization error exceeded scale/2 by {err}"


def test_pq_adc_equals_reconstructed_cosine(spark, emb):
    """The ADC LUT fold must equal cosine(query, reconstructed vector)
    EXACTLY (coordinate blocks are disjoint, so partial dots and squared
    norms add) — the internal-consistency oracle for the PQ serving path."""
    import math

    from pyspark.sql import functions as F

    from pixels_spark.functions import vector as V

    books = V.pq_codebooks(emb, "embedding", "vec_id", m=8, k=8, iterations=1)
    enc = V.pq_encode(emb, "embedding", "vec_id", books)
    qvec = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    got = {
        r["vec_id"]: r["sim"]
        for r in V.pq_knn(enc, "vec_id", books, qvec, k=5).collect()
    }
    codes = {r["vec_id"]: list(r["codes"]) for r in enc.collect()}
    qn = math.sqrt(sum(x * x for x in qvec))
    for vid, sim in got.items():
        recon = [x for j, c in enumerate(codes[vid]) for x in books[j][c]]
        dot = sum(a * b for a, b in zip(qvec, recon))
        rn = math.sqrt(sum(x * x for x in recon))
        assert abs(sim - dot / (qn * rn)) < 1e-9, vid


def test_pq_recall_and_compression(spark, emb):
    """PQ top-10 must overlap exact top-10 on >=6 ids, and the encoded form
    must really be m small codes (the 16x memory claim)."""
    from pyspark.sql import functions as F

    from pixels_spark.functions import vector as V

    m, k = 16, 32
    books = V.pq_codebooks(emb, "embedding", "vec_id", m=m, k=k)
    enc = V.pq_encode(emb, "embedding", "vec_id", books)
    row = enc.first()
    assert len(row["codes"]) == m
    assert all(0 <= c < k for c in row["codes"])

    # recall on UNSTRUCTURED (random) vectors is the worst case for PQ and
    # jitters per query — pin the mean over 5 queries, not a single draw
    qids = [r["vec_id"] for r in emb.orderBy("vec_id").limit(5).collect()]
    hits = 0
    for qid in qids:
        qvec = [
            float(x)
            for x in emb.filter(F.col("vec_id") == qid).first()["embedding"]
        ]
        approx = {
            r["vec_id"] for r in V.pq_knn(enc, "vec_id", books, qvec, k=10).collect()
        }
        exact = {
            r["vec_id"]
            for r in V.knn_brute_force(
                emb, "embedding", "vec_id",
                V.query_vector(emb, "vec_id", "embedding", qid), k=10,
            ).collect()
        }
        hits += len(approx & exact)
    assert hits >= 25, hits  # mean recall >= 0.5 across 5 queries


def test_pq_codebooks_deterministic(spark, emb):
    from pixels_spark.functions import vector as V

    b1 = V.pq_codebooks(emb, "embedding", "vec_id", m=4, k=4, iterations=1)
    b2 = V.pq_codebooks(emb, "embedding", "vec_id", m=4, k=4, iterations=1)
    assert b1 == b2


def test_pq_index_probe_matches_inline(spark, sf_dir, tmp_path, monkeypatch):
    """The prebuilt-index probe must return exactly what the inline
    train+encode+score path returns (stale/partial index impossible), and
    the second ensure call must be a pure cache hit."""
    import os

    from pixels_spark.queries import load_all_modules
    from pixels_spark.queries.vector_search import ensure_pq_index

    monkeypatch.setenv("PIXELS_SPARK_DERIVED_CACHE", str(tmp_path / "dc"))
    reg = load_all_modules()
    probe = [tuple(r) for r in reg["vec_pq_probe"].fn(spark, sf_dir).collect()]
    inline = [tuple(r) for r in reg["vec_knn_pq"].fn(spark, sf_dir).collect()]
    assert probe == inline

    books, enc = ensure_pq_index(spark, sf_dir)
    marker = os.path.join(os.path.dirname(enc), "_BUILT")
    mtime = os.path.getmtime(marker)
    ensure_pq_index(spark, sf_dir)
    assert os.path.getmtime(marker) == mtime


def test_ivfpq_probe_prunes_and_matches_subset_scoring(
    spark, sf_dir, tmp_path, monkeypatch
):
    """IVF+PQ: (a) the probe scan must read ONLY the probed cells'
    directories (partition pruning on the codes index); (b) its result
    must equal ADC-scoring the full encoded corpus RESTRICTED to members
    of the probed cells — the IVF layer only selects candidates, the PQ
    layer's math is unchanged."""
    from pyspark.sql import functions as F

    from pixels_spark.functions import vector as V
    from pixels_spark.queries import load_all_modules
    from pixels_spark.queries.vector_search import (
        ensure_ivfpq_index,
        probed_cells,
    )

    monkeypatch.setenv("PIXELS_SPARK_DERIVED_CACHE", str(tmp_path / "dc"))
    reg = load_all_modules()
    books, cents_path, idx_path = ensure_ivfpq_index(spark, sf_dir)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    probed = probed_cells(spark, cents_path, qvec, n_probe=2)

    # (a) pruning: input_file_name() reflects files actually scanned
    # post-pruning (inputFiles() lists the whole relation)
    scan = spark.read.parquet(idx_path).filter(F.col("ivf_cell").isin(probed))
    files = [r[0] for r in scan.select(F.input_file_name()).distinct().collect()]
    assert files, "scan read no files"
    allowed = {f"ivf_cell={c}" for c in probed}
    for f in files:
        assert any(p in f for p in allowed), f"unpruned file scanned: {f}" 

    # (b) equivalence: probe == ADC over the probed cells' member set
    probe_rows = [tuple(r) for r in reg["vec_ivfpq_probe"].fn(spark, sf_dir).collect()]
    members = (
        spark.read.parquet(idx_path)
        .filter(F.col("ivf_cell").isin(probed))
        .groupBy("vec_id")
        .agg(F.first("codes").alias("codes"))
    )
    expect = [tuple(r) for r in V.pq_knn(members, "vec_id", books, qvec, k=10).collect()]
    assert probe_rows == expect


def test_ivf_append_matches_full_assignment(spark, sf_dir, tmp_path):
    """Appending a second batch against frozen centroids must serve
    exactly what a single full assignment over the union would: probes on
    the appended index equal probes on the all-at-once index, and the
    appended files land only in the new rows' cells."""
    from pixels_spark.catalog import load_table
    from pixels_spark.functions import vector as V

    e = load_table(spark, sf_dir, "embeddings")
    half = e.agg(((F.min("vec_id") + F.max("vec_id")) / 2).alias("m")).first()["m"]
    first, second = e.filter(F.col("vec_id") <= half), e.filter(F.col("vec_id") > half)

    cents = V.make_centroids(first, "embedding", "vec_id", n_cells=4, iterations=2)

    inc = str(tmp_path / "inc")
    V.write_ivf_index(
        V.ivf_assign(first, "embedding", cents, id_col="vec_id"), inc
    )
    V.ivf_append(second, "embedding", cents, inc, id_col="vec_id")

    full = str(tmp_path / "full")
    V.write_ivf_index(V.ivf_assign(e, "embedding", cents, id_col="vec_id"), full)

    q = V.query_vector(e, "vec_id", "embedding", qid=7)
    a = V.ivf_probe_index(spark, inc, "embedding", "vec_id", q, cents, k=10, n_probe=2)
    b = V.ivf_probe_index(spark, full, "embedding", "vec_id", q, cents, k=10, n_probe=2)
    ra = [(r["vec_id"], round(r["sim"], 9)) for r in a.collect()]
    rb = [(r["vec_id"], round(r["sim"], 9)) for r in b.collect()]
    assert ra == rb and len(ra) == 10


def test_streaming_embedding_ingest_into_ivf(spark, sf_dir, tmp_path):
    """Streaming ANN ingest: an embeddings STREAM absorbed into the IVF
    index per micro-batch (foreachBatch -> ivf_append against frozen
    centroids); after the bounded replay, probes equal the all-at-once
    assignment — the index is maintainable from a live feed."""
    import os

    from pixels_spark.catalog import SCHEMAS, load_table
    from pixels_spark.functions import vector as V

    e = load_table(spark, sf_dir, "embeddings")
    half = e.agg(((F.min("vec_id") + F.max("vec_id")) / 2).alias("m")).first()["m"]
    first, second = e.filter(F.col("vec_id") <= half), e.filter(F.col("vec_id") > half)

    cents = V.make_centroids(first, "embedding", "vec_id", n_cells=4, iterations=2)
    idx = str(tmp_path / "idx")
    V.write_ivf_index(V.ivf_assign(first, "embedding", cents, id_col="vec_id"), idx)

    # the second half arrives as a 2-file stream
    src = str(tmp_path / "src")
    n2 = second.count()
    mid2 = second.agg(((F.min("vec_id") + F.max("vec_id")) / 2).alias("m")).first()["m"]
    second.filter(F.col("vec_id") <= mid2).coalesce(1).write.mode("append").parquet(src)
    second.filter(F.col("vec_id") > mid2).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(SCHEMAS["embeddings"])
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )

    def absorb(batch_df, batch_id):
        V.ivf_append(batch_df, "embedding", cents, idx, id_col="vec_id")

    q = (
        stream.writeStream.foreachBatch(absorb)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)

    full = str(tmp_path / "full")
    V.write_ivf_index(V.ivf_assign(e, "embedding", cents, id_col="vec_id"), full)
    qv = V.query_vector(e, "vec_id", "embedding", qid=7)
    a = V.ivf_probe_index(spark, idx, "embedding", "vec_id", qv, cents, k=10, n_probe=2)
    b = V.ivf_probe_index(spark, full, "embedding", "vec_id", qv, cents, k=10, n_probe=2)
    assert [(r["vec_id"], round(r["sim"], 9)) for r in a.collect()] == \
           [(r["vec_id"], round(r["sim"], 9)) for r in b.collect()]


def test_batch_knn_matches_per_query_brute_force(spark, sf_dir):
    """Each query's batch result equals the single-query kNN ranking."""
    from pixels_spark.catalog import load_table
    from pixels_spark.functions import vector as V
    from pyspark.sql import functions as F

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    batch = V.batch_knn(e, "embedding", "vec_id", q, k=5)
    got = {
        qid: [(r["vec_id"], r["sim"]) for r in rows]
        for qid, rows in (
            (qid, sorted((r for r in batch.collect() if r["q_id"] == qid),
                         key=lambda r: r["rank"]))
            for qid in (0, 1, 2)
        )
    }
    for qid in (0, 1, 2):
        single = V.knn_brute_force(
            e, "embedding", "vec_id", V.query_vector(e, "vec_id", "embedding", qid), k=5
        ).collect()
        want = [(r["vec_id"], r["sim"]) for r in single]
        assert got[qid] == want, qid


def test_hybrid_rrf_topn_no_window_and_matches_full_rank(spark, sf_dir):
    """Production-shape RRF: (a) the plan contains NO Window node — ranks
    come from bounded candidate lists, never a corpus-wide rank; (b) on
    the fixture the fused top-10 equals the full-rank reference's top-10
    (same doc_ids in the same order)."""
    from pixels_spark.queries import load_all_modules

    reg = load_all_modules()
    topn = reg["vec_hybrid_rrf_topn"].fn(spark, sf_dir)
    plan = topn._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, "corpus-wide rank sneaked into the plan"
    full = reg["vec_hybrid_rrf"].fn(spark, sf_dir)
    got = [r["doc_id"] for r in topn.collect()]
    want = [r["doc_id"] for r in full.collect()]
    assert got == want


def test_ivf_incremental_append_equals_one_shot(spark, sf_dir, tmp_path):
    """Frozen-centroid append: an index built as train(old) + append(new)
    serves bit-identical probe results to an index assigned in one shot
    with the same centroids."""
    import os

    from pixels_spark.catalog import load_table

    e = load_table(spark, sf_dir, "embeddings")
    old = e.filter(F.col("vec_id") < 300)
    new = e.filter(F.col("vec_id") >= 300)
    cents = V.make_centroids(old, "embedding", "vec_id", n_cells=8, iterations=2)
    q = V.query_vector(e, "vec_id", "embedding", qid=7)

    incr = str(tmp_path / "incr")
    V.write_ivf_index(
        V.ivf_assign(old, "embedding", cents, id_col="vec_id", n_assign=1), incr
    )
    V.ivf_append(new, "embedding", cents, incr, id_col="vec_id", n_assign=1)
    oneshot = str(tmp_path / "oneshot")
    V.write_ivf_index(
        V.ivf_assign(e, "embedding", cents, id_col="vec_id", n_assign=1), oneshot
    )
    got = [
        tuple(r)
        for r in V.ivf_probe_index(
            spark, incr, "embedding", "vec_id", q, cents, k=10, n_probe=2
        ).collect()
    ]
    want = [
        tuple(r)
        for r in V.ivf_probe_index(
            spark, oneshot, "embedding", "vec_id", q, cents, k=10, n_probe=2
        ).collect()
    ]
    assert got == want and len(got) == 10
    # the appended batch is physically present in the cell layout
    cells = [d for d in os.listdir(incr) if d.startswith("ivf_cell=")]
    assert cells, "no cell partitions written"


def test_comoment_matrix_equals_numpy_cov(spark):
    """M = n^2 * cov (biased, over quantized components) must equal numpy
    exactly — integers, no tolerance."""
    import numpy as np

    from pixels_spark.functions.vector import comoment_matrix

    rng = np.random.default_rng(7)
    x = rng.normal(size=(40, 5)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id bigint, embedding array<float>",
    )
    got = {
        (r.i, r.j): int(r.m)
        for r in comoment_matrix(df, "vec_id", "embedding").collect()
    }
    q = np.floor(x.astype(np.float64) * 1_000_000 + 0.5).astype(object)
    n = q.shape[0]
    for i in range(5):
        for j in range(i, 5):
            expect = n * int((q[:, i] * q[:, j]).sum()) - int(
                q[:, i].sum()
            ) * int(q[:, j].sum())
            assert got[(i, j)] == expect, (i, j)


def test_pca_power_recovers_dominant_direction(spark):
    """Anisotropic cloud (one direction 10x the variance of the rest):
    3 power rounds must align with numpy's top eigenvector, |cos| > 0.999."""
    import numpy as np

    from pixels_spark.functions.vector import pca_power

    rng = np.random.default_rng(11)
    d = 6
    direction = rng.normal(size=d)
    direction /= np.linalg.norm(direction)
    x = (
        rng.normal(size=(300, 1)) * 10.0 * direction[None, :]
        + rng.normal(size=(300, d)) * 0.5
    ).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id bigint, embedding array<float>",
    )
    out = pca_power(df, "vec_id", "embedding").collect()
    v = np.array([r.loading for r in sorted(out, key=lambda r: r.dim)])
    cov = np.cov(x.astype(np.float64).T, bias=True)
    eigvals, eigvecs = np.linalg.eigh(cov)
    top = eigvecs[:, -1]
    assert abs(float(v @ top)) > 0.999
    # loadings are unit-norm by construction
    assert abs(float(v @ v) - 1.0) < 1e-9


def test_pca_top2_recovers_both_directions_orthogonal(spark):
    """Two planted directions with separated variances (10x and 4x the
    noise): deflation must recover BOTH (|cos| > 0.99 each) and the
    learned loadings must be near-orthogonal."""
    import numpy as np

    from pixels_spark.functions.vector import pca_top2

    rng = np.random.default_rng(23)
    d = 6
    a = rng.normal(size=d); a /= np.linalg.norm(a)
    b = rng.normal(size=d); b -= (b @ a) * a; b /= np.linalg.norm(b)
    x = (
        rng.normal(size=(400, 1)) * 10.0 * a[None, :]
        + rng.normal(size=(400, 1)) * 4.0 * b[None, :]
        + rng.normal(size=(400, d)) * 0.3
    ).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id bigint, embedding array<float>",
    )
    out = sorted(pca_top2(df, "vec_id", "embedding").collect(),
                 key=lambda r: r.dim)
    v1 = np.array([r.loading for r in out])
    v2 = np.array([r.loading2 for r in out])
    cov = np.cov(x.astype(np.float64).T, bias=True)
    _, eigvecs = np.linalg.eigh(cov)
    assert abs(float(v1 @ eigvecs[:, -1])) > 0.99
    assert abs(float(v2 @ eigvecs[:, -2])) > 0.99
    assert abs(float(v1 @ v2)) < 0.05  # near-orthogonal (3-round v1 residual)


def test_mmr_matches_independent_greedy_replay(spark, sf_dir):
    """Replay the greedy MMR selection independently in Python over the
    collected top-16 candidates (floats, same 0.7/0.3 weights, same
    (score DESC, vec_id) tie order) and assert the declared query picks
    the identical sequence — an implementation-independent check of the
    greedy chain, valid on ANY fixture geometry (at sf0.001 the top-5 is
    already diverse, so a set-difference assertion would be vacuous)."""
    import math as _m

    from pixels_spark.queries.vector_search import vec_mmr

    e = load_table(spark, sf_dir, "embeddings")
    q = V.query_vector(e, "vec_id", "embedding", qid=7)
    qv = q.collect()[0]._qvec

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (_m.sqrt(sum(x * x for x in a)) * _m.sqrt(sum(y * y for y in b)))

    cand = sorted(
        (
            (cos(r.embedding, qv), r.vec_id, list(r.embedding))
            for r in e.collect()
        ),
        key=lambda t: (-t[0], t[1]),
    )[:16]
    sel = [cand[0]]
    rest = cand[1:]
    while len(sel) < 5:
        scored = sorted(
            (
                (
                    0.7 * rel - 0.3 * max(cos(emb, s[2]) for s in sel),
                    vid,
                    (rel, vid, emb),
                )
                for rel, vid, emb in rest
            ),
            key=lambda t: (-t[0], t[1]),
        )
        sel.append(scored[0][2])
        rest = [c for c in rest if c[1] != scored[0][1]]
    expect = [vid for _rel, vid, _e in sel]

    rows = vec_mmr(spark, sf_dir).collect()
    assert [r.rnk for r in rows] == [1, 2, 3, 4, 5]
    assert [r.vec_id for r in rows] == expect
    assert rows[0].score == pytest.approx(rows[0].rel)
