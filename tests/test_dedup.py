"""Property tests for hash-based dedup ops (no SQL oracle possible)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pixels_spark.catalog import load_table
from pixels_spark.functions import dedup as D


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").cache()


def test_exact_dedup_keeps_distinct_fingerprints(spark, docs):
    kept = D.exact_dedup(docs, "text")
    n_unique = docs.select(
        F.count_distinct(D.fingerprint(F.col("text")))
    ).first()[0]
    assert kept.count() == n_unique
    # deterministic: keeps the lowest doc_id per group
    assert kept.select(F.min("doc_id")).first()[0] == docs.select(F.min("doc_id")).first()[0]


def test_minhash_lsh_finds_high_jaccard_pairs(spark, docs):
    """LSH candidates must contain every truly-near pair at high jaccard
    (with 8 bands × 4 rows, a 0.9-jaccard pair collides w.p. ~1-(1-0.9^4)^8
    ≈ 0.9998 — treat misses as failures at this corpus size)."""
    exact = {
        (r.id_a, r.id_b)
        for r in D.ngram_jaccard_pairs(docs, threshold=0.9).collect()
    }
    found = {
        (r.id_a, r.id_b)
        for r in D.minhash_dedup_pairs(docs, threshold=0.9).collect()
    }
    missed = exact - found
    assert not missed, f"LSH missed high-jaccard pairs: {missed}"
    # verification step guarantees no false positives at the same threshold
    assert found <= exact


def test_minhash_pairs_jaccard_values_match_exact(spark, docs):
    mh = {(r.id_a, r.id_b): r.jaccard for r in D.minhash_dedup_pairs(docs, threshold=0.5).collect()}
    ex = {(r.id_a, r.id_b): r.jaccard for r in D.ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    for pair, j in mh.items():
        assert pair in ex
        assert abs(ex[pair] - j) < 1e-12


def test_simhash_identical_docs_same_signature(spark, docs):
    # duplicate every doc under a shifted id; signatures must agree pairwise
    base = docs.select("doc_id", "text")
    shifted = base.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    sigs = D.simhash(base.union(shifted), "doc_id", "text")
    a = sigs.filter(F.col("doc_id") < 1_000_000).select(
        F.col("doc_id").alias("k"), F.col("simhash").alias("sa")
    )
    b = sigs.filter(F.col("doc_id") >= 1_000_000).select(
        (F.col("doc_id") - 1_000_000).alias("k"), F.col("simhash").alias("sb")
    )
    diff = a.join(b, "k").filter(F.col("sa") != F.col("sb")).count()
    assert diff == 0


def test_simhash_near_pairs_have_low_hamming(spark, docs):
    pairs = D.simhash_near_pairs(docs, max_hamming=3).collect()
    for r in pairs:
        assert 0 <= r.hamming <= 3


def test_ngram_jaccard_self_similarity(spark, docs):
    """A doc unioned with itself under a new id must appear with jaccard 1."""
    clone = docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text").limit(5)
    both = docs.select("doc_id", "text").union(clone)
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.ngram_jaccard_pairs(both, threshold=0.999).collect()
    }
    for r in clone.collect():
        orig = r.doc_id - 1_000_000
        assert pairs.get((orig, r.doc_id)) == pytest.approx(1.0)


def test_connected_components_properties(spark, docs):
    from pyspark.sql import Row

    pairs = spark.createDataFrame(
        [Row(id_a=1, id_b=2), Row(id_a=2, id_b=3), Row(id_a=10, id_b=11),
         Row(id_a=3, id_b=4), Row(id_a=20, id_b=21), Row(id_a=21, id_b=22)]
    )
    comps = {r.id: r.component for r in D.connected_components(pairs).collect()}
    # chain 1-2-3-4 collapses to component 1 (diameter > 1 ⇒ propagation ran)
    assert comps[1] == comps[2] == comps[3] == comps[4] == 1
    assert comps[10] == comps[11] == 10
    assert comps[20] == comps[21] == comps[22] == 20


def test_embedding_near_dup_never_cartesian_by_default(spark, sf_dir):
    """Without a partition column the pair join must fall back to LSH-bucket
    blocking, never a cross join; the O(n²) path needs allow_full_pairs."""
    emb = load_table(spark, sf_dir, "embeddings")
    blocked = D.embedding_near_dup_pairs(emb, "vec_id", "embedding", threshold=0.9)
    plan = blocked._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    full = D.embedding_near_dup_pairs(
        emb.limit(50), "vec_id", "embedding", threshold=0.9, allow_full_pairs=True
    )
    fplan = full._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" in fplan or "BroadcastNestedLoopJoin" in fplan
    # blocked pairs are a subset of the full pairs, at identical sim values
    fpairs = {(r.id_a, r.id_b): r.sim for r in
              D.embedding_near_dup_pairs(emb.limit(50), "vec_id", "embedding",
                                         threshold=0.5, allow_full_pairs=True).collect()}
    bpairs = {(r.id_a, r.id_b): r.sim for r in
              D.embedding_near_dup_pairs(emb.limit(50), "vec_id", "embedding",
                                         threshold=0.5).collect()}
    assert set(bpairs) <= set(fpairs)
    for k, v in bpairs.items():
        assert v == fpairs[k]


def test_connected_components_chain_worst_case(spark):
    """50-node chain = worst-case diameter. Pointer jumping must converge in
    O(log n) rounds, and checkpoint/persist hygiene must keep the final plan
    bounded (the old version's lineage multiplied per iteration)."""
    from pyspark.sql import Row

    pairs = spark.createDataFrame([Row(id_a=i, id_b=i + 1) for i in range(49)])
    labels = D.connected_components(pairs, max_iterations=12)
    rows = labels.collect()
    assert len(rows) == 50
    assert all(r.component == 0 for r in rows), sorted(
        (r.id, r.component) for r in rows if r.component != 0
    )[:5]
    # lineage is truncated by localCheckpoint: the analyzed plan of the
    # result must stay small instead of growing with iteration count
    plan = labels._jdf.queryExecution().optimizedPlan().toString()
    assert len(plan) < 20_000, len(plan)


def test_canonical_docs_on_real_pairs(spark, docs):
    pairs = D.ngram_jaccard_pairs(docs, threshold=0.5)
    kept = D.canonical_docs(docs, pairs)
    n_docs = docs.count()
    n_pairs_ids = (
        pairs.select(F.col("id_a").alias("i"))
        .union(pairs.select(F.col("id_b").alias("i")))
        .distinct()
        .count()
    )
    comps = D.connected_components(pairs)
    n_components = comps.select("component").distinct().count()
    # survivors = docs not in any pair + one per component
    assert kept.count() == n_docs - n_pairs_ids + n_components
    # the kept member of each cluster is its smallest id
    min_ids = {r.component for r in comps.collect()}
    kept_ids = {r.doc_id for r in kept.collect()}
    assert min_ids <= kept_ids


def test_decontaminate_flags_overlapping_train_docs(spark):
    from pixels_spark.functions.dedup import decontaminate

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the dog"),
            (2, "completely different words here entirely now"),
            (3, "zz yy"),  # short doc: whole text is the single shingle
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "we saw the quick brown fox yesterday"), (101, "zz yy")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["n_shared"] for r in decontaminate(train, bench, n=4).collect()}
    # doc 1 shares the 4-gram "the quick brown fox"; doc 3 matches via the
    # short-doc whole-text shingle; doc 2 shares nothing.
    assert got == {1: 1, 3: 1}


def test_cut_lineage_reliable_mode_value_identical(spark, docs, tmp_path):
    """The fault-tolerant variants (persist-replicated, or reliable
    checkpoint when a checkpoint dir is set) must produce exactly the
    pair/cluster sets of the default localCheckpoint path."""

    def pairs_set(df):
        return {tuple(r) for r in df.select("id_a", "id_b").collect()}

    base = pairs_set(D.minhash_dedup_pairs(docs))
    assert pairs_set(D.minhash_dedup_pairs(docs, reliable=True)) == base
    sim_base = pairs_set(D.simhash_near_pairs(docs))
    assert pairs_set(D.simhash_near_pairs(docs, reliable=True)) == sim_base

    # with a reliable checkpoint dir configured the checkpoint() branch runs
    sc = spark.sparkContext
    # (left set for the rest of the session — only reliable=True consults it)
    sc.setCheckpointDir(str(tmp_path / "ck"))
    assert pairs_set(D.minhash_dedup_pairs(docs, reliable=True)) == base


def test_dedup_registry_exact_across_batches(spark, tmp_path):
    from pixels_spark.functions.dedup import DedupRegistry

    reg = DedupRegistry(spark, str(tmp_path / "reg_exact"))
    b1 = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, "alpha beta")],
        ["doc_id", "text"],
    )
    k1 = reg.add_batch_exact(b1)
    # intra-batch: doc 3 is an exact dup of doc 1 (first id wins)
    assert sorted(r["doc_id"] for r in k1.collect()) == [1, 2]
    b2 = spark.createDataFrame(
        [(4, "gamma delta"), (5, "epsilon zeta")], ["doc_id", "text"]
    )
    k2 = reg.add_batch_exact(b2)
    # cross-batch: doc 4 duplicates registered doc 2 — batch 1's text
    # is never re-read, only its fingerprints
    assert [r["doc_id"] for r in k2.collect()] == [5]


def test_dedup_registry_near_matches_streaming_convention(spark, tmp_path):
    """Batch-incremental suppression == the one-batch band_first_seen set
    when arrival order matches (all docs in a single batch, id order)."""
    from pixels_spark.functions.dedup import DedupRegistry, minhash_md5_bands

    docs = [
        (1, "the quick brown fox jumps over the lazy dog again today"),
        (2, "the quick brown fox jumps over the lazy dog again tonight"),
        (3, "completely different text with no overlap whatsoever here now"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    # ground truth: first-seen-wins over id order
    bands = df.select(
        "doc_id", F.explode(minhash_md5_bands(F.col("text"))).alias("b")
    ).select("doc_id", "b.band", "b.bh")
    first = bands.groupBy("band", "bh").agg(F.min("doc_id").alias("f"))
    expected_suppressed = {
        r["doc_id"]
        for r in bands.join(first, ["band", "bh"])
        .filter(F.col("doc_id") > F.col("f"))
        .select("doc_id")
        .distinct()
        .collect()
    }
    reg = DedupRegistry(spark, str(tmp_path / "reg_near"))
    kept = reg.add_batch_near(df)
    assert {r["doc_id"] for r in kept.collect()} == {1, 2, 3} - expected_suppressed

    # a later batch repeating doc 1's text verbatim is suppressed by the
    # registry even though batch 1 is gone
    b2 = spark.createDataFrame([(9, docs[0][1])], ["doc_id", "text"])
    assert reg.add_batch_near(b2).count() == 0


def test_dedup_registry_survives_reopen(spark, tmp_path):
    """Re-opening an existing registry path must APPEND (nightly-batch
    shape), not overwrite batch=1 — the counter recovers from disk."""
    from pixels_spark.functions.dedup import DedupRegistry

    path = str(tmp_path / "reg_reopen")
    r1 = DedupRegistry(spark, path)
    r1.add_batch_exact(
        spark.createDataFrame([(1, "alpha beta")], ["doc_id", "text"])
    )
    r2 = DedupRegistry(spark, path)  # fresh session over the same store
    assert r2.n_batches == 1
    k2 = r2.add_batch_exact(
        spark.createDataFrame(
            [(2, "alpha beta"), (3, "new text")], ["doc_id", "text"]
        )
    )
    assert [r["doc_id"] for r in k2.collect()] == [3]
    # batch 1's fingerprints are still on disk and still suppress later dups
    r3 = DedupRegistry(spark, path)
    assert r3.n_batches == 2
    assert r3.add_batch_exact(
        spark.createDataFrame([(9, "alpha beta")], ["doc_id", "text"])
    ).count() == 0


def test_dedup_registry_compact_preserves_suppression(spark, tmp_path):
    from pixels_spark.functions.dedup import DedupRegistry

    path = str(tmp_path / "reg_c")
    reg = DedupRegistry(spark, path)
    reg.add_batch_exact(spark.createDataFrame([(1, "aa")], ["doc_id", "text"]))
    reg.add_batch_exact(spark.createDataFrame([(2, "bb")], ["doc_id", "text"]))
    reg.add_batch_near(spark.createDataFrame(
        [(3, "the quick brown fox jumps over the lazy dog")], ["doc_id", "text"]))
    reg.compact()
    import os

    assert len([d for d in os.listdir(reg.exact_dir) if d.startswith("batch=")]) == 1
    # suppression behavior identical after consolidation (fresh open too)
    reg2 = DedupRegistry(spark, path)
    assert reg2.add_batch_exact(
        spark.createDataFrame([(9, "aa"), (10, "bb"), (11, "cc")], ["doc_id", "text"])
    ).count() == 1
    assert reg2.add_batch_near(spark.createDataFrame(
        [(12, "the quick brown fox jumps over the lazy dog")], ["doc_id", "text"])
    ).count() == 0


def test_duplicated_spans_matches_bruteforce(spark):
    """duplicated_spans vs a pure-Python reference on a crafted corpus:
    shared boilerplate paragraph found in both docs, merged to one maximal
    span each; unique text produces no spans."""
    from pixels_spark.functions.dedup import duplicated_spans

    boiler = "the quick brown fox jumps over the lazy dog again and again"
    docs = [
        (1, f"alpha beta gamma {boiler} delta epsilon zeta eta theta"),
        (2, f"{boiler} iota kappa lambda mu nu xi omicron pi rho sigma"),
        (3, "totally unique text with no repeated windows at all here ok fine"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r["doc_id"]: (r["span_start"], r["span_end"], r["n_windows"])
           for r in duplicated_spans(df, width=8, min_docs=2).collect()}

    def brute(width=8):
        toks = {i: t.lower().split() for i, t in docs}
        wins = {}
        for i, ws in toks.items():
            for p in range(len(ws) - width + 1):
                wins.setdefault(" ".join(ws[p:p + width]), set()).add(i)
        dup = {w for w, ids in wins.items() if len(ids) >= 2}
        spans = {}
        for i, ws in toks.items():
            hits = [p for p in range(len(ws) - width + 1)
                    if " ".join(ws[p:p + width]) in dup]
            if not hits:
                continue
            # merge (gap <= width)
            start, prev, n = hits[0], hits[0], 1
            out = []
            for p in hits[1:]:
                if p - prev <= width:
                    prev, n = p, n + 1
                else:
                    out.append((start, prev + width, n))
                    start, prev, n = p, p, 1
            out.append((start, prev + width, n))
            assert len(out) == 1  # crafted corpus: one span per doc
            spans[i] = out[0]
        return spans

    assert got == brute()
    assert 3 not in got


def test_duplicated_spans_plan_shape(spark, sf_dir):
    """Scale contract from the docstring: one tokenize pass (single
    FileScan), no self-join (window-based distinct-doc counting), and the
    two windows share one hash-keyed Exchange."""
    import re

    from pixels_spark.catalog import load_table
    from pixels_spark.functions.dedup import duplicated_spans

    d = load_table(spark, sf_dir, "documents")
    plan = duplicated_spans(d, width=8)._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"FileScan", plan)) == 1
    assert "Join" not in plan
    assert len(re.findall(r"Exchange", plan)) <= 3


def test_cut_duplicated_spans_excises_boilerplate(spark):
    """The crafted-corpus check: the shared boilerplate is removed from
    both docs, unique text survives verbatim, fully-unique docs pass
    through untouched."""
    from pixels_spark.functions.dedup import cut_duplicated_spans

    boiler = "the quick brown fox jumps over the lazy dog again and again"
    docs = [
        (1, f"alpha beta gamma {boiler} delta epsilon zeta eta theta"),
        (2, f"{boiler} iota kappa lambda mu nu xi omicron pi rho sigma"),
        (3, "totally unique text with no repeated windows at all here ok fine"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in
           cut_duplicated_spans(df, width=8, min_docs=2).collect()}
    assert got[1]["n_tokens_cut"] == 12 and got[2]["n_tokens_cut"] == 12
    assert got[1]["clean_text"] == "alpha beta gamma delta epsilon zeta eta theta"
    assert got[2]["clean_text"].startswith("iota kappa")
    assert got[3]["n_tokens_cut"] == 0
    assert got[3]["clean_text"] == docs[2][1]  # already lowercase


def test_source_overlap_counts_distinct_shared_windows(spark):
    from pixels_spark.functions.dedup import source_overlap

    boiler = "one two three four five six seven eight nine ten eleven twelve"
    rows = [
        (1, f"intro words {boiler} outro", "A"),
        (2, f"{boiler} and some other trailing content here", "B"),
        (3, f"{boiler} again in a second b document body text", "B"),
        (4, "entirely different text with no shared windows anywhere at all", "C"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = {(r["source_a"], r["source_b"]): r["n_shared_windows"]
           for r in source_overlap(df, "text", "source", width=8).collect()}
    # the 12-word boilerplate yields 12-8+1 = 5 shared windows; C shares none
    assert got == {("A", "B"): 5}


def test_prefix_ceil_is_exact_on_integer_products(spark):
    """The PPJoin prefix bound ⌈t·|A|⌉ must match EXACT rational ceil for
    every (threshold, size) — the double product can round up on exact
    integers (0.07*100 = 7.000000000000001 → ceil 8), which would SHORTEN
    the prefix and risk a missed boundary pair. The epsilon-guarded form
    used in ngram_jaccard_pairs can only err longer, never shorter."""
    import math
    from fractions import Fraction

    from pyspark.sql import functions as F

    # the raw hazard exists (guards the test against a future Spark that
    # changes double formatting semantics silently)
    raw = spark.range(1).select(
        F.ceil(F.lit(0.07) * F.lit(100)).alias("c")
    ).first()["c"]
    assert raw == 8, "double-ceil hazard vanished; revisit the epsilon guard"

    thresholds = [0.05, 0.07, 0.1, 0.125, 0.2, 0.25, 0.3, 0.5, 0.7, 0.8, 0.9]
    # ADVICE r8: an ABSOLUTE epsilon stops covering double rounding once
    # t·|A| ≳ 5e6 (the error is relative, ~2e-16·x) — so the guard is
    # now relative, and the test sweeps giant document sizes too
    sizes = list(range(1, 201)) + [
        10**6, 10**6 + 1, 5 * 10**6, 10**7, 10**8 + 3, 10**9
    ]
    rows = [(t, s) for t in thresholds for s in sizes]
    df = spark.createDataFrame(rows, "t double, s bigint")
    got = {
        (r["t"], r["s"]): r["c"]
        for r in df.select(
            "t",
            "s",
            F.ceil(F.col("t") * F.col("s") * F.lit(1.0 - 1e-12)).alias("c"),
        ).collect()
    }
    for t, s in rows:
        exact = math.ceil(Fraction(str(t)) * s)
        assert got[(t, s)] <= exact, (t, s, got[(t, s)], exact)
        # one-sided error bound: never more than one slot longer
        assert got[(t, s)] >= exact - 1, (t, s, got[(t, s)], exact)


def test_adaptive_prefix_split_matches_bruteforce_all_thresholds(spark):
    """The adaptive cold/hot split must be EXACT at every df_threshold —
    including K=0 (pure PPJoin: every shingle hot) and K=10^9 (pure naive:
    every shingle cold). Fuzzed against brute-force pairwise Jaccard on a
    corpus built to have genuinely HOT shingles (a boilerplate prefix
    shared by most docs) so the hot leg and the cold→hot rank offset are
    actually exercised."""
    import itertools
    import random

    from pixels_spark.functions import dedup as D

    rng = random.Random(77)
    vocab = [f"w{i}" for i in range(30)]
    boiler = "the quick brown fox jumps over"  # hot shingles in most docs
    rows = []
    for i in range(40):
        body = " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 12)))
        text = (boiler + " " + body) if i % 4 else body
        rows.append((i, text))
    # near-dup clusters: perturb a few docs lightly
    for i in range(40, 52):
        base = rows[i % 40][1]
        words = base.split()
        j = rng.randrange(len(words))
        words[j] = rng.choice(vocab)
        rows.append((i, " ".join(words)))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    def shingles(text, n=3):
        toks = text.lower().split()
        if len(toks) < n:
            return {" ".join(toks)}
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    sh = {i: shingles(t) for i, t in rows}
    t = 0.5
    want = set()
    for a, b in itertools.combinations(sorted(sh), 2):
        inter = len(sh[a] & sh[b])
        if inter and inter / len(sh[a] | sh[b]) >= t:
            want.add((a, b))

    for k in (None, 0, 1, 4, 16, 10**9):
        got = {
            (r.id_a, r.id_b)
            for r in D.ngram_jaccard_pairs(
                docs, threshold=t, df_threshold=k
            ).collect()
        }
        assert got == want, f"df_threshold={k}: {got ^ want}"


def test_containment_pairs_matches_bruteforce(spark):
    """containment_pairs' one-sided prefix + ordering + positional filters
    must be EXACT: fuzzed against brute-force pairwise containment on a
    corpus with hot boilerplate shingles AND genuine excerpt pairs (small
    docs whose full token stream is embedded inside much larger docs —
    the case Jaccard misses and this operator exists for)."""
    import itertools
    import random

    from pixels_spark.functions import dedup as D

    rng = random.Random(99)
    vocab = [f"w{i}" for i in range(30)]
    boiler = "the quick brown fox jumps over"
    rows = []
    for i in range(36):
        body = " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 14)))
        text = (boiler + " " + body) if i % 4 else body
        rows.append((i, text))
    # excerpt pairs: small docs embedded verbatim inside large hosts
    for i in range(36, 44):
        src = rows[i % 12][1].split()
        lo = rng.randrange(max(1, len(src) - 4))
        excerpt = src[lo : lo + rng.randint(4, 7)]
        rows.append((i, " ".join(excerpt)))
        host = (
            " ".join(rng.choice(vocab) for _ in range(10))
            + " " + " ".join(excerpt) + " "
            + " ".join(rng.choice(vocab) for _ in range(10))
        )
        rows.append((100 + i, host))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    def shingles(text, n=3):
        toks = text.lower().split()
        if len(toks) < n:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    sh = {i: shingles(t) for i, t in rows}
    for t in (0.5, 0.8, 1.0):
        want = set()
        for a, b in itertools.combinations(sorted(sh), 2):
            sa, sb = sh[a], sh[b]
            if len(sa) > len(sb) or (len(sa) == len(sb) and a > b):
                a, b, sa, sb = b, a, sb, sa
            inter = len(sa & sb)
            if inter and inter / len(sa) >= t:
                want.add((a, b))
        got = {
            (r.contained_id, r.container_id)
            for r in D.containment_pairs(docs, threshold=t).collect()
        }
        assert got == want, f"t={t}: {got ^ want}"
        # every reported containment value is the exact brute ratio
        for r in D.containment_pairs(docs, threshold=t).collect():
            sa, sb = sh[r.contained_id], sh[r.container_id]
            assert r.n_common == len(sa & sb)
            assert abs(r.containment - len(sa & sb) / len(sa)) < 1e-12
