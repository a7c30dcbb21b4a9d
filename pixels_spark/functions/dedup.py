"""Deduplication operators for LLM corpus cleaning.

Exact (hash-groupBy), MinHash+LSH (shingle→minhash→band→bucket-join),
SimHash, n-gram Jaccard, and embedding-cosine near-dup. All built from
DataFrame ops; hashes are Spark's ``xxhash64`` (JVM, codegen) so the hot
path never leaves the executor.

Scale design (100 TB):
- exact dedup: one shuffle on the 128-bit fingerprint; with a pre-bucketed
  corpus it becomes a shuffle-free map-side distinct.
- MinHash-LSH: cost is (docs × shingles) map work + one shuffle per band
  join keyed by (band, band-signature); candidate verification touches only
  colliding pairs — the whole point vs the quadratic naive pair join.
- SimHash: one explode + one groupBy(doc) — two narrow shuffles; hamming
  band join on the 4×16-bit split finds ≤3-bit neighbors without O(n²).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import fingerprint, tokens


def cut_lineage(df: DataFrame, reliable: bool = False) -> DataFrame:
    """Materialize an intermediate so downstream reuse (both sides of a
    self-join, iterative rounds) reads the materialization instead of
    recomputing the upstream job.

    Default (``reliable=False``): ``localCheckpoint`` — executor-local
    blocks, zero copy overhead, lineage truncated. The catch at cluster
    scale: localCheckpoint blocks are NOT recoverable — losing one
    executor aborts the query instead of recomputing (Spark cannot
    rebuild them). Fine for interactive/bench runs; wrong for multi-hour
    1000-executor jobs where an executor loss is routine.

    ``reliable=True``: if the session has a checkpoint dir
    (``sc.setCheckpointDir``), a reliable checkpoint (replayable from
    durable storage, lineage truncated); otherwise
    ``persist(MEMORY_AND_DISK_2)`` — 2× replicated cache, survives one
    executor loss, recomputes from lineage in the worst case (lineage is
    kept, so plans grow in iterative use — prefer a checkpoint dir for
    long chains). Both modes are value-identical (tests/test_dedup.py).
    """
    if not reliable:
        return df.localCheckpoint(eager=False)
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=False)
    from pyspark import StorageLevel

    return df.persist(StorageLevel.MEMORY_AND_DISK_2)


def spread(df: DataFrame, key: str) -> DataFrame:
    """Hash-repartition a compute-heavy operator's input across the cluster.

    Small/compacted tables often arrive as one parquet row group → one
    partition, which serializes CPU-bound work (shingling, hashing, vector
    math) onto a single core no matter how many executors exist (measured:
    the sf0.1 shingle explode ran 1-task). Hash-partitioning on the id both
    engages every core and pre-spreads skew; an input already WIDER than
    the session parallelism keeps its own partition count — spreading must
    never downscale a big table's parallelism (a 4096-partition 100 TB scan
    squeezed to defaultParallelism would concentrate, not spread).
    """
    default_par = df.sparkSession.sparkContext.defaultParallelism
    # Peeking at the input's width via df.rdd forces plan-to-RDD
    # conversion; under AQE that can eagerly materialize upstream query
    # stages (running their shuffles once here and again in the real job).
    # The initial physical plan (sparkPlan — built, never executed) already
    # knows the width statically when the top is a shuffle
    # (HashPartitioning(n) etc.); only for unknown-partitioned shuffle-free
    # plans (scan+map — the common dedup input) fall back to
    # getNumPartitions, which is cheap there (no query stages to run).
    import re

    plan = df._jdf.queryExecution().sparkPlan()
    n_in = plan.outputPartitioning().numPartitions()
    # only a SHUFFLE exchange makes getNumPartitions expensive under AQE;
    # a BroadcastExchange (broadcast-join input) has no query stage to
    # materialize, and skipping the fallback there would downscale a wide
    # scan-side to defaultParallelism — the bug this guard exists to avoid
    has_shuffle = re.search(r"(?<!Broadcast)Exchange", plan.toString())
    if n_in <= 1 and not has_shuffle:
        n_in = df.rdd.getNumPartitions()
    return df.repartition(max(default_par, n_in), key)


# ---------------------------------------------------------------------------
# exact dedup


def exact_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Drop exact duplicates by normalized-text fingerprint, keeping the
    lowest-id row per group (deterministic, unlike dropDuplicates)."""
    first_id = F.min(df.columns[0]).alias("_keep_id")
    keep = (
        df.withColumn("_fp", fingerprint(F.col(text_col)))
        .groupBy("_fp")
        .agg(first_id)
        .select(F.col("_keep_id"))
    )
    return df.join(keep, df[df.columns[0]] == F.col("_keep_id"), "left_semi")


def duplicate_groups(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(fingerprint, n_copies) for groups with >1 member."""
    return (
        df.withColumn("_fp", fingerprint(F.col(text_col)))
        .groupBy(F.col("_fp").alias("fingerprint"))
        .agg(F.count(F.lit(1)).alias("n_copies"))
        .filter(F.col("n_copies") > 1)
    )


# ---------------------------------------------------------------------------
# shingling


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column → array<string>.

    The token array is bound as a LAMBDA VARIABLE (transform over a
    1-element array) rather than referenced as a subtree inside the
    sliding-window lambda: higher-order functions re-evaluate non-variable
    child expressions per array element, so the old form re-ran the regex
    split (``tokens`` = split(trim(text), '\\s+')) once per shingle index
    — O(|tokens|²·|text|) work per document. With the variable binding the
    tokenize runs once per row and each window step only slices the bound
    array. Same values by construction (pure restructure).
    """

    def _from(toks: Column) -> Column:
        # sliding window via transform over index range; drop ragged tails
        idx = F.sequence(F.lit(0), F.size(toks) - n)
        sh = F.transform(
            idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
        )
        return F.when(F.size(toks) >= n, F.array_distinct(sh)).otherwise(
            F.array(F.concat_ws(" ", toks))
        )

    return F.element_at(F.transform(F.array(tokens(F.lower(text))), _from), 1)


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact pairwise on shingle-join candidates)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    block_col: str | None = None,
    reliable: bool = False,
    df_threshold: int | None = None,
) -> DataFrame:
    """Exact Jaccard-similar pairs via PREFIX-FILTERED shingle join
    (Chaudhuri et al. 2006 / PPJoin's prefix principle, relationally).

    A naive inverted-index self-join costs Σ df(shingle)² — quadratic in
    the posting length of every corpus-common shingle, which is exactly
    what blows up on templated/boilerplate text (measured: a 5× corpus
    OOMed the join; see tools/scale_check.py). Prefix filtering keeps the
    join EXACT but joins only each document's rarest shingles: order every
    document's shingle set by (global document frequency, shingle) and
    keep the first ``|A| − ⌈t·|A|⌉ + 1`` — any pair with Jaccard ≥ t must
    share its MINIMAL common shingle inside both prefixes (if a set's
    intersection avoided its prefix, the suffix could hold at most
    ``⌈t·|A|⌉ − 1 < t·|A| ≤ |A∩B|`` common shingles). Hot shingles land
    deep in every suffix, so their postings never meet the join.

    ``df_threshold`` (optional) switches on an ADAPTIVE split: shingles
    with df ≤ threshold ("cold") join their postings directly (no rank —
    output bounded by threshold × |postings|) while hotter shingles go
    through the prefix machinery, whose window then runs over the hot
    postings only. The split is EXACT: a qualifying pair's minimal common
    shingle s* is either cold (found by the cold leg, which joins ALL
    cold postings) or hot — and then every common shingle is ≥ s* in the
    (df, shingle) order, so the prefix principle applies unchanged; the
    hot leg's rank is the TRUE global rank because cold shingles sort
    strictly first, so rank(hot s in A) = |A's cold| + rank among hot
    (property-fuzzed vs brute force at K ∈ {0, 1, 4, 16, ∞} in
    tests/test_dedup.py). MEASURED default is None — the unified prefix
    pipeline — because on the fixture corpus the split LOSES (7.0 s vs
    2.6 s warm at sf0.1, A/B in one session): the prefix filter's
    candidate reduction (105k vs 268k pairs at K=16) outweighs the
    freq-join + window it avoids, and the split pays the posting relation
    twice more (4-way reuse) plus a union/distinct. The option exists for
    corpora whose posting mass is overwhelmingly cold-tail (the window
    input shrinks to the hot slice); flip it only with a measurement.

    Candidates then verify exactly: one join back to the per-doc shingle
    arrays, ``|A∩B| = size(array_intersect)``, Jaccard ≥ threshold.

    ``block_col`` (e.g. language, source, length bucket) restricts pairs to
    equal blocking-key values — the standard dedup blocking strategy —
    and composes with the prefix filter (candidates must collide on
    (prefix shingle, block)).
    """
    from pyspark.sql.window import Window

    cols = [
        F.col(id_col).alias("_id"),
        word_shingles(F.col(text_col), n).alias("_sh"),
    ]
    if block_col:
        cols.append(F.col(block_col).alias("_blk"))
    # lineage cut: the shingled table feeds the frequency pass, the prefix
    # pass, and both verification sides — materialize the compact per-doc
    # form once (one row per doc, shingle array, ~text-sized).
    sh = cut_lineage(
        spread(df, id_col).select(*cols).withColumn("_size", F.size("_sh")),
        reliable,
    )
    keep = ["_id", "_size"] + (["_blk"] if block_col else [])
    exploded = sh.select(*keep, F.explode("_sh").alias("_shingle"))
    freq = exploded.groupBy("_shingle").agg(
        F.count(F.lit(1)).alias("_df")
    )
    # ceil over the DOUBLE product t·|A| can round UP on exact-integer
    # products (0.07*100 = 7.000000000000001 → ceil 8), shortening the
    # prefix by one slot and risking a missed boundary pair. Shrinking by
    # a RELATIVE epsilon before ceil makes the error one-sided AT ANY
    # SIZE (double rounding error on t·|A| is relative, ~2e-16·x — an
    # absolute 1e-9 stops covering it once t·|A| ≳ 5e6 shingles): the
    # prefix can only err LONGER (a few extra candidates), never shorter
    # (a missed pair) — recall stays exact.
    prefix_len = F.col("_size") - F.ceil(
        F.lit(threshold) * F.col("_size") * F.lit(1.0 - 1e-12)
    ) + 1
    join_keys = ["_shingle"] + (["_blk"] if block_col else [])
    posts = exploded.join(freq, "_shingle")
    w = Window.partitionBy("_id").orderBy("_df", "_shingle")

    # PPJoin residual filters on the candidate join — both EXACT
    # (one-sided relative epsilon keeps boundary pairs), both crucial on
    # boilerplate-saturated corpora where posting lists are long:
    # - LENGTH: J ≥ t ⟹ min(|A|,|B|) ≥ t·max(|A|,|B|) (J ≤ min/max).
    # - POSITIONAL: if the pair's MINIMAL common shingle sits at rank i
    #   in A and j in B, overlap ≤ 1 + min(|A|−i, |B|−j); J ≥ t needs
    #   overlap ≥ t·(|A|+|B|)/(1+t). Applied per shared-prefix-shingle
    #   row: a qualifying pair always keeps its minimal-common-shingle
    #   row (the bound there is ≥ the true overlap), so the distinct()
    #   over survivors loses nothing — rows dropped for OTHER shared
    #   shingles are redundant candidate copies. Measured (SCALE.md r9):
    #   25× saturated corpus 560 s → the filtered join; candidates
    #   Σ df² bound unchanged but survivors collapse to near the
    #   verified-pair volume.
    _one_sided = F.lit(1.0 - 1e-12)
    _len_ok = F.least(F.col("_sza"), F.col("_szb")) >= (
        F.lit(threshold)
        * F.greatest(F.col("_sza"), F.col("_szb"))
        * _one_sided
    )

    def _pairs(rel: DataFrame, positional: bool) -> DataFrame:
        a = rel.select(
            F.col("_id").alias("id_a"),
            F.col("_size").alias("_sza"),
            *([F.col("_rk").alias("_rka")] if positional else []),
            *join_keys,
        )
        b = rel.select(
            F.col("_id").alias("id_b"),
            F.col("_size").alias("_szb"),
            *([F.col("_rk").alias("_rkb")] if positional else []),
            *join_keys,
        )
        out = a.join(b, join_keys).filter(
            (F.col("id_a") < F.col("id_b")) & _len_ok
        )
        if positional:
            bound = 1 + F.least(
                F.col("_sza") - F.col("_rka"), F.col("_szb") - F.col("_rkb")
            )
            alpha = (
                F.lit(threshold)
                * (F.col("_sza") + F.col("_szb"))
                / F.lit(1.0 + threshold)
                * _one_sided
            )
            out = out.filter(bound >= alpha)
        return out.select("id_a", "id_b")

    if df_threshold is None:
        # unified prefix pipeline (measured fastest on the fixture corpus;
        # lineage-cutting the prefix relation too is a net LOSS at fixture
        # scale — the eager checkpoint costs more than recomputing the
        # cheap freq-join/rank pipeline for the second self-join side)
        prefix = posts.withColumn("_rk", F.row_number().over(w)).filter(
            F.col("_rk") <= prefix_len
        )
        cands = _pairs(prefix, positional=True).distinct()
    else:
        # adaptive split: the posting relation feeds both legs' both join
        # sides — materialize it once
        posts = cut_lineage(posts, reliable)
        cold = posts.filter(F.col("_df") <= df_threshold)
        hot = posts.filter(F.col("_df") > df_threshold)
        # hot-leg global rank = (# cold shingles in the doc) + rank among
        # the doc's hot shingles; the window input is hot postings only
        ncold = cold.groupBy("_id").agg(F.count(F.lit(1)).alias("_nc"))
        hot_prefix = (
            hot.join(ncold, "_id", "left")
            .withColumn(
                "_rk",
                F.row_number().over(w) + F.coalesce(F.col("_nc"), F.lit(0)),
            )
            .filter(F.col("_rk") <= prefix_len)
        )
        # cold leg has no global rank — length filter only (still exact)
        cands = (
            _pairs(cold, positional=False)
            .unionByName(_pairs(hot_prefix, positional=True))
            .distinct()
        )
    sa = sh.select(
        F.col("_id").alias("id_a"),
        F.col("_sh").alias("_sh_a"),
        F.col("_size").alias("_size_a"),
    )
    sb = sh.select(
        F.col("_id").alias("id_b"),
        F.col("_sh").alias("_sh_b"),
        F.col("_size").alias("_size_b"),
    )
    common = F.size(F.array_intersect(F.col("_sh_a"), F.col("_sh_b")))
    jaccard = F.col("_common") / (
        F.col("_size_a") + F.col("_size_b") - F.col("_common")
    )
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("_common", common)
        .withColumn("jaccard", jaccard)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    block_col: str | None = None,
    reliable: bool = False,
) -> DataFrame:
    """Exact ASYMMETRIC containment pairs: C(A→B) = |A∩B| / |A| ≥ t for
    the smaller shingle set A inside the larger B (ties broken to the
    smaller id). This is the excerpt/quote/sub-document detector Jaccard
    structurally misses: a 50-shingle doc fully embedded in a 5000-shingle
    doc has J ≈ 0.01 but C = 1.0 (cf. the reference's dedup surface and
    Broder's containment measure).

    Prefix filtering applies ONE-SIDED here (the contained candidate
    side only): order A's shingles by (global df, shingle) and keep the
    first |A| − ⌈t·|A|⌉ + 1 — if every common shingle avoided that
    prefix, |A∩B| ≤ ⌈t·|A|⌉ − 1 < t·|A|, contradiction. The container
    side must join its FULL posting list (containment puts no lower
    bound on |A∩B|/|B|), so candidate volume is Σ_s prefdf(s)·df(s) —
    the prefix leg is what keeps hot boilerplate shingles from meeting
    their own full postings. Residual filters, both exact with the
    one-sided relative epsilon:
    - ORDERING: contained side is (|A| < |B|) or (|A| = |B| ∧ id_a <
      id_b) — subsumes the t·|A| ≤ |B| length bound for t ≤ 1.
    - POSITIONAL (on A only): at A-rank i, |A∩B| ≤ 1 + (|A| − i) must
      reach t·|A|; a qualifying pair keeps its minimal-common-shingle
      row, so the distinct() over survivors loses nothing.
    Candidates verify exactly against the per-doc shingle arrays.
    Exactness is property-fuzzed vs brute force in tests/test_dedup.py.

    Scale: same shape as ngram_jaccard_pairs — one lineage-cut shingle
    pass, df join, one prefix window, candidate join, verify join; at
    t = 0.8 the prefix is ~|A|/5 so the asymmetric join stays far below
    df² even though the B side is unpruned."""
    from pyspark.sql.window import Window

    cols = [
        F.col(id_col).alias("_id"),
        word_shingles(F.col(text_col), n).alias("_sh"),
    ]
    if block_col:
        cols.append(F.col(block_col).alias("_blk"))
    sh = cut_lineage(
        spread(df, id_col).select(*cols).withColumn("_size", F.size("_sh")),
        reliable,
    )
    keep = ["_id", "_size"] + (["_blk"] if block_col else [])
    exploded = sh.select(*keep, F.explode("_sh").alias("_shingle"))
    freq = exploded.groupBy("_shingle").agg(F.count(F.lit(1)).alias("_df"))
    posts = exploded.join(freq, "_shingle")
    prefix_len = (
        F.col("_size")
        - F.ceil(F.lit(threshold) * F.col("_size") * F.lit(1.0 - 1e-12))
        + 1
    )
    w = Window.partitionBy("_id").orderBy("_df", "_shingle")
    join_keys = ["_shingle"] + (["_blk"] if block_col else [])
    # r12 optimization, v2: the container side never needs the document
    # frequency — it joins its FULL posting list — so it reads straight
    # from ``exploded`` (a cheap in-task re-map of the checkpointed sh).
    # The freq-joined relation then has exactly ONE consumer (the prefix
    # side), so the tranche-3 lineage cut of it is no longer buying back
    # a replay and is dropped: that cut materialized the entire posting
    # relation (checkpoint write + 2 reads) just to stop the container
    # side re-running the freq aggregate it doesn't use. At 100 TB this
    # removes a corpus-sized checkpoint write from the operator.
    a = (
        posts.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= prefix_len)
        .select(
            F.col("_id").alias("id_a"),
            F.col("_size").alias("_sza"),
            F.col("_rk").alias("_rka"),
            *join_keys,
        )
    )
    b = exploded.select(
        F.col("_id").alias("id_b"), F.col("_size").alias("_szb"), *join_keys
    )
    ordering = (F.col("_sza") < F.col("_szb")) | (
        (F.col("_sza") == F.col("_szb")) & (F.col("id_a") < F.col("id_b"))
    )
    positional = (1 + F.col("_sza") - F.col("_rka")) >= (
        F.lit(threshold) * F.col("_sza") * F.lit(1.0 - 1e-12)
    )
    cands = (
        a.join(b, join_keys)
        .filter(ordering & positional)
        .select("id_a", "id_b")
        .distinct()
    )
    sa = sh.select(
        F.col("_id").alias("id_a"),
        F.col("_sh").alias("_sh_a"),
        F.col("_size").alias("_size_a"),
    )
    sb = sh.select(F.col("_id").alias("id_b"), F.col("_sh").alias("_sh_b"))
    common = F.size(F.array_intersect(F.col("_sh_a"), F.col("_sh_b")))
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("n_common", common.cast("bigint"))
        .withColumn(
            "containment", F.col("n_common") / F.col("_size_a")
        )
        .filter(F.col("containment") >= threshold)
        .select(
            F.col("id_a").alias("contained_id"),
            F.col("id_b").alias("container_id"),
            "n_common",
            "containment",
        )
    )


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
) -> DataFrame:
    """Train/test decontamination: flag training documents sharing ANY word
    n-gram with a benchmark/eval set → (id, n_shared) per contaminated doc.

    The standard LLM-corpus hygiene pass (n-gram overlap against held-out
    benchmarks) — an any-overlap *semi* relation, distinct from
    ``ngram_jaccard_pairs``'s pairwise similarity. Beyond-reference per the
    brief (the reference engine has no text surface).

    Scale shape: both sides explode their per-doc-distinct shingles; the
    benchmark side is globally distinct'd (benchmarks are tiny next to a
    100 TB corpus, so AQE turns the equi-join into a broadcast); one
    inner join on the shingle key then groupBy(id) counts shared shingles —
    each train shingle matches at most one benchmark row, so ``count(*)``
    is exactly the shared-shingle count. Sub-quadratic: no pair expansion,
    one shuffle keyed on the shingle, one on the id.
    """
    bsh = (
        benchmark.select(F.explode(word_shingles(F.col(text_col), n)).alias("_shingle"))
        .distinct()
    )
    tsh = spread(train.select(id_col, text_col), id_col).select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("_shingle")
    )
    return (
        tsh.join(bsh, "_shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
) -> DataFrame:
    """MinHash signatures as a DataFrame (_id, _sig array<bigint>).

    hash_i(s) = xxhash64(s, seed=i); signature[i] = min over shingles.
    Computed as explode(shingles) → groupBy(doc) with ``num_hashes`` MIN
    aggregates: shingles are materialized once, the num_hashes hash
    evaluations ride one hash-aggregate, and the whole thing is a single
    shuffle keyed by doc id. (The per-row array_min(transform(...)) form
    re-evaluates the shingle expression per hash function — measured 40×
    slower at sf0.1 — and degrades with document length; the explode form
    is also robust to long-document skew because map-side partial MIN
    combines before the shuffle.)
    """
    sh = spread(df, id_col).select(
        F.col(id_col).alias("_id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("_s"),
    )
    aggs = [
        F.min(F.xxhash64(F.col("_s"), F.lit(i))).alias(f"_h{i}")
        for i in range(num_hashes)
    ]
    per = sh.groupBy("_id").agg(*aggs)
    return per.select(
        "_id", F.array(*[F.col(f"_h{i}") for i in range(num_hashes)]).alias("_sig")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    reliable: bool = False,
) -> DataFrame:
    """LSH candidate pairs: split the signature into ``bands`` bands of
    ``num_hashes/bands`` rows; docs agreeing on any full band are candidates.

    One equi-join per the exploded (band_idx, band_hash) key — a single
    shuffle keyed by band content, never a cross join.
    """
    rows_per_band = num_hashes // bands
    # lineage cut (see ngram_jaccard_pairs): the signature job — shingle
    # explode + num_hashes MIN aggregates — would otherwise run once per
    # self-join side; the signature table is tiny (id + num_hashes longs)
    sig = cut_lineage(
        minhash_signatures(df, id_col, text_col, n, num_hashes), reliable
    )
    banded = sig.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at(F.col("_sig"), i * rows_per_band + j + 1)
                                    for j in range(rows_per_band)
                                ],
                            )
                        ).alias("band_hash"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("_b"),
    ).select("_id", "_b.band", "_b.band_hash")
    a = banded.select(F.col("_id").alias("id_a"), "band", "band_hash")
    b = banded.select(F.col("_id").alias("id_b"), "band", "band_hash")
    return (
        a.join(b, ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    reliable: bool = False,
) -> DataFrame:
    """MinHash-LSH candidates verified with exact Jaccard over shingles."""
    cands = minhash_lsh_candidates(
        df, id_col, text_col, n, num_hashes, bands, reliable=reliable
    )
    # r12 optimization: cut the verification shingle frame — both join
    # sides consume it, and without the cut each side re-shingles the
    # whole corpus (tokenize + n-gram + distinct per doc, the expensive
    # part); the doc-grain (id, shingle-array) frame is text-sized
    sh = cut_lineage(
        spread(df.select(id_col, text_col), id_col).select(
            F.col(id_col).alias("_vid"),
            word_shingles(F.col(text_col), n).alias("_vsh"),
        ),
        reliable,
    )
    a = sh.select(F.col("_vid").alias("id_a"), F.col("_vsh").alias("_sh_a"))
    b = sh.select(F.col("_vid").alias("id_b"), F.col("_vsh").alias("_sh_b"))
    inter = F.size(F.array_intersect(F.col("_sh_a"), F.col("_sh_b")))
    union = F.size(F.array_union(F.col("_sh_a"), F.col("_sh_b")))
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_md5_bands(
    text: Column,
    n: int = 3,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingles: Column | None = None,
) -> Column:
    """Per-row MinHash LSH bands as a pure column expression (no shuffle,
    no explode) — array<struct<band:int, bh:string>>.

    md5-based hash family (hash_i(s) = first 8 hex chars of
    md5('i|' || s) as a bigint) instead of xxhash64: md5 exists in DuckDB
    with identical semantics, so band values — and therefore collision
    sets — are EXACTLY restatable in oracle SQL (same trick as
    ``sampling.hash_bucket``). Stateless per row: safe in streaming
    projections where a groupBy would need its own state.

    ``shingles`` (optional) takes an already-computed ``word_shingles``
    array column so a caller that also materializes the array (the
    verify-join path in ``minhash_md5_pairs``) shingles each document
    ONCE instead of re-tokenizing inside the band expression — same
    values by construction (the bands are a pure function of the array).
    """
    # single-arg factory, NOT `lambda s, i=i`: F.transform passes the array
    # index to any two-argument callable, silently replacing the bound seed
    # with an index Column
    def _hasher(i: int):
        prefix = f"{i}|"
        return lambda s: F.conv(
            F.substring(F.md5(F.concat(F.lit(prefix), s)), 1, 8), 16, 10
        ).cast("long")

    def _bands(sh: Column) -> Column:
        sigs = [
            F.array_min(F.transform(sh, _hasher(i))) for i in range(num_hashes)
        ]
        n_bands = num_hashes // rows_per_band
        return F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.concat_ws(
                        ",",
                        *[
                            sigs[b * rows_per_band + j].cast("string")
                            for j in range(rows_per_band)
                        ],
                    ).alias("bh"),
                )
                for b in range(n_bands)
            ]
        )

    if shingles is not None:
        return _bands(shingles)
    # bind the shingle array as a lambda variable: as a subtree it would be
    # re-evaluated once per hash function (each per-hash transform takes it
    # as its traversed argument) — num_hashes tokenize passes per row
    return F.element_at(F.transform(F.array(word_shingles(text, n)), _bands), 1)


def minhash_md5_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    threshold: float = 0.5,
    reliable: bool = False,
) -> DataFrame:
    """MinHash-LSH near-dup pairs on the md5 hash family: band-collision
    candidates (``minhash_md5_bands`` — no shuffle to build, one band
    equi-join to collide) verified with exact Jaccard over the shingle
    arrays. Because md5 is computable in DuckDB with identical semantics,
    the ENTIRE pair set — candidates included — is exactly restatable in
    oracle SQL (unlike the xxhash64 fast path ``minhash_dedup_pairs``,
    whose verified OUTPUT is engine-agnostic but whose candidate set
    isn't replayable). Same plan shape either way: band equi-join, never
    all-pairs; exact-verify joins back to per-doc shingle arrays."""
    # two-step projection so word_shingles evaluates ONCE per row: the
    # outer select builds the bands from the materialized _vsh column
    # reference (Catalyst's CollapseProject declines to inline a non-cheap
    # expression referenced 8+ times, so the tokenize+shingle pipeline is
    # not duplicated into the band transforms — verified by A/B timing of
    # the checkpoint job)
    sh = cut_lineage(
        spread(df, id_col)
        .select(
            F.col(id_col).alias("_vid"),
            word_shingles(F.col(text_col), n).alias("_vsh"),
        )
        .select(
            "_vid",
            "_vsh",
            minhash_md5_bands(
                None, n, num_hashes, rows_per_band, shingles=F.col("_vsh")
            ).alias("_bands"),
        ),
        reliable,
    )
    bb = sh.select("_vid", F.explode("_bands").alias("_b")).select(
        "_vid", F.col("_b.band").alias("band"), F.col("_b.bh").alias("bh")
    )
    cands = (
        bb.alias("a")
        .join(
            bb.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a._vid") < F.col("b._vid")),
        )
        .select(F.col("a._vid").alias("id_a"), F.col("b._vid").alias("id_b"))
        .distinct()
    )
    a = sh.select(F.col("_vid").alias("id_a"), F.col("_vsh").alias("_sh_a"))
    b = sh.select(F.col("_vid").alias("id_b"), F.col("_vsh").alias("_sh_b"))
    inter = F.size(F.array_intersect(F.col("_sh_a"), F.col("_sh_b")))
    union = F.size(F.array_union(F.col("_sh_a"), F.col("_sh_b")))
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
    hash_fn=None,
) -> DataFrame:
    """64-bit SimHash per document.

    explode(tokens) → groupBy(doc) with packed set-bit counters →
    reassemble the sign bits. One shuffle total; see inline comment for the
    16-bit-lane packing (valid for documents ≤ 65535 tokens).

    ``hash_fn`` (Column → Column, default xxhash64) swaps the token hash:
    ``dedup_simhash_md5`` passes the md5-prefix family so the whole
    signature is DuckDB-replicable and the oracle compares it exactly.
    """
    assert bits % 4 == 0
    token_hash = hash_fn if hash_fn is not None else F.xxhash64
    toks = spread(df, id_col).select(
        F.col(id_col).alias("_id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("_tok"),
    ).withColumn("_h", token_hash(F.col("_tok")))

    # Packed counters: 4 bit-indicators per aggregate, one per 16-bit lane
    # of a long — 16 sums instead of 64 (~3× less aggregate work). A lane
    # counts up to 65535 tokens exactly; sign test per bit b becomes
    # 2·set_count(b) > n_tokens ⇔ the classic ±1 sum is positive (ties →
    # 0-bit, unchanged).
    def packed(group: int) -> Column:
        expr = F.lit(0).cast("long")
        for lane in range(4):
            b = group * 4 + lane
            bit = F.shiftright(F.col("_h"), b).bitwiseAND(F.lit(1)).cast("long")
            expr = expr + F.shiftleft(bit, lane * 16)
        return expr

    n_groups = bits // 4
    bit_sums = toks.groupBy("_id").agg(
        *[F.sum(packed(g)).alias(f"_p{g}") for g in range(n_groups)],
        F.count(F.lit(1)).alias("_n"),
    )
    sig = F.lit(0).cast("bigint")
    for g in range(n_groups):
        for lane in range(4):
            b = g * 4 + lane
            set_count = F.shiftright(F.col(f"_p{g}"), lane * 16).bitwiseAND(
                F.lit(0xFFFF)
            )
            weight = (
                F.lit(1 << b).cast("bigint")
                if b < 63
                else F.lit(-(1 << 63)).cast("bigint")
            )
            sig = sig + F.when((set_count * 2) > F.col("_n"), weight).otherwise(
                F.lit(0).cast("bigint")
            )
    return bit_sums.select(F.col("_id").alias(id_col), sig.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    reliable: bool = False,
    bits: int = 64,
    hash_fn=None,
) -> DataFrame:
    """Near-duplicate pairs by SimHash hamming distance ≤ max_hamming.

    Band trick: split the signature into 4 equal-width chunks; any pair
    within hamming ≤3 agrees exactly on ≥1 chunk (pigeonhole), so an
    equi-join per chunk finds all of them without O(n²). ``bits`` /
    ``hash_fn`` pass through to ``simhash`` — the md5-prefix family with
    bits=32 makes the whole pair set DuckDB-replicable (the declared
    ``dedup_simhash`` oracle); the xxhash64 64-bit default is the
    production fast path (JVM hash, no md5 string round-trip).

    The signature table feeds BOTH sides of the self-join; Spark's exchange
    reuse does not fire across the differently-aliased sides, so without a
    lineage cut the token-explode + groupBy (the expensive 99% of the job)
    runs twice. ``localCheckpoint`` materializes the tiny signature table
    (2 longs per doc) once; both join sides then scan the materialization —
    at 100 TB this halves the operator."""
    assert bits % 4 == 0
    cw = bits // 4
    mask = (1 << cw) - 1
    sigs = cut_lineage(
        simhash(df, id_col, text_col, bits=bits, hash_fn=hash_fn), reliable
    )
    chunks = sigs.select(
        F.col(id_col).alias("_id"),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftright(F.col("simhash"), i * cw)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk_val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("_c"),
    ).select("_id", "simhash", "_c.chunk", "_c.chunk_val")
    a = chunks.select(
        F.col("_id").alias("id_a"), F.col("simhash").alias("_sig_a"), "chunk", "chunk_val"
    )
    b = chunks.select(
        F.col("_id").alias("id_b"), F.col("simhash").alias("_sig_b"), "chunk", "chunk_val"
    )
    hamming = F.bit_count(F.col("_sig_a").bitwiseXOR(F.col("_sig_b")))
    # hamming-filter BEFORE the dedup shuffle: the distinct only has to
    # carry pairs that already passed the (highly selective) distance test,
    # not every same-chunk candidate — order is semantics-preserving since
    # hamming is a pure function of the pair
    return (
        a.join(b, ["chunk", "chunk_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    partition_col: str | list[str] | None = None,
    threshold: float = 0.95,
    dim: int | None = None,
    n_planes: int = 8,
    seed: int = 42,
    allow_full_pairs: bool = False,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold.

    Blocking is MANDATORY — an unblocked self-join is O(n²) and a
    scale-killer at corpus size. With ``partition_col`` (a cluster/label/
    IVF-cell column, or a LIST of columns for composite blocks — joined as
    separate equi-keys, so NULLs drop rather than collide the way a
    separator-concatenated string key would); without one, rows are
    blocked by a random-hyperplane LSH bucket (``lsh_bucket``, seeded, so
    the equi-join carries only same-bucket candidates — high-cosine pairs
    collide with high probability, raise ``n_planes`` for selectivity or
    lower it for recall). The all-pairs cross join exists only behind the
    explicit ``allow_full_pairs=True`` escape hatch.

    Norms are computed once per side before the join (n folds), not per pair
    (3·n² folds) — cosine(a,b) = dot(a,b)/(‖a‖·‖b‖) with identical FP result."""
    from .vector import dot, l2_norm, with_lsh_bucket

    src = spread(df, id_col)
    part_cols: list[str] = []
    if partition_col:
        names = (
            [partition_col] if isinstance(partition_col, str) else list(partition_col)
        )
        for i, c in enumerate(names):
            src = src.withColumn(f"_part{i}", F.col(c))
            part_cols.append(f"_part{i}")
    elif not allow_full_pairs:
        src = with_lsh_bucket(src, vec_col, "_part0", dim, n_planes, seed)
        part_cols.append("_part0")

    cols = [
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
        l2_norm(F.col(vec_col)).alias("_norm"),
        *[F.col(c) for c in part_cols],
    ]
    base = src.select(*cols)
    on = part_cols
    a = base.select(
        F.col("_id").alias("id_a"),
        F.col("_vec").alias("_vec_a"),
        F.col("_norm").alias("_norm_a"),
        *on,
    )
    b = base.select(
        F.col("_id").alias("id_b"),
        F.col("_vec").alias("_vec_b"),
        F.col("_norm").alias("_norm_b"),
        *on,
    )
    joined = a.join(b, on) if on else a.crossJoin(b)
    sim = dot(F.col("_vec_a"), F.col("_vec_b")) / (F.col("_norm_a") * F.col("_norm_b"))
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", sim)
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


# ---------------------------------------------------------------------------
# near-dup clusters: pairs → connected components → canonical selection


def connected_components(
    pairs: DataFrame, max_iterations: int = 20, reliable: bool = False
) -> DataFrame:
    """Group near-duplicate pairs (id_a, id_b) into clusters: returns
    (id, component) where component = the smallest id reachable from id.

    Distributed min-label propagation: every node starts labeled with the
    smallest direct neighbor (or itself); each iteration joins labels
    across edges and keeps the minimum, until a fixpoint. Converges in
    O(log diameter) iterations: each round does neighbor min-propagation
    (one edge join + groupBy) followed by pointer jumping (re-labeling by
    the label of the current label), which halves remaining path lengths —
    the union-find equivalent of the large-star/small-star map-reduce
    algorithm. Near-dup clusters are shallow (dup groups are dense), so it
    terminates in 2-3 rounds in practice; ``max_iterations`` bounds
    adversarial chains.

    Iteration hygiene for scale: edges and the current labels are
    persisted (each iteration re-reads both; without caching iteration i
    would recompute all prior joins), old labels are unpersisted as soon
    as the new generation is materialized, lineage is truncated with
    ``localCheckpoint`` every few iterations (bounding plan depth on
    high-diameter graphs), and the convergence check is FUSED into the
    label computation — the old label rides along and one aggregate
    counts changes, so each iteration is exactly one job and one driver
    round-trip.
    """
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .persist()
    )
    # initial label: min(self, direct neighbors)
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("nbr_min"))
        .select(
            F.col("src").alias("id"),
            F.least(F.col("src"), F.col("nbr_min")).alias("component"),
        )
        .persist()
    )
    prev = labels  # the persisted handle of the current generation
    checkpoint_every = 3
    for it in range(max_iterations):
        # propagate: candidate label via any neighbor's label
        candidate = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("component").alias("nbr_comp"))
        )
        propagated = (
            labels.join(candidate, labels["id"] == candidate["src"], "left_outer")
            .select(
                "id",
                F.col("component").alias("_old"),
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_comp"), F.col("component"))
                ).alias("component"),
            )
        )
        # pointer jumping: component := label(component). Halves remaining
        # path lengths, turning O(diameter) convergence into O(log diameter).
        new_labels = (
            propagated.alias("p")
            .join(labels.alias("l"), F.col("p.component") == F.col("l.id"), "left_outer")
            .select(
                F.col("p.id").alias("id"),
                F.col("p._old").alias("_old"),
                F.least(
                    F.col("p.component"),
                    F.coalesce(F.col("l.component"), F.col("p.component")),
                ).alias("component"),
            )
        )
        if (it + 1) % checkpoint_every == 0:
            # the lineage cut persists internally; don't double-persist
            new_labels = cut_lineage(new_labels, reliable)
        else:
            new_labels = new_labels.persist()
        # one job: materializes new_labels into the cache AND counts changes
        changed = new_labels.agg(
            F.sum((F.col("component") != F.col("_old")).cast("long"))
        ).first()[0]
        prev.unpersist()
        prev = new_labels
        labels = new_labels.select("id", "component")
        if not changed:
            break
    edges.unpersist()
    return labels


def canonical_docs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    reliable: bool = False,
) -> DataFrame:
    """Near-dup dedup, end to end: keep one document per duplicate cluster
    (the smallest id — deterministic), plus every document that appears in
    no pair. This is the step an LLM corpus pipeline actually ships:
    pairs → clusters → survivors."""
    comps = connected_components(pairs, reliable=reliable)
    losers = comps.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("_loser")
    )
    return df.join(losers, df[id_col] == F.col("_loser"), "left_anti")


# ---------------------------------------------------------------------------
# incremental dedup registry (batch counterpart of streaming band_first_seen)


class DedupRegistry:
    """Persisted dedup state for INCREMENTAL corpus growth: each new batch
    is checked against every fingerprint/band ever registered — WITHOUT
    re-reading the old corpus — then appends its own novel entries. This
    is the production shape for 100 TB pipelines: a nightly crawl batch
    dedups against the historical fingerprint store (fingerprint-sized,
    ~1% of corpus bytes), not against the corpus itself.

    Two append-only parquet stores under ``path``:

    - ``exact/batch=<n>``: md5(text) fingerprints → exact dedup;
    - ``bands/batch=<n>``: MinHash-LSH (band, bh) values (md5 hash family,
      ``minhash_md5_bands``) → near dedup. A doc is suppressed iff ANY of
      its bands was seen before — the same first-seen-wins convention as
      the streaming ``band_first_seen`` operator, so batch and streaming
      ingest produce the SAME suppression set for the same arrival order.

    Within a batch, earlier id wins (deterministic). Kept rows are
    persisted per batch and returned re-read, so later calls never
    invalidate earlier results via lazy re-lists. No reference analog
    (Retina has no dedup); cited as beyond-parity.
    """

    def __init__(self, spark, path: str):
        import os

        self.spark = spark
        self.path = path
        self.exact_dir = os.path.join(path, "exact")
        self.bands_dir = os.path.join(path, "bands")
        self.kept_dir = os.path.join(path, "kept")
        os.makedirs(path, exist_ok=True)
        # recover the batch counter from what is already on disk, so
        # re-opening an existing registry (the nightly-batch shape)
        # APPENDS instead of silently overwriting batch=1
        self.n_batches = max(
            (
                int(d.split("=", 1)[1])
                for root in (self.exact_dir, self.bands_dir, self.kept_dir)
                if os.path.isdir(root)
                for d in os.listdir(root)
                if d.startswith("batch=")
            ),
            default=0,
        )

    def _existing(self, root: str, schema: str) -> DataFrame:
        import os

        if os.path.isdir(root) and os.listdir(root):
            return self.spark.read.option("basePath", root).parquet(root).drop("batch")
        return self.spark.createDataFrame([], schema)

    def _add_batch(
        self,
        df: DataFrame,
        id_col: str,
        entries: DataFrame,
        entry_keys: list[str],
        store_dir: str,
        schema: str,
    ) -> DataFrame:
        """Shared check-register skeleton: suppress ids whose entries hit
        the persisted store OR a smaller id in this batch; persist kept
        rows; append the novel entry values (including suppressed docs'
        unclaimed ones — the streaming first-seen state convention)."""
        import os

        self.n_batches += 1
        reg = self._existing(store_dir, schema)
        hit_reg = entries.join(reg, entry_keys, "left_semi").select(id_col)
        first = entries.groupBy(*entry_keys).agg(F.min(id_col).alias("_first"))
        intra = (
            entries.join(first, entry_keys)
            .filter(F.col(id_col) > F.col("_first"))
            .select(id_col)
        )
        suppressed = hit_reg.unionByName(intra).distinct()
        kept = df.join(suppressed, id_col, "left_anti")
        kept_path = os.path.join(self.kept_dir, f"batch={self.n_batches}")
        kept.write.mode("overwrite").parquet(kept_path)
        entries.select(*entry_keys).distinct().join(
            reg, entry_keys, "left_anti"
        ).write.mode("overwrite").parquet(
            os.path.join(store_dir, f"batch={self.n_batches}")
        )
        return self.spark.read.parquet(kept_path)

    def add_batch_exact(
        self, df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
    ) -> DataFrame:
        """Check+register a batch by whole-document md5: returns the kept
        rows (not an exact dup of any registered doc nor of a smaller-id
        doc in this batch); appends the novel fingerprints."""
        fps = df.select(F.col(id_col), F.md5(F.col(text_col)).alias("fp"))
        return self._add_batch(df, id_col, fps, ["fp"], self.exact_dir, "fp string")

    def add_batch_near(
        self, df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
    ) -> DataFrame:
        """Check+register a batch by MinHash-LSH bands: returns the kept
        rows (no band collides with a registered band value or with a
        smaller-id doc in this batch); appends the novel band values."""
        bands = df.select(
            F.col(id_col),
            F.explode(minhash_md5_bands(F.col(text_col))).alias("_b"),
        ).select(
            id_col, F.col("_b.band").alias("band"), F.col("_b.bh").alias("bh")
        )
        return self._add_batch(
            df, id_col, bands, ["band", "bh"], self.bands_dir, "band int, bh string"
        )

    def compact(self) -> None:
        """Consolidate the per-batch fingerprint/band stores into one
        directory each (the registry's own OPTIMIZE — thousands of
        nightly batch dirs otherwise accumulate and every check pays
        their listing). Entry sets are unchanged; kept/ batches are
        left as-is (they are results, not lookup state)."""
        import os
        import shutil

        for root, schema in (
            (self.exact_dir, "fp string"),
            (self.bands_dir, "band int, bh string"),
        ):
            if not (os.path.isdir(root) and os.listdir(root)):
                continue
            batches = [d for d in os.listdir(root) if d.startswith("batch=")]
            if len(batches) <= 1:
                continue
            entries = self._existing(root, schema).distinct()
            tmp = root + "._compact_tmp"
            entries.write.mode("overwrite").parquet(tmp)
            for d in batches:
                shutil.rmtree(os.path.join(root, d))
            os.replace(tmp, os.path.join(root, f"batch={self.n_batches}"))


# ---------------------------------------------------------------------------
# substring-level dedup (cross-document duplicated spans)


def duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document duplicated SUBSTRING spans: maximal word ranges
    covered by ``width``-word windows whose text appears in at least
    ``min_docs`` distinct documents.

    This is substring-level dedup in the sense of Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better"): document
    dedup (exact/MinHash) misses boilerplate paragraphs repeated across
    otherwise-distinct pages; span-level detection finds the repeated
    regions themselves so a pipeline can cut them instead of dropping
    whole documents. Returns (id, span_start, span_end, n_windows) with
    word-index spans ``[span_start, span_end)``; overlapping/adjacent
    duplicate windows are merged per document (gaps-and-islands).

    Scale shape (the suffix-array of the paper replaced by the Spark-
    native equivalent): positional window explode (rows = total words, the
    same volume as any shingle pipeline) → md5(window) so the shuffle
    carries 16-byte keys instead of raw text → distinct-doc counts via two
    stacked window functions over ONE hash-keyed Exchange (a first-
    occurrence flag per (hash, doc) summed per hash) — no self-join, no
    lineage cut, no duplicate-set broadcast, and per-row state only (both
    windows are sort-based streaming aggregates, so a boilerplate window
    shared by a billion docs costs nothing extra, where a collect_set
    would blow up) → per-doc span merge (one narrow shuffle on the id).
    No pair expansion anywhere — cost is linear in corpus words: exactly
    two Exchanges and one tokenize pass (plan-asserted in tests).
    """
    from pyspark.sql.window import Window

    toks = tokens(F.lower(F.col(text_col)))
    d = df.select(F.col(id_col), toks.alias("_w")).filter(F.size("_w") >= width)
    idx = F.sequence(F.lit(0), F.size("_w") - width)
    wins = d.select(
        id_col,
        F.posexplode(
            F.transform(idx, lambda i: F.md5(F.concat_ws(" ", F.slice("_w", i + 1, width))))
        ).alias("pos", "_h"),
    )
    # distinct docs per hash without countDistinct-join: flag the first
    # row of each (hash, doc) group, then sum flags per hash. Both windows
    # cluster on _h, so Catalyst plans ONE Exchange + two sorts.
    w_doc = Window.partitionBy("_h", id_col).orderBy("pos")
    w_h = Window.partitionBy("_h")
    hits = (
        wins.withColumn(
            "_first", (F.row_number().over(w_doc) == 1).cast("int")
        )
        .withColumn("_nd", F.sum("_first").over(w_h))
        .filter(F.col("_nd") >= min_docs)
        .drop("_first", "_nd")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    islands = hits.withColumn(
        "_new",
        F.when(F.col("pos") - F.lag("pos").over(w) <= width, 0).otherwise(1),
    ).withColumn(
        "_grp", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        islands.groupBy(id_col, "_grp")
        .agg(
            F.min("pos").cast("bigint").alias("span_start"),
            (F.max("pos") + width).cast("bigint").alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .drop("_grp")
    )


def cut_duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """REMOVE the cross-document duplicated spans ``duplicated_spans``
    detects: every token position covered by a duplicated window range is
    excised and the remaining tokens re-join in order — the "cut the
    repeated region, keep the document" alternative to dropping whole
    near-duplicate documents (Lee et al. 2022's actual training-data
    treatment).

    Returns (id, n_tokens, n_tokens_cut, clean_text). Documents with no
    duplicated spans pass through with their (lower-cased, whitespace-
    normalized) token stream intact — the same normalization the span
    detector tokenizes with, so offsets line up.

    Scale shape: spans per document are few (merged maximal ranges), so
    the coverage join is a per-id join with a tiny range filter — linear,
    not tokens × spans; the re-assembly is one groupBy(id) with an
    in-group sort (array_sort over (pos, tok) structs, map-side).
    """
    spans = duplicated_spans(df, id_col, text_col, width=width, min_docs=min_docs)
    toks_arr = tokens(F.lower(F.col(text_col)))
    pos_toks = df.select(
        F.col(id_col), F.posexplode(toks_arr).alias("pos", "_tok")
    )
    sp = spans.select(
        F.col(id_col).alias("_sid"),
        F.col("span_start").alias("_ss"),
        F.col("span_end").alias("_se"),
    )
    covered = pos_toks.join(
        sp,
        (F.col(id_col) == F.col("_sid"))
        & (F.col("pos") >= F.col("_ss"))
        & (F.col("pos") < F.col("_se")),
        "left_anti",
    )
    kept = covered.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("_n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "_tok"))),
                lambda s: s["_tok"],
            ),
        ).alias("clean_text"),
    )
    totals = df.select(
        F.col(id_col), F.size(toks_arr).cast("bigint").alias("n_tokens")
    )
    return (
        totals.join(kept, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            (F.col("n_tokens") - F.coalesce(F.col("_n_kept"), F.lit(0)))
            .cast("bigint")
            .alias("n_tokens_cut"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )


def source_overlap(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    width: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-GROUP duplication overlap matrix: for every pair of groups
    (sources, crawls, snapshots), how many distinct ``width``-word windows
    they share → (group_a, group_b, n_shared_windows), group_a < group_b.

    The corpus-curation report behind mixture decisions: which sources
    syndicate each other's boilerplate, which crawl snapshot is a rehash
    of the last one, how contaminated a new source is against what's
    already ingested.

    Scale shape: per-group DISTINCT window hashes first (the md5 key is
    16 bytes; volume ≤ corpus words and collapses hard — boilerplate is
    repeated, that's the point), then a self-equi-join on the hash. Pair
    expansion is bounded by C(n_groups, 2) per hash — group count is
    tens, never corpus-sized — so the join output is at most
    190× the distinct-hash count at 20 groups, in practice far below.
    The distinct relation is lineage-cut so both join sides read one
    materialization. Since rows are (group, hash)-distinct, a plain
    count(*) per pair IS the distinct shared-window count — no
    countDistinct shuffle.
    """
    # spread on the doc id (high cardinality), not the group key — a
    # 20-group corpus hashed on group would leave most partitions empty.
    # Tokenize into a materialized `_w` column FIRST: referenced as a
    # subtree inside the sliding-window lambda the regex split would
    # re-run once per window index (HOFs re-evaluate non-variable
    # children per element — the word_shingles defect), O(len²) per doc;
    # as an attribute the per-window slice is O(width).
    toks = F.col("_w")
    d = (
        spread(df.select(id_col, group_col, text_col), id_col)
        .select(
            F.col(id_col),
            F.col(group_col),
            tokens(F.lower(F.col(text_col))).alias("_w"),
        )
        .filter(F.size(toks) >= width)
    )
    idx = F.sequence(F.lit(0), F.size(toks) - width)
    gw = cut_lineage(
        d.select(
            F.col(group_col),
            F.explode(
                F.transform(
                    idx, lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, width)))
                )
            ).alias("_h"),
        ).distinct()
    )
    a, b = gw.alias("a"), gw.alias("b")
    return (
        a.join(
            b,
            (F.col("a._h") == F.col("b._h"))
            & (F.col(f"a.{group_col}") < F.col(f"b.{group_col}")),
        )
        .groupBy(
            F.col(f"a.{group_col}").alias(f"{group_col}_a"),
            F.col(f"b.{group_col}").alias(f"{group_col}_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_windows"))
    )
