"""Corpus-statistics operators: unigram-LM scoring, boilerplate removal,
writer-side CHAR/VARCHAR truncation.

(The declared queries txt_lm_score / txt_boilerplate / vec_kmeans_round are
oracle-compared against DuckDB in test_queries_oracle.py; these tests pin
the operator-level semantics and edge cases.)
"""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from pixels_spark.functions import text as T
from pixels_spark.storage.load import truncate_to_lengths, truncation_counts
from pixels_spark.types import type_max_length


def _docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=0, text="the cat sat"),
            Row(doc_id=1, text="the dog ran"),
            Row(doc_id=2, text="the cat ran far"),
            Row(doc_id=3, text="THE rare unicorn"),
        ]
    )


def test_unigram_lm_scores_match_hand_computation(spark):
    out = {
        r["doc_id"]: r
        for r in T.unigram_lm_scores(_docs(spark), "doc_id", "text").collect()
    }
    # corpus (lowercased): the x4, cat x2, ran x2, sat, dog, far, rare,
    # unicorn → N=13, V=8
    counts = {"the": 4, "cat": 2, "ran": 2, "sat": 1, "dog": 1, "far": 1,
              "rare": 1, "unicorn": 1}
    n, v = 13, 8

    def lp(w):  # quantized like the engine: decimal(18,9)
        return round(math.log((counts[w] + 1.0) / (n + v)), 9)

    doc0 = (lp("the") + lp("cat") + lp("sat")) / 3
    assert out[0]["n_tokens"] == 3
    assert abs(out[0]["avg_logprob"] - doc0) < 1e-12
    # the rare-word doc scores strictly lower than the common-word docs
    assert out[3]["avg_logprob"] < out[0]["avg_logprob"]
    assert out[3]["avg_logprob"] < out[1]["avg_logprob"]


def test_remove_frequent_tokens_strips_only_frequent(spark):
    # 'the' appears in 4/4 docs (case-insensitively); everything else ≤ 2/4
    out = {
        r["doc_id"]: r
        for r in T.remove_frequent_tokens(
            _docs(spark), "doc_id", "text", df_ratio=0.75
        ).collect()
    }
    assert out[0]["clean_text"] == "cat sat"
    assert out[0]["n_removed"] == 1
    # casing of surviving tokens is preserved; uppercase THE still removed
    assert out[3]["clean_text"] == "rare unicorn"
    assert out[3]["n_removed"] == 1
    assert all(r["n_tokens"] - r["n_removed"] >= 0 for r in out.values())


def test_remove_frequent_tokens_empty_set_is_identity(spark):
    # threshold above every doc-frequency → nothing removed, text intact
    out = T.remove_frequent_tokens(_docs(spark), "doc_id", "text", df_ratio=2.0)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert all(r["n_removed"] == 0 for r in rows.values())
    assert rows[2]["clean_text"] == "the cat ran far"


def test_remove_frequent_tokens_can_empty_a_document(spark):
    df = _docs(spark).sparkSession.createDataFrame(
        [Row(doc_id=0, text="x x x"), Row(doc_id=1, text="x")]
    )
    rows = {
        r["doc_id"]: r
        for r in T.remove_frequent_tokens(df, "doc_id", "text", df_ratio=0.5).collect()
    }
    assert rows[0]["clean_text"] == "" and rows[0]["n_removed"] == 3
    assert rows[1]["clean_text"] == "" and rows[1]["n_removed"] == 1


def test_type_max_length():
    assert type_max_length("varchar(25)") == 25
    assert type_max_length("char(3)") == 3
    assert type_max_length("binary(16)") == 16
    assert type_max_length("varbinary(8)") == 8
    assert type_max_length("varchar") is None
    assert type_max_length("decimal(15,2)") is None
    assert type_max_length("bigint") is None


def test_truncate_to_lengths_matches_reference_writer(spark):
    # VarcharColumnWriter.java:57-63 — overlong values truncated, counted
    df = spark.createDataFrame(
        [
            Row(k=1, name="MOROCCO", comment="short"),
            Row(k=2, name="UNITED KINGDOM", comment="exactly10!"),
            Row(k=3, name=None, comment="this one is far too long"),
        ]
    )
    types = {"name": "varchar(10)", "comment": "char(10)"}
    counts = truncation_counts(df, types)
    assert counts == {"name": 1, "comment": 1}
    out = {r["k"]: r for r in truncate_to_lengths(df, types).collect()}
    assert out[1]["name"] == "MOROCCO"  # within bound: untouched
    assert out[2]["name"] == "UNITED KIN"  # cut at 10
    assert out[3]["name"] is None  # nulls pass through
    assert out[2]["comment"] == "exactly10!"
    assert out[3]["comment"] == "this one i"
    # binary columns truncate by byte length
    bdf = spark.createDataFrame([Row(k=1, payload=bytearray(b"0123456789abcdef"))])
    bout = truncate_to_lengths(bdf, {"payload": "binary(4)"}).collect()[0]
    assert bytes(bout["payload"]) == b"0123"
    assert truncation_counts(bdf, {"payload": "binary(4)"}) == {"payload": 1}


def test_load_table_applies_pixels_type_truncation(spark, tmp_path):
    from pyspark.sql.types import StringType, StructField, StructType

    from pixels_spark.storage.load import load_table

    src = tmp_path / "src"
    src.mkdir()
    (src / "part.csv").write_text("1|abcdefghij\n2|xy\n")
    schema = StructType(
        [StructField("id", StringType()), StructField("s", StringType())]
    )
    out = load_table(
        spark,
        str(src),
        str(tmp_path / "dest"),
        schema,
        pixels_types={"s": "varchar(5)"},
    )
    got = {r["id"]: r["s"] for r in out.collect()}
    assert got == {"1": "abcde", "2": "xy"}


def test_pack_token_spans_partitions_stream_exactly(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=0, text=" ".join(["a"] * 5)),
            Row(doc_id=1, text=" ".join(["b"] * 3)),
            Row(doc_id=2, text=" ".join(["c"] * 9)),
            Row(doc_id=3, text=" ".join(["d"] * 2)),
        ]
    )
    spans = T.pack_token_spans(df, "doc_id", "text", shard_tokens=4).collect()
    # stream = 5+3+9+2 = 19 tokens → shards 0..4 (last partial, 3 tokens)
    per_shard = {}
    per_doc = {}
    for r in spans:
        width = r["tok_end"] - r["tok_start"]
        assert width > 0
        per_shard[r["shard"]] = per_shard.get(r["shard"], 0) + width
        per_doc.setdefault(r["doc_id"], []).append((r["tok_start"], r["tok_end"]))
    assert per_shard == {0: 4, 1: 4, 2: 4, 3: 4, 4: 3}
    # each doc's spans tile [0, n) contiguously
    for doc, n in [(0, 5), (1, 3), (2, 9), (3, 2)]:
        ivs = sorted(per_doc[doc])
        assert ivs[0][0] == 0 and ivs[-1][1] == n
        assert all(a[1] == b[0] for a, b in zip(ivs, ivs[1:]))
    # doc 2 (9 tokens) straddles three 4-token shards
    assert len(per_doc[2]) == 3


def test_pack_token_spans_whitespace_doc_counts_one_empty_token(spark):
    # the shared cross-engine convention (token_count ≡ DuckDB
    # string_split_regex): splitting trimmed-empty text yields [''] —
    # one degenerate token, so the doc still gets a 1-wide span
    df = spark.createDataFrame(
        [Row(doc_id=0, text="x y"), Row(doc_id=1, text=" ")]
    )
    spans = {r["doc_id"]: r for r in
             T.pack_token_spans(df, "doc_id", "text", shard_tokens=8).collect()}
    assert spans[1]["tok_end"] - spans[1]["tok_start"] == 1


def test_token_budget_mix_reaches_budget_per_stratum(spark):
    rows = [
        Row(doc_id=i, text=" ".join(["w"] * 10), source=f"s{i % 2}")
        for i in range(20)
    ]
    kept = T.token_budget_mix(
        spark.createDataFrame(rows), "doc_id", "text", "source", budget_tokens=35
    ).collect()
    by_src = {}
    for r in kept:
        by_src.setdefault(r["source"], 0)
        by_src[r["source"]] += r["n_tokens"]
    # 10-token docs, budget 35 → 4 docs / 40 tokens kept per stratum
    # (the crossing doc is included)
    assert by_src == {"s0": 40, "s1": 40}


def test_token_budget_mix_is_deterministic(spark):
    rows = [
        Row(doc_id=i, text=" ".join(["w"] * (1 + i % 7)), source="s")
        for i in range(50)
    ]
    df = spark.createDataFrame(rows)
    a = sorted(r["doc_id"] for r in T.token_budget_mix(df, budget_tokens=40).collect())
    b = sorted(
        r["doc_id"]
        for r in T.token_budget_mix(df.repartition(7), budget_tokens=40).collect()
    )
    assert a == b  # partitioning-independent (md5 total order)


def test_load_and_register_keeps_pixels_type_strings(spark, tmp_path):
    from pyspark.sql.types import StringType, StructField, StructType

    from pixels_spark.storage.load import load_and_register
    from pixels_spark.storage.metadata import MetadataStore

    src = tmp_path / "src2"
    src.mkdir()
    (src / "part.csv").write_text("1|abcdefghij\n")
    store = MetadataStore(str(tmp_path / "meta"))
    load_and_register(
        spark,
        store,
        "s",
        "t",
        str(src),
        str(tmp_path / "dest2"),
        StructType([StructField("id", StringType()), StructField("s", StringType())]),
        pixels_types={"s": "varchar(5)"},
    )
    cols = {c["name"]: c["type"] for c in store.get_columns("s", "t")}
    assert cols["s"] == "varchar(5)"  # declared length survives cataloging
    assert cols["id"] == "string"


def test_pack_and_budget_ignore_null_text(spark):
    # size(split(NULL)) is -1 under non-ANSI Spark — a NULL-text doc must
    # not shift later documents' offsets (DuckDB skips NULLs in the sum)
    df = spark.createDataFrame(
        [
            Row(doc_id=0, text="a a a"),
            Row(doc_id=1, text=None),
            Row(doc_id=2, text="b b b b b"),
        ]
    )
    spans = T.pack_token_spans(df, "doc_id", "text", shard_tokens=4).collect()
    per_shard = {}
    for r in spans:
        per_shard[r["shard"]] = per_shard.get(r["shard"], 0) + (
            r["tok_end"] - r["tok_start"]
        )
    assert per_shard == {0: 4, 1: 4}  # 8 tokens total, doc 1 absent
    assert {r["doc_id"] for r in spans} == {0, 2}
    kept = T.token_budget_mix(
        df.withColumn("source", F.lit("s")), budget_tokens=100
    ).collect()
    assert {r["doc_id"] for r in kept} == {0, 2}


def test_lm_score_plan_broadcasts_vocab(spark, sf_dir):
    """The vocab join must broadcast (vocab is tiny relative to the token
    stream) — a sort-merge join here would shuffle the whole exploded
    corpus on the token string."""
    from pixels_spark.catalog import load_table
    from pixels_spark.plans.pushdown import explain_str

    d = load_table(spark, sf_dir, "documents")
    plan = explain_str(T.unigram_lm_scores(d))
    assert "BroadcastHashJoin" in plan, plan


def test_boilerplate_plan_broadcasts_frequent_set(spark, sf_dir):
    """The single-row frequent-set must reach documents via a broadcast
    nested-loop (1-row cross), never a shuffled cartesian."""
    from pixels_spark.catalog import load_table
    from pixels_spark.plans.pushdown import explain_str

    d = load_table(spark, sf_dir, "documents")
    plan = explain_str(T.remove_frequent_tokens(d))
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_token_budget_mix_per_stratum_dict(spark):
    rows = [
        Row(doc_id=i, text=" ".join(["w"] * 10), source=f"s{i % 3}")
        for i in range(30)
    ]
    kept = T.token_budget_mix(
        spark.createDataFrame(rows),
        budget_tokens={"s0": 35, "s1": 5},  # s2 absent → excluded
    ).collect()
    tok = {}
    for r in kept:
        tok[r["source"]] = tok.get(r["source"], 0) + r["n_tokens"]
    assert tok == {"s0": 40, "s1": 10}  # crossing doc included per stratum


def test_export_training_shards_one_file_per_shard(spark, tmp_path):
    import os

    df = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(["w"] * 10)) for i in range(20)]
    )
    out = str(tmp_path / "shards")
    T.export_training_shards(df, out, shard_tokens=50)
    shard_dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert shard_dirs == [f"shard={i}" for i in range(4)]  # 200 tokens / 50
    for d in shard_dirs:
        files = [f for f in os.listdir(os.path.join(out, d)) if f.endswith(".parquet")]
        assert len(files) == 1
    back = spark.read.parquet(out)
    assert back.count() == 20
    per = {r["shard"]: r["n"] for r in
           back.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per == {0: 5, 1: 5, 2: 5, 3: 5}


def test_heavy_hitters_exact_vs_groupby(spark):
    """High-cardinality stream with a tiny MG capacity: the sketch must
    prune candidates yet the final answer equals the exact groupBy."""
    import pandas as pd

    # 3 hot keys (8% each) in a sea of 5000 distinct cold keys
    rows = (["hot_a"] * 800 + ["hot_b"] * 900 + ["hot_c"] * 1000
            + [f"cold{i}" for i in range(5000)] + ["warm"] * 300)
    df = spark.createDataFrame(pd.DataFrame({"w": rows})).repartition(8)
    got = {r["w"]: r["cnt"] for r in
           T.heavy_hitters(df, "w", 0.05, mg_capacity=50).collect()}
    n = len(rows)
    truth = {k: v for k, v in
             pd.Series(rows).value_counts().items() if v >= 0.05 * n}
    assert got == truth
    assert set(got) == {"hot_a", "hot_b", "hot_c"}  # warm at 3.75% excluded


def test_heavy_hitters_threshold_validation(spark):
    import pytest

    df = spark.range(1).select(F.col("id").cast("string").alias("w"))
    with pytest.raises(ValueError, match="threshold_frac"):
        T.heavy_hitters(df, "w", 0.0)


def test_heavy_hitters_rejects_guarantee_breaking_capacity(spark):
    import pandas as pd
    import pytest

    df = spark.createDataFrame(pd.DataFrame({"w": ["a"] * 10}))
    with pytest.raises(ValueError, match="candidate-superset guarantee"):
        T.heavy_hitters(df, "w", 0.05, mg_capacity=3)


def test_heavy_hitters_exact_ceil_threshold(spark):
    """100 rows at threshold 0.07: the quota is exactly 7, not the
    IEEE-double ceil(7.000000000000001) = 8."""
    import pandas as pd

    rows = ["hot"] * 7 + [f"c{i}" for i in range(93)]
    df = spark.createDataFrame(pd.DataFrame({"w": rows}))
    got = {r["w"]: r["cnt"] for r in T.heavy_hitters(df, "w", 0.07).collect()}
    assert got == {"hot": 7}


def test_heavy_hitters_numeric_nulls_skipped(spark):
    """Numeric columns surface SQL NULL as NaN in pandas batches; NULL
    rows must not count toward N or appear as candidates (ADVICE r5)."""
    rows = [(1.0,)] * 40 + [(2.0,)] * 5 + [(None,)] * 55
    df = spark.createDataFrame(rows, "v double").repartition(4)
    got = {r["v"]: r["cnt"] for r in T.heavy_hitters(df, "v", 0.5).collect()}
    # N must be 45 (non-null rows): 1 appears 40/45 = 89% -> kept;
    # if NaN were counted N=100 and 1 at 40% would be wrongly dropped
    assert got == {1.0: 40}


def test_chunk_tokens_shapes(spark):
    """Chunking edges: short doc -> one whole-doc chunk; exact-width doc ->
    one chunk; width+1 tokens -> two chunks with the overlap contract;
    stride == width -> disjoint tiling; invalid stride rejected."""
    import pytest

    docs = [
        (1, "a b c"),                       # shorter than width
        (2, " ".join(f"t{i}" for i in range(8))),    # exact width
        (3, " ".join(f"t{i}" for i in range(9))),    # width + 1
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {(r["doc_id"], r["chunk_idx"]): r
           for r in T.chunk_tokens(df, width=8, stride=6).collect()}
    assert got[(1, 0)]["n_tokens"] == 3 and got[(1, 0)]["chunk_text"] == "a b c"
    assert got[(2, 0)]["n_tokens"] == 8 and (2, 1) not in got
    # 9 tokens, stride 6: chunks at 0 (8 tokens) and 6 (3 tokens)
    assert got[(3, 0)]["chunk_text"].split() == [f"t{i}" for i in range(8)]
    assert got[(3, 1)]["chunk_text"].split() == ["t6", "t7", "t8"]
    assert got[(3, 1)]["n_tokens"] == 3

    # stride == width -> disjoint cover
    tiles = T.chunk_tokens(df.filter("doc_id = 3"), width=3, stride=3).collect()
    texts = [r["chunk_text"] for r in sorted(tiles, key=lambda r: r["chunk_idx"])]
    assert " ".join(texts).split() == [f"t{i}" for i in range(9)]

    with pytest.raises(ValueError, match="stride"):
        T.chunk_tokens(df, width=4, stride=5)


def test_kl_drift_properties(spark):
    """KL sanity: a group identical to the corpus mixture scores ~0; a
    group with a disjoint vocabulary scores strictly higher; KL >= 0 up to
    smoothing-induced epsilon."""
    same = [("a", "x y z w x y"), ("b", "x y z w x y")]
    df = spark.createDataFrame(same, ["source", "text"])
    kl = {r["source"]: r["kl_drift"] for r in T.kl_drift_by_group(df).collect()}
    # both groups ARE the corpus distribution -> drift ~ 0 up to the
    # add-one smoothing epsilon (group N differs from corpus N, so the
    # smoothed distributions differ slightly even for identical counts)
    assert all(0 <= v < 0.01 for v in kl.values()), kl

    skew = [("a", "x x x x x x"), ("b", "y y y y y y")]
    df2 = spark.createDataFrame(skew, ["source", "text"])
    kl2 = {r["source"]: r["kl_drift"] for r in T.kl_drift_by_group(df2).collect()}
    assert all(v > 0.1 for v in kl2.values()), kl2


def test_char_entropy_extremes(spark, tmp_path):
    """Entropy boundaries: one repeated char -> 0; k equiprobable chars
    -> ln(k); and lowercase-invariance (the query lowers first)."""
    import math

    from pixels_spark.queries.text_pipeline import txt_char_entropy

    docs = spark.createDataFrame(
        [(1, "aaaaaa", "en", "s", 6), (2, "abcd", "en", "s", 4),
         (3, "AbCd", "en", "s", 4)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    sf = str(tmp_path / "sf")
    import os
    os.makedirs(sf, exist_ok=True)
    docs.write.parquet(os.path.join(sf, "documents.parquet"))
    got = {r["doc_id"]: r for r in txt_char_entropy(spark, sf).collect()}
    assert got[1]["entropy"] == 0.0 and got[1]["n_distinct_chars"] == 1
    assert abs(got[2]["entropy"] - math.log(4)) < 1e-12
    assert got[3]["entropy"] == got[2]["entropy"]  # case-folded first


def test_char_entropy_skips_empty_text(spark, tmp_path):
    """Empty documents drop out (F.sequence(1,0) would otherwise step
    DOWNWARD and fabricate phantom chars the oracle never emits)."""
    import os

    from pixels_spark.queries.text_pipeline import txt_char_entropy

    docs = spark.createDataFrame(
        [(1, "", "en", "s", 0), (2, "ab", "en", "s", 2)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    sf = str(tmp_path / "sf"); os.makedirs(sf, exist_ok=True)
    docs.write.parquet(os.path.join(sf, "documents.parquet"))
    rows = txt_char_entropy(spark, sf).collect()
    assert [r["doc_id"] for r in rows] == [2]


def test_bpe_train_greedy_self_pair_and_next_round_counts(spark, tmp_path):
    """Crafted corpus where the top merge is the SELF-pair (a,a): greedy
    left-to-right must merge 'aaaa'→[aa,aa] and 'aaa'→[aa,a] (run
    parity), never the overlapping [a,aa,a]/[aa,aa] miscounts — then the
    round-2 pair table is fully pinned by hand."""
    import os

    from pixels_spark.queries.text_pipeline import txt_bpe_train

    docs = spark.createDataFrame(
        [(1, "aaaa aaa abab", "en", "s", 13)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    sf = str(tmp_path / "sf"); os.makedirs(sf, exist_ok=True)
    docs.write.parquet(os.path.join(sf, "documents.parquet"))
    rows = [
        (r["round"], r["rnk"], r["left_tok"], r["right_tok"], r["cnt"])
        for r in txt_bpe_train(spark, sf).collect()
    ]
    # round 1: (a,a) wins with 3+2=5 adjacent occurrences
    assert rows[0] == (1, 1, "a", "a", 5)
    # round 2 over [aa,aa] + [aa,a] + [a,b,a,b]:
    assert rows[1:] == [
        (2, 1, "a", "b", 2),
        (2, 2, "aa", "a", 1),
        (2, 3, "aa", "aa", 1),
        (2, 4, "b", "a", 1),
    ]
