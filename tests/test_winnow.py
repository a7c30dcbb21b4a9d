"""Winnowing fingerprint properties (functions/text.py::winnow_fingerprints).

The Schleimer guarantee: two documents sharing a substring of length
>= k + window - 1 share at least one fingerprint. Short documents (< k
chars) produce no fingerprints rather than erroring (Spark's descending
sequence(1,0) pitfall).
"""

from __future__ import annotations

from pixels_spark.functions.text import winnow_fingerprints


def _fps(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = winnow_fingerprints(df, "doc_id", "text", k=8, window=4).collect()
    by_doc: dict[int, set[str]] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    return by_doc

def test_shared_substring_shares_fingerprint(spark):
    shared = "the quick brown fox jumps over the lazy dog"
    fps = _fps(
        spark,
        [
            (1, "PREFIX aaaa " + shared + " SUFFIX bbbb"),
            (2, "totally different lead-in; " + shared + " and another tail"),
            (3, "no overlap here whatsoever, unrelated content entirely"),
        ],
    )
    assert fps[1] & fps[2], "docs sharing a long substring must share a fingerprint"
    assert not (fps[1] & fps[3] and fps[2] & fps[3] and len(fps[3] & fps[1] & fps[2]) > 0)


def test_identical_docs_identical_fingerprints(spark):
    text = "identical content that is comfortably longer than one window"
    fps = _fps(spark, [(1, text), (2, text)])
    assert fps[1] == fps[2]


def test_short_doc_yields_no_fingerprints(spark):
    fps = _fps(spark, [(1, "tiny"), (2, "long enough document text here")])
    assert 1 not in fps
    assert fps[2]
