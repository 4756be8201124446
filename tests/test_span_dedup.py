import pytest

from data_sync_tool_spark.operators.span_dedup import dedupe_spans, duplicate_spans


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


SHARED = "a b c d e f g h"  # 8 tokens


def test_duplicate_spans_finds_maximal_cross_doc_span(spark):
    df = _docs(
        spark,
        [
            (1, f"p q r {SHARED} s t"),
            (2, f"{SHARED} u v w"),
            (3, "totally different words here nothing shared at all ok"),
        ],
    )
    got = {
        (r["id"], r["span_start"], r["span_tokens"], r["span_text"])
        for r in duplicate_spans(df, min_len=4).collect()
    }
    # maximal span is the full 8-token run in both docs, nothing in doc 3
    assert got == {(1, 3, 8, SHARED), (2, 0, 8, SHARED)}


def test_duplicate_spans_counts_within_doc_repeats(spark):
    df = _docs(spark, [(1, f"{SHARED} x y z {SHARED}")])
    got = sorted(
        (r["span_start"], r["span_tokens"])
        for r in duplicate_spans(df, min_len=4).collect()
    )
    assert got == [(0, 8), (11, 8)]


def test_duplicate_spans_merges_overlapping_grams_not_disjoint_ones(spark):
    # two separate duplicated regions in one doc must NOT merge across the gap
    df = _docs(
        spark,
        [
            (1, f"{SHARED} gapone gaptwo m n o p"),
            (2, f"{SHARED} other filler m n o p"),
        ],
    )
    got = sorted(
        (r["id"], r["span_start"], r["span_tokens"])
        for r in duplicate_spans(df, min_len=4).collect()
    )
    assert got == [(1, 0, 8), (1, 10, 4), (2, 0, 8), (2, 10, 4)]


def test_duplicate_spans_respects_min_count(spark):
    df = _docs(spark, [(1, f"x {SHARED}"), (2, f"y {SHARED}"), (3, f"z {SHARED}")])
    assert duplicate_spans(df, min_len=8, min_count=4).count() == 0
    assert duplicate_spans(df, min_len=8, min_count=3).count() == 3


def test_duplicate_spans_validates_params(spark):
    df = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError):
        duplicate_spans(df, min_len=0)
    with pytest.raises(ValueError):
        duplicate_spans(df, min_count=1)


def test_dedupe_spans_keeps_corpus_first_copy(spark):
    df = _docs(
        spark,
        [
            (1, f"p q r {SHARED} s t"),
            (2, f"{SHARED} u v w"),
            (3, "unrelated text entirely its own words"),
        ],
    )
    got = {r["doc_id"]: r["text"] for r in dedupe_spans(df, min_len=4).collect()}
    # doc 1 holds the canonical (min (id,pos)) copy and keeps it; doc 2 loses it
    assert got[1] == f"p q r {SHARED} s t"
    assert got[2] == "u v w"
    assert got[3] == "unrelated text entirely its own words"


def test_dedupe_spans_preserves_other_columns_and_normalizes(spark):
    df = spark.createDataFrame(
        [(7, f"KEEP, me! {SHARED}", "m7"), (8, f"{SHARED} tail-bit", "m8")],
        "doc_id long, text string, meta string",
    )
    got = {r["doc_id"]: (r["text"], r["meta"]) for r in dedupe_spans(df, min_len=8).collect()}
    # doc 7 is canonical (id 7 < 8): keeps the span, text normalized
    assert got[7] == (f"keep me {SHARED}", "m7")
    assert got[8] == ("tail bit", "m8")
