"""Document chunking operator (operators/chunking.py)."""

from __future__ import annotations

import pytest

from data_sync_tool_spark.operators.chunking import chunk_documents


def _chunks(spark, text, chunk_chars=10, overlap=3):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = (
        chunk_documents(df, chunk_chars=chunk_chars, overlap=overlap)
        .orderBy("chunk_idx")
        .collect()
    )
    return [(r["chunk_idx"], r["chunk_text"], r["n_chars"]) for r in rows]


def test_short_doc_single_chunk(spark):
    assert _chunks(spark, "hello") == [(0, "hello", 5)]


def test_exact_boundary_single_chunk(spark):
    assert _chunks(spark, "0123456789") == [(0, "0123456789", 10)]


def test_overlap_and_tail_coverage(spark):
    text = "abcdefghijklmnopq"  # 17 chars, chunk 10, stride 7 -> 2 chunks
    out = _chunks(spark, text)
    assert out == [(0, "abcdefghij", 10), (1, "hijklmnopq", 10)]
    # consecutive chunks share exactly `overlap` characters
    assert out[0][1][-3:] == out[1][1][:3]


def test_reconstruction_covers_text(spark):
    text = "".join(chr(97 + i % 26) for i in range(100))
    out = _chunks(spark, text, chunk_chars=16, overlap=5)
    stride = 11
    rebuilt = out[0][1] + "".join(c[1][5:] for c in out[1:])
    assert rebuilt == text
    for idx, chunk, n in out:
        assert text[idx * stride : idx * stride + 16] == chunk
        assert n == len(chunk)


def test_empty_text_one_empty_chunk(spark):
    assert _chunks(spark, "") == [(0, "", 0)]


def test_invalid_overlap_rejected(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_chars=10, overlap=10)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_chars=10, overlap=-1)


# ---------------------------------------------------------------- packing

def _pack_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pack_sequences_hand_computed(spark):
    from data_sync_tool_spark.operators.chunking import pack_sequences

    # token counts: 3, 4, 2, 0 → starts 0, 3, 7, 9; budget 5
    df = _pack_docs(
        spark,
        [(1, "a b c"), (2, "d e f g"), (3, "h i"), (4, "")],
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["tok_start"], r["seq_id"], r["crosses_boundary"])
        for r in pack_sequences(df, budget=5).collect()
    }
    assert got == {
        1: (3, 0, 0, 0),   # [0,3) inside seq 0
        2: (4, 3, 0, 1),   # [3,7) spans seqs 0-1
        3: (2, 7, 1, 0),   # [7,9) inside seq 1
        4: (0, 9, 1, 0),   # empty doc occupies nothing, never crosses
    }


def test_pack_sequences_distributed_equals_sequential(spark):
    """The range-partitioned prefix sum must reproduce the one-partition
    layout exactly — on ids arriving in arbitrary partition order."""
    from data_sync_tool_spark.operators.chunking import pack_sequences

    rows = [(i * 17 % 101, "tok " * (i % 13)) for i in range(101)]
    df = _pack_docs(spark, rows).repartition(7)
    wide = {r["doc_id"]: tuple(r) for r in pack_sequences(df, 16, n_partitions=13).collect()}
    seq = {r["doc_id"]: tuple(r) for r in pack_sequences(df, 16, n_partitions=1).collect()}
    assert wide == seq
    # offsets are a contiguous layout: sorted starts stitch up exactly
    ordered = sorted(wide.values())
    pos = 0
    for _id, n, start, _s, _c in ordered:
        assert start == pos
        pos += n


def test_pack_sequences_validates_budget(spark):
    from data_sync_tool_spark.operators.chunking import pack_sequences

    with pytest.raises(ValueError):
        pack_sequences(_pack_docs(spark, [(1, "a")]), budget=0)


def test_packed_sequence_text_splits_docs_at_boundaries(spark):
    from data_sync_tool_spark.operators.chunking import packed_sequence_text

    df = _pack_docs(spark, [(1, "a b c"), (2, "d e f g"), (3, "h i")])
    got = {
        r["seq_id"]: (r["n_tokens"], r["seq_text"])
        for r in packed_sequence_text(df, budget=4).collect()
    }
    # stream: a b c d | e f g h | i  — doc 2 split across seqs 0/1
    assert got == {0: (4, "a b c d"), 1: (4, "e f g h"), 2: (1, "i")}


def test_packed_sequence_text_full_coverage_and_order(spark):
    from data_sync_tool_spark.operators.chunking import packed_sequence_text

    rows = [(i, " ".join(f"t{i}x{j}" for j in range(i % 7))) for i in range(40)]
    df = _pack_docs(spark, rows).repartition(5)
    seqs = sorted(
        (r["seq_id"], r["seq_text"])
        for r in packed_sequence_text(df, budget=10, n_partitions=6).collect()
    )
    rebuilt = " ".join(t for _s, t in seqs)
    expected = " ".join(t for _i, t in rows if t)
    assert rebuilt == expected
