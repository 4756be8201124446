import pytest

from data_sync_tool_spark.operators.bpe import (
    bpe_encode,
    bpe_token_counts,
    bpe_train,
    encode_word,
    train_bpe_on_word_counts,
)


def test_driver_merge_loop_classic_fixture():
    # Sennrich's running example: "low"x5 "lower"x2 "newest"x6 "widest"x3
    counts = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_bpe_on_word_counts(counts, 4)
    # most frequent pair is (e,s) 9, then (es,t) 9, then (l,o) 7, (lo,w) 7
    assert merges == [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]


def test_encode_word_applies_merges_by_rank():
    merges = [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]
    ranks = {m: i for i, m in enumerate(merges)}
    assert encode_word("newest", ranks) == ["n", "e", "w", "est"]
    assert encode_word("lowest", ranks) == ["low", "est"]
    assert encode_word("xyz", ranks) == ["x", "y", "z"]  # unknown chars pass through
    assert encode_word("", ranks) == []


def test_bpe_train_matches_sequential_reference(spark):
    rows = [(i, " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3))
            for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(5)
    got = bpe_train(df, n_merges=4)
    ref = train_bpe_on_word_counts(
        [("low", 20), ("lower", 8), ("newest", 24), ("widest", 12)], 4
    )
    assert got == ref


def test_bpe_train_deterministic_across_partitionings(spark):
    rows = [(i, f"alpha beta gamma delta doc{i % 7} alpha beta") for i in range(60)]
    a = bpe_train(spark.createDataFrame(rows, "doc_id long, text string").repartition(2), 10)
    b = bpe_train(spark.createDataFrame(rows, "doc_id long, text string").repartition(13), 10)
    assert a == b and len(a) == 10


def test_bpe_encode_matches_driver_reference(spark):
    rows = [(i, f"lowest newest wideness Lower, NEWEST! doc-{i}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(6)
    merges = bpe_train(df, n_merges=12)
    ranks = {m: i for i, m in enumerate(merges)}
    got = {r["doc_id"]: r["bpe_tokens"] for r in bpe_encode(df, merges).collect()}
    from data_sync_tool_spark.operators.decontam import _tokens  # noqa: F401

    import re

    for i, text in rows:
        words = [w for w in re.sub(r"[^0-9a-z]", " ", text.lower()).split() if w]
        expect = [t for w in words for t in encode_word(w, ranks)]
        assert got[i] == expect


def test_bpe_token_counts_and_validation(spark):
    df = spark.createDataFrame([(1, "aa aa ab")], "doc_id long, text string")
    merges = bpe_train(df, n_merges=1)
    assert merges == [("a", "a")]
    got = bpe_token_counts(df, merges).collect()[0]
    assert (got["id"], got["n_bpe_tokens"]) == (1, 4)  # [aa] [aa] [aa b]->2
    with pytest.raises(ValueError):
        bpe_train(df, n_merges=-1)


def test_bpe_token_stats_query_matches_sequential_reference_at_sf0001(spark):
    import re

    from data_sync_tool_spark.operators.bpe import bpe_train
    from data_sync_tool_spark.queries import catalog, read_table

    sf = "/root/testdata/sf0.001"
    docs = read_table(spark, sf, "documents")
    merges = bpe_train(docs, n_merges=64)
    ranks = {m: i for i, m in enumerate(merges)}
    got = {r["doc_id"]: r["n_bpe_tokens"] for r in catalog()["bpe_token_stats"][0](spark, sf).collect()}
    rows = docs.select("doc_id", "text").collect()
    assert len(got) == len(rows)
    for r in rows:
        words = [w for w in re.sub(r"[^0-9a-z]", " ", (r["text"] or "").lower()).split() if w]
        assert got[r["doc_id"]] == sum(len(encode_word(w, ranks)) for w in words)
