from data_sync_tool_spark.operators.transcripts import (
    assemble_transcripts,
    transcript_dup_groups,
)


def _final(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )


def test_assemble_orders_turns_without_a_window(spark):
    # turns arrive shuffled across partitions; assembly must restore order
    df = _final(
        spark,
        [
            ("c1", 2, "assistant", "fine"),
            ("c1", 0, "user", "hi"),
            ("c1", 1, "assistant", "hello"),
            ("c2", 0, "user", "solo"),
        ],
    ).repartition(4)
    got = {r["conv_id"]: (r["n_turns"], r["transcript"]) for r in assemble_transcripts(df).collect()}
    assert got == {
        "c1": (3, "user: hi\nassistant: hello\nassistant: fine"),
        "c2": (1, "user: solo"),
    }


def test_assemble_handles_null_role_and_text(spark):
    df = _final(spark, [("c1", 0, None, "x"), ("c1", 1, "user", None)])
    got = assemble_transcripts(df).collect()[0]["transcript"]
    assert got == ": x\nuser: "


def test_dup_groups_fingerprint_exact_transcripts(spark):
    df = _final(
        spark,
        [
            ("a", 0, "user", "hi"),
            ("a", 1, "bot", "yo"),
            ("b", 0, "user", "hi"),
            ("b", 1, "bot", "yo"),
            ("c", 0, "user", "hi"),  # same first turn but shorter: distinct
        ],
    )
    got = {(r["conv_id"], r["canonical_id"]) for r in transcript_dup_groups(assemble_transcripts(df)).collect()}
    assert got == {("a", "a"), ("b", "a")}


def test_turn_boundaries_are_semantic(spark):
    # "hi\nbot: yo" as ONE turn renders identically to two separate turns,
    # but the framed fingerprint must keep them distinct
    merged = assemble_transcripts(
        _final(
            spark,
            [("x", 0, "user", "hi\nbot: yo"), ("y", 0, "user", "hi"), ("y", 1, "bot", "yo")],
        )
    )
    rows = {r["conv_id"]: r for r in merged.collect()}
    assert rows["x"]["transcript"] == rows["y"]["transcript"]
    assert rows["x"]["fp"] != rows["y"]["fp"]
    assert transcript_dup_groups(merged).count() == 0


def test_role_text_boundary_cannot_be_forged(spark):
    # role "a: b" + text "c" vs role "a" + text "b: c" — same rendered line
    a = assemble_transcripts(_final(spark, [("x", 0, "a: b", "c")]))
    b = assemble_transcripts(_final(spark, [("y", 0, "a", "b: c")]))
    fa, fb = a.collect()[0], b.collect()[0]
    assert fa["transcript"] == fb["transcript"]
    assert fa["fp"] != fb["fp"]


def _turn_rows(conv, turns, lsn0=0):
    return [
        {"conv_id": conv, "turn_idx": i, "role": r, "text": t, "lsn": lsn0 + i, "op": "upsert"}
        for i, (r, t) in enumerate(turns)
    ]


def test_assemble_changed_transcripts_incremental(spark, tmp_path):
    from data_sync_tool_spark.operators.transcripts import (
        assemble_changed_transcripts,
        assemble_transcripts,
    )
    from data_sync_tool_spark.sources.lake import LakeTable

    schema = "conv_id string, turn_idx int, role string, text string, lsn long, op string"
    table = LakeTable(spark, str(tmp_path / "turns"), ["conv_id", "turn_idx"], n_buckets=4)
    b1 = _turn_rows("conv-a", [("user", "hi"), ("bot", "hello")]) + _turn_rows(
        "conv-b", [("user", "q1"), ("bot", "a1")], lsn0=10
    )
    table.merge_into(spark.createDataFrame(b1, schema), batch_id="b1")
    lsn_after_b1 = 11
    # second batch touches only conv-b (update turn 1 + new turn 2)
    b2 = [
        {"conv_id": "conv-b", "turn_idx": 1, "role": "bot", "text": "a1-fixed", "lsn": 20, "op": "upsert"},
        {"conv_id": "conv-b", "turn_idx": 2, "role": "user", "text": "thanks", "lsn": 21, "op": "upsert"},
    ]
    table.merge_into(spark.createDataFrame(b2, schema), batch_id="b2")

    for max_pruned in (10_000, 0):  # zone-map-pruned path, then semi-join fallback
        got = assemble_changed_transcripts(table, lsn_after_b1, max_pruned_keys=max_pruned)
        rows = {r["conv_id"]: r for r in got.collect()}
        assert set(rows) == {"conv-b"}
        assert rows["conv-b"]["transcript"] == "user: q1\nbot: a1-fixed\nuser: thanks"
    # incremental result ≡ full reassembly restricted to the dirty conv
    full = {
        r["conv_id"]: r["fp"]
        for r in assemble_transcripts(table.read()).collect()
    }
    assert rows["conv-b"]["fp"] == full["conv-b"]


def test_assemble_changed_transcripts_empty_feed(spark, tmp_path):
    from data_sync_tool_spark.operators.transcripts import assemble_changed_transcripts
    from data_sync_tool_spark.sources.lake import LakeTable

    schema = "conv_id string, turn_idx int, role string, text string, lsn long, op string"
    table = LakeTable(spark, str(tmp_path / "turns2"), ["conv_id", "turn_idx"], n_buckets=2)
    table.merge_into(
        spark.createDataFrame(_turn_rows("c", [("user", "x")]), schema), batch_id="b1"
    )
    got = assemble_changed_transcripts(table, since_lsn=10**9)
    assert got.count() == 0
    assert got.columns == ["conv_id", "n_turns", "transcript", "fp"]
