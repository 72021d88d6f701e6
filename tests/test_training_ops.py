"""Training-pipeline profiling operators: bigram quality, shard
assignment, class centroids, COO export — hand-computed expectations
plus partition invariance (every one of these is also DuckDB-oracled
in the driver harness; these tests pin the semantics at unit scale)."""

from __future__ import annotations

from islamic_ner_spark.plans.driver_queries import (
    q_bigram_quality,
    q_label_centroids,
    q_shard_assignment,
)


def _with_docs(spark, monkeypatch, rows):
    import islamic_ner_spark.plans.driver_queries as dq

    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    monkeypatch.setattr(dq, "_read", lambda s, d, t: df)
    return df


def test_bigram_quality_hand_docs(spark, monkeypatch) -> None:
    # "a b" occurs in 3 docs => common; "b c" in only 2 => not
    _with_docs(
        spark,
        monkeypatch,
        [
            (1, "a b c", "s"),
            (2, "a b c", "s"),
            (3, "a b", "s"),
            (4, "solo", "s"),
        ],
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["n_common"], r["conventional_x1000"])
        for r in q_bigram_quality(spark, "ignored").collect()
    }
    assert got == {
        1: (2, 1, 500),
        2: (2, 1, 500),
        3: (1, 1, 1000),
        4: (0, 0, 0),
    }


def test_bigram_quality_partition_invariant(spark, monkeypatch) -> None:
    rows = [
        (i, " ".join(f"w{(i * 3 + j) % 7}" for j in range(6)), "s")
        for i in range(30)
    ]
    import islamic_ner_spark.plans.driver_queries as dq

    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    monkeypatch.setattr(dq, "_read", lambda s, d, t: df.coalesce(1))
    a = sorted(map(tuple, q_bigram_quality(spark, "x").collect()))
    monkeypatch.setattr(dq, "_read", lambda s, d, t: df.repartition(7))
    b = sorted(map(tuple, q_bigram_quality(spark, "x").collect()))
    assert a == b and len(a) == 30


def test_shard_assignment_balances_tokens(spark, monkeypatch) -> None:
    # 80 docs of 10 tokens (bin 0) + 16 docs of 100 tokens (bin 1):
    # round-robin within each bin => every shard gets 10 small + 2 big
    rows = [(i, " ".join(["w"] * 10), "s") for i in range(80)] + [
        (100 + i, " ".join(["w"] * 100), "s") for i in range(16)
    ]
    _with_docs(spark, monkeypatch, rows)
    got = {
        r["shard"]: (r["n_docs"], r["sum_tokens"])
        for r in q_shard_assignment(spark, "ignored").collect()
    }
    assert got == {s: (12, 300) for s in range(8)}


def test_label_centroids_hand_vectors(spark, monkeypatch) -> None:
    import islamic_ner_spark.plans.driver_queries as dq

    df = spark.createDataFrame(
        [
            (0, [1.0, -0.5], 7),
            (1, [2.0, 0.5], 7),
            (2, [10.0, 0.25], 9),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    monkeypatch.setattr(dq, "_read", lambda s, d, t: df)
    got = {
        (r["label"], r["pos"]): r["centroid_x1e6"]
        for r in q_label_centroids(spark, "ignored").collect()
    }
    # label 7 pos 0: (1e6 + 2e6) div 2; pos 1: (-500000 + 500000) div 2
    assert got == {
        (7, 0): 1_500_000,
        (7, 1): 0,
        (9, 0): 10_000_000,
        (9, 1): 250_000,
    }


def test_snapshot_diff_statuses(spark) -> None:
    from islamic_ner_spark.operators.snapshot import snapshot_diff

    old = spark.createDataFrame(
        [("a", "x"), ("b", "y"), ("c", "z")], "doc_id STRING, text STRING"
    )
    new = spark.createDataFrame(
        [("a", "x"), ("b", "y2"), ("d", "w")], "doc_id STRING, text STRING"
    )
    got = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
    assert got == {"a": "unchanged", "b": "changed", "c": "deleted", "d": "added"}


def test_doc_keywords_integer_idf(spark) -> None:
    import os

    from islamic_ner_spark.plans.driver_queries import q_doc_keywords

    # 'rare' appears only in d0 -> df=1, N=2: score = 1*1000*2//1 = 2000
    # 'common' is in both docs -> df=2: score = tf*1000*2//2 = tf*1000
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(0, "rare common"), (1, "common common")],
            "doc_id LONG, text STRING",
        ).write.parquet(os.path.join(d, "documents.parquet"))
        rows = q_doc_keywords(spark, d).collect()
    by = {(r.doc_id, r.word): (r.score_x1000, r.rank) for r in rows}
    assert by[(0, "rare")] == (2000, 1)
    assert by[(0, "common")] == (1000, 2)
    assert by[(1, "common")] == (2000, 1)


def test_lm_surprise_hand_docs(spark, monkeypatch) -> None:
    # corpus bigrams: "a b" x2 (docs 1,2), "b c" x1 (doc 1)
    # cu: c(a)=2, c(b)=1; V (first-word vocab) = 2
    # s("a b") = (2+2) div (2+1) = 1;  s("b c") = (1+2) div (1+1) = 1
    _with_docs(
        spark,
        monkeypatch,
        [
            (1, "a b c", "s"),
            (2, "a b", "s"),
            (3, "solo", "s"),
            (4, "", "s"),
        ],
    )
    from islamic_ner_spark.plans.driver_queries import q_lm_surprise

    got = {
        r["doc_id"]: (r["n_bigrams"], r["surprise_sum"], r["avg_surprise_x100"])
        for r in q_lm_surprise(spark, "ignored").collect()
    }
    assert got == {
        1: (2, 2, 100),
        2: (1, 1, 100),
        3: (0, 0, 0),  # one word: no bigrams, zero-filled row kept
        4: (0, 0, 0),  # empty text: zero-filled row kept
    }


def test_lm_surprise_flags_unseen_continuations(spark, monkeypatch) -> None:
    # "the" starts many bigrams; the doc pairing it with a one-off
    # continuation must score strictly higher than the conventional one
    rows = [(i, "the cat sat", "s") for i in range(1, 7)]
    rows.append((7, "the zzzgibberish qq", "s"))
    _with_docs(spark, monkeypatch, rows)
    from islamic_ner_spark.plans.driver_queries import q_lm_surprise

    got = {
        r["doc_id"]: r["avg_surprise_x100"]
        for r in q_lm_surprise(spark, "ignored").collect()
    }
    assert got[7] > got[1]
    assert all(got[i] == got[1] for i in range(2, 7))


def test_role_transitions_hand_convs(spark) -> None:
    from islamic_ner_spark.operators.stats import role_transitions

    rows = [
        ("c1", 0, "user", None),
        ("c1", 1, "assistant", None),
        ("c1", 2, "tool", "search"),
        ("c1", 3, "assistant", None),
        ("c2", 0, "user", None),
        ("c2", 1, "assistant", None),
        ("c3", 0, "tool", None),  # tool turn with NULL tool name
        ("c3", 1, "assistant", None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, tool string"
    )
    got = {
        (r["prev_state"], r["state"]): (r["n_transitions"], r["n_convs"])
        for r in role_transitions(df).collect()
    }
    assert got == {
        ("user", "assistant"): (2, 2),
        ("assistant", "tool:search"): (1, 1),
        ("tool:search", "assistant"): (1, 1),
        ("tool:?", "assistant"): (1, 1),
    }


def test_role_transitions_partition_invariance(spark) -> None:
    # the lag window must order by turn_idx regardless of input layout
    from islamic_ner_spark.operators.stats import role_transitions

    rows = [
        ("c1", i, "user" if i % 2 == 0 else "assistant", None)
        for i in range(8)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, tool string"
    )
    one = {
        (r["prev_state"], r["state"]): (r["n_transitions"], r["n_convs"])
        for r in role_transitions(df.coalesce(1)).collect()
    }
    many = {
        (r["prev_state"], r["state"]): (r["n_transitions"], r["n_convs"])
        for r in role_transitions(df.repartition(8)).collect()
    }
    assert one == many == {
        ("user", "assistant"): (4, 1),
        ("assistant", "user"): (3, 1),
    }


def test_sft_pairs_hand_convs(spark) -> None:
    from islamic_ner_spark.operators.sft import sft_pairs

    rows = [
        # c1: user -> assistant -> tool -> tool -> assistant -> user -> assistant
        ("c1", 0, "user", "q1", None),
        ("c1", 1, "assistant", "a1", None),
        ("c1", 2, "tool", "t", "search"),
        ("c1", 3, "tool", "t", "fetch"),
        ("c1", 4, "assistant", "a2", None),
        ("c1", 5, "user", "q2", None),
        ("c1", 6, "assistant", "a3", None),
        # c2: assistant opener with no user before it -> dropped
        ("c2", 0, "assistant", "hello", None),
        ("c2", 1, "user", "q", None),
        ("c2", 2, "assistant", "a", None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    got = {
        (r["conv_id"], r["turn_idx"]): (
            r["prompt_turn_idx"], r["prompt"], r["response"],
            r["n_trace_tool_turns"],
        )
        for r in sft_pairs(df).collect()
    }
    assert got == {
        ("c1", 1): (0, "q1", "a1", 0),
        ("c1", 4): (0, "q1", "a2", 2),  # two tool turns in the trace
        ("c1", 6): (5, "q2", "a3", 0),  # trace resets at the new prompt
        ("c2", 2): (1, "q", "a", 0),    # opener emitted nothing
    }


def test_sft_pairs_partition_invariance(spark) -> None:
    from islamic_ner_spark.operators.sft import sft_pairs

    rows = []
    for c in range(6):
        for i in range(6):
            role = ("user", "assistant", "tool")[i % 3]
            rows.append(
                (f"c{c}", i, role, f"{role}-{c}-{i}",
                 "search" if role == "tool" else None)
            )
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    one = sorted(map(tuple, sft_pairs(df.coalesce(1)).collect()))
    many = sorted(map(tuple, sft_pairs(df.repartition(16)).collect()))
    assert one == many and len(one) == 12  # 2 assistant turns per conv


def test_tool_call_stats_hand_convs(spark) -> None:
    import datetime as dt

    from islamic_ner_spark.operators.stats import tool_call_stats

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    rows = [
        # c1: search answered after 7s, then fetch is the LAST turn (no followup)
        ("c1", 0, "user", "q", None, ts(0)),
        ("c1", 1, "tool", "t", "search", ts(10)),
        ("c1", 2, "assistant", "a", None, ts(17)),
        ("c1", 3, "tool", "t", "fetch", ts(20)),
        # c2: search answered after 3s; NULL tool name answered after 5s
        ("c2", 0, "tool", "t", "search", ts(0)),
        ("c2", 1, "assistant", "a", None, ts(3)),
        ("c2", 2, "tool", "t", None, ts(4)),
        ("c2", 3, "assistant", "a", None, ts(9)),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )
    got = {
        r["tool"]: (
            r["n_calls"], r["n_convs"], r["n_with_followup"],
            r["total_latency_s"], r["avg_latency_ms"],
        )
        for r in tool_call_stats(df).collect()
    }
    assert got == {
        "search": (2, 2, 2, 10, 5000),  # (7 + 3) s -> floor-mean 5000 ms
        "fetch": (1, 1, 0, 0, 0),       # trailing call: counted, no latency
        "?": (1, 1, 1, 5, 5000),        # NULL tool name bucketizes as '?'
    }


def test_assemble_conversations_order_and_invariance(spark) -> None:
    from islamic_ner_spark.operators.sft import assemble_conversations

    rows = [
        # deliberately out of turn order in the input
        ("c1", 2, "assistant", "done"),
        ("c1", 0, "user", "start"),
        ("c1", 1, "tool", "run"),
        ("c2", 0, "user", "hi"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    for frame in (df.coalesce(1), df.repartition(8)):
        got = {
            r["conv_id"]: (r["n_turns"], r["n_chars"], r["conversation"])
            for r in assemble_conversations(frame).collect()
        }
        assert got == {
            "c1": (3, 35, "user: start\ntool: run\nassistant: done"),
            "c2": (1, 8, "user: hi"),
        }


def test_sft_pair_quality_hand_convs(spark) -> None:
    from islamic_ner_spark.operators.sft import sft_pair_quality

    rows = [
        ("c1", 0, "user", "find the cat", None),
        ("c1", 1, "assistant", "the cat sat on the mat", None),  # echoes 2 words
        ("c2", 0, "user", "hello", None),
        ("c2", 1, "assistant", "hello", None),  # pure echo
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    got = {
        (r["conv_id"], r["turn_idx"]): (
            r["n_prompt_words"], r["n_response_words"], r["n_shared_words"],
            r["len_ratio_x100"],
        )
        for r in sft_pair_quality(df).collect()
    }
    # c1: prompt {find,the,cat}=3; response {the,cat,sat,on,mat}=5 distinct
    #     shared {the,cat}=2; chars 22 resp / 12 prompt -> 183
    # c2: 1/1 words, 1 shared, 5/5 chars -> 100
    assert got == {
        ("c1", 1): (3, 5, 2, 183),
        ("c2", 1): (1, 1, 1, 100),
    }
