"""Sequence packing (sample packing for training data)."""

from __future__ import annotations

from pyspark.sql import functions as F

from islamic_ner_spark.operators.packing import pack_sequences


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_packing_respects_capacity_and_order(spark) -> None:
    texts = ["w " * n for n in (5, 5, 5, 9, 2, 10, 1, 1)]  # token counts 5,5,5,9,2,10,1,1
    out = pack_sequences(_docs(spark, texts), capacity=10, n_groups=1).collect()
    rows = sorted((r["doc_id"], r["pack_id"], r["n_tokens"]) for r in out)
    # greedy walk at cap 10: [5,5] [5] [9] [2] wait: 5+5=10 ok; +5 -> 15>10 new;
    # 5+9=14>10 new; 9+2=11>10 new; 2+10=12>10 new; 10+1=11>10 new; 1+1=2 ok
    assert [r[1] for r in rows] == [0, 0, 1, 2, 3, 4, 5, 5]
    # per-pack totals never exceed capacity except single-doc packs
    totals: dict[int, list[int]] = {}
    for _, pack, n in rows:
        totals.setdefault(pack, []).append(n)
    for members in totals.values():
        assert sum(members) <= 10 or len(members) == 1


def test_packing_oversized_doc_gets_own_pack(spark) -> None:
    texts = ["a b", "x " * 50, "c d"]  # 2, 50, 2 tokens at cap 8
    out = {r["doc_id"]: r["pack_id"] for r in pack_sequences(
        _docs(spark, texts), capacity=8, n_groups=1
    ).collect()}
    assert out[0] == 0 and out[1] == 1 and out[2] == 2


def test_packing_deterministic_across_partitionings(spark) -> None:
    texts = [f"{'tok ' * (i % 7 + 1)}" for i in range(60)]
    docs = _docs(spark, texts)
    a = sorted(map(tuple, pack_sequences(docs, capacity=12, n_groups=4).collect()))
    b = sorted(map(tuple, pack_sequences(
        docs.repartition(13), capacity=12, n_groups=4
    ).collect()))
    assert a == b
    # groups are independent streams: every group id present
    assert {r[1] for r in a} == {0, 1, 2, 3}
