"""Bucketed-table publish layer: co-located joins, correctness parity.

The plan assertions here (zero Exchange under the forced sort-merge
regime) are the point of the feature; scripts/plan_audit.py repeats
them against the staged sf0.01 graph.
"""

from __future__ import annotations

import contextlib

import pytest


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@contextlib.contextmanager
def _conf(spark, **kv):
    old = {k: spark.conf.get(k, None) for k in kv}
    try:
        for k, v in kv.items():
            spark.conf.set(k, v)
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@pytest.fixture()
def graph_frames(spark):
    nodes = spark.createDataFrame(
        [("Scholar", f"k{i}", 0.9) for i in range(60)],
        "label string, key string, confidence double",
    )
    edges = spark.createDataFrame(
        [
            (
                "NARRATED_FROM",
                "Scholar",
                f"k{i}",
                "Scholar",
                f"k{(i * 7 + 1) % 60}",
                0.8,
            )
            for i in range(60)
        ]
        + [("IN_BOOK", "Hadith", "h0", "Book", "b0", 1.0)],
        "pred string, src_label string, src_key string, "
        "tgt_label string, tgt_key string, confidence double",
    )
    return nodes, edges


def _publish(spark, nodes, edges, tmp_path, prefix):
    # explicit paths => external tables; the (static) warehouse dir is
    # never touched
    from islamic_ner_spark.sources.bucketed import publish_graph_tables

    return publish_graph_tables(
        spark, nodes, edges, tmp_path / "tables", prefix=prefix
    )


def test_colocated_join_has_no_exchange(spark, graph_frames, tmp_path) -> None:
    from islamic_ner_spark.sources.bucketed import expand_neighbors

    nodes, edges = graph_frames
    nt, et = _publish(spark, nodes, edges, tmp_path, "t1")
    try:
        with _conf(
            spark,
            **{
                "spark.sql.autoBroadcastJoinThreshold": "-1",
                "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
            },
        ):
            out = expand_neighbors(spark, nt, et)
            plan = _plan(out)
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, plan
            assert plan.count("Bucketed: true") == 2, plan
            assert out.count() == 60
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {nt}")
        spark.sql(f"DROP TABLE IF EXISTS {et}")


def test_bucketed_join_matches_plain_join(spark, graph_frames, tmp_path) -> None:
    from islamic_ner_spark.sources.bucketed import expand_neighbors

    nodes, edges = graph_frames
    nt, et = _publish(spark, nodes, edges, tmp_path, "t2")
    try:
        got = sorted(map(tuple, expand_neighbors(spark, nt, et).collect()))
        want = sorted(
            map(
                tuple,
                nodes.join(edges, nodes["key"] == edges["src_key"])
                .select(
                    nodes["key"],
                    nodes["label"],
                    edges["pred"],
                    edges["tgt_label"],
                    edges["tgt_key"],
                    edges["confidence"],
                )
                .collect(),
            )
        )
        assert got == want and len(got) == 60
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {nt}")
        spark.sql(f"DROP TABLE IF EXISTS {et}")
