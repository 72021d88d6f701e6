"""Dump .explain("formatted") for the round-6 touched queries.

Usage: python scripts/capture_plans_r06.py OUTDIR [SUFFIX]

Run from the repo whose plans you want (the round-start worktree for
"_before", the optimized tree for "_after") — tiny inputs, the plan
SHAPE is what the files witness.  Eagerly-checkpointed operators show
``Scan ExistingRDD`` where the pre-cut plans re-derived the whole
subtree; that difference is the point.
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    outdir = Path(sys.argv[1])
    suffix = sys.argv[2] if len(sys.argv) > 2 else ""
    outdir.mkdir(parents=True, exist_ok=True)
    sf_dir = "/root/testdata/sf0.01"

    from pyspark.sql import functions as F

    from islamic_ner_spark.operators.graph_analytics import (
        pagerank_integer,
        triangles,
    )
    from islamic_ner_spark.operators.queries import top_narrators
    from islamic_ner_spark.plans import driver_queries as dq
    from islamic_ner_spark.plans.pipeline import build_graph
    from islamic_ner_spark.session import build_session
    from islamic_ner_spark.sources.transcripts import synthetic_transcripts

    spark = build_session("capture_plans", master="local[8]", shuffle_partitions=8)

    def dump(name: str, df) -> None:
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        (outdir / f"{name}{suffix}.txt").write_text(buf.getvalue())
        print(f"wrote {name}{suffix}.txt")

    result = build_graph(spark, synthetic_transcripts(spark, 200, turns_per_conv=4))
    dump("kg_build_edges", result.edges)
    dump("kg_build_nodes", result.nodes)
    dump("kg_top_narrators", top_narrators(result.edges, k=20))
    dump("kg_pagerank", pagerank_integer(result.edges))
    dump("kg_triangles", triangles(result.edges))
    dump("repetition_filters", dq.QUERIES["repetition_filters"](spark, sf_dir))
    dump("model_ner", dq.QUERIES["model_ner"](spark, sf_dir))


if __name__ == "__main__":
    main()
