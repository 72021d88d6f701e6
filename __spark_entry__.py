"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction pipeline on transcripts
synthesized deterministically from the sf0.001 documents table and returns
the narration-chain edge table.  ``queries()``/``oracle_sql()`` expose the
operator catalog (SQL-oracled scalar/window/join/similarity queries +
rows-only KG pipeline stages); see
islamic_ner_spark/plans/driver_queries.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: transcripts -> NER -> triples -> linking -> graph ->
    narration-chain edges (ordered)."""
    from pyspark.sql import functions as F

    from islamic_ner_spark.plans.pipeline import build_graph
    from islamic_ner_spark.plans.staging import FLAGSHIP_TURNS_PER_CONV
    from islamic_ner_spark.sources.transcripts import transcripts_from_documents

    docs = spark.read.parquet(f"{SF0001}/documents.parquet").select("doc_id")
    transcripts = transcripts_from_documents(
        spark, docs, turns_per_conv=FLAGSHIP_TURNS_PER_CONV
    )
    result = build_graph(spark, transcripts)
    return (
        result.edges.where(F.col("pred") == "NARRATED_FROM")
        .select(
            "source_hadith",
            F.col("src_key").alias("source"),
            F.col("tgt_key").alias("target"),
            "confidence",
            "evidence",
        )
        .orderBy("source_hadith", "source", "target")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from islamic_ner_spark.plans.driver_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from islamic_ner_spark.plans.driver_queries import ORACLE_SQL

    return dict(ORACLE_SQL)
