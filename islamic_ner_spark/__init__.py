"""islamic_ner_spark — PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of the semantics of ``ablayed/islamic-ner``
(reference at /root/reference, read-only) as a Spark DataFrame / Arrow-UDF
dataflow over multi-turn transcript tables:

    transcripts(conv_id, turn_idx, role, text, tool, ts)
        -> normalize (column expressions, P1-P8)
        -> mention detection (broadcast Aho-Corasick + isnad patterns,
           one fused mapInPandas pass, M1-M15)
        -> triple extraction (R1-R6, same fused pass)
        -> entity linking (broadcast exact join L1, blocked fuzzy L2,
           connected-components canonicalization L3')
        -> graph materialize (MERGE-semantics aggregations A1-A6)
        -> graph queries (Q1-Q6, iterative BFS)

Design stance: DataFrame-declarative wherever Catalyst can optimize;
Python confined to batched pandas/Arrow UDFs (never per-row ``F.udf``);
joins broadcast where one side is a gazetteer/dimension; skew handled by
salting + AQE; every pipeline stage writes a partitioned parquet table
plus a lineage manifest and is independently resumable.
"""

__version__ = "0.1.0"
