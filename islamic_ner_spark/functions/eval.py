"""Entity-level evaluation (E1): seqeval-equivalent span P/R/F1.

Parity target: the reference evaluates NER with seqeval's
overall_precision/recall/f1 on BIO sequences — exact (type, start, end)
span match (run_camelbert_ablation.py:184-216).  Implemented here from
the definition (no seqeval dependency): spans are decoded with the same
state machine as relation extraction and matched as exact tuples.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from islamic_ner_spark.functions.relations import bio_to_entity_spans


def _span_tuples(tokens: Sequence[str], labels: Sequence[str]) -> List[Tuple[str, int, int]]:
    return [
        (str(s["type"]), int(s["start"]), int(s["end"]))
        for s in bio_to_entity_spans(list(tokens), list(labels))
    ]


def span_prf(
    gold: Sequence[Tuple[Sequence[str], Sequence[str]]],
    pred: Sequence[Tuple[Sequence[str], Sequence[str]]],
) -> Dict[str, float]:
    """Micro P/R/F1 over (doc, type, start, end) exact span matches."""
    n_gold = n_pred = n_hit = 0
    for (g_tokens, g_labels), (p_tokens, p_labels) in zip(gold, pred):
        g_spans = set(_span_tuples(g_tokens, g_labels))
        p_spans = set(_span_tuples(p_tokens, p_labels))
        n_gold += len(g_spans)
        n_pred += len(p_spans)
        n_hit += len(g_spans & p_spans)
    precision = n_hit / n_pred if n_pred else 0.0
    recall = n_hit / n_gold if n_gold else 0.0
    f1 = 2 * precision * recall / (precision + recall) if (precision + recall) else 0.0
    return {"precision": precision, "recall": recall, "f1": f1,
            "gold": n_gold, "pred": n_pred, "matched": n_hit}


def span_prf_df(gold: DataFrame, pred: DataFrame) -> Dict[str, float]:
    """DataFrame version: both inputs have (doc_id, tokens, labels);
    spans are decoded in an Arrow batch and matched with a join."""
    from islamic_ner_spark.operators.ner import annotate_labeled
    from islamic_ner_spark.operators.relations import extract_mentions

    def spans_of(df: DataFrame) -> DataFrame:
        prepared = annotate_labeled(
            df.select(
                F.col("doc_id").alias("conv_id"),
                F.lit(0).alias("turn_idx"),
                "tokens",
                "labels",
            )
        )
        return extract_mentions(prepared).select(
            F.col("conv_id").alias("gdoc_id"), "entity_type", "start_token", "end_token"
        ).distinct()

    g = spans_of(gold)
    p = spans_of(pred)
    n_gold = g.count()
    n_pred = p.count()
    n_hit = g.join(p, ["gdoc_id", "entity_type", "start_token", "end_token"]).count()
    precision = n_hit / n_pred if n_pred else 0.0
    recall = n_hit / n_gold if n_gold else 0.0
    f1 = 2 * precision * recall / (precision + recall) if (precision + recall) else 0.0
    return {"precision": precision, "recall": recall, "f1": f1,
            "gold": n_gold, "pred": n_pred, "matched": n_hit}
