"""Model-NER stage plumbing: fallback path + model-required error."""

from __future__ import annotations

import pytest

from islamic_ner_spark.operators.model_ner import HAVE_TRANSFORMERS, model_ner_labels
from islamic_ner_spark.plans.pipeline import DEFAULT_GAZETTEER_DIR
from islamic_ner_spark.sources.gazetteer import Gazetteer


def test_fallback_labels_match_gazetteer_path(spark) -> None:
    bc = spark.sparkContext.broadcast(Gazetteer.from_dir(DEFAULT_GAZETTEER_DIR))
    rows = [("c1", 0, "assistant", "حدثنا عبد الله عن مالك", None, None)]
    transcripts = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    out = model_ner_labels(transcripts, bc).collect()
    assert len(out) == 1
    row = out[0]
    assert row["labels"][1] == "B-SCHOLAR"
    # gazetteer-fallback confidences: 0.75 for B-, 0.7 for I-, 0 for O
    for label, conf in zip(row["labels"], row["confidences"]):
        expected = 0.75 if label.startswith("B-") else 0.7 if label.startswith("I-") else 0.0
        assert conf == expected


@pytest.mark.skipif(HAVE_TRANSFORMERS, reason="transformer stack present")
def test_model_required_raises_without_stack(spark) -> None:
    bc = spark.sparkContext.broadcast(Gazetteer.from_dir(DEFAULT_GAZETTEER_DIR))
    transcripts = spark.createDataFrame(
        [("c1", 0, None, "x", None, None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    with pytest.raises(RuntimeError, match="transformers"):
        model_ner_labels(transcripts, bc, model_dir="/nonexistent", allow_fallback=False)
