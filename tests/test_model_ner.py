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


# ---------------------------------------------------------------------------
# M12 transformer-path core: chunking / word-window / max-seq truncation /
# first-subword labeling / O-fallback / BIO repair — exercised with a
# deterministic fake encoder so the logic runs without torch/transformers
# (parity target: WordLevelNER, scripts/build_graph.py:182-278).
# ---------------------------------------------------------------------------

import numpy as np

from islamic_ner_spark.operators.model_ner import make_word_predictor

ID2LABEL = {0: "O", 1: "B-SCHOLAR", 2: "I-SCHOLAR", 3: "B-BOOK", 4: "I-BOOK"}


def _fake_encode(chunk):
    """Each word -> 2 subwords bracketed by 2 special tokens (CLS/SEP).

    First subword of a word carries the word's 'true' logit; the SECOND
    subword deliberately votes for a DIFFERENT label so any implementation
    that doesn't take first-subword-only is caught.
    """
    word_ids = [None]
    rows = [np.zeros(5)]
    for wi, word in enumerate(chunk):
        if word.startswith("s"):
            first, second = 1, 3     # B-SCHOLAR, conflicting B-BOOK
        elif word.startswith("i"):
            first, second = 2, 0     # orphan I-SCHOLAR -> repair to B-
        elif word.startswith("b"):
            first, second = 3, 1
        else:
            first, second = 0, 1
        for sub, lab in ((0, first), (1, second)):
            row = np.zeros(5)
            row[lab] = 4.0           # softmax conf ~= e^4 / (e^4 + 4)
            word_ids.append(wi)
            rows.append(row)
    word_ids.append(None)
    rows.append(np.zeros(5))
    return word_ids, np.stack(rows)


def test_fake_model_first_subword_and_chunking() -> None:
    # 6 words, window 4 -> chunks [0:4] and [4:6]; every word covered
    words = ["said", "other", "book", "said2", "plain", "sx"]
    predict = make_word_predictor(_fake_encode, ID2LABEL, word_window=4, max_seq=512)
    labels, confidences = predict(words)
    assert labels == ["B-SCHOLAR", "O", "B-BOOK", "B-SCHOLAR", "O", "B-SCHOLAR"]
    expected_conf = float(np.exp(4.0) / (np.exp(4.0) + 4.0))
    for lab, conf in zip(labels, confidences):
        if lab != "O":
            assert abs(conf - expected_conf) < 1e-9
    assert len(labels) == len(confidences) == len(words)


def test_fake_model_max_seq_truncation_o_fallback() -> None:
    # 2 subwords/word after a CLS special: max_seq=6 keeps positions
    # [CLS, w0a, w0b, w1a, w1b, w2a] — word 3 of every 4-word window is
    # never encoded and must keep the safety O / 0.0 fallback
    words = ["s0", "s1", "s2", "s3", "s4", "s5", "s6", "s7"]
    predict = make_word_predictor(_fake_encode, ID2LABEL, word_window=4, max_seq=6)
    labels, confidences = predict(words)
    assert labels == ["B-SCHOLAR", "B-SCHOLAR", "B-SCHOLAR", "O"] * 2
    assert confidences[3] == 0.0 and confidences[7] == 0.0


def test_fake_model_orphan_inside_tag_repaired() -> None:
    # first word votes I-SCHOLAR with no preceding B- -> repair promotes
    # it to B-SCHOLAR (reference _repair_bio semantics)
    predict = make_word_predictor(_fake_encode, ID2LABEL, word_window=8, max_seq=512)
    labels, _ = predict(["inner", "other"])
    assert labels == ["B-SCHOLAR", "O"]


def test_numpy_encoder_distributed_matches_driver_replay(spark) -> None:
    """The deterministic numpy model (VERDICT r3 next #4) runs the SAME
    chunked word-window core end-to-end distributed; per-word labels and
    confidences from the Spark path must equal a driver-side replay of
    make_word_predictor over the normalized words — including rows long
    enough to span multiple 120-word chunks."""
    from islamic_ner_spark.functions.normalize import normalize
    from islamic_ner_spark.operators.model_ner import (
        NUMPY_ID2LABEL,
        deterministic_numpy_encoder,
        model_ner_labels,
    )

    long_text = " ".join(
        ["حدثنا", "مالك", "عن", "نافع", "قال", "الكتاب"] * 50
    )  # 300 words -> 3 chunks at word_window=120
    rows = [
        ("c1", 0, "user", long_text, "", None),
        ("c2", 0, "user", "short text only", "", None),
        ("c3", 0, "user", "", "", None),
    ]
    schema = ("conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    transcripts = spark.createDataFrame(rows, schema).repartition(3)
    got = {
        r["conv_id"]: r
        for r in model_ner_labels(transcripts, None, encoder="numpy").collect()
    }
    assert set(got) == {"c1", "c2", "c3"}

    predict = make_word_predictor(
        deterministic_numpy_encoder(), NUMPY_ID2LABEL, 120, 512
    )
    for conv_id, _, _, text, _, _ in rows:
        words = normalize(text or "").split()
        labels, confidences = predict(words)
        assert got[conv_id]["tokens"] == words
        assert got[conv_id]["labels"] == labels
        assert got[conv_id]["confidences"] == confidences

    # the long row genuinely exercises chunking and produces entities,
    # and every label is BIO-valid after repair
    long_labels = got["c1"]["labels"]
    assert len(long_labels) == 300
    assert any(l.startswith("B-") for l in long_labels)
    prev = "O"
    for label in long_labels:
        if label.startswith("I-"):
            assert prev in (f"B-{label[2:]}", f"I-{label[2:]}"), (prev, label)
        prev = label
