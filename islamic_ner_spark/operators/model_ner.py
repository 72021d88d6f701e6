"""Model-based NER stage (M12): chunked transformer labeling as a
pluggable Arrow-UDF, with the gazetteer+pattern path as fallback.

Parity target: WordLevelNER (scripts/build_graph.py:182-278) — word
windows of 120, max sequence 512, first-subword label per word, safety
O-fallback, BIO repair — and the API's model/fallback switch
(api/routes/ner.py:289-340).

The transformer stack is not installed in this container, so the model
path is gated behind import-try; construction raises a clear error unless
``allow_fallback=True``, in which case the stage degrades to the
reference's own model-free gazetteer semantics (identical to
operators/ner.annotate_transcripts).  The Spark-side shape — model loaded
once per executor process, batched inference inside ``mapInPandas``,
labels repaired and length-aligned — is real.
"""

from __future__ import annotations

from typing import Iterator, List, Optional

import pandas as pd
from pyspark.broadcast import Broadcast
from pyspark.sql import DataFrame

try:  # pragma: no cover - not installed in this container
    import torch  # noqa: F401
    from transformers import AutoModelForTokenClassification, AutoTokenizer  # noqa: F401

    HAVE_TRANSFORMERS = True
except ImportError:
    HAVE_TRANSFORMERS = False

LABELED_SCHEMA = (
    "conv_id string, turn_idx int, doc_id string, "
    "tokens array<string>, labels array<string>, confidences array<double>"
)

# label inventory of the deterministic in-sandbox model (mirrors the
# reference model's id2label: BIO over annotate.ENTITY_TYPES)
NUMPY_ID2LABEL = {
    0: "O",
    1: "B-SCHOLAR", 2: "I-SCHOLAR",
    3: "B-BOOK", 4: "I-BOOK",
    5: "B-CONCEPT", 6: "I-CONCEPT",
    7: "B-PLACE", 8: "I-PLACE",
    9: "B-HADITH_REF", 10: "I-HADITH_REF",
}


def deterministic_numpy_encoder(*, dim: int = 64, seed: int = 13):
    """A fully deterministic, dependency-free stand-in for the
    tokenizer + transformer forward pass, so the chunked model path
    (word windows, first-subword labels, max-seq truncation, safety
    O-fallback — scripts/build_graph.py:182-278) executes END-TO-END
    distributed in this sandbox (no torch available; VERDICT r3 next
    #4).

    Subword split mimics BPE shape: a word of length L becomes
    ``max(1, ceil(L/4))`` pieces, bracketed by [CLS]/[SEP] specials
    whose ``word_id`` is None — so multi-piece words exercise the
    first-subword rule and long chunks exercise truncation.  Logits are
    a seeded linear map over hashed char-trigram bag features: pure
    numpy + blake2b, identical on every executor, machine, and run.
    """
    import hashlib
    from functools import lru_cache

    import numpy as np

    rng = np.random.RandomState(seed)
    weights = rng.normal(size=(dim, len(NUMPY_ID2LABEL)))

    # word pieces are <= 4 chars drawn from a small corpus vocabulary, so
    # the distinct-piece set is tiny relative to the token stream; the
    # char-trigram hashing dominated the encoder's profile (~50%), and a
    # bounded memo removes it for repeats.  Cached arrays are never
    # mutated (np.stack copies), so sharing them is safe.
    @lru_cache(maxsize=1 << 17)
    def piece_features(piece: str) -> np.ndarray:
        vec = np.zeros(dim)
        bounded = f"^{piece}$"
        for i in range(len(bounded) - 2):
            bucket = int.from_bytes(
                hashlib.blake2b(
                    bounded[i : i + 3].encode("utf-8"), digest_size=4
                ).digest(),
                "big",
            )
            vec[bucket % dim] += 1.0
        return vec

    def encode(chunk: List[str]):
        word_ids: List[Optional[int]] = [None]
        rows = [piece_features("[CLS]")]
        for word_index, word in enumerate(chunk):
            n_pieces = max(1, (len(word) + 3) // 4)
            for p in range(n_pieces):
                word_ids.append(word_index)
                rows.append(piece_features(word[p * 4 : (p + 1) * 4]))
        word_ids.append(None)
        rows.append(piece_features("[SEP]"))
        return word_ids, np.stack(rows) @ weights

    return encode


def make_word_predictor(encode, id2label: dict, word_window: int, max_seq: int):
    """Model-agnostic word-level labeling core (WordLevelNER,
    scripts/build_graph.py:182-278): word windows of ``word_window``,
    first-subword label per word, safety O-fallback for words the
    (truncated) encoding never covers, BIO repair at the end.

    ``encode(chunk) -> (word_ids, logits)`` abstracts the tokenizer +
    forward pass: ``word_ids`` maps each encoded token position to its
    source word index (None for special tokens) truncated at ``max_seq``
    positions, ``logits`` is a float ndarray [n_tokens, n_labels].
    Separated from the transformers stack so the chunking logic is
    executable (and unit-tested with a deterministic fake) even where
    torch is not installed.
    """
    import numpy as np

    from islamic_ner_spark.functions.annotate import normalize_label, repair_bio

    # the label inventory is tiny and fixed per model — normalize each
    # entry once instead of per predicted word (normalize_label was ~12%
    # of the predictor's profile at bench scale)
    norm_label_of = {
        pred_id: normalize_label(str(label)) for pred_id, label in id2label.items()
    }

    def predict(words: List[str]) -> tuple[List[str], List[float]]:
        labels = ["O"] * len(words)
        confidences = [0.0] * len(words)
        for chunk_start in range(0, len(words), word_window):
            chunk = words[chunk_start : chunk_start + word_window]
            word_ids, logits = encode(chunk)
            word_ids = list(word_ids)[:max_seq]
            logits = np.asarray(logits, dtype=np.float64)[:max_seq]
            # softmax over the label axis for per-token confidence
            shifted = np.exp(logits - logits.max(axis=-1, keepdims=True))
            probabilities = shifted / shifted.sum(axis=-1, keepdims=True)
            prediction_ids = logits.argmax(axis=-1)
            seen = set()
            for token_index, word_id in enumerate(word_ids):
                if word_id is None or word_id in seen or word_id >= len(chunk):
                    continue
                seen.add(word_id)
                pred_id = int(prediction_ids[token_index])
                labels[chunk_start + word_id] = norm_label_of.get(pred_id, "O")
                confidences[chunk_start + word_id] = float(
                    probabilities[token_index, pred_id]
                )
        return repair_bio(labels), confidences

    return predict


def _predict_with_model(
    model_dir: str, word_window: int, max_seq: int
):  # pragma: no cover - requires transformers
    """Per-executor model closure (loaded once per python worker)."""
    import torch
    from transformers import AutoModelForTokenClassification, AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(model_dir)
    model = AutoModelForTokenClassification.from_pretrained(model_dir)
    model.eval()
    id2label = model.config.id2label

    def encode(chunk: List[str]):
        encoded = tokenizer(
            chunk,
            is_split_into_words=True,
            return_tensors="pt",
            truncation=True,
            max_length=max_seq,
        )
        with torch.no_grad():
            logits = model(**encoded).logits[0]
        return encoded.word_ids(batch_index=0), logits.numpy()

    return make_word_predictor(encode, id2label, word_window, max_seq)


def model_ner_labels(
    transcripts: DataFrame,
    gazetteer_bc: Optional[Broadcast],
    *,
    model_dir: Optional[str] = None,
    word_window: int = 120,
    max_seq: int = 512,
    allow_fallback: bool = True,
    encoder: str = "auto",
) -> DataFrame:
    """transcripts -> (tokens, labels, confidences) via model NER.

    ``encoder`` selects the model stack: ``"auto"`` uses transformers
    when installed and ``model_dir`` is given, else the gazetteer
    fallback; ``"numpy"`` runs the SAME chunked word-window core through
    :func:`deterministic_numpy_encoder` (executable + oracle-checkable
    in this sandbox, no torch); the fallback emits B=0.75/I=0.7 word
    confidences exactly like the API's fallback (ner.py:145-188)."""
    use_model = encoder != "numpy" and bool(model_dir) and HAVE_TRANSFORMERS
    if encoder != "numpy" and not use_model and not allow_fallback:
        raise RuntimeError(
            "transformers/torch not available and allow_fallback=False "
            "(install the model stack or use the gazetteer path)"
        )
    if encoder != "numpy" and not use_model and gazetteer_bc is None:
        raise ValueError("gazetteer_bc is required for the fallback path")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from islamic_ner_spark.functions.annotate import annotate_raw
        from islamic_ner_spark.functions.normalize import normalize

        gazetteer = gazetteer_bc.value if gazetteer_bc is not None else None
        if encoder == "numpy":
            predict = make_word_predictor(
                deterministic_numpy_encoder(), NUMPY_ID2LABEL, word_window, max_seq
            )
        else:
            predict = (
                _predict_with_model(model_dir, word_window, max_seq)
                if use_model
                else None
            )
        for batch in batches:
            doc_ids = batch["conv_id"].astype(str) + ":" + batch["turn_idx"].astype(str)
            token_rows, label_rows, conf_rows = [], [], []
            for text in batch["text"]:
                ntext = normalize(text or "")
                words = ntext.split()
                if predict is not None:
                    labels, confidences = predict(words)
                else:
                    _, labels = annotate_raw(ntext, gazetteer, is_normalized=True)
                    confidences = [
                        0.75 if l.startswith("B-") else 0.7 if l.startswith("I-") else 0.0
                        for l in labels
                    ]
                token_rows.append(words)
                label_rows.append(labels)
                conf_rows.append(confidences)
            yield pd.DataFrame(
                {
                    "conv_id": batch["conv_id"],
                    "turn_idx": batch["turn_idx"],
                    "doc_id": doc_ids,
                    "tokens": token_rows,
                    "labels": label_rows,
                    "confidences": conf_rows,
                }
            )

    return transcripts.mapInPandas(run, schema=LABELED_SCHEMA)
