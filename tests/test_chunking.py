"""Document chunking: python replay of the window-start rule plus
edge cases (short doc, exact multiple, empty/whitespace doc)."""

from __future__ import annotations

import hashlib
import random

import pytest

from islamic_ner_spark.operators.packing import chunk_documents

DOC_SCHEMA = "doc_id long, text string"


def _py_chunks(text, chunk_words, overlap):
    words = text.strip().split()
    if not words:
        return []
    n, step = len(words), chunk_words - overlap
    out, s = [], 1
    while s <= n and (s == 1 or s + overlap <= n):
        piece = words[s - 1 : s - 1 + chunk_words]
        out.append(
            (
                s,
                len(piece),
                hashlib.md5(" ".join(piece).encode()).hexdigest(),
            )
        )
        s += step
    return out


@pytest.mark.parametrize(
    "chunk_words,overlap", [(5, 2), (100, 20), (4, 0), (3, 2)]
)
def test_chunks_match_python_replay(spark, chunk_words, overlap) -> None:
    rng = random.Random(17)
    texts = [
        " ".join(f"w{rng.randint(0, 30)}" for _ in range(n))
        for n in (0, 1, 2, 3, 4, 5, 7, 10, 11, 12, 40, 101)
    ] + ["   ", "one"]
    docs = spark.createDataFrame(list(enumerate(texts)), DOC_SCHEMA)
    got = {}
    rows = chunk_documents(
        docs, chunk_words=chunk_words, overlap=overlap
    ).collect()
    for r in rows:
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["start_word"], r["n_words"], r["chunk_md5"])
        )
    for doc_id, text in enumerate(texts):
        expect = [
            (i, s, n, h)
            for i, (s, n, h) in enumerate(
                _py_chunks(text, chunk_words, overlap)
            )
        ]
        assert sorted(got.get(doc_id, [])) == expect, f"doc {doc_id}"


def test_chunks_reject_bad_overlap(spark) -> None:
    docs = spark.createDataFrame([(0, "a b c")], DOC_SCHEMA)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_words=5, overlap=5)
