"""BPE tokenizer training: Spark operator vs a pure-Python replay.

The Python reference below implements the classic sequential algorithm
(Sennrich et al. 2016 `learn_bpe`, doc-level variant without
end-of-word markers, greedy leftmost-non-overlapping merge, ties broken
lexicographically) — the relational formulation in operators/bpe.py
must reproduce it exactly.  Test texts stay ASCII so the Python re
module's character classes coincide with the Java/RE2 ``\\p{L}`` ones.
"""

from __future__ import annotations

import re
from collections import Counter

import pytest

from islamic_ner_spark.operators.bpe import learn_bpe, word_frequencies

_ASCII_PRETOKEN = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+"


def py_bpe(texts, n_merges, vocab_cap=512):
    words = Counter()
    for t in texts:
        words.update(re.findall(_ASCII_PRETOKEN, t))
    top = sorted(words.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_cap]
    freq = dict(top)
    vocab = {w: list(w) for w, _ in top}
    merges = []
    for step in range(1, n_merges + 1):
        counts = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += freq[w]
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((step, a, b, c))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def _docs(spark, texts, n_partitions=None):
    df = spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(texts)], "doc_id STRING, text STRING"
    )
    return df.repartition(n_partitions) if n_partitions else df


CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest widest widest widest",
    "the lowest newest widest low, the lowest!",
]


def _learned(spark, texts, n_merges, **kw):
    rows = learn_bpe(_docs(spark, texts), n_merges=n_merges, **kw).collect()
    return [(r.step, r.left_sym, r.right_sym, r.pair_freq) for r in rows]


def test_matches_python_reference(spark):
    assert _learned(spark, CORPUS, 8) == py_bpe(CORPUS, 8)


def test_greedy_leftmost_overlap(spark):
    # 'aaaa' x3: pairs (a,a) at positions 1,2,3 -> count 9; the merge
    # keeps positions 1 and 3 (leftmost non-overlapping), so round 2
    # sees ['aa','aa'] and learns ('aa','aa') with count 3
    texts = ["aaaa aaaa aaaa"]
    got = _learned(spark, texts, 2)
    assert got == [(1, "a", "a", 9), (2, "aa", "aa", 3)]
    assert got == py_bpe(texts, 2)


def test_tie_breaks_lexicographic(spark):
    # 'ab' and 'cd' both appear twice -> counts tie at 2; ('a','b') wins
    texts = ["ab cd", "cd ab"]
    got = _learned(spark, texts, 1)
    assert got == [(1, "a", "b", 2)]
    assert got == py_bpe(texts, 1)


def test_partition_layout_invariant(spark):
    texts = CORPUS * 3
    wide = learn_bpe(_docs(spark, texts, n_partitions=7), n_merges=6).collect()
    narrow = learn_bpe(_docs(spark, texts, n_partitions=1), n_merges=6).collect()
    assert wide == narrow == [tuple(r) for r in wide]  # shape sanity
    assert [(r.step, r.left_sym, r.right_sym, r.pair_freq) for r in wide] == py_bpe(
        texts, 6
    )


def test_vocab_cap_is_deterministic(spark):
    # cap to 2 words: 'newest' (7) and 'low' (6) survive; merges are
    # learned from those only
    got = _learned(spark, CORPUS, 3, vocab_cap=2)
    assert got == py_bpe(CORPUS, 3, vocab_cap=2)


def test_word_frequencies_cap(spark):
    wf = word_frequencies(_docs(spark, CORPUS), vocab_cap=3).collect()
    assert len(wf) == 3
    assert wf[0].freq >= wf[1].freq >= wf[2].freq


def test_early_stop_when_fully_merged(spark):
    # single repeated 2-char word: only one merge is learnable
    got = _learned(spark, ["ab ab ab"], 5)
    assert got == [(1, "a", "b", 3)]


from islamic_ner_spark.operators.bpe import encode_corpus


def py_bpe_encode(texts, n_merges, vocab_cap=512):
    """Sequential replay of encode_corpus: train on the capped vocab,
    apply merges in learned order to every distinct word, report
    per-doc token stats."""
    merges = [(a, b) for _, a, b, _ in py_bpe(texts, n_merges, vocab_cap)]

    def enc_len(word):
        syms = list(word)
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    stats = {}
    for i, t in enumerate(texts):
        ws = re.findall(_ASCII_PRETOKEN, t)
        if not ws:
            continue
        n_tokens = sum(enc_len(w) for w in ws)
        stats[f"d{i}"] = (len(ws), n_tokens, (n_tokens * 1000) // len(ws))
    return stats


@pytest.mark.parametrize("n_partitions", [None, 7])
def test_encode_corpus_matches_python_replay(spark, n_partitions) -> None:
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"], r["tokens_per_word_x1000"])
        for r in encode_corpus(
            _docs(spark, CORPUS, n_partitions),
            n_merges=4,
            pattern=_ASCII_PRETOKEN,
        ).collect()
    }
    assert got == py_bpe_encode(CORPUS, n_merges=4)


def test_encode_corpus_covers_uncapped_words(spark) -> None:
    # vocab_cap=2 trains on two words only, but encoding must still
    # tokenize every corpus word (rare words outside the cap)
    texts = ["aa aa aa bb bb zz", "zz qq"]
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in encode_corpus(
            _docs(spark, texts),
            n_merges=2,
            vocab_cap=2,
            pattern=_ASCII_PRETOKEN,
        ).collect()
    }
    # trained merges on {aa, bb}: (a,a) then (b,b) -> 'aa','bb' single
    # tokens; 'zz'/'qq' stay two chars each
    assert got == {"d0": (6, 3 + 2 + 2), "d1": (2, 4)}
