"""Dataset stats (A7-A10, P12), ingestion (S2-S3), and evaluation (E1)."""

from __future__ import annotations

from pathlib import Path

from islamic_ner_spark.functions.annotate import merge_allowed_labels, word_offsets
from islamic_ner_spark.functions.eval import span_prf, span_prf_df
from islamic_ner_spark.operators.stats import (
    entity_type_counts,
    label_distribution,
    oversample_to_targets,
    seeded_split,
    training_filter,
)
from islamic_ner_spark.sources.ingest import detect_text_column, read_csv_with_fallback

LABELED_SCHEMA = "conv_id string, turn_idx int, tokens array<string>, labels array<string>"


def _labeled(spark):
    rows = [
        ("d1", 0, ["a"] * 6, ["O", "B-SCHOLAR", "I-SCHOLAR", "O", "B-CONCEPT", "O"]),
        ("d2", 0, ["b"] * 3, ["O", "O", "O"]),                    # no entity -> filtered
        ("d3", 0, ["c"] * 140, ["B-BOOK"] + ["O"] * 139),          # too long -> filtered
        ("d4", 0, ["d"] * 5, ["B-PLACE", "O", "O", "O", "B-PLACE"]),
    ]
    return spark.createDataFrame(rows, LABELED_SCHEMA)


def test_label_distribution_and_counts(spark) -> None:
    df = _labeled(spark)
    dist = {r["label"]: (r["n"], r["pct"]) for r in label_distribution(df).collect()}
    total = 6 + 3 + 140 + 5
    assert dist["B-SCHOLAR"][0] == 1
    assert dist["O"][0] == total - 6
    assert abs(dist["B-PLACE"][1] - round(2 / total * 100, 3)) < 1e-9

    counts = {r["entity_type"]: r["n"] for r in entity_type_counts(df).collect()}
    assert counts == {"SCHOLAR": 1, "CONCEPT": 1, "BOOK": 1, "PLACE": 2}


def test_training_filter(spark) -> None:
    kept = training_filter(_labeled(spark)).select("conv_id").collect()
    assert sorted(r["conv_id"] for r in kept) == ["d1", "d4"]


def test_seeded_split_deterministic(spark) -> None:
    df = spark.range(1000)
    a1, b1, c1 = seeded_split(df, (0.8, 0.1, 0.1), seed=7)
    a2, b2, c2 = seeded_split(df, (0.8, 0.1, 0.1), seed=7)
    assert a1.count() == a2.count() and b1.count() == b2.count()
    assert a1.count() + b1.count() + c1.count() == 1000


def test_oversample_to_targets(spark) -> None:
    df = _labeled(spark)
    boosted = oversample_to_targets(df, {"PLACE": 6}, seed=3)
    counts = {r["entity_type"]: r["n"] for r in entity_type_counts(boosted).collect()}
    assert counts["PLACE"] >= 6
    # non-targeted types only grow via cloned records, never shrink
    assert counts["SCHOLAR"] >= 1


def test_merge_allowed_labels() -> None:
    base = ["O", "B-SCHOLAR", "I-SCHOLAR", "O", "O"]
    cand = ["B-PLACE", "I-PLACE", "O", "O", "B-CONCEPT"]
    merged = merge_allowed_labels(base, cand, {"PLACE", "CONCEPT"})
    # PLACE span overlaps occupied slot 1 -> rejected; CONCEPT lands on O
    assert merged == ["O", "B-SCHOLAR", "I-SCHOLAR", "O", "B-CONCEPT"]


def test_word_offsets() -> None:
    text = "ab  cd ab"
    assert word_offsets(text, ["ab", "cd", "ab"]) == [(0, 2), (4, 6), (7, 9)]


def test_read_csv_with_fallback_cp1256(spark, tmp_path: Path) -> None:
    path = tmp_path / "arabic.csv"
    content = "id,text\n1,مرحبا\n2,سلام\n"
    path.write_bytes(content.encode("cp1256"))
    df = read_csv_with_fallback(spark, str(path))
    rows = {int(r["id"]): r["text"] for r in df.collect()}
    assert rows[1] == "مرحبا"


def test_detect_text_column(spark) -> None:
    rows = [
        ("x", "<SANAD>حدثنا فلان</SANAD>", "nope"),
        ("y", "<MATN>نص</MATN>", "nothing"),
        ("z", "plain", "plain"),
    ]
    df = spark.createDataFrame(rows, "a string, b string, c string")
    assert detect_text_column(df) == "b"
    assert detect_text_column(df.select("a", "c")) is None


def test_span_prf_python_and_df(spark) -> None:
    gold = [
        (["t"] * 5, ["O", "B-SCHOLAR", "I-SCHOLAR", "O", "B-CONCEPT"]),
        (["t"] * 3, ["B-BOOK", "I-BOOK", "O"]),
    ]
    pred = [
        (["t"] * 5, ["O", "B-SCHOLAR", "I-SCHOLAR", "O", "O"]),     # missed concept
        (["t"] * 3, ["B-BOOK", "I-BOOK", "B-PLACE"]),               # spurious place
    ]
    scores = span_prf(gold, pred)
    assert scores["gold"] == 3 and scores["pred"] == 3 and scores["matched"] == 2
    assert abs(scores["f1"] - 2 / 3) < 1e-9

    gold_df = spark.createDataFrame(
        [("g1", gold[0][0], gold[0][1]), ("g2", gold[1][0], gold[1][1])],
        "doc_id string, tokens array<string>, labels array<string>",
    )
    pred_df = spark.createDataFrame(
        [("g1", pred[0][0], pred[0][1]), ("g2", pred[1][0], pred[1][1])],
        "doc_id string, tokens array<string>, labels array<string>",
    )
    df_scores = span_prf_df(gold_df, pred_df)
    assert df_scores["matched"] == 2 and df_scores["gold"] == 3 and df_scores["pred"] == 3


def test_validate_bio_dataset_distributed(spark) -> None:
    """Distributed BIO validity scan mirrors gold_annotation.py:153-210."""
    from islamic_ner_spark.operators.stats import validate_bio_dataset

    rows = [
        ("ok", ["t1", "t2", "t3"], ["B-SCHOLAR", "I-SCHOLAR", "O"]),
        ("orphan_i", ["t1", "t2"], ["O", "I-BOOK"]),
        ("type_switch", ["t1", "t2"], ["B-SCHOLAR", "I-BOOK"]),
        ("bad_tag", ["t1", "t2"], ["B-XYZ", "I-XYZ"]),
        ("after_invalid", ["t1", "t2"], ["B-XYZ", "I-SCHOLAR"]),
        ("mismatch", ["t1", "t2", "t3"], ["O", "O"]),
        ("empty", [], []),
    ]
    df = spark.createDataFrame(
        rows, "rec string, tokens array<string>, labels array<string>"
    )
    got = {r["rec"]: list(r["bio_errors"]) for r in validate_bio_dataset(df).collect()}

    assert "ok" not in got and "empty" not in got
    assert got["orphan_i"] == [
        "invalid I- continuation 'I-BOOK' at token_index=1; previous tag was 'O'"
    ]
    assert got["type_switch"] == [
        "invalid I- continuation 'I-BOOK' at token_index=1; previous tag was 'B-SCHOLAR'"
    ]
    # invalid tags error, and reset the state machine -> the following
    # I- is an orphan even though a tag precedes it
    assert got["bad_tag"] == [
        "invalid tag 'B-XYZ' at token_index=0",
        "invalid tag 'I-XYZ' at token_index=1",
    ]
    assert got["after_invalid"] == [
        "invalid tag 'B-XYZ' at token_index=0",
        "invalid I- continuation 'I-SCHOLAR' at token_index=1; previous tag was 'B-XYZ'",
    ]
    assert got["mismatch"] == ["token/tag length mismatch: 3 tokens vs 2 tags"]


def test_oversample_candidate_cap(spark) -> None:
    """The candidate collect is bounded; capped runs still hit targets."""
    from pyspark.sql import functions as F

    from islamic_ner_spark.operators.stats import oversample_to_targets

    rows = [
        (f"c{i}", ["t"] * 6, ["B-SCHOLAR", "O", "O", "O", "O", "O"])
        for i in range(50)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, tokens array<string>, labels array<string>"
    )
    boosted = oversample_to_targets(
        df, {"SCHOLAR": 80}, max_candidates=10
    )
    n_scholar = boosted.select(
        F.explode("labels").alias("l")
    ).where(F.col("l") == "B-SCHOLAR").count()
    assert n_scholar >= 80


def test_read_transcripts_jsonl_roundtrip(spark, tmp_path) -> None:
    """JSONL chat logs read through the schema-pinned reader feed the
    pipeline identically to parquet input."""
    from islamic_ner_spark.sources.transcripts import (
        TRANSCRIPTS_SCHEMA,
        read_transcripts,
        synthetic_transcripts,
    )

    transcripts = synthetic_transcripts(spark, 5, turns_per_conv=3)
    transcripts.write.json(str(tmp_path / "jsonl"))
    transcripts.write.parquet(str(tmp_path / "pq"))

    via_json = read_transcripts(spark, str(tmp_path / "jsonl"), source_format="json")
    via_parquet = read_transcripts(spark, str(tmp_path / "pq"))
    assert via_json.schema == via_parquet.schema
    assert sorted(map(tuple, via_json.collect())) == sorted(
        map(tuple, via_parquet.collect())
    )

    # malformed rows surface as nulls, not a dead job
    (tmp_path / "jsonl" / "bad.json").write_text('{"conv_id": "c9", "turn_idx": "NOT_AN_INT"}\n')
    rows = read_transcripts(spark, str(tmp_path / "jsonl"), source_format="json").collect()
    bad = [r for r in rows if r["conv_id"] == "c9"]
    assert len(bad) == 1 and bad[0]["turn_idx"] is None

    # CSV (header) round-trips too, including timestamp parsing
    transcripts.write.option("header", True).csv(str(tmp_path / "csv"))
    via_csv = read_transcripts(spark, str(tmp_path / "csv"), source_format="csv")
    assert sorted(map(tuple, via_csv.collect())) == sorted(
        map(tuple, via_parquet.collect())
    )

    import pytest

    with pytest.raises(ValueError, match="unsupported"):
        read_transcripts(spark, str(tmp_path / "pq"), source_format="xml")
