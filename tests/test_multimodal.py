"""Multimodal column plumbing (schemas, Arrow batches, deterministic stubs)."""

from __future__ import annotations

from islamic_ner_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_media,
    extract_features,
    sample_frames,
    synthetic_media,
)


def test_synthetic_media_schema_and_determinism(spark) -> None:
    media = synthetic_media(spark, 12)
    rows = {r["media_id"]: r for r in media.collect()}
    assert len(rows) == 12
    assert set(r["kind"] for r in rows.values()) == {"image", "audio", "video"}
    again = {r["media_id"]: r for r in synthetic_media(spark, 12).collect()}
    assert bytes(rows[3]["payload"]) == bytes(again[3]["payload"])
    assert rows[3]["meta"]["codec"] == "synthetic-v1"


def test_decode_media(spark) -> None:
    decoded = {r["media_id"]: r for r in decode_media(synthetic_media(spark, 9)).collect()}
    assert len(decoded) == 9
    for r in decoded.values():
        assert 16 <= r["width"] < 64
        assert 16 <= r["height"] < 64
        assert 1 <= r["n_frames"] <= 8
        assert r["n_bytes"] > 10


def test_extract_features_feeds_similarity(spark) -> None:
    media = synthetic_media(spark, 30)
    feats = extract_features(media)
    rows = feats.collect()
    assert all(len(r["features"]) == FEATURE_DIM for r in rows)

    # plumbing into the ANN operator: rename and run brute-force topk
    from pyspark.sql import functions as F

    from islamic_ner_spark.operators.similarity import brute_force_topk

    emb = feats.select(F.col("media_id").alias("vec_id"), F.col("features").alias("embedding"))
    topk = brute_force_topk(emb, emb.where(F.col("vec_id") < 3), k=2)
    assert topk.count() == 6


def test_sample_frames(spark) -> None:
    media = synthetic_media(spark, 12)
    frames = sample_frames(media, every_n=2).collect()
    assert frames, "expected at least one video row"
    for r in frames:
        assert r["frame_idx"] % 2 == 0
        assert len(bytes(r["frame_bytes"])) > 0
