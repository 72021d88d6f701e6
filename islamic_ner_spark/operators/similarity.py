"""Similarity search over embedding columns: exact top-k + LSH scale path.

* :func:`brute_force_topk` — exact cosine top-k via zip_with/aggregate
  (JVM-side, whole-stage codegen); the correctness baseline.
* :func:`lsh_topk` — random-hyperplane LSH: signatures computed in numpy
  inside Arrow batches, candidates from multi-band bucket equi-joins,
  exact cosine re-scoring of candidates only.  At 100 TB this replaces
  the O(N^2) cross join with O(N * bucket_size) work; recall is tunable
  via (n_planes, bands).

Scores are rounded to 1e-6 with id tiebreaks so rankings are stable
across engines and partitionings.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _with_norm(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    vec = F.transform(vec_col, lambda x: x.cast("double"))
    return emb.select(
        F.col(id_col).alias("vid"),
        vec.alias("vec"),
        F.sqrt(F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x * x)).alias("nrm"),
    )


def _score(pairs: DataFrame) -> DataFrame:
    dot = F.aggregate(
        F.zip_with("qvec", "vec", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    return pairs.select(
        "qid",
        F.col("vid").alias("nid"),
        F.round(dot / (F.col("qnrm") * F.col("nrm")) * 1e6).cast("long").alias("cos_x1e6"),
    )


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("qid").orderBy(F.desc("cos_x1e6"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("qid", "rank", "nid", "cos_x1e6")
    )


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of each query vector against the corpus."""
    corpus = _with_norm(emb, id_col, vec_col)
    qs = _with_norm(queries, id_col, vec_col).select(
        F.col("vid").alias("qid"), F.col("vec").alias("qvec"), F.col("nrm").alias("qnrm")
    )
    pairs = qs.crossJoin(corpus).where(F.col("qid") != F.col("vid"))
    return _rank_topk(_score(pairs), k)


def hyperplane_signatures(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 7,
) -> DataFrame:
    """(vid, band_id, band_hash) — sign-bit signatures against seeded
    random hyperplanes, split into bands for multi-probe bucketing."""
    assert n_planes % bands == 0

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes = None
        rows_per_band = n_planes // bands
        for batch in batches:
            mat = np.array([np.asarray(v, dtype=np.float64) for v in batch[vec_col]])
            if planes is None and len(mat):
                rng = np.random.RandomState(seed)
                planes = rng.normal(size=(mat.shape[1], n_planes))
            if not len(mat):
                yield pd.DataFrame({"vid": [], "band_id": [], "band_hash": []})
                continue
            bits = (mat @ planes) > 0  # (n, n_planes)
            out_vid, out_band, out_hash = [], [], []
            for vid, row in zip(batch[id_col], bits):
                for band in range(bands):
                    chunk = row[band * rows_per_band : (band + 1) * rows_per_band]
                    digest = hashlib.blake2b(
                        np.packbits(chunk).tobytes() + bytes([band]), digest_size=8
                    ).hexdigest()
                    out_vid.append(vid)
                    out_band.append(band)
                    out_hash.append(digest)
            yield pd.DataFrame({"vid": out_vid, "band_id": out_band, "band_hash": out_hash})

    return emb.select(id_col, vec_col).mapInPandas(
        run, schema="vid long, band_id int, band_hash string"
    )


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: bucket-join candidates, exact re-score.

    A query's candidate set is every vector sharing at least one band
    bucket with it; only those pairs get the exact cosine."""
    corpus_sig = hyperplane_signatures(
        emb, id_col=id_col, vec_col=vec_col, n_planes=n_planes, bands=bands, seed=seed
    )
    query_sig = hyperplane_signatures(
        queries, id_col=id_col, vec_col=vec_col, n_planes=n_planes, bands=bands, seed=seed
    ).select(
        F.col("vid").alias("qid"), F.col("band_id").alias("qband"), F.col("band_hash").alias("qhash")
    )

    candidates = (
        query_sig.join(
            corpus_sig,
            on=[
                F.col("qband") == F.col("band_id"),
                F.col("qhash") == F.col("band_hash"),
            ],
        )
        .where(F.col("qid") != F.col("vid"))
        .select("qid", "vid")
        .distinct()
    )
    return topk_from_candidates(
        emb, queries, candidates, k=k, id_col=id_col, vec_col=vec_col
    )


def topk_from_candidates(
    emb: DataFrame,
    queries: DataFrame,
    candidates: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine re-scoring + per-query ranking of a candidate set
    ``(qid, vid)`` — the relational tail shared by every ANN variant
    (and independently replayable by a SQL oracle)."""
    corpus = _with_norm(emb, id_col, vec_col)
    qs = _with_norm(queries, id_col, vec_col).select(
        F.col("vid").alias("qid2"), F.col("vec").alias("qvec"), F.col("nrm").alias("qnrm")
    )
    pairs = (
        candidates.join(corpus, "vid")
        .join(qs, F.col("qid") == F.col("qid2"))
        .drop("qid2")
    )
    return _rank_topk(_score(pairs), k)


def embedding_candidate_pairs(sigs: DataFrame) -> DataFrame:
    """Unordered candidate pairs (id_a < id_b) from a hyperplane
    signature table — corpus self-join on shared band buckets."""
    return (
        sigs.alias("a")
        .join(
            sigs.alias("b"),
            on=[
                F.col("a.band_id") == F.col("b.band_id"),
                F.col("a.band_hash") == F.col("b.band_hash"),
                F.col("a.vid") < F.col("b.vid"),
            ],
        )
        .select(F.col("a.vid").alias("id_a"), F.col("b.vid").alias("id_b"))
        .distinct()
    )


def cosine_pair_scores(emb: DataFrame, pairs: DataFrame, *, id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """Exact cosine (x1e6, integer) for explicit (id_a, id_b) pairs."""
    corpus = _with_norm(emb, id_col, vec_col)
    a = corpus.select(F.col("vid").alias("id_a"), F.col("vec").alias("qvec"),
                      F.col("nrm").alias("qnrm"))
    b = corpus.select(F.col("vid").alias("id_b"), "vec", "nrm")
    dot = F.aggregate(
        F.zip_with("qvec", "vec", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return (
        pairs.join(a, "id_a").join(b, "id_b")
        .select(
            "id_a", "id_b",
            F.round(dot / (F.col("qnrm") * F.col("nrm")) * 1e6).cast("long")
            .alias("cos_x1e6"),
        )
    )


def embedding_near_duplicates(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold_x1e6: int = 800_000,
    n_planes: int = 32,
    bands: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Embedding-cosine near-duplicate grouping: hyperplane-LSH candidate
    pairs -> exact cosine re-score (integer x1e6, engine-exact) ->
    connected components.  Returns (id, group) with group = the cluster's
    numeric min id (matching the other near-dup operators); singletons
    omitted.  Never all-pairs: candidate count is
    bounded by bucket co-occupancy, tunable via (n_planes, bands)."""
    sigs = hyperplane_signatures(
        emb, id_col=id_col, vec_col=vec_col, n_planes=n_planes, bands=bands, seed=seed
    )
    candidates = embedding_candidate_pairs(sigs)
    scored = cosine_pair_scores(emb, candidates, id_col=id_col, vec_col=vec_col)
    edges = scored.where(F.col("cos_x1e6") >= threshold_x1e6).select(
        F.col("id_a").cast("string").alias("src"),
        F.col("id_b").cast("string").alias("dst"),
    )
    from islamic_ner_spark.operators.components import (
        connected_components,
        numeric_groups,
    )

    return numeric_groups(connected_components(edges))


def topk_recall(approx: DataFrame, exact: DataFrame) -> float:
    """Recall of the approximate neighbor set vs the exact one."""
    hits = approx.select("qid", "nid").intersect(exact.select("qid", "nid")).count()
    total = exact.count()
    return hits / total if total else 1.0
