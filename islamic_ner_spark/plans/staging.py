"""Oracle staging: materialize the Python/Arrow stage outputs to parquet
so every driver query's *relational tail* is SQL that BOTH engines run.

DuckDB cannot execute Aho-Corasick matching, SequenceMatcher scoring, or
blake2b minhashing — but everything downstream of those kernels (edge
MERGE aggregation, node variant-union/last-writer, connected components,
band-bucket candidate joins, top-k ranking) is relational.  Each stage
group writes its kernel outputs once per (sf_dir, STAGE_VERSION) under
``.stage/``; the Spark query then computes its answer from the staged
parquet with DataFrame operators, and the paired ``ORACLE_SQL`` entry
computes the same answer in DuckDB over the *same files* (connected
components via recursive CTE).  The result: a genuine differential test
of the relational tail instead of a rows-only count.

Staleness: a ``_STAGE_META.json`` records (sf_dir, version); any
mismatch wipes and rebuilds the group.  Bump ``STAGE_VERSION`` whenever
staged semantics change.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STAGE_VERSION = "r5-1"
STAGE_ROOT = Path(__file__).resolve().parents[2] / ".stage"

# the flagship entry() (__spark_entry__.py) and the staged KG dataflow
# MUST synthesize transcripts identically — single-sourced here so a
# future change cannot silently diverge the oracle input from the
# flagship input (tests/test_queries.py asserts the row counts agree)
FLAGSHIP_TURNS_PER_CONV = 3

# shared query parameters (must match the paired ORACLE_SQL strings)
MINHASH_THRESHOLD = 0.7
SIMHASH_MAX_HAMMING = 6
SIMHASH_BANDS = SIMHASH_MAX_HAMMING + 1  # pigeonhole: full recall
# hyperplane-LSH plane/band counts are derived per corpus by
# operators/similarity.hyperplane_params (bits/band ~ log2 N => random
# candidates stay linear in N); only the structural knobs live here.
ANN_BANDS = 8
ANN_N_QUERIES = 20
ANN_PROBE_RADIUS = 1  # query-side multiprobe: recall without loosening buckets
IVF_NPROBE = 4
EMBDUP_THRESHOLD_X1E6 = 800_000  # perturbed twins score ~0.87-0.93; others < 0.52


def stage_path(group: str, table: str) -> str:
    return str(STAGE_ROOT / group / table)


def stage_glob(group: str, table: str) -> str:
    """DuckDB-readable glob for a staged Spark parquet directory."""
    return f"{stage_path(group, table)}/*.parquet"


def _meta_file(group: str) -> Path:
    return STAGE_ROOT / group / "_STAGE_META.json"


def _is_current(group: str, sf_dir: str) -> bool:
    try:
        meta = json.loads(_meta_file(group).read_text())
    except (OSError, json.JSONDecodeError):
        return False
    return meta.get("sf_dir") == sf_dir and meta.get("version") == STAGE_VERSION


def _mark(group: str, sf_dir: str) -> None:
    _meta_file(group).write_text(
        json.dumps({"sf_dir": sf_dir, "version": STAGE_VERSION})
    )


def _reset(group: str) -> None:
    shutil.rmtree(STAGE_ROOT / group, ignore_errors=True)
    (STAGE_ROOT / group).mkdir(parents=True, exist_ok=True)


def _write(df: DataFrame, group: str, table: str) -> DataFrame:
    df.write.mode("overwrite").parquet(stage_path(group, table))
    return df.sparkSession.read.parquet(stage_path(group, table))


def documents_with_perturbed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents plus a deterministic near-duplicate of each doc (id+10^6,
    first 12 chars dropped) — guarantees the near-dup operators have
    positive findings to verify at any scale factor."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    perturbed = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.substring("text", 13, 1_000_000).alias("text"),
    )
    return docs.unionByName(perturbed)


def embeddings_with_perturbed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings plus a deterministic near-duplicate of each vector
    (vec_id + 10^6, first component +0.5 on unit-norm vectors -> cosine
    ~0.87-0.93 vs its twin, far above any original pair) — guarantees the
    embedding near-dup operator has positive findings to verify.  The
    construction is pure column arithmetic so the DuckDB oracle rebuilds
    the identical table from the embeddings view."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    perturbed = emb.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.concat(
            F.array(F.col("embedding")[0] + F.lit(0.5)),
            F.slice("embedding", 2, 1_000_000),
        ).alias("embedding"),
    )
    return emb.unionByName(perturbed)


def ensure_conv_stage(spark: SparkSession, sf_dir: str) -> None:
    """Stage the raw flagship transcripts table itself (conv_id,
    turn_idx, role, text, tool, ts) — the shared input for
    conversation-structure queries whose relational tail (lag windows,
    transition aggregation) both engines run over the same parquet.
    The generator is deterministic Python, so the oracle cannot replay
    it; staging the rows once makes every downstream comparison a
    genuine differential test."""
    if _is_current("conv", sf_dir):
        return
    _reset("conv")

    from islamic_ner_spark.sources.transcripts import transcripts_from_documents

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    _write(
        transcripts_from_documents(
            spark, docs, turns_per_conv=FLAGSHIP_TURNS_PER_CONV
        ),
        "conv", "transcripts",
    )
    _mark("conv", sf_dir)


def ensure_kg_stage(spark: SparkSession, sf_dir: str) -> None:
    """Stage the KG dataflow's kernel outputs for ``sf_dir``:

    * ``annotated``    — conv_id, turn_idx, doc_id, labels, mentions, triples
    * ``resolution_scored`` — per-string exact/fuzzy/new ladder output
    * ``gazetteer_dim`` — (entity_type, variant_norm, canonical_norm), the
      exact-resolution dimension: lets the oracle RECOMPUTE the ladder's
      exact rung (dict membership + canonical) by SQL join instead of
      trusting the staged labels (VERDICT r2 "What's wrong" #3)
    * ``new_nodes`` / ``new_pair_edges`` — joint-canonicalization inputs
    * ``edge_rows``    — pre-MERGE edge candidate rows (post-linking)
    * ``node_rows``    — pre-MERGE node candidate rows (post-linking)
    """
    if _is_current("kg", sf_dir):
        return
    _reset("kg")

    from islamic_ner_spark.operators.graph import (
        edge_candidate_rows,
        node_candidate_rows,
    )
    from islamic_ner_spark.operators.linking import (
        _distinct_linkable_strings,
        canonicalize_from_pairs,
        new_entity_nodes,
        new_pair_edges,
        resolution_from_scored,
        resolve_triples,
        score_strings_ladder,
    )
    from islamic_ner_spark.operators.ner import annotate_transcripts
    from islamic_ner_spark.operators.relations import extract_mentions, extract_triples
    from islamic_ner_spark.plans.pipeline import (
        DEFAULT_GAZETTEER_DIR,
        resolve_mentions_table,
    )
    from islamic_ner_spark.sources.gazetteer import Gazetteer
    from islamic_ner_spark.sources.transcripts import transcripts_from_documents

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    transcripts = transcripts_from_documents(
        spark, docs, turns_per_conv=FLAGSHIP_TURNS_PER_CONV
    )
    gazetteer_bc = spark.sparkContext.broadcast(
        Gazetteer.from_dir(DEFAULT_GAZETTEER_DIR)
    )

    annotated = _write(
        annotate_transcripts(transcripts, gazetteer_bc).select(
            "conv_id", "turn_idx", "doc_id", "labels", "mentions", "triples"
        ),
        "kg", "annotated",
    )
    mentions = extract_mentions(annotated)
    triples = extract_triples(annotated)

    scored = _write(
        score_strings_ladder(
            _distinct_linkable_strings(mentions, triples), gazetteer_bc
        ),
        "kg", "resolution_scored",
    )
    _write(gazetteer_bc.value.to_dataframe(spark), "kg", "gazetteer_dim")
    new_nodes = _write(
        new_entity_nodes(
            scored.where(F.col("match_type") == "new").select(
                "text", "entity_type", "norm_text"
            )
        ),
        "kg", "new_nodes",
    )
    pair_edges = _write(new_pair_edges(new_nodes), "kg", "new_pair_edges")

    resolution = resolution_from_scored(
        scored, canonicalize_from_pairs(new_nodes, pair_edges)
    ).persist()
    resolved_triples = resolve_triples(triples, resolution)
    _write(edge_candidate_rows(resolved_triples), "kg", "edge_rows")
    _write(
        node_candidate_rows(
            resolve_mentions_table(mentions, resolution),
            annotated.select("conv_id", "turn_idx", "doc_id"),
            resolved_triples,
        ),
        "kg", "node_rows",
    )
    resolution.unpersist()
    _mark("kg", sf_dir)


def ensure_dedup_stage(spark: SparkSession, sf_dir: str) -> None:
    """Stage near-dup kernel outputs: verified MinHash pair edges
    (``minhash_pairs``) and SimHash signatures (``simhash_sigs``)."""
    if _is_current("dedup", sf_dir):
        return
    _reset("dedup")

    from islamic_ner_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        simhash_signatures,
        verify_jaccard_pairs,
    )

    corpus = documents_with_perturbed(spark, sf_dir)
    # signatures to parquet FIRST: candidate generation (and its bucket
    # overflow check) then read the staged files instead of re-running
    # the blake2b minhash kernel per consumer
    sigs = _write(minhash_signatures(corpus), "dedup", "minhash_sigs")
    candidates = _write(lsh_candidate_pairs(sigs), "dedup", "minhash_candidates")
    from islamic_ner_spark.operators.capping import log_candidate_stats

    log_candidate_stats(
        "minhash-lsh (staged)",
        n_candidates=candidates.count(),
        corpus_size=corpus.count(),
    )
    verified = verify_jaccard_pairs(candidates, corpus, threshold=MINHASH_THRESHOLD)
    _write(verified.select("id_a", "id_b"), "dedup", "minhash_pairs")
    _write(simhash_signatures(corpus), "dedup", "simhash_sigs")
    _mark("dedup", sf_dir)


def ensure_media_stage(spark: SparkSession, sf_dir: str) -> None:
    """Stage the multimodal pipeline's kernel outputs: ``media_raw``
    (synthetic binary payloads + typed metadata, one row per document)
    and ``media_decoded`` (the Arrow-batched header decode).  The oracle
    recomputes payload byte lengths directly from the staged binary
    column (octet_length) and replays the per-kind aggregation — the
    decode kernel itself is pytest-gated (tests/test_multimodal.py)."""
    if _is_current("media", sf_dir):
        return
    _reset("media")

    from islamic_ner_spark.operators.multimodal import decode_media, synthetic_media

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    raw = _write(synthetic_media(spark, n_docs), "media", "media_raw")
    _write(decode_media(raw), "media", "media_decoded")
    _mark("media", sf_dir)


STREAM_N_BATCHES = 3
STREAM_N_BUCKETS = 8

# model-NER path knobs (match the reference defaults,
# scripts/build_graph.py:182-278); the staged input triples each doc's
# text so most rows exceed one 120-word window and the chunk-boundary
# logic actually executes.
MODEL_WORD_WINDOW = 120
MODEL_MAX_SEQ = 512


def ensure_stream_stage(spark: SparkSession, sf_dir: str) -> None:
    """Stage the STREAMED graph: the flagship transcripts split into
    ``STREAM_N_BATCHES`` files -> ``start_graph_stream`` (bucketed
    incremental MERGE, one file per micro-batch) ->
    ``rebucket_graph`` (the bucket-modulus maintenance job, doubling
    ``STREAM_N_BUCKETS`` — so bucket-boundary bugs that only appear at
    real row counts are caught inside the driver's gate, VERDICT r4
    next #6) -> ``compact_graph_stream`` (cross-batch
    re-canonicalization) -> the final node/edge tables staged as
    parquet.  The paired oracle replays the one-shot BATCH merge SQL
    over the ``kg`` group's candidate rows, so stream + rebucket +
    compaction == batch is checked inside the driver's own correctness
    gate (VERDICT r3 next #3), not just in pytest.

    The split is arbitrary on purpose: the incremental merge rules are
    associative/commutative (writer ordinals) and compaction joins the
    accumulated vocabulary, so the result must be independent of how
    rows land in micro-batches."""
    if _is_current("stream", sf_dir):
        return
    _reset("stream")

    import shutil as _shutil
    import tempfile

    from islamic_ner_spark.plans.pipeline import DEFAULT_GAZETTEER_DIR
    from islamic_ner_spark.sources.gazetteer import Gazetteer
    from islamic_ner_spark.sources.transcripts import transcripts_from_documents
    from islamic_ner_spark.streaming.stream_pipeline import (
        compact_graph_stream,
        rebucket_graph,
        start_graph_stream,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    transcripts = transcripts_from_documents(
        spark, docs, turns_per_conv=FLAGSHIP_TURNS_PER_CONV
    ).persist()  # three filtered writes below reuse one generator pass
    work = Path(tempfile.mkdtemp(prefix="stream_stage_"))
    try:
        for i in range(STREAM_N_BATCHES):
            transcripts.where(
                F.pmod(F.xxhash64("conv_id"), F.lit(STREAM_N_BATCHES)) == i
            ).coalesce(1).write.parquet(str(work / "in" / f"part{i}"))
        gazetteer_bc = spark.sparkContext.broadcast(
            Gazetteer.from_dir(DEFAULT_GAZETTEER_DIR)
        )
        graph_dir = str(work / "graph")
        query = start_graph_stream(
            spark, str(work / "in" / "*"), graph_dir, str(work / "ckpt"),
            gazetteer_bc, available_now=True, max_files_per_trigger=1,
            n_buckets=STREAM_N_BUCKETS,
        )
        if not query.awaitTermination(timeout=900):
            query.stop()
            raise TimeoutError(
                "stream staging did not drain in 900s — compacting a "
                "half-built graph would stage wrong rows"
            )
        rebucket_graph(spark, graph_dir, STREAM_N_BUCKETS * 2)
        compact_graph_stream(spark, graph_dir, gazetteer_bc)
        _write(
            spark.read.parquet(f"{graph_dir}/edges").drop("bucket"),
            "stream", "edges",
        )
        _write(
            spark.read.parquet(f"{graph_dir}/nodes").drop("bucket"),
            "stream", "nodes",
        )
    finally:
        transcripts.unpersist()
        _shutil.rmtree(work, ignore_errors=True)
    _mark("stream", sf_dir)


def ensure_stream_dedup_stage(spark: SparkSession, sf_dir: str) -> None:
    """Stage the STATEFUL streaming dedup's survivors: the documents
    table split into three ascending-``doc_id`` ranges written with
    strictly increasing mtimes (file-source batch order), drained
    through ``stream_exact_dedup`` (``applyInPandasWithState``, one
    boolean of state per content hash).  Because batches arrive in
    ascending id-range order, the first batch containing a hash holds
    its global minimum id — so the cross-batch stateful winner equals a
    plain ``GROUP BY md5(text)`` + ``MIN(doc_id)`` over the source
    table, which is exactly what the DuckDB oracle replays."""
    if _is_current("sdedup", sf_dir):
        return
    _reset("sdedup")

    import shutil as _shutil
    import tempfile
    import time as _time

    from islamic_ner_spark.streaming.stream_pipeline import start_dedup_stream

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    b1 = lo + (hi - lo) // 3
    b2 = lo + 2 * (hi - lo) // 3
    parts = [
        docs.where(F.col("doc_id") <= b1),
        docs.where((F.col("doc_id") > b1) & (F.col("doc_id") <= b2)),
        docs.where(F.col("doc_id") > b2),
    ]
    work = Path(tempfile.mkdtemp(prefix="sdedup_stage_"))
    try:
        for i, part in enumerate(parts):
            part.coalesce(1).write.parquet(str(work / "in" / f"p{i}"))
            _time.sleep(1.1)  # distinct mtimes => deterministic batch order
        query = start_dedup_stream(
            spark, str(work / "in" / "*"), "doc_id long, text string",
            str(work / "out"), str(work / "ckpt"),
            available_now=True, max_files_per_trigger=1,
        )
        if not query.awaitTermination(timeout=600):
            query.stop()
            raise TimeoutError("dedup stream staging did not drain in 600s")
        _write(spark.read.parquet(str(work / "out")), "sdedup", "survivors")
    finally:
        _shutil.rmtree(work, ignore_errors=True)
    _mark("sdedup", sf_dir)


STREAM_WINDOW_SECONDS = 600
STREAM_WATERMARK_SECONDS = 60


def ensure_stream_window_stage(spark: SparkSession, sf_dir: str) -> None:
    """Stage the watermarked windowed-aggregation path:

    * ``mention_events`` — (ts, entity_type) batch-kernel mention rows
      over the flagship transcripts (the shared input both engines
      aggregate);
    * ``windowed`` — the STREAMED tumbling-window counts: transcripts
      split into event-time-ordered micro-batches (in-order feeding, so
      the advancing watermark drops nothing), drained through
      ``start_windowed_mention_stream`` and restarted once with no new
      data to flush every window the final watermark closed.

    The oracle replays epoch-arithmetic windowing + the same explicit
    watermark cutoff over ``mention_events``; both sides apply
    ``window_end <= max(ts) - watermark`` so the comparison is exact
    regardless of Spark's internal boundary rule."""
    if _is_current("swin", sf_dir):
        return
    _reset("swin")

    import shutil as _shutil
    import tempfile
    import time as _time

    from islamic_ner_spark.operators.ner import annotate_transcripts
    from islamic_ner_spark.plans.pipeline import DEFAULT_GAZETTEER_DIR
    from islamic_ner_spark.sources.gazetteer import Gazetteer
    from islamic_ner_spark.sources.transcripts import transcripts_from_documents
    from islamic_ner_spark.streaming.stream_pipeline import (
        start_windowed_mention_stream,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    transcripts = transcripts_from_documents(
        spark, docs, turns_per_conv=FLAGSHIP_TURNS_PER_CONV
    ).persist()
    gazetteer_bc = spark.sparkContext.broadcast(
        Gazetteer.from_dir(DEFAULT_GAZETTEER_DIR)
    )
    annotated = annotate_transcripts(transcripts, gazetteer_bc)
    _write(
        annotated.select("ts", F.explode("mentions").alias("m")).select(
            "ts", F.col("m.entity_type").alias("entity_type")
        ),
        "swin", "mention_events",
    )

    bounds = sorted(r["ts"] for r in transcripts.select("ts").distinct().collect())
    cuts = [
        bounds[len(bounds) // 4],
        bounds[len(bounds) // 2],
        bounds[3 * len(bounds) // 4],
    ]
    parts = [
        transcripts.where(F.col("ts") <= cuts[0]),
        transcripts.where((F.col("ts") > cuts[0]) & (F.col("ts") <= cuts[1])),
        transcripts.where((F.col("ts") > cuts[1]) & (F.col("ts") <= cuts[2])),
        transcripts.where(F.col("ts") > cuts[2]),
    ]
    work = Path(tempfile.mkdtemp(prefix="swin_stage_"))
    try:
        for i, part in enumerate(parts):
            part.coalesce(1).write.parquet(str(work / "in" / f"p{i}"))
            _time.sleep(1.1)  # distinct mtimes => event-time batch order
        kwargs = dict(
            available_now=True, max_files_per_trigger=1,
            window_duration=f"{STREAM_WINDOW_SECONDS} seconds",
            watermark_delay=f"{STREAM_WATERMARK_SECONDS} seconds",
        )
        for _restart in range(2):  # second run flushes final-watermark windows
            query = start_windowed_mention_stream(
                spark, str(work / "in" / "*"), str(work / "out"),
                str(work / "ckpt"), gazetteer_bc, **kwargs,
            )
            if not query.awaitTermination(timeout=600):
                query.stop()
                raise TimeoutError("windowed stream staging did not drain in 600s")
        _write(spark.read.parquet(str(work / "out")), "swin", "windowed")
    finally:
        transcripts.unpersist()
        _shutil.rmtree(work, ignore_errors=True)
    _mark("swin", sf_dir)


def ensure_model_stage(spark: SparkSession, sf_dir: str) -> None:
    """Stage the model-NER path's predictions: one long turn per
    document (text tripled so most rows exceed one ``MODEL_WORD_WINDOW``
    chunk), labeled end-to-end by the chunked word-window /
    first-subword / max-seq core through the deterministic numpy encoder
    (operators/model_ner.py).  The oracle recomputes entity counts and
    label fingerprints from the staged arrays — the prediction kernel
    itself is deterministic and unit-tested against chunk boundaries."""
    if _is_current("model", sf_dir):
        return
    _reset("model")

    from islamic_ner_spark.operators.model_ner import model_ner_labels

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    transcripts = docs.select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.concat_ws(" ", "text", "text", "text").alias("text"),
    )
    _write(
        model_ner_labels(
            transcripts, None, encoder="numpy",
            word_window=MODEL_WORD_WINDOW, max_seq=MODEL_MAX_SEQ,
        ),
        "model", "predictions",
    )
    _mark("model", sf_dir)


def ensure_ann_stage(spark: SparkSession, sf_dir: str) -> None:
    """Stage hyperplane-LSH signatures, sized per corpus:

    * ``ann_sigs`` — exact corpus signatures over the embeddings table
      (``max(8, log2 N)`` bits x ``ANN_BANDS`` bands);
    * ``ann_query_probes`` — the first ``ANN_N_QUERIES`` vectors'
      multiprobe hashes (radius ``ANN_PROBE_RADIUS``), so the candidate
      join — Spark and the DuckDB oracle alike — is a pure equi-join of
      two staged tables;
    * ``emb_neardup_sigs`` — signatures over the perturbed corpus with
      :func:`hyperplane_params`-derived (planes, bands) targeting 95%
      recall at the near-dup cosine threshold;
    * ``ivf_assign`` / ``ivf_probes`` — IVF coarse-quantizer cell
      assignments (corpus, nearest cell) and query probe cells
      (``IVF_NPROBE`` nearest), from deterministic k-means centroids —
      the candidate join is again a pure equi-join of two staged tables
      either engine can run.
    """
    if _is_current("ann", sf_dir):
        return
    _reset("ann")

    import math

    from islamic_ner_spark.operators.similarity import (
        assign_cells,
        hyperplane_bits,
        hyperplane_params,
        hyperplane_signatures,
        kmeans_centroids,
    )
    from pyspark.sql import functions as _F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    ann_planes = hyperplane_bits(n) * ANN_BANDS
    _write(
        hyperplane_signatures(emb, n_planes=ann_planes, bands=ANN_BANDS),
        "ann", "ann_sigs",
    )
    _write(
        hyperplane_signatures(
            emb.where(_F.col("vec_id") < ANN_N_QUERIES),
            n_planes=ann_planes, bands=ANN_BANDS, probe_radius=ANN_PROBE_RADIUS,
        ),
        "ann", "ann_query_probes",
    )

    centroids = kmeans_centroids(emb, n_cells=max(4, math.isqrt(max(1, n))))
    _write(assign_cells(emb, centroids).select("vid", "cell"), "ann", "ivf_assign")
    _write(
        assign_cells(
            emb.where(_F.col("vec_id") < ANN_N_QUERIES), centroids,
            nprobe=IVF_NPROBE,
        ).select("vid", "cell"),
        "ann", "ivf_probes",
    )

    dup = embeddings_with_perturbed(spark, sf_dir)
    dup_planes, dup_bands = hyperplane_params(
        2 * n, min_cos=EMBDUP_THRESHOLD_X1E6 / 1e6
    )
    _write(
        hyperplane_signatures(dup, n_planes=dup_planes, bands=dup_bands),
        "ann", "emb_neardup_sigs",
    )
    _mark("ann", sf_dir)
