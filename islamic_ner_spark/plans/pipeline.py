"""End-to-end KG construction plan: transcripts -> nodes + edges.

Spark lifecycle (all stages DataFrame-native, SURVEY.md §3):

    read transcripts
      -> annotate (fused normalize + AC-gazetteer + pattern NER,
         one narrow mapInPandas)                      [no shuffle]
      -> mentions / triples (narrow mapInPandas)      [no shuffle]
      -> resolution over DISTINCT strings (broadcast exact join,
         batched fuzzy, CC canonicalization)          [small shuffles]
      -> resolved triples/mentions (AQE broadcast/skew join)
      -> nodes/edges groupBy MERGE-semantics aggs     [keyed shuffle]

With a ``work_dir`` each stage materializes to parquet with a lineage
manifest and is resumable; the annotate stage is bucketed by conv_id hash
and resumes at bucket granularity (a killed job skips finished buckets).
"""

from __future__ import annotations

import hashlib
import json
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from islamic_ner_spark.operators.graph import (
    build_edges,
    build_edges_turn_local,
    build_hadith_nodes_turn_local,
    build_nodes,
    edges_from_combined,
    fused_graph_outputs,
    graph_stats,
    nodes_from_combined,
)

# above this many distinct (text, type) strings the resolution no longer
# broadcasts comfortably as a Python dict; fall back to relational
# materialize (broadcast joins + global aggs).  The strategy is decided
# from a count() of the (persisted) resolution table — the rows are only
# ever collected to the driver after the count says they fit.
FUSED_VOCAB_LIMIT = 500_000
from islamic_ner_spark.operators.linking import (
    build_resolution_table,
    resolve_triples,
)
from islamic_ner_spark.operators.ner import annotate_transcripts
from islamic_ner_spark.operators.relations import extract_mentions, extract_triples
from islamic_ner_spark.sources import tables
from islamic_ner_spark.sources.gazetteer import Gazetteer

DEFAULT_GAZETTEER_DIR = str(Path(__file__).resolve().parents[1] / "data" / "gazetteers")


@dataclass
class GraphBuildResult:
    annotated: DataFrame
    mentions: DataFrame
    triples: DataFrame
    resolution: DataFrame
    resolved_triples: DataFrame
    resolved_mentions: DataFrame
    nodes: DataFrame
    edges: DataFrame
    persisted: list = None  # cached intermediates, released via unpersist()
    extracted: DataFrame = None  # cached (conv, turn, doc, mentions, triples)

    def stats(self) -> dict:
        return graph_stats(self.nodes, self.edges)

    def metrics(self) -> dict:
        """Per-stage row counts — the in-memory counterpart of the
        ``work_dir`` path's ``_manifest.json`` lineage records (computed
        on demand from the cached intermediates, so the counts cost
        cache scans, not recomputation)."""
        turns_df = self.extracted if self.extracted is not None else self.annotated
        return {
            "turns": turns_df.count(),
            "mentions": self.mentions.count(),
            "triples": self.triples.count(),
            "resolution_strings": self.resolution.count(),
            "nodes": self.nodes.count(),
            "edges": self.edges.count(),
        }

    def unpersist(self) -> None:
        """Release every intermediate this build cached — required by
        long-running callers (e.g. the streaming foreachBatch loop) to
        keep executor storage bounded across many builds."""
        for df in self.persisted or []:
            df.unpersist()


def _fingerprint(*parts: object) -> str:
    return hashlib.sha256(json.dumps([str(p) for p in parts]).encode()).hexdigest()[:16]


def resolve_mentions_table(mentions: DataFrame, resolution: DataFrame) -> DataFrame:
    """Attach canonical/confidence to mention rows (HADITH_REF mentions
    canonicalize to their doc_id with confidence 1.0, builder.py:149-167)."""
    # resolution is persisted by the pipeline; AQE broadcasts it at
    # runtime based on its actual (small) size
    res = resolution.select(
        "text", "entity_type",
        F.col("canonical_name").alias("canonical_name_r"),
        F.col("confidence").alias("confidence_r"),
        F.col("match_type").alias("match_type_r"),
    )
    return (
        mentions.join(res, ["text", "entity_type"], "left")
        .withColumn(
            "canonical_name",
            F.when(F.col("entity_type") == "HADITH_REF", F.col("doc_id")).otherwise(
                F.col("canonical_name_r")
            ),
        )
        .withColumn(
            "confidence",
            F.when(F.col("entity_type") == "HADITH_REF", F.lit(1.0)).otherwise(
                F.col("confidence_r")
            ),
        )
        .withColumn(
            "match_type",
            F.when(F.col("entity_type") == "HADITH_REF", F.lit("exact")).otherwise(
                F.col("match_type_r")
            ),
        )
        .drop("canonical_name_r", "confidence_r", "match_type_r")
    )


def _annotate_resumable(
    spark: SparkSession,
    transcripts: DataFrame,
    gazetteer_bc,
    work_dir: str,
    fingerprint: str,
    n_buckets: int,
    n_waves: int = 4,
) -> DataFrame:
    """Bucketed, partition-resumable annotate stage.

    Buckets are committed in ``n_waves`` independent append jobs, each
    followed by an incremental manifest update — so a killed job leaves a
    manifest recording exactly the committed buckets, and the re-run
    annotates only the missing ones.  More waves = finer resume
    granularity but one extra input scan per wave (the bucket predicate
    is a hash of conv_id and cannot prune the source); 4 is a reasonable
    default, pass 1 for single-commit all-or-nothing.
    """
    path = str(Path(work_dir) / "annotated")
    bucket_col = F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int")

    manifest = tables.read_manifest(path)
    if manifest and manifest.get("fingerprint") == fingerprint and manifest.get("complete"):
        return tables.read_table(spark, path).drop("bucket")

    # partial output is only resumable if it was produced for the SAME
    # input/gazetteer fingerprint; otherwise it is stale and must be
    # rebuilt from scratch (e.g. same work_dir pointed at a new input)
    if manifest and manifest.get("fingerprint") == fingerprint:
        done = tables.completed_buckets(path)
        resumed = True
        # crash window: a wave's parquet job can commit and the process
        # die before the manifest update records it.  Those bucket dirs
        # hold real rows the manifest doesn't know about — re-annotating
        # them would APPEND A SECOND COPY.  The manifest is the only
        # source of truth, so drop any bucket dir it doesn't list.
        import shutil

        for bucket_dir in Path(path).glob("bucket=*"):
            if bucket_dir.name.split("=", 1)[1] not in done:
                shutil.rmtree(bucket_dir, ignore_errors=True)
    else:
        done = set()
        resumed = False
        if Path(path).exists():
            import shutil

            shutil.rmtree(path, ignore_errors=True)

    per_partition: dict[str, int] = (
        dict((manifest or {}).get("per_partition_rows") or {}) if done else {}
    )
    started = time.time()
    wave_of = {b: b % n_waves for b in range(n_buckets)}
    pending_waves = sorted(
        {wave_of[b] for b in range(n_buckets) if str(b) not in done}
    )
    for wave in pending_waves:
        wave_buckets = [
            b for b in range(n_buckets)
            if wave_of[b] == wave and str(b) not in done
        ]
        # bucket is a pure function of conv_id, so the wave predicate
        # applies to the RAW transcripts — the expensive annotate UDF
        # only ever runs on each wave's rows, never on the full input
        chunk = annotate_transcripts(
            transcripts.where(bucket_col.isin(wave_buckets)), gazetteer_bc
        ).withColumn("bucket", bucket_col)
        chunk.write.mode("append").partitionBy("bucket").parquet(path)
        # count committed rows per bucket from the files just written —
        # the manifest update is the checkpoint barrier for this wave
        wave_counts = {
            str(r["bucket"]): r["rows"]
            for r in spark.read.parquet(path)
            .where(F.col("bucket").isin(wave_buckets))
            .groupBy("bucket").agg(F.count(F.lit(1)).alias("rows")).collect()
        }
        for b in wave_buckets:
            wave_counts.setdefault(str(b), 0)
        per_partition.update(wave_counts)
        tables.manifest_path(path).write_text(json.dumps({
            "stage": "annotate",
            "fingerprint": fingerprint,
            "per_partition_rows": per_partition,
            "rows": sum(per_partition.values()),
            "complete": len(per_partition) >= n_buckets,
            "resumed": resumed,
            "duration_s": round(time.time() - started, 3),
        }, indent=2))
    if not pending_waves:
        # all buckets were already committed; finalize the manifest
        tables.manifest_path(path).write_text(json.dumps({
            "stage": "annotate",
            "fingerprint": fingerprint,
            "per_partition_rows": per_partition,
            "rows": sum(per_partition.values()),
            "complete": True,
            "resumed": resumed,
            "duration_s": round(time.time() - started, 3),
        }, indent=2))
    return tables.read_table(spark, path).drop("bucket")


def build_graph_from_labels(
    spark: SparkSession,
    labeled: DataFrame,
    *,
    gazetteer: Optional[Gazetteer] = None,
    gazetteer_dir: str = DEFAULT_GAZETTEER_DIR,
) -> GraphBuildResult:
    """KG construction from pre-labeled input — the reference's
    ``process_hadith(tokens, labels, hadith_id)`` entry point
    (builder.py:134-209), e.g. for externally produced model-NER labels.

    ``labeled`` columns: conv_id string, turn_idx int, tokens
    array<string>, labels array<string>.
    """
    from islamic_ner_spark.operators.ner import annotate_labeled

    annotated = annotate_labeled(
        labeled.select(
            "conv_id", F.col("turn_idx").cast("int").alias("turn_idx"), "tokens", "labels"
        )
    ).persist()
    return _build_from_annotated(
        spark, annotated, gazetteer or Gazetteer.from_dir(gazetteer_dir), work_dir=None,
        fingerprint="labels",
        # arbitrary labeled input may repeat (conv_id, turn_idx) rows, so
        # neither turn contiguity nor turn uniqueness is guaranteed ->
        # global groupBy merges for both edges and nodes
        unique_turns=False,
    )


def build_graph(
    spark: SparkSession,
    transcripts: DataFrame,
    *,
    gazetteer: Optional[Gazetteer] = None,
    gazetteer_dir: str = DEFAULT_GAZETTEER_DIR,
    work_dir: Optional[str] = None,
    n_buckets: int = 64,
    input_token: str = "",
) -> GraphBuildResult:
    """Run the full KG-construction dataflow.

    Without ``work_dir`` the plan stays lazy (annotated is persisted since
    two children consume it).  With ``work_dir`` every stage materializes
    to parquet + manifest and re-runs resume from completed work.

    Input contract: ``transcripts`` has at most one row per
    (conv_id, turn_idx) — the transcripts table's natural key per
    BASELINE.json input_hint.  The shuffle-free edge merge relies on it
    (each turn's triples then provably share a partition).
    """
    gazetteer = gazetteer or Gazetteer.from_dir(gazetteer_dir)
    gazetteer_bc = spark.sparkContext.broadcast(gazetteer)
    # input_token folds the input identity (path, row caps) into stage
    # fingerprints so a work_dir is never silently reused across inputs.
    # Even without a token, a cheap intrinsic identity — schema + the
    # source file listing (stable across job restarts, unlike plan/expr
    # ids) — is folded in, so pointing an old work_dir at new parquet
    # invalidates the staged tables instead of silently resuming them.
    input_identity = transcripts.schema.simpleString()
    try:
        source_files = sorted(transcripts.inputFiles())
    except Exception:  # non-file-backed plans (e.g. in-memory test frames)
        source_files = []
    # "v2": node/edge output schemas gained the writer-ordinal columns
    # (first_emit / best_*) — the version bump invalidates work_dirs
    # staged by older code so a resume never unions mixed schemas.
    fingerprint = _fingerprint(
        "v2", gazetteer_dir, sorted(gazetteer.lookup)[:50], input_token,
        input_identity, hashlib.sha256("\n".join(source_files).encode()).hexdigest(),
    )

    if work_dir:
        annotated = _annotate_resumable(
            spark, transcripts, gazetteer_bc, work_dir, fingerprint, n_buckets
        )
        extracted = annotated
    else:
        annotated = annotate_transcripts(transcripts, gazetteer_bc)
        # Only the extraction outputs feed the KG stages; tokens/labels/
        # norm_text are the bulk of the row, so the build materializes a
        # LEAN annotate pass (same memoized kernel, 5-column output —
        # the Arrow boundary never serializes the dropped columns, and
        # the input projection prunes role/tool/ts from the scan).  The
        # full annotated view stays lazy (recomputed on demand for
        # audits/stats).
        extracted = annotate_transcripts(
            transcripts, gazetteer_bc, extraction_only=True
        ).persist()

    result = _build_from_annotated(
        spark, annotated, gazetteer, work_dir=work_dir, fingerprint=fingerprint,
        gazetteer_bc=gazetteer_bc, extracted=extracted,
    )
    if not work_dir:
        result.persisted.append(extracted)
    return result


def _build_from_annotated(
    spark: SparkSession,
    annotated: DataFrame,
    gazetteer: Gazetteer,
    *,
    work_dir: Optional[str],
    fingerprint: str,
    gazetteer_bc=None,
    extracted: Optional[DataFrame] = None,
    unique_turns: bool = True,
) -> GraphBuildResult:
    if gazetteer_bc is None:
        gazetteer_bc = spark.sparkContext.broadcast(gazetteer)
    if extracted is None:
        extracted = annotated
    gazetteer_df = gazetteer.to_dataframe(spark)
    persisted: list = []

    mentions = extract_mentions(extracted)
    triples = extract_triples(extracted)

    if work_dir:
        # partition columns are the stages' natural pruning predicates
        # (e.g. narration-chain queries filter pred) and give the lineage
        # manifests their per-partition row counts
        for name, df, pby in (
            ("mentions", mentions, ["entity_type"]),
            ("triples", triples, ["pred"]),
        ):
            path = str(Path(work_dir) / name)
            if not tables.table_is_current(path, fingerprint):
                tables.write_table(
                    df, path, stage=name, fingerprint=fingerprint, partition_by=pby
                )
        mentions = tables.read_table(spark, str(Path(work_dir) / "mentions"))
        triples = tables.read_table(spark, str(Path(work_dir) / "triples"))
    else:
        pass  # mentions/triples are cheap explodes of the cached `extracted`

    resolution = build_resolution_table(
        spark, mentions, triples, gazetteer_df, gazetteer_bc, persisted=persisted
    )
    if work_dir:
        path = str(Path(work_dir) / "resolution")
        if not tables.table_is_current(path, fingerprint):
            tables.write_table(resolution, path, stage="resolution", fingerprint=fingerprint)
        resolution = tables.read_table(spark, path)
    else:
        resolution = resolution.persist()
        persisted.append(resolution)

    resolved_triples = resolve_triples(triples, resolution)
    resolved_mentions = resolve_mentions_table(mentions, resolution)

    doc_index = extracted.select("conv_id", "turn_idx", "doc_id")

    fused = None
    if unique_turns and not work_dir:
        # one Arrow pass over the extraction computes merged edges,
        # Hadith nodes, and per-batch pre-aggregated vocabulary node
        # candidates — no cache re-scans, no joins, no big shuffles
        # (operators/graph.fused_graph_outputs).  Needs the resolution as
        # a driver-side dict, so the strategy is chosen from a COUNT of
        # the persisted resolution (a few bytes to the driver); the rows
        # themselves are only collected once the count says they fit.
        # Beyond FUSED_VOCAB_LIMIT the relational materialize is the
        # default — no multi-GB speculative collect at extreme vocab.
        if resolution.count() <= FUSED_VOCAB_LIMIT:
            res_dict = {
                (r["text"], r["entity_type"]): (r["canonical_name"], r["confidence"])
                for r in resolution.collect()
            }
            res_bc = spark.sparkContext.broadcast(res_dict)
            fused = fused_graph_outputs(extracted, res_bc).persist()
            persisted.append(fused)

    if fused is not None:
        edges = edges_from_combined(fused)
        nodes = nodes_from_combined(fused, extracted)
    else:
        if unique_turns:
            # doc-scoped (Hadith) nodes are a narrow per-turn projection;
            # only vocabulary-keyed rows go through the global agg, where
            # map-side partial aggregation collapses them to
            # ~|vocabulary| rows per partition
            nodes = build_nodes(
                resolved_mentions, doc_index, resolved_triples, exclude_doc_scoped=True
            ).unionByName(build_hadith_nodes_turn_local(extracted))
        else:
            nodes = build_nodes(resolved_mentions, doc_index, resolved_triples)
        if work_dir or not unique_turns:
            # parquet round-trip (an input split can start mid-turn) or
            # arbitrary caller input: turn contiguity is not guaranteed ->
            # global groupBy merge
            edges = build_edges(resolved_triples)
        else:
            edges = build_edges_turn_local(resolved_triples)

    if work_dir:
        for name, df, pby in (
            ("nodes", nodes, ["label"]),
            ("edges", edges, ["pred"]),
        ):
            path = str(Path(work_dir) / name)
            if not tables.table_is_current(path, fingerprint):
                tables.write_table(
                    df, path, stage=name, fingerprint=fingerprint, partition_by=pby
                )
        nodes = tables.read_table(spark, str(Path(work_dir) / "nodes"))
        edges = tables.read_table(spark, str(Path(work_dir) / "edges"))
    elif fused is None:
        # Aggregated outputs are consumed repeatedly (stats, queries,
        # counts) and are much cheaper to recompute-from-cache than the
        # full rows are to columnar-compress; only the small aggregates
        # get cached.  (The fused path already persists the combined
        # output; edges/nodes are cheap filters over that cache.)
        nodes = nodes.persist()
        edges = edges.persist()
        persisted.extend([nodes, edges])

    return GraphBuildResult(
        annotated=annotated,
        mentions=mentions,
        triples=triples,
        resolution=resolution,
        resolved_triples=resolved_triples,
        resolved_mentions=resolved_mentions,
        nodes=nodes,
        edges=edges,
        persisted=persisted,
        extracted=extracted,
    )
