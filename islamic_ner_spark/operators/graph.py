"""Graph materialize: resolved mentions + triples -> nodes & edges tables.

Neo4j MERGE semantics re-expressed as deterministic aggregations
(builder.py:394-443, FakeGraphBackend in tests/test_graph.py:31-84):

* node upsert ``SET n += props``  -> last-writer-wins per property under a
  stable (conv_id, turn_idx, mention order) sequence, except ``variants``
  which accumulates as a sorted set union
* edge MERGE keyed by (pred, src_label, src_key, tgt_label, tgt_key,
  source_hadith) -> first writer fixes evidence/confidence; later writers
  raise confidence to the max and fill evidence only if empty.  Within one
  document the reference's in-batch dedupe keeps the *first* relation
  per key (builder.py:99-123), which ``min_by`` over the emit order
  reproduces exactly.

Node schema per entity type (builder.py:19-26, 325-392):
SCHOLAR->(Scholar, canonical_name), BOOK->(Book, canonical_name),
CONCEPT->(Concept, term), PLACE->(Place, canonical_name),
HADITH_REF->(Hadith, hadith_id).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NODE_LABELS = {
    "SCHOLAR": "Scholar",
    "BOOK": "Book",
    "CONCEPT": "Concept",
    "PLACE": "Place",
    "HADITH_REF": "Hadith",
    "HADITH": "Hadith",
}

def _label_expr(type_col: str) -> F.Column:
    """entity_type -> node label as a when-chain (codegen-friendly)."""
    expr = F.lit(None).cast("string")
    for entity_type, label in reversed(list(NODE_LABELS.items())):
        expr = F.when(F.col(type_col) == entity_type, F.lit(label)).otherwise(expr)
    return expr


def node_candidate_rows(
    resolved_mentions: DataFrame,
    doc_index: DataFrame,
    resolved_triples: DataFrame | None = None,
    *,
    exclude_doc_scoped: bool = False,
) -> DataFrame:
    """The pre-aggregation node MERGE input: one row per (node key,
    writer) with the writer's emit order — the relational half of
    :func:`build_nodes`, exposed so the MERGE tail can be staged to
    parquet and replayed by an independent SQL engine.

    Columns: label, key, conv_id, turn_idx, emit_idx, original_text,
    confidence.
    """
    keep_types = [t for t in NODE_LABELS if not (
        exclude_doc_scoped and t == "HADITH_REF")]
    linkable = resolved_mentions.where(
        F.col("entity_type").isin(keep_types)
    ).select(
        "conv_id",
        "turn_idx",
        F.col("mention_idx").alias("emit_idx"),
        F.col("entity_type"),
        # HADITH_REF mentions key to the doc id (builder.py:149-167)
        F.when(F.col("entity_type") == "HADITH_REF", F.col("doc_id"))
        .otherwise(F.col("canonical_name"))
        .alias("key"),
        F.col("text").alias("original_text"),
        F.col("confidence"),
    )

    hadith_meta = doc_index.select(
        "conv_id",
        "turn_idx",
        F.lit(2_000_000_000).alias("emit_idx"),  # appended after mentions
        F.lit("HADITH_REF").alias("entity_type"),
        F.col("doc_id").alias("key"),
        F.col("doc_id").alias("original_text"),
        F.lit(1.0).alias("confidence"),
    )

    rows = linkable if exclude_doc_scoped else linkable.unionByName(hadith_meta)

    if resolved_triples is not None:
        def endpoint(side: str, offset: int) -> DataFrame:
            return resolved_triples.select(
                "conv_id",
                "turn_idx",
                # endpoints are merged after the doc's mention nodes, src
                # before tgt, in relation emit order (builder.py:125-126)
                (F.lit(3_000_000_000) + F.col("rel_idx") * 2 + F.lit(offset))
                .alias("emit_idx"),
                F.col(f"{side}_type").alias("entity_type"),
                F.col(f"{side}_canonical").alias("key"),
                F.when(
                    F.col(f"{side}_type") == "HADITH_REF", F.col("doc_id")
                ).otherwise(F.col(f"{side}_text")).alias("original_text"),
                F.coalesce(F.col(f"{side}_confidence_r"), F.lit(1.0)).alias(
                    "confidence"
                ),
            ).where(F.col("entity_type").isin(keep_types))

        rows = rows.unionByName(endpoint("subj", 0)).unionByName(endpoint("obj", 1))

    return rows.select(
        _label_expr("entity_type").alias("label"),
        "key",
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.col("emit_idx").cast("long").alias("emit_idx"),
        "original_text",
        "confidence",
    )


def aggregate_nodes(rows: DataFrame) -> DataFrame:
    """Node MERGE over candidate rows (the ``SET n += props`` tail):
    last-writer-wins properties under (conv_id, turn_idx, emit_idx)
    order, ``variants`` as sorted set union, ``mention_count`` as the
    writer count (builder.py:404-443).

    The winning writer's ordinal rides along as ``best_conv/best_turn/
    best_emit`` so any later re-aggregation — cross-batch incremental
    MERGE, or node clusters that merge during streaming
    re-canonicalization compaction — can re-run the SAME last-writer
    rule associatively: max over constituents' ordinals IS the global
    last writer."""
    # single struct-max carries both last-writer payloads in one agg
    # buffer (vs two max_by(col, order) buffers); order fields lead, so
    # struct comparison == last-writer-wins
    winner = F.max(
        F.struct(
            F.col("conv_id"),
            F.col("turn_idx").cast("int").alias("turn_idx"),
            F.col("emit_idx").cast("long").alias("emit_idx"),
            F.col("original_text"),
            F.col("confidence"),
        )
    ).alias("w")
    return (
        rows.groupBy("label", "key")
        .agg(
            winner,
            F.array_sort(F.collect_set("original_text")).alias("variants"),
            F.count(F.lit(1)).alias("mention_count"),
        )
        .select(
            "label",
            "key",
            F.col("w.original_text").alias("name_ar"),
            F.col("w.confidence").alias("confidence"),
            "variants",
            "mention_count",
            F.col("w.conv_id").alias("best_conv"),
            F.col("w.turn_idx").alias("best_turn"),
            F.col("w.emit_idx").alias("best_emit"),
        )
        # Hadith nodes carry provenance fields, empty for transcript input
        # (builder.py:339-343); Book author / Concept category default ""
        .withColumn("book_ref", F.when(F.col("label") == "Hadith", F.lit("")))
        .withColumn("chapter", F.when(F.col("label") == "Hadith", F.lit("")))
    )


def build_nodes(
    resolved_mentions: DataFrame,
    doc_index: DataFrame,
    resolved_triples: DataFrame | None = None,
    *,
    exclude_doc_scoped: bool = False,
) -> DataFrame:
    """Node table from resolved mention spans + one Hadith node per doc +
    triple endpoints (inferred entities, e.g. author-map books, exist only
    as endpoints — the reference merges endpoint nodes during relation
    insert, builder.py:125-126).

    ``resolved_mentions`` columns: conv_id, turn_idx, doc_id, mention_idx,
    text, entity_type, canonical_name, confidence, match_type.
    ``doc_index`` columns: conv_id, turn_idx, doc_id (distinct docs).

    With ``exclude_doc_scoped=True`` all HADITH_REF-typed rows (whose node
    key is the per-turn ``doc_id``) are left out: the pipeline computes
    those with the shuffle-free :func:`build_hadith_nodes_turn_local` and
    unions them in, so the global agg only shuffles vocabulary-keyed rows
    (which map-side partial aggregation collapses to ~|vocabulary| rows
    per partition instead of ~|corpus| doc-keyed rows).
    """
    return aggregate_nodes(
        node_candidate_rows(
            resolved_mentions,
            doc_index,
            resolved_triples,
            exclude_doc_scoped=exclude_doc_scoped,
        )
    )


def build_hadith_nodes_turn_local(extracted: DataFrame) -> DataFrame:
    """Hadith (doc-scoped) nodes as a pure narrow projection — no shuffle.

    A Hadith node's key is the turn's ``doc_id``, so every row that could
    merge into it comes from that one turn: HADITH_REF mention spans,
    the per-doc metadata row, and HADITH_REF triple endpoints
    (builder.py:149-167, 313-322).  All of those are available in the
    annotate output's array columns, so the whole MERGE collapses to a
    per-row expression:

    * name_ar / confidence: the last writer is the metadata row or a
      HADITH_REF endpoint — both carry (doc_id, 1.0) — so the outcome is
      constant.
    * variants: {doc_id} ∪ {HADITH_REF mention surface texts}.
    * mention_count: 1 (metadata) + #HADITH_REF mentions + #HADITH_REF
      endpoints.

    Equivalence with the global groupBy strategy is asserted in
    tests/test_graph_pipeline.py; requires one input row per turn (the
    transcripts-table natural key).

    ``extracted`` columns: conv_id, turn_idx, doc_id,
    mentions array<struct<..entity_type,text..>>, triples array<struct<..>>.
    """
    is_href = lambda m: m["entity_type"] == "HADITH_REF"  # noqa: E731
    href_mentions = F.filter("mentions", is_href)
    n_href_endpoints = F.size(
        F.filter("triples", lambda t: t["subj_type"] == "HADITH_REF")
    ) + F.size(F.filter("triples", lambda t: t["obj_type"] == "HADITH_REF"))

    # the global agg's winner ordinal for this key: max emit among the
    # turn's candidate rows — HADITH_REF triple endpoints (3e9 + 2*rel
    # [+1 for obj]) when present, else the metadata row (2e9); mention
    # emits (< 2e9) never win
    endpoint_emit = F.aggregate(
        "triples",
        F.lit(2_000_000_000).cast("long"),
        lambda acc, t: F.greatest(
            acc,
            F.when(
                t["subj_type"] == "HADITH_REF",
                F.lit(3_000_000_000) + t["rel_idx"].cast("long") * 2,
            ).otherwise(F.lit(0).cast("long")),
            F.when(
                t["obj_type"] == "HADITH_REF",
                F.lit(3_000_000_000) + t["rel_idx"].cast("long") * 2 + 1,
            ).otherwise(F.lit(0).cast("long")),
        ),
    )

    return extracted.select(
        F.lit("Hadith").alias("label"),
        F.col("doc_id").alias("key"),
        F.col("doc_id").alias("name_ar"),
        F.lit(1.0).alias("confidence"),
        F.array_sort(
            F.array_distinct(
                F.concat(
                    F.array(F.col("doc_id")),
                    F.transform(href_mentions, lambda m: m["text"]),
                )
            )
        ).alias("variants"),
        (F.lit(1) + F.size(href_mentions) + n_href_endpoints)
        .cast("long")
        .alias("mention_count"),
        F.col("conv_id").alias("best_conv"),
        F.col("turn_idx").cast("int").alias("best_turn"),
        endpoint_emit.alias("best_emit"),
        F.lit("").alias("book_ref"),
        F.lit("").alias("chapter"),
    )


def build_edges(resolved_triples: DataFrame) -> DataFrame:
    """Edge table from resolved triples with MERGE-upsert aggregation.

    ``resolved_triples``: output of linking.resolve_triples — must carry
    subj_canonical/obj_canonical, source_hadith, rel_idx.

    General-purpose (any input partitioning) global-groupBy strategy; the
    pipeline uses the shuffle-free :func:`build_edges_turn_local` variant.
    """
    return aggregate_edges(edge_candidate_rows(resolved_triples))


def aggregate_edges(rows: DataFrame) -> DataFrame:
    """Edge MERGE over candidate rows (the upsert tail): first writer in
    (conv_id, turn_idx, emit_idx) order fixes confidence/evidence per
    key, ``merge_count`` counts the writers (builder.py:99-123,427-435).

    ``first_emit`` (the winning writer's emit ordinal) rides along so a
    later re-aggregation — e.g. edges whose endpoint keys merge during
    streaming re-canonicalization compaction — can re-run the SAME
    first-writer rule associatively: min over rows' ``first_emit`` IS
    the global first writer (an edge key's rows all share one turn, so
    emit order alone totally orders its writers)."""
    # single struct-min carries both payloads in one agg buffer (half the
    # sort width of two min_by(col, order) buffers); the order fields
    # lead, so struct comparison == first-writer-wins
    winner = F.min(
        F.struct(
            F.col("conv_id"),
            F.col("turn_idx").cast("int").alias("turn_idx"),
            F.col("emit_idx").cast("long").alias("emit_idx"),
            F.col("confidence"),
            F.col("evidence"),
        )
    ).alias("w")
    return (
        rows.groupBy(*EDGE_KEY)
        .agg(winner, F.count(F.lit(1)).alias("merge_count"))
        .select(
            *EDGE_KEY,
            F.col("w.confidence").alias("confidence"),
            F.col("w.evidence").alias("evidence"),
            "merge_count",
            F.col("w.emit_idx").alias("first_emit"),
        )
    )


EDGE_KEY = ["pred", "src_label", "src_key", "tgt_label", "tgt_key", "source_hadith"]

# persistent-table DDL shapes (v2, writer-ordinal columns) — shared by
# the streaming maintenance jobs so a one-table-missing graph dir can be
# processed against an empty side of the right schema
EDGES_TABLE_SCHEMA = (
    "pred string, src_label string, src_key string, tgt_label string, "
    "tgt_key string, source_hadith string, confidence double, "
    "evidence string, merge_count long, first_emit long"
)
NODES_TABLE_SCHEMA = (
    "label string, key string, name_ar string, confidence double, "
    "variants array<string>, mention_count long, best_conv string, "
    "best_turn int, best_emit long, book_ref string, chapter string"
)
_EDGES_OUT_SCHEMA = EDGES_TABLE_SCHEMA


def edge_candidate_rows(resolved_triples: DataFrame) -> DataFrame:
    """Shared projection + validity filter for both edge-merge strategies
    (exposed so the MERGE tail can be staged to parquet and replayed by
    an independent SQL engine)."""
    return resolved_triples.select(
        "conv_id",
        "turn_idx",
        F.col("rel_idx").alias("emit_idx"),
        F.col("pred"),
        _label_expr("subj_type").alias("src_label"),
        F.col("subj_canonical").alias("src_key"),
        _label_expr("obj_type").alias("tgt_label"),
        F.col("obj_canonical").alias("tgt_key"),
        F.col("source_hadith"),
        F.col("confidence"),
        F.col("evidence"),
    ).where(
        F.col("src_key").isNotNull()
        & (F.col("src_key") != "")
        & F.col("tgt_key").isNotNull()
        & (F.col("tgt_key") != "")
        & F.col("src_label").isNotNull()
        & F.col("tgt_label").isNotNull()
    )


def build_edges_turn_local(resolved_triples: DataFrame) -> DataFrame:
    """Shuffle-free edge MERGE for pipeline-produced triples.

    The edge MERGE key includes ``source_hadith``, which in this pipeline
    is the per-turn ``doc_id`` (``conv_id:turn_idx``) — so the MERGE can
    only ever combine rows of a *single turn*.  A turn's triples are
    contiguous within one partition (they come from one exploded array
    row, and ``resolve_triples`` joins the resolution table as a
    broadcast, which preserves the stream side's partitioning and order).
    The global groupBy of :func:`build_edges` is therefore a no-op across
    turns, and at 16+ cores its SortAggregate + full-row Exchange was the
    measured scaling bottleneck (per-record CPU inflates ~5x with core
    count; see BENCH.md).  This operator does the same first-writer-wins
    merge per turn in an Arrow-batched pass with NO exchange at all.

    Requires: all rows of one ``source_hadith`` contiguous within a
    partition.  Use :func:`build_edges` for inputs of unknown layout
    (results are identical; verified in tests/test_graph_pipeline.py).
    """
    rows = edge_candidate_rows(resolved_triples).select(
        "pred", "src_label", "src_key", "tgt_label", "tgt_key",
        "source_hadith", "confidence", "evidence", "emit_idx",
    )

    def merge(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        key_cols = EDGE_KEY

        def flush(chunk: pd.DataFrame) -> pd.DataFrame | None:
            if chunk.empty:
                return None
            # first-writer-wins per key in emit order within each doc run
            run = (chunk["source_hadith"] != chunk["source_hadith"].shift()).cumsum()
            order = np.lexsort((chunk["emit_idx"].to_numpy(), run.to_numpy()))
            if not (np.diff(order) > 0).all():
                chunk = chunk.iloc[order]
            if not chunk.duplicated(subset=key_cols).any():
                out = chunk.rename(columns={"emit_idx": "first_emit"}).copy()
                out["merge_count"] = np.int64(1)
                return out
            out = chunk.groupby(key_cols, sort=False, as_index=False).agg(
                confidence=("confidence", "first"),
                evidence=("evidence", "first"),
                merge_count=("evidence", "size"),
                first_emit=("emit_idx", "first"),
            )
            return out[key_cols + ["confidence", "evidence", "merge_count", "first_emit"]]

        tail: pd.DataFrame | None = None
        for batch in batches:
            if tail is not None and len(tail):
                batch = pd.concat([tail, batch], ignore_index=True)
                tail = None
            if batch.empty:
                continue
            doc = batch["source_hadith"].to_numpy()
            trailing = doc == doc[-1]
            # rows of the last doc may continue into the next Arrow batch;
            # hold them back (a turn's rows are contiguous, so the trailing
            # run is exactly the incomplete group)
            rev = trailing[::-1]
            head_len = len(batch) - (len(batch) if rev.all() else int(np.argmin(rev)))
            tail = batch.iloc[head_len:]
            head = flush(batch.iloc[:head_len])
            if head is not None and len(head):
                yield head
        if tail is not None and len(tail):
            final = flush(tail)
            if final is not None and len(final):
                yield final

    return rows.mapInPandas(merge, schema=_EDGES_OUT_SCHEMA)


_COMBINED_SCHEMA = (
    "out string, "
    "pred string, src_label string, src_key string, tgt_label string, "
    "tgt_key string, source_hadith string, confidence double, "
    "evidence string, merge_count long, first_emit long, "
    "label string, key string, name_ar string, variants array<string>, "
    "mention_count long, best_conv string, best_turn int, best_emit long"
)
# Hadith (doc-scoped) nodes are deliberately NOT part of the fused output:
# at one row per turn they would double the cached row count with variant
# arrays, and build_hadith_nodes_turn_local is a near-free narrow JVM
# projection over the already-cached extraction.


def fused_graph_outputs(extracted: DataFrame, resolution_bc) -> DataFrame:
    """Edges + node inputs in ONE Arrow pass over the annotate output.

    Motivation (BENCH.md): the relational materialize scans the cached
    extraction 4x (mention explode, two triple explodes, doc index),
    broadcast-joins the resolution into each, and pushes ~6 rows/turn
    through JVM row processing whose per-record CPU inflates ~2x at 16
    threads on one box.  All of that is turn-local computation over data
    already sitting in the turn's arrays, so one mapInPandas with the
    (vocabulary-sized) resolution as a broadcast Python dict replaces it;
    Python workers have per-worker heaps and scale ~1.0 (same shape as
    the annotate stage).

    Per input row (= one turn) emits, discriminated by ``out``:

    * ``edge``  — first-writer-wins merged edges (== build_edges_turn_local)
    * ``vnode`` — per-BATCH pre-aggregated vocabulary-node candidates
      (~|vocabulary| rows per Arrow batch); finish with
      :func:`nodes_from_combined` (== build_nodes on vocabulary rows,
      unioned with the JVM-side Hadith projection)

    ``resolution_bc``: broadcast dict {(text, entity_type): (canonical,
    confidence)}.  Requires one input row per (conv_id, turn_idx); falls
    back to the relational operators above for arbitrary inputs or
    extreme vocabularies (plans/pipeline.py).
    """

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        res = resolution_bc.value
        labels_map = NODE_LABELS

        for batch in batches:
            edge_rows: list[tuple] = []
            # (label, key) -> [order, text, conf, variants, count]
            vocab: dict[tuple, list] = {}

            for conv_id, turn_idx, doc_id, mentions, triples in zip(
                batch["conv_id"], batch["turn_idx"], batch["doc_id"],
                batch["mentions"], batch["triples"],
            ):
                turn_idx = int(turn_idx)
                for m in mentions:
                    etype = m["entity_type"]
                    if etype == "HADITH_REF":
                        continue
                    lab = labels_map.get(etype)
                    if lab is None:
                        continue
                    hit = res.get((m["text"], etype))
                    if hit is None:
                        continue
                    key = (lab, hit[0])
                    order = (conv_id, turn_idx, m["mention_idx"])
                    ent = vocab.get(key)
                    if ent is None:
                        vocab[key] = [order, m["text"], hit[1], {m["text"]}, 1]
                    else:
                        if order > ent[0]:
                            ent[0], ent[1], ent[2] = order, m["text"], hit[1]
                        ent[3].add(m["text"])
                        ent[4] += 1

                seen: dict[tuple, list] = {}
                for t in triples:
                    ridx = t["rel_idx"]
                    endpoints = (
                        (t["subj_text"], t["subj_type"], 3_000_000_000 + ridx * 2),
                        (t["obj_text"], t["obj_type"], 3_000_000_000 + ridx * 2 + 1),
                    )
                    canon = []
                    for text, etype, emit in endpoints:
                        if etype == "HADITH_REF":
                            canon.append(doc_id)
                            continue
                        hit = res.get((text, etype))
                        canon.append(hit[0] if hit else None)
                        lab = labels_map.get(etype)
                        if lab is None or hit is None:
                            continue
                        key = (lab, hit[0])
                        order = (conv_id, turn_idx, emit)
                        # endpoint confidence = resolution confidence
                        # (resolve_triples: coalesce(confidence_r, 1.0))
                        conf = hit[1] if hit[1] is not None else 1.0
                        ent = vocab.get(key)
                        if ent is None:
                            vocab[key] = [order, text, conf, {text}, 1]
                        else:
                            if order > ent[0]:
                                ent[0], ent[1], ent[2] = order, text, conf
                            ent[3].add(text)
                            ent[4] += 1
                    sc, oc = canon
                    sl = labels_map.get(t["subj_type"])
                    ol = labels_map.get(t["obj_type"])
                    if sc and oc and sl and ol:
                        k = (t["pred"], sl, sc, ol, oc, doc_id)
                        ent = seen.get(k)
                        if ent is None:
                            # edge candidate emit == rel_idx
                            seen[k] = [t["confidence"], t["evidence"], 1, ridx]
                        else:
                            ent[2] += 1
                for k, v in seen.items():
                    edge_rows.append(k + (v[0], v[1], v[2], v[3]))

            n_e, n_v = len(edge_rows), len(vocab)
            if not (n_e or n_v):
                # a fully-empty construction would give the frame's list
                # columns numpy float64 dtype, which Arrow cannot convert
                # to list<string> (possible when a batch has no matches
                # at all, e.g. non-Arabic input)
                continue
            out = pd.DataFrame(
                {
                    "out": ["edge"] * n_e + ["vnode"] * n_v,
                    "pred": [r[0] for r in edge_rows] + [None] * n_v,
                    "src_label": [r[1] for r in edge_rows] + [None] * n_v,
                    "src_key": [r[2] for r in edge_rows] + [None] * n_v,
                    "tgt_label": [r[3] for r in edge_rows] + [None] * n_v,
                    "tgt_key": [r[4] for r in edge_rows] + [None] * n_v,
                    "source_hadith": [r[5] for r in edge_rows] + [None] * n_v,
                    "confidence": [r[6] for r in edge_rows]
                    + [v[2] for v in vocab.values()],
                    "evidence": [r[7] for r in edge_rows] + [None] * n_v,
                    "merge_count": [r[8] for r in edge_rows] + [0] * n_v,
                    "first_emit": [r[9] for r in edge_rows] + [0] * n_v,
                    "label": [None] * n_e + [k[0] for k in vocab],
                    "key": [None] * n_e + [k[1] for k in vocab],
                    "name_ar": [None] * n_e + [v[1] for v in vocab.values()],
                    "variants": [None] * n_e
                    + [sorted(v[3]) for v in vocab.values()],
                    "mention_count": [0] * n_e + [v[4] for v in vocab.values()],
                    "best_conv": [None] * n_e + [v[0][0] for v in vocab.values()],
                    "best_turn": [0] * n_e + [v[0][1] for v in vocab.values()],
                    "best_emit": [0] * n_e + [v[0][2] for v in vocab.values()],
                }
            )
            yield out

    return extracted.select(
        "conv_id", "turn_idx", "doc_id", "mentions", "triples"
    ).mapInPandas(run, schema=_COMBINED_SCHEMA)


def edges_from_combined(combined: DataFrame) -> DataFrame:
    return combined.where(F.col("out") == "edge").select(
        "pred", "src_label", "src_key", "tgt_label", "tgt_key",
        "source_hadith", "confidence", "evidence", "merge_count", "first_emit",
    )


def nodes_from_combined(combined: DataFrame, extracted: DataFrame) -> DataFrame:
    """Vocabulary candidates finish with a (tiny) global last-writer/
    variant-union aggregation; Hadith nodes come from the narrow JVM
    projection over the cached extraction."""
    hadith = build_hadith_nodes_turn_local(extracted)
    winner = F.max(
        F.struct("best_conv", "best_turn", "best_emit", "name_ar", "confidence")
    ).alias("w")
    vocab = (
        combined.where(F.col("out") == "vnode")
        .groupBy("label", "key")
        .agg(
            winner,
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("variants"))))
            .alias("variants"),
            F.sum("mention_count").alias("mention_count"),
        )
        .select(
            "label",
            "key",
            F.col("w.name_ar").alias("name_ar"),
            F.col("w.confidence").alias("confidence"),
            "variants",
            "mention_count",
            F.col("w.best_conv").alias("best_conv"),
            F.col("w.best_turn").alias("best_turn"),
            F.col("w.best_emit").alias("best_emit"),
            F.when(F.col("label") == "Hadith", F.lit("")).alias("book_ref"),
            F.when(F.col("label") == "Hadith", F.lit("")).alias("chapter"),
        )
    )
    return vocab.unionByName(hadith)


def merge_edges_incremental(existing: DataFrame, incoming: DataFrame) -> DataFrame:
    """Cross-batch MERGE (A4): confidence = max, evidence = first
    non-empty, existing row wins ties (builder.py:427-435).
    ``merge_count`` accumulates across batches (old + new), so after any
    partitioning of the input into batches it equals the one-shot batch
    build's total writer count per edge — bucket/batch-history-invariant.
    """
    e = existing.select(
        "pred", "src_label", "src_key", "tgt_label", "tgt_key", "source_hadith",
        F.col("confidence").alias("old_conf"), F.col("evidence").alias("old_ev"),
        F.col("merge_count").alias("old_mc"), F.col("first_emit").alias("old_fe"),
    )
    i = incoming.select(
        "pred", "src_label", "src_key", "tgt_label", "tgt_key", "source_hadith",
        F.col("confidence").alias("new_conf"), F.col("evidence").alias("new_ev"),
        F.col("merge_count").alias("new_mc"), F.col("first_emit").alias("new_fe"),
    )
    key = ["pred", "src_label", "src_key", "tgt_label", "tgt_key", "source_hadith"]
    return (
        e.join(i, key, "full_outer")
        .select(
            *key,
            F.greatest(
                F.coalesce("old_conf", F.lit(0.0)), F.coalesce("new_conf", F.lit(0.0))
            ).alias("confidence"),
            F.when(
                F.coalesce(F.col("old_ev"), F.lit("")) != "", F.col("old_ev")
            ).otherwise(F.coalesce("new_ev", F.lit(""))).alias("evidence"),
            (
                F.coalesce("old_mc", F.lit(0)) + F.coalesce("new_mc", F.lit(0))
            ).alias("merge_count"),
            # least() skips nulls: the surviving first-writer ordinal
            F.least("old_fe", "new_fe").alias("first_emit"),
        )
    )


def merge_nodes_incremental(existing: DataFrame, incoming: DataFrame) -> DataFrame:
    """Cross-batch node MERGE: ``SET n += props`` semantics — the side
    whose winning writer is GLOBALLY later (max ``best_conv/best_turn/
    best_emit`` ordinal) wins properties, ``variants`` accumulates as a
    sorted set union, ``mention_count`` sums (builder.py:404-408; union
    semantics tests/test_graph.py:31-44).

    Resolving the winner by ordinal (rather than "incoming wins") makes
    the merge commutative: batches may replay or arrive out of writer
    order and the result still equals the one-shot batch build."""
    key = ["label", "key"]
    e = existing.select(
        *key,
        F.col("name_ar").alias("old_name"), F.col("confidence").alias("old_conf"),
        F.col("variants").alias("old_variants"),
        F.col("mention_count").alias("old_count"),
        F.col("best_conv").alias("old_bc"), F.col("best_turn").alias("old_bt"),
        F.col("best_emit").alias("old_be"),
        F.col("book_ref").alias("old_book_ref"), F.col("chapter").alias("old_chapter"),
    )
    i = incoming.select(
        *key,
        F.col("name_ar").alias("new_name"), F.col("confidence").alias("new_conf"),
        F.col("variants").alias("new_variants"),
        F.col("mention_count").alias("new_count"),
        F.col("best_conv").alias("new_bc"), F.col("best_turn").alias("new_bt"),
        F.col("best_emit").alias("new_be"),
        F.col("book_ref").alias("new_book_ref"), F.col("chapter").alias("new_chapter"),
    )
    empty_arr = F.array().cast("array<string>")
    # incoming wins ties (replay of the same batch must be a no-op under
    # the old "incoming wins" contract)
    new_wins = F.col("old_bc").isNull() | (
        F.col("new_bc").isNotNull()
        & (
            F.struct(
                F.col("new_bc").alias("c"), F.col("new_bt").alias("t"),
                F.col("new_be").alias("e"),
            )
            >= F.struct(
                F.col("old_bc").alias("c"), F.col("old_bt").alias("t"),
                F.col("old_be").alias("e"),
            )
        )
    )

    def pick(new_col: str, old_col: str) -> F.Column:
        return F.when(new_wins, F.coalesce(new_col, old_col)).otherwise(
            F.coalesce(old_col, new_col)
        )

    return e.join(i, key, "full_outer").select(
        *key,
        pick("new_name", "old_name").alias("name_ar"),
        pick("new_conf", "old_conf").alias("confidence"),
        F.array_sort(
            F.array_union(
                F.coalesce("old_variants", empty_arr),
                F.coalesce("new_variants", empty_arr),
            )
        ).alias("variants"),
        (
            F.coalesce("old_count", F.lit(0)) + F.coalesce("new_count", F.lit(0))
        ).alias("mention_count"),
        pick("new_bc", "old_bc").alias("best_conv"),
        pick("new_bt", "old_bt").alias("best_turn"),
        pick("new_be", "old_be").alias("best_emit"),
        pick("new_book_ref", "old_book_ref").alias("book_ref"),
        pick("new_chapter", "old_chapter").alias("chapter"),
    )


def graph_stats(nodes: DataFrame, edges: DataFrame) -> dict:
    """Counts by node label and edge type + totals (A6, builder.py:244-283)."""
    nodes_by_label = {
        r["label"]: r["count"] for r in nodes.groupBy("label").count().collect()
    }
    rels_by_type = {
        r["pred"]: r["count"] for r in edges.groupBy("pred").count().collect()
    }
    return {
        "nodes_by_label": nodes_by_label,
        "relationships_by_type": rels_by_type,
        "total_nodes": int(sum(nodes_by_label.values())),
        "total_relationships": int(sum(rels_by_type.values())),
    }
