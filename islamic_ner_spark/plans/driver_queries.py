"""Driver-facing query catalog over /root/testdata tables.

Two families:

* **SQL-oracled** queries (DuckDB-checkable): the engine's scalar/text
  layer (normalization, tokenization, dedup, language/quality scoring,
  fingerprints), windowed sessionization, joins/aggregations, and
  embedding similarity — each paired with an ANSI-SQL oracle in
  ``ORACLE_SQL``.  Numeric outputs are integers/strings/exact decimals so
  value hashes cannot drift on floating-point representation.
* **KG pipeline** queries (rows-only checks): the full NER -> triples ->
  linking -> graph dataflow over transcripts synthesized deterministically
  *from the documents table* (doc_id seeds the conversation) — DuckDB
  cannot run Aho-Corasick/BFS, so these are covered by the pytest parity
  gates instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from islamic_ner_spark.functions.normalize import TASHKEEL_PATTERN

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _transcripts(spark: SparkSession, sf_dir: str, turns: int = 3) -> DataFrame:
    """Deterministic transcripts keyed by the documents table's doc_ids."""
    from islamic_ner_spark.sources.transcripts import transcripts_from_documents

    docs = _read(spark, sf_dir, "documents").select("doc_id")
    return transcripts_from_documents(spark, docs, turns_per_conv=turns)


def _graph(spark: SparkSession, sf_dir: str):
    from islamic_ner_spark.plans.pipeline import build_graph

    return build_graph(spark, _transcripts(spark, sf_dir))


# ---------------------------------------------------------------------------
# SQL-oracled queries
# ---------------------------------------------------------------------------

# DuckDB (RE2) spelling of the tashkeel class
_TASHKEEL_RE2 = "[\\x{0610}-\\x{061a}\\x{064b}-\\x{065f}\\x{0670}]"
_TRANSLATE_SRC = "آأإةىـ"
_TRANSLATE_DST = "اااهي"


def q_normalize_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-P8 normalization (regex subset) pushed into column expressions."""
    docs = _read(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.translate(
                F.regexp_replace(
                    F.regexp_replace("text", "<[^>]+>", " "), TASHKEEL_PATTERN, ""
                ),
                _TRANSLATE_SRC,
                _TRANSLATE_DST,
            ),
            r"\s+",
            " ",
        )
    )
    return docs.select("doc_id", norm.alias("norm_text"))


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11/P12-style token counting per document."""
    docs = _read(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    ).where(F.length(F.trim("text")) > 0)


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content hash (A1-style groupBy)."""
    docs = _read(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5(F.col("text")).alias("text_hash"))
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.min("doc_id").alias("keep_id"),
        )
    )


def q_lang_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic + quality scoring (integers only)."""
    docs = _read(spark, sf_dir, "documents")
    n_latin = F.length(F.regexp_replace("text", "[^A-Za-z]", ""))
    n_arabic = F.length(F.regexp_replace("text", "[^ء-ي]", ""))
    n_total = F.length("text")
    words = F.split(F.trim("text"), r"\s+")
    return docs.select(
        "doc_id",
        F.size(words).cast("long").alias("n_words"),
        F.floor(F.length(F.regexp_replace("text", r"\s", "")) * 100 / F.size(words))
        .cast("long")
        .alias("avg_word_len_x100"),
        F.floor(n_latin * 100 / F.greatest(n_total, F.lit(1))).cast("long").alias("latin_pct"),
        F.floor(n_arabic * 100 / F.greatest(n_total, F.lit(1))).cast("long").alias("arabic_pct"),
        F.when(n_latin * 2 > n_total, F.lit("latin")).otherwise(F.lit("other")).alias(
            "script_guess"
        ),
    )


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint: md5 of case/whitespace-canonicalized text."""
    docs = _read(spark, sf_dir, "documents")
    canon = F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
    return docs.select("doc_id", F.md5(canon).alias("fingerprint"))


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window sessionization: 30-minute inactivity gap per user."""
    events = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    with_breaks = events.withColumn(
        "is_break", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    )
    sessions = with_breaks.withColumn(
        "session_no", F.sum("is_break").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sessions.groupBy("user_id").agg(
        F.max("session_no").cast("long").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


def q_events_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation + rank over event types."""
    events = _read(spark, sf_dir, "events")
    agg = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")) * 100)
        .cast("long")
        .alias("value_cents"),
    )
    w = Window.orderBy(F.desc("n_events"), F.asc("event_type"))
    return agg.withColumn("rank", F.row_number().over(w).cast("long"))


def q_lineitem_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped aggregation (exact decimal arithmetic)."""
    li = _read(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,4)")
    price = F.col("l_extendedprice").cast("decimal(18,4)")
    disc = F.col("l_discount").cast("decimal(18,4)")
    return (
        li.where(F.col("l_shipdate") < F.lit("1998-09-03"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(qty) * 100).cast("long").alias("sum_qty_x100"),
            F.round(F.sum(price) * 100).cast("long").alias("sum_base_price_x100"),
            F.round(F.sum(price * (F.lit(1).cast("decimal(18,4)") - disc)) * 10000)
            .cast("long")
            .alias("sum_disc_price_x10000"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_orders_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: orders -> customer -> nation (broadcast dimensions)."""
    orders = _read(spark, sf_dir, "orders")
    customer = _read(spark, sf_dir, "customer")
    nation = _read(spark, sf_dir, "nation")
    return (
        orders.join(
            F.broadcast(customer),
            orders["o_custkey"] == customer["c_custkey"],
        )
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")) * 100)
            .cast("long")
            .alias("total_price_x100"),
        )
    )


def q_embedding_topk(spark: SparkSession, sf_dir: str, k: int = 5, n_queries: int = 20) -> DataFrame:
    """Brute-force cosine top-k over the embeddings table.

    Exact baseline for ANN; cosine rounded to 1e-6 with id tiebreak so the
    ranking is engine-independent.  The scale path (LSH bucketing) reuses
    the same scoring with a pre-join on bucket ids.
    """
    emb = _read(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("vec")
    )
    norm = F.sqrt(F.aggregate("vec", F.lit(0.0), lambda acc, x: acc + x * x))
    emb = emb.withColumn("norm", norm)
    queries = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"), F.col("vec").alias("qvec"), F.col("norm").alias("qnorm")
    )
    pairs = queries.crossJoin(emb.select(F.col("vec_id").alias("nid"), "vec", "norm")).where(
        F.col("qid") != F.col("nid")
    )
    dot = F.aggregate(
        F.zip_with("qvec", "vec", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    scored = pairs.select(
        "qid",
        "nid",
        F.round(dot / (F.col("qnorm") * F.col("norm")) * 1000000).cast("long").alias(
            "cos_x1e6"
        ),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_x1e6"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("qid", "rank", "nid", "cos_x1e6")
    )


# ---------------------------------------------------------------------------
# KG pipeline queries (rows-only checks; semantics gated by pytest parity)
# ---------------------------------------------------------------------------


def q_kg_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from islamic_ner_spark.operators.ner import annotate_transcripts
    from islamic_ner_spark.operators.relations import extract_triples
    from islamic_ner_spark.plans.pipeline import DEFAULT_GAZETTEER_DIR
    from islamic_ner_spark.sources.gazetteer import Gazetteer

    gazetteer = Gazetteer.from_dir(DEFAULT_GAZETTEER_DIR)
    bc = spark.sparkContext.broadcast(gazetteer)
    annotated = annotate_transcripts(_transcripts(spark, sf_dir), bc)
    return extract_triples(annotated)


def q_kg_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _graph(spark, sf_dir).edges


def q_kg_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _graph(spark, sf_dir).nodes.select(
        "label", "key", "name_ar", "confidence", "variants", "mention_count"
    )


def q_kg_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _graph(spark, sf_dir).resolution


def q_kg_narration_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _graph(spark, sf_dir).edges
    return (
        edges.where(
            (F.col("pred") == "NARRATED_FROM")
            & (F.col("src_label") == "Scholar")
            & (F.col("tgt_label") == "Scholar")
        )
        .select("source_hadith", F.col("src_key").alias("source"), F.col("tgt_key").alias("target"), "confidence")
        .orderBy("source_hadith", "source", "target")
    )


def q_kg_scholar_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from islamic_ner_spark.operators.components import connected_components

    edges = _graph(spark, sf_dir).edges
    scholar_pairs = edges.where(
        (F.col("pred") == "NARRATED_FROM")
        & (F.col("src_label") == "Scholar")
        & (F.col("tgt_label") == "Scholar")
    ).select(F.col("src_key").alias("src"), F.col("tgt_key").alias("dst"))
    return connected_components(scholar_pairs)


def _documents_with_perturbed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents plus a deterministic near-duplicate of each doc (id+10^6,
    first 12 chars dropped) — guarantees the near-dup operators have
    positive findings to verify at any scale factor."""
    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    perturbed = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.substring("text", 13, 1_000_000).alias("text"),
    )
    return docs.unionByName(perturbed)


def q_neardup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from islamic_ner_spark.operators.dedup import near_duplicate_groups

    corpus = _documents_with_perturbed(spark, sf_dir)
    return near_duplicate_groups(corpus, threshold=0.7).orderBy("id")


def q_neardup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from islamic_ner_spark.operators.dedup import simhash_near_duplicates

    corpus = _documents_with_perturbed(spark, sf_dir)
    return simhash_near_duplicates(corpus, max_hamming=6).orderBy("id_a", "id_b")


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from islamic_ner_spark.operators.similarity import lsh_topk

    emb = _read(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    return lsh_topk(emb, queries, k=5, n_planes=16, bands=8)


def q_label_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from islamic_ner_spark.operators.ner import annotate_transcripts
    from islamic_ner_spark.operators.stats import label_distribution
    from islamic_ner_spark.plans.pipeline import DEFAULT_GAZETTEER_DIR
    from islamic_ner_spark.sources.gazetteer import Gazetteer

    bc = spark.sparkContext.broadcast(Gazetteer.from_dir(DEFAULT_GAZETTEER_DIR))
    annotated = annotate_transcripts(_transcripts(spark, sf_dir), bc)
    return label_distribution(annotated)


QUERIES = {
    # SQL-oracled
    "normalize_documents": q_normalize_documents,
    "token_stats": q_token_stats,
    "dedup_exact": q_dedup_exact,
    "lang_quality": q_lang_quality,
    "doc_fingerprint": q_doc_fingerprint,
    "events_sessionize": q_events_sessionize,
    "events_type_stats": q_events_type_stats,
    "lineitem_pricing_summary": q_lineitem_pricing_summary,
    "orders_per_nation": q_orders_per_nation,
    "embedding_topk": q_embedding_topk,
    # KG pipeline (rows-only)
    "kg_triples": q_kg_triples,
    "kg_edges": q_kg_edges,
    "kg_nodes": q_kg_nodes,
    "kg_resolution": q_kg_resolution,
    "kg_narration_chains": q_kg_narration_chains,
    "kg_scholar_components": q_kg_scholar_components,
    # training-data pipeline (rows-only)
    "neardup_minhash": q_neardup_minhash,
    "neardup_simhash": q_neardup_simhash,
    "ann_lsh_topk": q_ann_lsh_topk,
    "label_distribution": q_label_distribution,
}


ORACLE_SQL = {
    "normalize_documents": f"""
        SELECT doc_id,
               trim(regexp_replace(
                   translate(
                       regexp_replace(regexp_replace(text, '<[^>]+>', ' ', 'g'),
                                      '{_TASHKEEL_RE2}', '', 'g'),
                       '{_TRANSLATE_SRC}', '{_TRANSLATE_DST}'),
                   '\\s+', ' ', 'g')) AS norm_text
        FROM documents
    """,
    "token_stats": """
        SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
               CAST(length(text) AS BIGINT) AS n_chars
        FROM documents
        WHERE length(trim(text)) > 0
    """,
    "dedup_exact": """
        SELECT md5(text) AS text_hash,
               COUNT(*) AS dup_count,
               MIN(doc_id) AS keep_id
        FROM documents
        GROUP BY md5(text)
    """,
    "lang_quality": """
        SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_words,
               CAST(floor(length(regexp_replace(text, '\\s', '', 'g')) * 100.0
                    / len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS avg_word_len_x100,
               CAST(floor(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 100.0
                    / greatest(length(text), 1)) AS BIGINT) AS latin_pct,
               CAST(floor(length(regexp_replace(text, '[^\\x{0621}-\\x{064a}]', '', 'g')) * 100.0
                    / greatest(length(text), 1)) AS BIGINT) AS arabic_pct,
               CASE WHEN length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 2
                         > length(text)
                    THEN 'latin' ELSE 'other' END AS script_guess
        FROM documents
    """,
    "doc_fingerprint": """
        SELECT doc_id,
               md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
        FROM documents
    """,
    "events_sessionize": """
        WITH gaps AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w IS NULL
                             OR epoch(ts) - lag(epoch(ts)) OVER w > 1800
                        THEN 1 ELSE 0 END AS is_break
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), numbered AS (
            SELECT user_id,
                   SUM(is_break) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS session_no
            FROM gaps
        )
        SELECT user_id,
               CAST(MAX(session_no) AS BIGINT) AS n_sessions,
               COUNT(*) AS n_events
        FROM numbered
        GROUP BY user_id
    """,
    "events_type_stats": """
        WITH agg AS (
            SELECT event_type,
                   COUNT(*) AS n_events,
                   COUNT(DISTINCT user_id) AS n_users,
                   CAST(round(SUM(CAST(value AS DECIMAL(18,6))) * 100, 0) AS BIGINT)
                       AS value_cents
            FROM events
            GROUP BY event_type
        )
        SELECT event_type, n_events, n_users, value_cents,
               CAST(row_number() OVER (ORDER BY n_events DESC, event_type ASC) AS BIGINT)
                   AS rank
        FROM agg
    """,
    "lineitem_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(round(SUM(CAST(l_quantity AS DECIMAL(18,4))) * 100, 0) AS BIGINT)
                   AS sum_qty_x100,
               CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) * 100, 0) AS BIGINT)
                   AS sum_base_price_x100,
               CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                              * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
                          * 10000, 0) AS BIGINT) AS sum_disc_price_x10000,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate < TIMESTAMP '1998-09-03'
        GROUP BY l_returnflag, l_linestatus
    """,
    "orders_per_nation": """
        SELECT n.n_name AS nation,
               COUNT(*) AS n_orders,
               COUNT(DISTINCT o.o_custkey) AS n_customers,
               CAST(round(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) * 100, 0) AS BIGINT)
                   AS total_price_x100
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """,
    "embedding_topk": """
        WITH vecs AS (
            SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS vec
            FROM embeddings
        ), norms AS (
            SELECT vec_id, vec,
                   sqrt(list_sum([x * x FOR x IN vec])) AS nrm
            FROM vecs
        ), scored AS (
            SELECT q.vec_id AS qid, n.vec_id AS nid,
                   CAST(round(list_sum([q.vec[i] * n.vec[i] FOR i IN range(1, 65)])
                              / (q.nrm * n.nrm) * 1000000, 0) AS BIGINT) AS cos_x1e6
            FROM norms q, norms n
            WHERE q.vec_id < 20 AND q.vec_id <> n.vec_id
        ), ranked AS (
            SELECT qid, nid, cos_x1e6,
                   CAST(row_number() OVER (PARTITION BY qid
                                           ORDER BY cos_x1e6 DESC, nid ASC) AS BIGINT)
                       AS rank
            FROM scored
        )
        SELECT qid, rank, nid, cos_x1e6 FROM ranked WHERE rank <= 5
    """,
}
