"""Dataset statistics and training-set shaping (A7-A10, P12).

Parity targets: label-distribution / entity-count reporting
(generate_silver_data.py:261-292), training filters (:294-299),
seeded split (:545-561), and class-target oversampling
(boost_silver_data.py:355-422).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def label_distribution(annotated: DataFrame, labels_col: str = "labels") -> DataFrame:
    """Per-label share of all tokens, % rounded to 3dp (A7)."""
    exploded = annotated.select(F.explode(labels_col).alias("label"))
    counts = exploded.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    total = F.sum("n").over(Window.partitionBy())
    return counts.select(
        "label", "n", F.round(F.col("n") * 100.0 / total, 3).alias("pct")
    ).orderBy("label")


def entity_type_counts(annotated: DataFrame, labels_col: str = "labels") -> DataFrame:
    """B- tag counts per entity type (A7)."""
    return (
        annotated.select(F.explode(labels_col).alias("label"))
        .where(F.col("label").startswith("B-"))
        .select(F.substring("label", 3, 100).alias("entity_type"))
        .groupBy("entity_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("entity_type")
    )


def training_filter(
    annotated: DataFrame,
    tokens_col: str = "tokens",
    labels_col: str = "labels",
    *,
    min_tokens: int = 5,
    max_tokens: int = 128,
) -> DataFrame:
    """Keep rows with min<=len(tokens)<=max and >=1 B- label (P12)."""
    n_entities = F.size(
        F.filter(labels_col, lambda label: label.startswith("B-"))
    )
    return annotated.where(
        F.size(tokens_col).between(min_tokens, max_tokens) & (n_entities > 0)
    )


def seeded_split(
    df: DataFrame, weights: Sequence[float] = (0.8, 0.1, 0.1), seed: int = 42
) -> List[DataFrame]:
    """Deterministic train/dev/test split (A9)."""
    return df.randomSplit(list(weights), seed=seed)


def oversample_to_targets(
    train: DataFrame,
    targets: Dict[str, int],
    *,
    labels_col: str = "labels",
    seed: int = 42,
) -> DataFrame:
    """Class-target oversampling (A8, boost_silver_data.py:355-422).

    Distributed re-expression of the reference's driver loop: per-record
    entity yields are aggregated (small), replication multiplicities are
    computed on the driver from the aggregate (the same greedy
    yield-descending round-robin), and the replication itself is a
    distributed explode.  Deterministic under the seed.
    """
    def b_count(entity_type: str):
        # closure (not a default arg) — a 2-arg lambda would make Spark
        # pass the array index as the second parameter
        return F.size(F.filter(labels_col, lambda label: label == f"B-{entity_type}"))

    yields = train.select(
        F.monotonically_increasing_id().alias("_rid"), "*"
    ).withColumn(
        "_yield",
        F.map_from_arrays(
            F.array([F.lit(t) for t in targets]),
            F.array(*[b_count(t) for t in targets]),
        ),
    )
    yields = yields.persist()

    # current counts per targeted type (small aggregate)
    count_row = yields.select(
        *[
            F.sum(F.col("_yield").getItem(t)).alias(t)
            for t in targets
        ]
    ).collect()[0]
    current = {t: int(count_row[t] or 0) for t in targets}

    # candidate list per type (rid, yield) — bounded by records that
    # contain the type at all; collected because multiplicity planning is
    # a greedy sequential decision (same as the reference)
    import random

    multiplicity: Dict[int, int] = {}
    for entity_type, threshold in targets.items():
        if current[entity_type] >= threshold:
            continue
        cands = [
            (int(r["_rid"]), int(r["y"]))
            for r in yields.select("_rid", F.col("_yield").getItem(entity_type).alias("y"))
            .where(F.col("y") > 0)
            .collect()
        ]
        if not cands:
            continue
        rng = random.Random(seed)
        rng.shuffle(cands)
        cands.sort(key=lambda item: item[1], reverse=True)
        cursor = 0
        while current[entity_type] < threshold:
            rid, entity_yield = cands[cursor % len(cands)]
            cursor += 1
            multiplicity[rid] = multiplicity.get(rid, 0) + 1
            current[entity_type] += entity_yield

    if not multiplicity:
        return yields.drop("_rid", "_yield")

    mult_df = yields.sparkSession.createDataFrame(
        [(rid, m) for rid, m in multiplicity.items()], "_rid long, _mult int"
    )
    clones = (
        yields.join(F.broadcast(mult_df), "_rid")
        .withColumn("_copy", F.explode(F.sequence(F.lit(1), F.col("_mult"))))
        .drop("_mult", "_copy")
    )
    return yields.drop("_rid", "_yield").unionByName(clones.drop("_rid", "_yield"))
