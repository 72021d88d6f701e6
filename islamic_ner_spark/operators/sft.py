"""SFT training-pair extraction from multi-turn agent transcripts.

The transcript-corpus counterpart of the reference's training-set
shaping (generate_silver_data.py builds token-classification rows from
annotated text): a 10^12-turn conversation corpus becomes supervised
fine-tuning examples by pairing each assistant turn with the user turn
that prompted it, carrying the agentic trace length (tool turns the
assistant consumed in between) so downstream curation can stratify by
trace depth — the standard read before training on tool-use data.

No reference counterpart (the reference is a document NER pipeline);
this operator belongs to the transcript axis of the graft.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sft_pairs(transcripts: DataFrame) -> DataFrame:
    """(prompt, response) supervised pairs from (conv_id, turn_idx,
    role, text, tool) transcripts.

    For every assistant turn with at least one user turn strictly
    before it in the same conversation:

    * ``prompt``           — the text of the NEAREST preceding user turn
    * ``prompt_turn_idx``  — that user turn's position
    * ``response``         — the assistant turn's text
    * ``n_trace_tool_turns`` — tool turns strictly between prompt and
      response (the agentic trace this exchange consumed)

    Assistant turns before any user turn (conversation openers, system
    chatter) emit nothing; consecutive assistant turns after one user
    turn each pair with that same prompt (a corpus-policy choice the
    caller can tighten by filtering ``turn_idx - prompt_turn_idx``).

    Plan shape at 10^12 turns: every window expression shares ONE
    (conv_id, turn_idx) spec, so the two chained Window operators run
    back-to-back over a single conv_id-keyed exchange (the second pass
    reuses the first's partitioning — no reshuffle) — conversations are
    bounded (tens of turns), so partitions are tiny and skew-free.  The
    trace count is running-sum arithmetic (tool turns before the
    response minus tool turns at the prompt), never a self-join.
    Nothing collects.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    before = w.rowsBetween(Window.unboundedPreceding, -1)
    upto = w.rowsBetween(Window.unboundedPreceding, 0)
    is_tool = F.when(F.col("role") == "tool", 1).otherwise(0)
    user_text = F.when(F.col("role") == "user", F.col("text"))
    user_idx = F.when(F.col("role") == "user", F.col("turn_idx"))

    # pass 1: running tool count (window functions cannot nest, so the
    # cumulative sum materializes as a column before the last() pass)
    with_cum = transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        F.sum(is_tool).over(upto).alias("_cum_tool"),
    )
    enriched = with_cum.select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        F.last(user_text, ignorenulls=True).over(before).alias("prompt"),
        F.last(user_idx, ignorenulls=True).over(before).alias("prompt_turn_idx"),
        (
            F.col("_cum_tool")
            - F.when(F.col("role") == "tool", 1).otherwise(0)
        ).alias("_tools_before"),
        F.last(
            F.when(F.col("role") == "user", F.col("_cum_tool")),
            ignorenulls=True,
        )
        .over(before)
        .alias("_tools_at_prompt"),
    )
    return enriched.where(
        (F.col("role") == "assistant") & F.col("prompt").isNotNull()
    ).select(
        "conv_id",
        "turn_idx",
        F.col("prompt_turn_idx").cast("int").alias("prompt_turn_idx"),
        "prompt",
        F.col("text").alias("response"),
        (
            F.coalesce(F.col("_tools_before"), F.lit(0))
            - F.coalesce(F.col("_tools_at_prompt"), F.lit(0))
        )
        .cast("long")
        .alias("n_trace_tool_turns"),
    )


def assemble_conversations(
    transcripts: DataFrame, sep: str = "\n"
) -> DataFrame:
    """Assemble each conversation into ONE role-tagged document in
    turn_idx order — the north-rule's "turns are assembled per
    conversation with window-ordered turn_idx" surfaced as an operator,
    feeding conversation-level dedup / quality / packing the same way
    the per-turn path feeds extraction.

    Output: (conv_id, n_turns, n_chars, conversation) where
    ``conversation`` is ``role: text`` lines joined by ``sep``.

    Ordering is engine-exact without a global sort: turns collect into
    an array of (turn_idx, line) structs and ``array_sort`` orders by
    the leading int field (turn_idx is unique per conversation), so the
    assembled string is independent of partition layout and shuffle
    arrival order.

    Plan shape at 10^12 turns: one conv_id-keyed aggregation
    (ObjectHashAggregate — collect_list combines partially map-side);
    per-group state is one conversation (tens of turns), so memory is
    bounded and skew-free.  Nothing collects to the driver.
    """
    line = F.concat(F.col("role"), F.lit(": "), F.col("text"))
    per_turn = transcripts.select(
        "conv_id", F.struct(F.col("turn_idx"), line.alias("line")).alias("t")
    )
    return per_turn.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum(F.length(F.col("t.line"))).cast("long").alias("n_chars"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("t")), lambda x: x["line"]
            ),
            sep,
        ).alias("conversation"),
    )


def sft_pair_quality(transcripts: DataFrame) -> DataFrame:
    """Curation features over extracted SFT pairs — the filter step that
    follows :func:`sft_pairs` in a real pipeline (drop echo responses,
    degenerate length ratios, zero-overlap non-sequiturs before
    training):

    * ``n_prompt_words`` / ``n_response_words`` — whitespace tokens
    * ``n_shared_words``   — distinct words the response copies from its
      prompt (echo / extractiveness signal)
    * ``len_ratio_x100``   — response chars per 100 prompt chars
      (integer floor division, engine-exact)

    All features are JVM column expressions over the sft_pairs plan —
    array_distinct / array_intersect on split words, no UDF, no new
    exchange beyond the single conv_id window exchange the extraction
    already pays.  Empty strings tokenize to zero words (split of ''
    yields [''], filtered out identically in both engines).
    """
    pairs = sft_pairs(transcripts)
    words = lambda c: F.array_remove(  # noqa: E731
        F.array_distinct(F.split(F.trim(F.col(c)), r"\s+")), ""
    )
    p_words = words("prompt")
    r_words = words("response")
    return pairs.select(
        "conv_id",
        "turn_idx",
        "n_trace_tool_turns",
        F.size(p_words).cast("long").alias("n_prompt_words"),
        F.size(r_words).cast("long").alias("n_response_words"),
        F.size(F.array_intersect(r_words, p_words))
        .cast("long")
        .alias("n_shared_words"),
        F.expr(
            "(length(response) * 100) div greatest(length(prompt), 1)"
        )
        .cast("long")
        .alias("len_ratio_x100"),
    )
