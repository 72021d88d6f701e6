"""Benchmark: end-to-end KG construction throughput + headline queries.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS].  Prints exactly ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "cpu_s": {name: cpu-sec, ...},
     "load1": {name: loadavg-at-start, ...}, "sf": ...,
     "triples": N, "turns": N, "triples_per_sec": X, "turns_per_sec": X}

The headline stage is the full pipeline (synthesized transcripts scaled
from the sf documents table -> annotate -> triples -> linking -> graph),
measured as wall time to materialize the edges table; triples/sec is the
BASELINE.json metric.  Scale knobs via env:
SPARK_GRAFT_CONVS_PER_DOC (default 6), SPARK_GRAFT_TURNS (default 4).

Noise accounting (round-2 verdict: a 2.9x official-number swing turned
out to be host interference and was only diagnosable by re-running):
every timed phase also records the container cgroup CPU-seconds it
burned, the host 1-min loadavg at its start, and a ``foreign_jvm`` flag
— a watcher thread polls /proc every 3 s for Spark processes not
descended from this one (round 3 caught a co-tenant local[16] JVM
burning the container's quota mid-leg; a phase it overlaps is not
comparable and the flag says so without re-running).  Wall time that swings
while cpu_s stays flat is external load, not a code regression — the
evidence ships in the JSON so a reader never has to re-run to tell.
Two reading caveats: load1 after the first phase includes the decaying
contribution of OUR OWN just-finished JVM threads (compare against
`cpus`, not zero), and under heavy host contention the cgroup counter
itself inflates (vCPU-seconds include hypervisor-stolen slices), so
cpu_s comparisons are meaningful between runs in similar load windows.
The short SQL headliners additionally run $SPARK_GRAFT_BEST_OF times
(default 2) keeping the best wall time; the KG build runs once (it is
long enough to average noise, and its cpu_s is the ground truth).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


# Version of the SPARK_GRAFT_KG_ONLY leg workload (what a scaling leg
# times + burns CPU on).  Bump whenever the KG_ONLY-mode work changes —
# scaling_run.py compares accumulated pairs by combined container CPU,
# and that comparison is only meaningful between legs that ran the same
# workload.  Rev 1 = kg_build + top_narrators + components (the workload
# of the committed 0.900 headline pair; the round-4 pagerank/triangle
# headliners are full-bench only).
LEG_WORKLOAD_REV = 1

# Committed work-conservation reference for the contended-window
# self-flag (round-4 verdict next #2).  Calibration (code-review r5
# made this precise): the quiet-window kg_build PHASE alone burns
# ~1132-1137 CPU-s at local[4]/local[16] on the 6M-turn workload
# (round-5 headline pair legs), but the driver's per-round bench runs
# at local[32], where 32 threads on this box's SMT-shared cores
# inflate the same phase's CPU time ~15-25% — so the reference is set
# at the local[16] LEG TOTAL (1318.6: kg_build + top_narrators +
# components), which empirically matches the quiet local[32] kg_build
# phase burn.  cpu_s scales linearly with turn count; the 1.5x
# tolerance then flags genuine stall inflation (BENCH_r04 hit 4502 vs
# r03's 1868 for byte-identical output; this round's contended full
# bench hit 2631, flagged, vs the clean window's pass) without
# false-flagging clean wide runs.
KG_BUILD_REF_CPU_S = 1320.0
KG_BUILD_REF_TURNS = 6_000_000
CONTENTION_TOLERANCE = 1.5


def _container_cpu_ns() -> int | None:
    """Container-wide CPU accounting (covers the JVM + Python workers;
    per-process rusage cannot see the unwaited JVM).  v1 cpuacct first,
    cgroup v2 unified cpu.stat as fallback."""
    try:
        return int(open("/sys/fs/cgroup/cpuacct/cpuacct.usage").read())
    except OSError:
        pass
    for path in ("/sys/fs/cgroup/cpu.stat", "/sys/fs/cgroup/unified/cpu.stat"):
        try:
            for line in open(path):
                if line.startswith("usage_usec"):
                    return int(line.split()[1]) * 1000
        except OSError:
            continue
    return None


def _load1() -> float | None:
    try:
        return float(open("/proc/loadavg").read().split()[0])
    except OSError:
        return None


class _PhaseClock:
    """Times phases, pairing wall seconds with cgroup CPU-seconds, the
    host load at phase start, and a foreign-Spark-JVM contamination flag
    (round-3 verdict #7: a leg a co-tenant Spark job overlaps is
    garbage, and the evidence must ship in the JSON)."""

    def __init__(self) -> None:
        self.timings: dict[str, float] = {}
        self.cpu_s: dict[str, float] = {}
        self.load1: dict[str, float] = {}
        self.foreign_jvm: dict[str, bool] = {}

    @staticmethod
    def _watch_foreign(fn):
        """Run ``fn`` while a daemon thread polls for foreign Spark
        processes every 3 s (plus one check before and after — a
        transient co-tenant JVM mid-phase must not escape the flag).
        Returns True when any was observed."""
        import threading

        from islamic_ner_spark import hostguard

        hit = threading.Event()
        stop = threading.Event()

        def poll() -> None:
            while not stop.is_set() and not hit.is_set():
                if hostguard.foreign_spark_processes():
                    hit.set()
                    return
                stop.wait(3.0)

        if hostguard.foreign_spark_processes():
            hit.set()
        watcher = threading.Thread(target=poll, daemon=True)
        watcher.start()
        try:
            fn()
        finally:
            stop.set()
            watcher.join(timeout=5.0)
        if hostguard.foreign_spark_processes():
            hit.set()
        return hit.is_set()

    def run(self, name: str, fn) -> None:
        load = _load1()
        cpu_before = _container_cpu_ns()
        start = time.time()
        foreign = self._watch_foreign(fn)
        wall = time.time() - start
        cpu_after = _container_cpu_ns()
        self.timings[name] = round(wall, 3)
        self.foreign_jvm[name] = foreign
        if cpu_before is not None and cpu_after is not None:
            self.cpu_s[name] = round((cpu_after - cpu_before) / 1e9, 2)
        if load is not None:
            self.load1[name] = load

    def run_best_of(self, name: str, fn, repeats: int) -> None:
        """Best wall time of ``repeats`` runs (keeps that run's cpu_s)."""
        best: tuple[float, float | None, float | None, bool] | None = None
        for _ in range(max(1, repeats)):
            load = _load1()
            cpu_before = _container_cpu_ns()
            start = time.time()
            foreign = self._watch_foreign(fn)
            wall = time.time() - start
            cpu_after = _container_cpu_ns()
            cpu = (
                (cpu_after - cpu_before) / 1e9
                if cpu_before is not None and cpu_after is not None
                else None
            )
            if best is None or wall < best[0]:
                best = (wall, cpu, load, foreign)
        self.timings[name] = round(best[0], 3)
        if best[1] is not None:
            self.cpu_s[name] = round(best[1], 2)
        if best[2] is not None:
            self.load1[name] = best[2]
        self.foreign_jvm[name] = best[3]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    # default sized so fixed costs (session, vocabulary resolution) are
    # amortized and the number reflects steady-state throughput: at sf0.1
    # this is 6M turns, ~1.5 min on 32 cores
    convs_per_doc = int(os.environ.get("SPARK_GRAFT_CONVS_PER_DOC", "300"))
    turns_per_conv = int(os.environ.get("SPARK_GRAFT_TURNS", "4"))
    best_of = int(os.environ.get("SPARK_GRAFT_BEST_OF", "2"))

    # Admission gate (round-4 verdict next #2): BENCH_r04 was measured at
    # load1 10-36 and showed a phantom 2.6x regression.  Wait (bounded)
    # for a window with no foreign Spark JVM and load1 at/below the
    # threshold before the timed phases.  SPARK_GRAFT_ADMIT_WAIT=0
    # disables; the default wait is short enough not to eat an unattended
    # driver budget, and an expired wait still proceeds (the per-phase
    # evidence columns ship regardless).
    # ONE read of the leg-workload switch: four phase groups hang off it,
    # and a future phase landing under a stale per-site env lookup would
    # silently change what a KG_ONLY scaling leg times (the byte-equal
    # invariant LEG_WORKLOAD_REV protects) — code-review r5
    kg_only = bool(os.environ.get("SPARK_GRAFT_KG_ONLY"))
    admit_wait = int(os.environ.get("SPARK_GRAFT_ADMIT_WAIT", "300"))
    admit_load = float(
        os.environ.get("SPARK_GRAFT_ADMIT_LOAD", str(max(4, cpus // 4)))
    )

    from islamic_ner_spark import hostguard

    # ONE shared wait budget across all phase groups — an unattended
    # driver run must never stack 3x the full wait
    admit_budget = [float(admit_wait)]

    def admission(phase_group: str) -> None:
        if admit_budget[0] <= 0:
            return
        t0 = time.time()
        # allow_decay_tail: between bench's own phases, load1 is mostly
        # the EWMA tail of the phase that just finished — admit when the
        # container is live-idle and load is falling, instead of burning
        # the shared budget waiting out our own decay (code-review r5)
        ok = hostguard.wait_for_admission(
            admit_load,
            max_wait_s=admit_budget[0],
            poll_s=10.0,
            allow_decay_tail=True,
        )
        admit_budget[0] -= time.time() - t0
        if not ok:
            print(
                f"[bench] {phase_group}: admission wait expired; "
                "phases may be contended (see cpu_s/load1 columns)",
                file=sys.stderr, flush=True,
            )

    from pyspark.sql import functions as F

    from islamic_ner_spark.plans import driver_queries as dq
    from islamic_ner_spark.plans.pipeline import build_graph
    from islamic_ner_spark.session import build_session
    from islamic_ner_spark.sources.transcripts import synthetic_transcripts

    spark = build_session(
        "islamic_ner_bench", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
    )

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    n_convs = n_docs * convs_per_doc
    clock = _PhaseClock()

    # --- input synthesis (untimed: a real deployment reads an existing
    # transcripts table; what we benchmark is the engine, not the faker) --
    import shutil
    import tempfile

    staging = tempfile.mkdtemp(prefix="bench_transcripts_")
    synthetic_transcripts(
        spark, n_convs, turns_per_conv=turns_per_conv, partitions=cpus * 4
    ).write.mode("overwrite").parquet(staging)

    # --- headline: end-to-end KG build -----------------------------------
    counts: dict[str, int] = {}

    def kg_build() -> None:
        transcripts = spark.read.parquet(staging)
        result = build_graph(spark, transcripts)
        # ONE action materializes both output tables: the union-of-aggregates
        # plan shares the broadcast resolution exchange and the cached
        # extraction scans, and populates the edges/nodes caches in a single
        # job.  sum(merge_count) IS the resolved-triple count (each emitted
        # triple contributes exactly one merge), so no separate pass needed.
        stats_rows = (
            result.edges.agg(
                F.count(F.lit(1)).alias("n"), F.sum("merge_count").alias("m")
            )
            .select(F.lit("edges").alias("k"), "n", "m")
            .unionByName(
                result.nodes.agg(F.count(F.lit(1)).alias("n")).select(
                    F.lit("nodes").alias("k"), "n", F.lit(0).cast("long").alias("m")
                )
            )
            .collect()
        )
        stats = {r["k"]: r for r in stats_rows}
        counts["edges"] = int(stats["edges"]["n"])
        counts["triples"] = int(stats["edges"]["m"])
        counts["nodes"] = int(stats["nodes"]["n"])
        counts["result"] = result  # type: ignore[assignment]

    admission("kg_build")
    clock.run("kg_build_e2e", kg_build)
    kg_seconds = clock.timings["kg_build_e2e"]
    n_turns = n_convs * turns_per_conv
    result = counts.pop("result")

    # --- headline queries over the built graph ---------------------------
    from islamic_ner_spark.operators.components import connected_components
    from islamic_ner_spark.operators.graph_analytics import pagerank_integer, triangles
    from islamic_ner_spark.operators.queries import top_narrators

    clock.run("kg_top_narrators", lambda: top_narrators(result.edges, k=20).collect())
    # round-4 analytics headliners: both reduce to the vocabulary-sized
    # scholar digraph first, so their cost is independent of corpus size.
    # Skipped under SPARK_GRAFT_KG_ONLY: scaling legs select pairs by
    # combined container CPU, so the leg workload must stay byte-equal
    # to the committed headline pair's (which predates these two) — the
    # ~700 extra CPU-s they add would otherwise bar every new pair from
    # ever winning the min-CPU comparison, regardless of window quality.
    if not kg_only:
        clock.run("kg_pagerank", lambda: pagerank_integer(result.edges).collect())
        clock.run("kg_triangles", lambda: triangles(result.edges).count())

    def components() -> None:
        scholar_pairs = result.edges.where(
            (F.col("pred") == "NARRATED_FROM")
            & (F.col("src_label") == "Scholar")
            & (F.col("tgt_label") == "Scholar")
        ).select(F.col("src_key").alias("src"), F.col("tgt_key").alias("dst"))
        connected_components(scholar_pairs).groupBy("component").count().collect()

    clock.run("kg_components", components)

    # --- model-NER end-to-end (round-4 verdict next #5): the reference's
    # flagship bottleneck (1.55 docs/s single-threaded on CPU,
    # BASELINE.md) measured as distributed Arrow-batched throughput.
    # Same chunked word-window/max-seq core as production, through the
    # deterministic numpy encoder (no torch in this sandbox); text is
    # tripled so most rows exceed one 120-word window and the chunk
    # logic is actually in the hot path.  Replication via
    # SPARK_GRAFT_MODEL_REPL scales the doc count (default 10x =>
    # 50k docs at sf0.1).
    model_docs = 0
    if not kg_only:
        from islamic_ner_spark.operators.model_ner import model_ner_labels

        model_repl = int(os.environ.get("SPARK_GRAFT_MODEL_REPL", "10"))
        model_docs = n_docs * model_repl
        model_input = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .crossJoin(spark.range(model_repl).select(F.col("id").alias("rep")))
            .select(
                F.concat_ws("-", F.col("doc_id").cast("string"), "rep").alias(
                    "conv_id"
                ),
                F.lit(0).cast("int").alias("turn_idx"),
                F.concat_ws(" ", "text", "text", "text").alias("text"),
            )
            .repartition(cpus * 2)
        )

        def model_ner() -> None:
            model_ner_labels(model_input, None, encoder="numpy").select(
                F.sum(F.size("labels"))
            ).collect()

        admission("model_ner")
        clock.run("model_ner_e2e", model_ner)

    # --- transcript training-data ops over the FULL synthetic corpus ------
    # (outside KG_ONLY so scaling-leg workloads stay byte-identical)
    if not kg_only:
        from islamic_ner_spark.operators.sft import (
            assemble_conversations,
            sft_pairs,
        )

        admission("transcript_ops")
        corpus = spark.read.parquet(staging)

        def run_sft_pairs() -> None:
            # aggregate sink that touches every output column, so column
            # pruning cannot skip the prompt/response window computation
            sft_pairs(corpus).select(
                F.count(F.lit(1)),
                F.sum(F.length("prompt") + F.length("response")),
                F.sum("n_trace_tool_turns"),
            ).collect()

        clock.run("sft_pairs_e2e", run_sft_pairs)

        def run_assemble() -> None:
            assemble_conversations(corpus).select(
                F.count(F.lit(1)), F.sum(F.length("conversation"))
            ).collect()

        clock.run("assemble_convs_e2e", run_assemble)

    # --- relational / text / similarity headliners ------------------------
    if not kg_only:
        admission("sql_headliners")
        for name in (
            "lineitem_pricing_summary",
            "orders_per_nation",
            "events_sessionize",
            "dedup_exact",
            "lang_quality",
            "embedding_topk",
            "events_asof",
            "repetition_filters",
        ):
            clock.run_best_of(
                name,
                lambda name=name: dq.QUERIES[name](spark, sf_dir).collect(),
                best_of,
            )

    shutil.rmtree(staging, ignore_errors=True)
    total = round(sum(clock.timings.values()), 3)

    # contended-window self-flag: cpu_s is the steal-immune
    # work-conservation signal, so comparing the measured kg_build burn
    # against the committed quiet-window reference (scaled by turn
    # count) says directly whether this run's walls are trustworthy.
    contended = None
    kg_cpu = clock.cpu_s.get("kg_build_e2e")
    ref_cpu = KG_BUILD_REF_CPU_S * (n_turns / KG_BUILD_REF_TURNS)
    # linear cpu_s scaling only holds once per-run fixed costs (JVM
    # startup ~50 CPU-s) are amortized; below ~1/10 of the reference
    # workload the flag has no calibrated baseline and stays null
    if kg_cpu is not None and n_turns >= KG_BUILD_REF_TURNS // 10:
        contended = kg_cpu > CONTENTION_TOLERANCE * ref_cpu
        if contended:
            print(
                f"[bench] CONTENDED WINDOW: kg_build_e2e burned {kg_cpu:.0f} "
                f"CPU-s vs committed quiet-window reference {ref_cpu:.0f} "
                f"(>{CONTENTION_TOLERANCE}x) — walls in this run are "
                "inflated by host interference, compare cpu_s not wall",
                file=sys.stderr, flush=True,
            )

    payload = {
        "metric": "kg-build e2e + headline query suite wall time",
        "value": total,
        "unit": "sec",
        "queries": clock.timings,
        "cpu_s": clock.cpu_s,
        "load1": clock.load1,
        "foreign_jvm": clock.foreign_jvm,
        "contended": contended,
        "kg_build_ref_cpu_s": round(ref_cpu, 1),
        "best_of_sql": best_of,
        "sf": sf_dir,
        "cpus": cpus,
        # how many queries()/oracle_sql() entries exist, so a truncated
        # correctness harness run is self-describing (round-4 verdict
        # next #1: the r04 artifact silently attested 50 of 70)
        "queries_total": len(dq.QUERIES),
        "oracles_total": len(dq.ORACLE_SQL),
        "turns": n_turns,
        "triples": counts["triples"],
        "edges": counts["edges"],
        "nodes": counts["nodes"],
        "turns_per_sec": round(n_turns / kg_seconds, 1),
        "triples_per_sec": round(counts["triples"] / kg_seconds, 1),
    }
    if model_docs and "model_ner_e2e" in clock.timings:
        payload["model_docs"] = model_docs
        payload["model_docs_per_sec"] = round(
            model_docs / clock.timings["model_ner_e2e"], 1
        )
    if kg_only:
        # stamped ONLY on KG_ONLY legs: scaling_run compares accumulated
        # pairs by combined container CPU, and that comparison is only
        # meaningful between legs that timed the identical KG_ONLY
        # workload — a full-bench result seeded into the history must
        # never pass for CPU-comparable (ADVICE r4, bench.py:296)
        payload["leg_workload_rev"] = LEG_WORKLOAD_REV
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
