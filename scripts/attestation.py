"""Regenerate ATTESTATION.json: {query: first round with an official
driver-attested green CORRECTNESS row}.

Reads every committed CORRECTNESS_r*.json (the driver's own artifacts —
history, never edited) and records, per registry entry, the first round
whose row was fully green (rows/schema/hash all matching, no error).
Entries the driver has never attested map to null, so window-rotation
gaps are auditable without diffing the per-round files by hand.

Usage: python scripts/attestation.py   (writes ATTESTATION.json)
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    from islamic_ner_spark.plans.driver_queries import QUERIES

    first: dict[str, int | None] = {}
    rounds = sorted(
        REPO.glob("CORRECTNESS_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    )
    for path in rounds:
        rnd = int(re.search(r"r(\d+)", path.name).group(1))
        data = json.loads(path.read_text())
        for name, row in data.items():
            green = (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") is not False  # rows-only ops: null ok
                and not row.get("err")
            )
            if green and name not in first:
                first[name] = rnd

    out = {name: first.get(name) for name in QUERIES}
    attested = sum(1 for v in out.values() if v is not None)
    payload = {
        "attested_union": attested,
        "registry_total": len(out),
        "first_attested_round": out,
        "source": [p.name for p in rounds],
    }
    (REPO / "ATTESTATION.json").write_text(json.dumps(payload, indent=2) + "\n")
    print(
        f"ATTESTATION.json: {attested}/{len(out)} attested across "
        f"{len(rounds)} rounds; never attested: "
        f"{sorted(k for k, v in out.items() if v is None)}"
    )


if __name__ == "__main__":
    main()
