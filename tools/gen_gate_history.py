"""Regenerate ionex_spark/plans/gate_history.json from CORRECTNESS_r*.json.

The round driver's oracle gate checks only the first 50 registry entries,
so each round ~39 queries ride outside the hard gate.  To guarantee no
oracled query goes >= 2 rounds without a green driver row (round-4
verdict task #1), the registry orders entries by how stale their driver
evidence is.  This tool derives that evidence from the driver's own
output files: a query's `last round` is the newest CORRECTNESS_rNN.json
in which it has a fully green row (rows + schema + hash match).

Run from the repo root after each round lands a new CORRECTNESS file:

    python tools/gen_gate_history.py

and commit the regenerated JSON.  tests/test_registry_order.py fails if
the JSON is stale (a newer CORRECTNESS file exists than the recorded
latest_round).
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "ionex_spark", "plans", "gate_history.json")


def build() -> dict:
    rounds: dict[str, list[int]] = {}
    latest = 0
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        latest = max(latest, rnd)
        data = json.load(open(path))
        for name, row in data.items():
            green = bool(
                row.get("rows_match")
                and row.get("hash_match")
                and row.get("schema_match", True)
            )
            if green:
                rounds.setdefault(name, []).append(rnd)
    return {
        "latest_round": latest,
        "rounds": {k: sorted(v) for k, v in sorted(rounds.items())},
    }


def main() -> None:
    hist = build()
    with open(OUT, "w") as f:
        json.dump(hist, f, indent=1, sort_keys=True)
        f.write("\n")
    n = len(hist["rounds"])
    print(f"wrote {OUT}: {n} queries, latest_round={hist['latest_round']}")


if __name__ == "__main__":
    main()
