"""Regenerate ionex_spark/plans/gate_history.json from CORRECTNESS_r*.json.

The round driver's oracle gate checks only the first 50 registry entries,
so each round ~50 queries ride outside the hard gate.  To guarantee no
oracled query goes stale beyond its tier's budget (2 rounds, or 3 once
deeply verified — see ionex_spark/plans/queries.py), the registry orders
entries by how stale their driver evidence is.  The evidence comes from
the driver's own output files: a query's `last round` is the newest
CORRECTNESS_rNN.json in which it has a fully green row (rows + schema +
hash match).

Since round 6 regeneration is SELF-HEALING: queries.gate_history()
detects a CORRECTNESS file newer than the committed JSON and regenerates
in-place automatically.  This wrapper remains for explicit runs:

    python tools/gen_gate_history.py
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "ionex_spark", "plans", "gate_history.json")

sys.path.insert(0, REPO)

from ionex_spark.plans.queries import build_history  # noqa: E402


def build() -> dict:
    return build_history(REPO)


def main() -> None:
    hist = build()
    with open(OUT, "w") as f:
        json.dump(hist, f, indent=1, sort_keys=True)
        f.write("\n")
    n = len(hist["rounds"])
    print(f"wrote {OUT}: {n} queries, latest_round={hist['latest_round']}")


if __name__ == "__main__":
    main()
