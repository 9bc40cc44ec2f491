"""Regenerate QUERIES.md from the live registry (gate order).

    python tools/gen_queries_md.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HEADER = """# QUERIES — the full registry, gate order (generated)

Emitted by `__spark_entry__.queries()`: priority-100 new work first,
then ascending last-green-driver-round with evidence-depth tiebreak
(gate_history.json, self-healing from the driver's CORRECTNESS files
since round 6), name as final tiebreak; the round driver's oracle gate
checks rows 1-50.  Rotation budget: every oracled query gets a hard
driver row at least every 2 rounds, relaxed to 3 once deeply verified
(>= 3 green rounds) — pinned by tests/test_registry_order.py.
`sidecar` = pinned parquet oracle (trig/iterative kernel; independent
pytest twin).  Every entry is verified bit-exact by
tools/check_oracle.py at sf0.01 this round; independent per-family
evidence is indexed in tests/test_evidence_manifest.py.

| # | query | priority | last driver round | greens | oracle |
|---|---|---|---|---|---|
"""


def main() -> None:
    import __spark_entry__ as m
    from ionex_spark.plans import queries as q

    hist = q.gate_history()
    lines = [HEADER]
    for i, name in enumerate(m.queries(), 1):
        last = q.last_driver_round(name, hist)
        depth = q.evidence_depth(name, hist)
        oracle = "SQL" if name in q.ORACLES else "sidecar/rows-only"
        lines.append(
            f"| {i} | `{name}` | {q.PRIORITY[name]} |"
            f" {last if last else 'never'} | {depth} | {oracle} |\n"
        )
    out = os.path.join(REPO, "QUERIES.md")
    with open(out, "w") as fh:
        fh.writelines(lines)
    print(f"wrote {out}: {i} queries")


if __name__ == "__main__":
    main()
