"""Builder-run full-registry oracle report — compensating rotation evidence.

Replays the driver's correctness gate (tools/check_oracle.py comparison:
row count, column names, order-insensitive bit-exact values) over EVERY
registered query, and writes the result as ORACLE_REPORT_r<NN>.json in the
repo root using the same row shape as the driver's CORRECTNESS files:

    {"<query>": {"rows_match": bool, "schema_match": bool,
                 "hash_match": bool, "spark_rows": int,
                 "oracle_rows": int, "err": str | null}}

Why it exists (round-6 verdict task #1): the registry (115 oracled
queries) arithmetically outgrew the driver's 50-entry gate window at the
2/3-round staleness budgets, so "every query re-verified every <= budget
rounds" needs a second evidence channel.  ionex_spark.plans.queries
reads these committed reports into gate_history()["builder_rounds"];
staleness (tests/test_registry_order.py) runs on the newest evidence of
either kind, while window ORDERING stays driver-only so every query
still cycles through the hard gate.

Usage: python tools/gen_oracle_report.py [sf_dir] [round]
       (defaults: /root/testdata/sf0.01, ionex_spark current_round)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from check_oracle import compare, duck_con  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import __spark_entry__ as entry_mod
    from ionex_spark.plans import queries as q
    from ionex_spark.session import get_spark

    rnd = int(sys.argv[2]) if len(sys.argv) > 2 else q.current_round()
    out_path = os.path.join(REPO, f"ORACLE_REPORT_r{rnd:02d}.json")

    spark = get_spark("oracle-report")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_con(sf_dir)
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    report: dict[str, dict] = {}
    n_green = 0
    for name, fn in queries.items():
        if name not in oracles:
            continue  # report covers oracled queries only
        t0 = time.time()
        row = {
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "spark_rows": 0,
            "oracle_rows": 0,
            "err": None,
        }
        try:
            sdf = fn(spark, sf_dir).toPandas()
            row["spark_rows"] = int(len(sdf))
            odf = con.execute(oracles[name]).fetchdf()
            row["oracle_rows"] = int(len(odf))
            errs = compare(name, sdf, odf)
            if errs:
                row["err"] = "; ".join(errs[:3])
            else:
                row.update(
                    rows_match=True, schema_match=True, hash_match=True
                )
                n_green += 1
        except Exception as e:  # noqa: BLE001
            row["err"] = f"{type(e).__name__}: {e}"[:500]
        report[name] = row
        status = "ok" if row["hash_match"] else "FAIL"
        print(f"[{status}] {name} ({time.time() - t0:.1f}s)")

    with open(out_path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
        f.write("\n")
    n = len(report)
    print(f"\nwrote {out_path}: {n_green}/{n} green")
    spark.stop()
    sys.exit(0 if n_green == n else 1)


if __name__ == "__main__":
    main()
