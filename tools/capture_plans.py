"""Dump .explain('formatted') for registered queries to files.

Usage: python tools/capture_plans.py <out_dir> <suffix> [query ...]
       (no queries -> a default heavy set; suffix e.g. 'before'/'after')

Writes <out_dir>/<query>_<suffix>.txt — the optimization-round evidence
files (plans/r07/...).  Queries whose CONSTRUCTION is eager (connected
components' localCheckpoint loop) execute those stages while building;
the captured plan is the final returned DataFrame's.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT = [
    "dedup_minhash_pairs", "dedup_groups", "dedup_groups_star",
    "dedup_simhash_pairs", "dedup_simhash_pairs_bands",
    "dedup_group_representatives", "contamination_safe_split",
    "similarity_ivf", "knn_grid", "knn_points", "knn_points_adaptive",
    "knn_points_metrics", "dedup_containment_pairs",
    "dedup_containment_capped", "token_countmin_sketch",
    "boilerplate_ngram_stats", "domain_pagerank_dangling",
]


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:] or DEFAULT
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entry_mod
    from ionex_spark.session import get_spark

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    for name in names:
        df = queries[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        n_reuse = plan.count("ReusedExchange")
        print(f"{name}: Exchange={n_ex} (reused {n_reuse}) -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
