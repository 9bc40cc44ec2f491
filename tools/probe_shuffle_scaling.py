"""Scaling evidence for a SHUFFLE-heavy path (complements
tools/bench_scaling.py, whose flagship is broadcast-dominated): the
shard_assign two-phase global rank — one full-width repartition + an
in-partition sort + a window — at local[N] vs local[4N] on identical
input.  Results appended to BENCH.md by hand.

    python tools/probe_shuffle_scaling.py           # 2 vs 8 cores
    SCALING_LEVELS=8,32 python tools/probe_shuffle_scaling.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEVELS = tuple(
    int(x) for x in os.environ.get("SCALING_LEVELS", "2,8").split(",")
)
N_ROWS = int(os.environ.get("SPARK_GRAFT_PROBE_N", "20000000"))
RUNS = int(os.environ.get("SCALING_RUNS", "3"))

CHILD = r"""
import sys, time
sys.path.insert(0, {repo!r})
from ionex_spark.operators import shards as sh
from ionex_spark.session import get_spark
spark = get_spark("shuffle-scale", master="local[{cpus}]",
                  shuffle_partitions={cpus},
                  extra_conf={{"spark.sql.adaptive.enabled": "false"}})
spark.sparkContext.setLogLevel("ERROR")
docs = spark.range(0, {n}, 1, {cpus} * 4).selectExpr("id as doc_id")
# warm (codegen + scan)
sh.shard_assign(docs, 20000, n_buckets={cpus} * 4,
                backend="xxhash64").groupBy("shard_id").count().count()
best = None
for _ in range({runs}):
    t0 = time.time()
    n_sh = sh.shard_assign(docs, 20000, n_buckets={cpus} * 4,
                           backend="xxhash64").groupBy("shard_id").count().count()
    dt = time.time() - t0
    best = dt if best is None or dt < best else best
print("RESULT", best, n_sh)
spark.stop()
"""


def run(cpus: int) -> float:
    code = CHILD.format(repo=REPO, cpus=cpus, n=N_ROWS, runs=RUNS)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            return float(line.split()[1])
    raise RuntimeError(out.stderr[-2000:])


def main() -> None:
    lo, hi = LEVELS
    t_lo = run(lo)
    t_hi = run(hi)
    thr_lo, thr_hi = N_ROWS / t_lo, N_ROWS / t_hi
    eff = (thr_hi / thr_lo) / (hi / lo)
    print(json.dumps({
        "job": "shard_assign 20k-row shards (repartition + sort + window)",
        "rows": N_ROWS,
        "levels": [lo, hi],
        "best_sec": [round(t_lo, 2), round(t_hi, 2)],
        "rows_per_sec": [round(thr_lo, 1), round(thr_hi, 1)],
        "scaling_efficiency": round(eff, 3),
        "pass": eff >= 0.8,
    }, indent=1))


if __name__ == "__main__":
    main()
