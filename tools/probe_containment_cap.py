"""Scale probe (round-5 verdict task #4): one planted boilerplate
shingle across N docs makes the UNCAPPED containment index join
quadratic in N — C(N,2) candidate rows from that single token — while
the df-cap drops it from the index and stays flat.

    python tools/probe_containment_cap.py           # full ladder
    SPARK_GRAFT_PROBE_N=20000 python tools/probe_containment_cap.py

Each doc = one shared boilerplate trigram + unique filler trigrams, so
the hot token is the ONLY cross-doc shingle: candidate volume isolates
the effect being probed.  Results land in BENCH.md by hand.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from ionex_spark.operators import dedup as dd
from ionex_spark.session import get_spark


def docs_with_boilerplate(spark, n: int):
    # 'hot hot hot' is the planted df=n trigram; the id-derived words
    # make every other trigram unique to its doc
    return spark.range(n).selectExpr(
        "id as doc_id",
        "concat('hot hot hot u', id, 'a u', id, 'b u', id, 'c u', id, 'd')"
        " as text",
    )


def run(spark, n: int, cap):
    docs = docs_with_boilerplate(spark, n)
    t0 = time.time()
    out = dd.containment_pairs(
        docs, n=3, min_containment=0.6, max_doc_freq=cap
    ).count()
    return time.time() - t0, out


def main():
    spark = get_spark("probe-cap", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    n_max = int(os.environ.get("SPARK_GRAFT_PROBE_N", "100000"))
    print("n, mode, seconds, pairs_out")
    for n in (5000, 10000, 20000):
        if n > n_max:
            break
        s, out = run(spark, n, cap=None)
        print(f"{n}, uncapped, {s:.2f}, {out}")
    s, out = run(spark, n_max, cap=1000)
    print(f"{n_max}, capped@1000, {s:.2f}, {out}")
    spark.stop()


if __name__ == "__main__":
    main()
