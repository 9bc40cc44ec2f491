"""Scale probe: cross-epoch bloom dedup with a REALISTIC filter size —
1M-doc corpus, 20M-row increment (5% planted dups), m_bits = 2^24 / k=5
(theoretical FP ~ 2% at 1M entries).  Measures wall time, the measured
false-positive rate, and exactness of is_dup against ground truth.

    python tools/probe_incremental_dedup.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from ionex_spark.operators import dedup as dd
from ionex_spark.session import get_spark


def main() -> None:
    n_corpus = int(os.environ.get("PROBE_CORPUS", "1000000"))
    n_inc = int(os.environ.get("PROBE_INC", "20000000"))
    spark = get_spark("probe-incdedup", master="local[32]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    corpus = spark.range(n_corpus).selectExpr(
        "id as doc_id", "concat('corpus doc ', id, ' body text') as text"
    )
    # 5% of increment rows duplicate a corpus doc (id mod), rest unique
    inc = spark.range(n_inc).selectExpr(
        "id + 10000000 as doc_id",
        f"case when id % 20 = 0 then concat('corpus doc ', id % {n_corpus},"
        " ' body text') else concat('new doc ', id, ' body') end as text",
    )

    t0 = time.time()
    out = dd.incremental_dedup(
        inc, corpus, m_bits=1 << 24, k=5, backend="xxhash64"
    )
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("bloom_candidate").alias("cands"),
        F.sum("is_dup").alias("dups"),
    ).collect()[0]
    wall = time.time() - t0
    true_dups = n_inc // 20
    fp = (agg.cands - agg.dups) / max(1, agg.n - true_dups)
    print(f"rows={agg.n} candidates={agg.cands} dups={agg.dups}"
          f" (expected {true_dups})")
    print(f"wall {wall:.1f}s ({n_inc / wall / 1e6:.1f}M rows/s);"
          f" measured FP rate {fp:.4f}")
    assert agg.dups == true_dups, "is_dup must be exact"
    assert fp < 0.05, fp
    spark.stop()


if __name__ == "__main__":
    main()
