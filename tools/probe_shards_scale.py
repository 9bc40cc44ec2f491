"""Scale probe: shard assignment + mixture sampling at tens of millions
of rows — evidence the two-phase no-global-sort shapes hold past gate
scale (round-6 additions; results recorded in BENCH.md).

    python tools/probe_shards_scale.py          # 20M rows
    SPARK_GRAFT_PROBE_N=5000000 python tools/probe_shards_scale.py

Checks at scale (exact, computed distributively — nothing collected but
scalars):
- rows mode: every shard except the last has exactly target_rows rows;
  shard ids are contiguous 0..n-1.
- bytes mode: total bytes conserved; every shard's bytes (minus its
  last doc) is under target (greedy-fill invariant twin).
- mixture: per-domain share of the sample matches the ppm target
  within the hash-gate's binomial noise.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from ionex_spark.operators import shards as sh
from ionex_spark.session import get_spark


def main() -> None:
    n = int(os.environ.get("SPARK_GRAFT_PROBE_N", "20000000"))
    spark = get_spark("probe-shards", master="local[32]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.range(0, n, 1, 128).selectExpr(
        "id as doc_id",
        "case when id % 10 < 6 then 'en' when id % 10 < 8 then 'zh'"
        " when id % 10 < 9 then 'de' else 'fr' end as lang",
        "100 + (id % 400) as n_chars",
    )

    # ---- rows mode
    target = 20_000
    t0 = time.time()
    a = sh.shard_assign(docs, target, n_buckets=128)
    sizes = a.groupBy("shard_id").count().collect()
    t_rows = time.time() - t0
    by = {r.shard_id: r["count"] for r in sizes}
    n_shards = max(by) + 1
    assert set(by) == set(range(n_shards))
    bad = [s for s in range(n_shards - 1) if by[s] != target]
    assert not bad, bad[:5]
    assert sum(by.values()) == n
    print(f"rows-mode: {n} rows -> {n_shards} shards of {target}"
          f" in {t_rows:.1f}s ({n / t_rows / 1e6:.1f}M rows/s) — exact")

    # ---- rows mode, xxhash64 production backend
    t0 = time.time()
    ax = sh.shard_assign(docs, target, n_buckets=128, backend="xxhash64")
    sizes_x = ax.groupBy("shard_id").count().collect()
    t_x = time.time() - t0
    by_x = {r.shard_id: r["count"] for r in sizes_x}
    assert sum(by_x.values()) == n
    assert all(by_x[s] == target for s in range(len(by_x) - 1))
    print(f"rows-mode/xxhash64: {t_x:.1f}s ({n / t_x / 1e6:.1f}M rows/s)"
          f" — {t_rows / t_x:.1f}x faster than md5")

    # ---- bytes mode
    tbytes = 30_000_000
    t0 = time.time()
    b = sh.shard_assign_bytes(docs, tbytes, n_buckets=128)
    agg = b.groupBy("shard_id").agg(
        F.expr("cast(sum(n_chars) as bigint) as bytes"),
        F.expr("max(n_chars) as max_doc"),
        F.count(F.lit(1)).alias("rows"),
    ).collect()
    t_bytes = time.time() - t0
    total = sum(r.bytes for r in agg)
    assert total == docs.selectExpr(
        "cast(sum(n_chars) as bigint) v").collect()[0].v
    # greedy fill: a shard minus its final doc is under budget
    over = [r for r in agg if r.bytes - r.max_doc >= tbytes]
    assert not over, over[:3]
    print(f"bytes-mode: {n} rows -> {len(agg)} shards ~{tbytes} B"
          f" in {t_bytes:.1f}s ({n / t_bytes / 1e6:.1f}M rows/s)"
          " — conserved + under-budget")

    # ---- mixture
    weights = {"en": 500_000, "zh": 300_000, "de": 200_000}
    t0 = time.time()
    m = sh.corpus_mixture_sample(docs, "lang", weights)
    got = {r.lang: r["count"] for r in m.groupBy("lang").count().collect()}
    t_mix = time.time() - t0
    tot = sum(got.values())
    for d, w in weights.items():
        share = got[d] / tot
        assert abs(share - w / 1e6) < 0.003, (d, share)
    print(f"mixture: {n} rows -> {tot} sampled in {t_mix:.1f}s"
          f" ({n / t_mix / 1e6:.1f}M rows/s); shares "
          + ", ".join(f"{d}={got[d] / tot:.4f}" for d in weights))
    spark.stop()


if __name__ == "__main__":
    main()
