"""Production entry point: weighted mixture -> fixed-size training
shards with per-shard manifests — the tokens-to-training-shards last
mile (round-5 verdict task #3), chunked, resumable, spark-submit ready.

    python tools/make_pyfiles.py            # builds dist/ionex_spark.zip
    spark-submit --master local[32] \
        --py-files dist/ionex_spark.zip \
        jobs/shard_writer_job.py \
        --docs /root/testdata/sf0.1/documents.parquet \
        --out /tmp/shards_tbl --job-id run1 \
        --weights '{"en": 600000, "zh": 250000, "de": 150000}' \
        --target-rows 64 --chunks 4

Phase 1 (data): shard assignment is a pure function of doc ids
(operators.shards.shard_assign), so each chunk recomputes it and
appends only its own shard-id range — chunk outputs are disjoint by
construction, and a crashed run resumes without re-appending
(ResumableJob snapshot+lineage dedup).  Phase 2 (manifest): one chunk
per shard range rolls its committed data back up into manifest rows
(shard_id, n_rows, n_bytes, content_hash) in a sibling snapshot table;
a training loader reads the manifest table, streams shards, and
verifies the checksum — both phases land in snapshot tables, so both
are time-travelable.
"""

from __future__ import annotations

import argparse
import json
import math

from pyspark.sql import SparkSession


def assigned_docs(spark, docs_path: str, weights: dict | None,
                  target_rows: int):
    from ionex_spark.operators import shards as sh

    docs = spark.read.parquet(docs_path)
    if weights:
        docs = sh.corpus_mixture_sample(docs, "lang", weights)
    return sh.shard_assign(docs, target_rows)


def data_chunk(spark, docs_path, weights, target_rows, shard_lo, shard_hi):
    a = assigned_docs(spark, docs_path, weights, target_rows)
    return a.filter(
        f"shard_id >= {shard_lo} and shard_id < {shard_hi}"
    ).select("doc_id", "lang", "source", "text", "shard_id", "shard_pos")


def manifest_chunk(spark, data_table, shard_lo, shard_hi):
    from ionex_spark.operators import shards as sh

    data = data_table.read(spark).filter(
        f"shard_id >= {shard_lo} and shard_id < {shard_hi}"
    )
    return sh.shard_manifest(data)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--job-id", default="shard-writer")
    ap.add_argument("--weights", default=None,
                    help="JSON {domain: ppm} mixture weights over lang;"
                    " omit to shard the full input")
    ap.add_argument("--target-rows", type=int, default=4096)
    ap.add_argument("--chunks", type=int, default=8)
    args = ap.parse_args()
    weights = json.loads(args.weights) if args.weights else None

    spark = SparkSession.builder.appName("shard-writer").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from ionex_spark.sources.tableio import ResumableJob, SnapshotTable

    # one cheap pre-pass: how many shards exist (count after mixture)
    n_rows = assigned_docs(spark, args.docs, weights, args.target_rows).count()
    n_shards = max(1, math.ceil(n_rows / args.target_rows))
    per = math.ceil(n_shards / args.chunks)
    ranges = [
        (i * per, min((i + 1) * per, n_shards))
        for i in range(args.chunks)
        if i * per < n_shards
    ]

    data_table = SnapshotTable(args.out)
    data_job = ResumableJob(data_table, f"{args.job_id}-data")
    data_res = data_job.run(spark, [
        (
            f"shards-{lo:06d}-{hi:06d}",
            (lambda lo=lo, hi=hi: lambda s: data_chunk(
                s, args.docs, weights, args.target_rows, lo, hi
            ))(),
        )
        for lo, hi in ranges
    ])

    man_table = SnapshotTable(args.out + "_manifest")
    man_job = ResumableJob(man_table, f"{args.job_id}-manifest")
    man_res = man_job.run(spark, [
        (
            f"manifest-{lo:06d}-{hi:06d}",
            (lambda lo=lo, hi=hi: lambda s: manifest_chunk(
                s, data_table, lo, hi
            ))(),
        )
        for lo, hi in ranges
    ])

    print(json.dumps({
        "job_id": args.job_id,
        "rows": n_rows,
        "n_shards": n_shards,
        "data": {k: data_res[k] for k in ("ran", "skipped", "recovered")},
        "manifest": {k: man_res[k] for k in ("ran", "skipped", "recovered")},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
