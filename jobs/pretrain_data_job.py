"""Production entry point: the FULL pretraining-data pipeline in one
resumable spark-submit job — quality filter -> (optional) benchmark
decontamination -> exact dedup -> weighted mixture -> fixed-size
training shards + per-shard manifests.

    python tools/make_pyfiles.py            # builds dist/ionex_spark.zip
    spark-submit --master local[32] \
        --py-files dist/ionex_spark.zip \
        jobs/pretrain_data_job.py \
        --docs /root/testdata/sf0.1/documents.parquet \
        --out /tmp/pretrain --job-id run1 \
        --weights '{"en": 1000000}' \
        --target-rows 256 --chunks 4

    NOTE on --weights: the clean phase keeps only languages in
    corpus_pipeline_job.SAMPLE_FRACS whose text passes the
    language-agreement filter (on the synthetic corpus only en
    survives) — weight only languages that survive cleaning;
    shard_phases raises EARLY with the observed counts otherwise,
    before any shard work runs.

Three phases, each a ResumableJob over its own snapshot table, so a
crash anywhere resumes at chunk granularity without recomputing or
duplicating anything:

1. CLEAN  (<out>/clean):  corpus_pipeline_job.build_chunk per
   content-hash range — quality filter, optional decontamination,
   exact dedup representatives.  Chunking by md5(text) range makes
   per-chunk dedup globally exact.
2. DATA   (<out>/shards): weighted mixture over the committed clean
   table (deterministic integer thresholds), then shard_assign —
   every chunk recomputes the pure-function assignment and appends
   only its own shard range (disjoint by construction).
3. MANIFEST (<out>/shards_manifest): per-shard rows/bytes/checksum
   rolled up from the committed data, which verify_shards can audit
   at load time.

All three tables are time-travelable snapshots; the training loader
reads (shards, shards_manifest) and verifies integrity per shard.
"""

from __future__ import annotations

import argparse
import json
import math

from pyspark.sql import SparkSession


def clean_phase(spark, docs_path, out, job_id, chunks, hash_buckets,
                bench_path):
    import importlib.util
    import os
    import sys

    from ionex_spark.sources.tableio import ResumableJob, SnapshotTable

    spec = importlib.util.spec_from_file_location(
        "corpus_pipeline_job",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "corpus_pipeline_job.py"),
    )
    cp = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("corpus_pipeline_job", cp)
    spec.loader.exec_module(cp)

    table = SnapshotTable(out + "/clean")
    job = ResumableJob(table, f"{job_id}-clean")
    res = job.run(spark, [
        (
            f"clean-{i:04d}",
            (lambda lo, hi: lambda s: cp.build_chunk(
                s, docs_path, lo, hi, hash_buckets, bench_path
            ))(lo, hi),
        )
        for i, (lo, hi) in enumerate(
            cp.chunk_ranges(hash_buckets, chunks)
        )
    ])
    return table, res


def shard_phases(spark, clean_table, out, job_id, weights, target_rows,
                 chunks):
    from ionex_spark.operators import shards as sh
    from ionex_spark.sources.tableio import ResumableJob, SnapshotTable

    def compute_assigned(s):
        docs = clean_table.read(s)
        if weights:
            counts = {
                r[0]: r[1]
                for r in docs.groupBy("lang").count().collect()
            }
            missing = [d for d in weights if counts.get(d, 0) <= 0]
            if missing:
                raise ValueError(
                    f"mixture domains {missing} have no rows after the"
                    f" clean phase (observed: {counts}); weight only"
                    " languages that survive cleaning"
                )
            docs = sh.corpus_mixture_sample(docs, "lang", weights)
        return sh.shard_assign(docs, target_rows)

    # compute the (pure, deterministic) assignment ONCE per process and
    # let every chunk filter the checkpointed frame — the resume design
    # only needs chunks to be pure functions across PROCESS restarts,
    # not to recompute the mixture counts + bucket offsets per chunk
    # (review finding: 1 + chunks full recomputations)
    assigned_df = compute_assigned(spark).localCheckpoint(eager=True)

    def assigned(s):
        return assigned_df

    n_rows = assigned_df.count()
    n_shards = max(1, math.ceil(n_rows / target_rows))
    per = math.ceil(n_shards / chunks)
    ranges = [
        (i * per, min((i + 1) * per, n_shards))
        for i in range(chunks)
        if i * per < n_shards
    ]

    data_table = SnapshotTable(out + "/shards")
    data_job = ResumableJob(data_table, f"{job_id}-data")
    data_res = data_job.run(spark, [
        (
            f"shards-{lo:06d}-{hi:06d}",
            (lambda lo=lo, hi=hi: lambda s: assigned(s).filter(
                f"shard_id >= {lo} and shard_id < {hi}"
            ).select("doc_id", "lang", "n_tokens", "fingerprint",
                     "shard_id", "shard_pos"))(),
        )
        for lo, hi in ranges
    ])

    man_table = SnapshotTable(out + "/shards_manifest")
    man_job = ResumableJob(man_table, f"{job_id}-manifest")

    def manifest_chunk(lo, hi):
        def fn(s):
            from ionex_spark.operators import shards as sh2

            data = data_table.read(s).filter(
                f"shard_id >= {lo} and shard_id < {hi}"
            )
            # the clean table carries the md5-based doc fingerprint —
            # checksumming (id, fingerprint) identifies content without
            # dragging full text through the shard tables; n_bytes is
            # reported in TOKENS (the budget the loader actually cares
            # about)
            return sh2.shard_manifest(
                data, text_col="fingerprint", bytes_col="n_tokens"
            )
        return fn

    man_res = man_job.run(spark, [
        (f"manifest-{lo:06d}-{hi:06d}", manifest_chunk(lo, hi))
        for lo, hi in ranges
    ])
    return n_rows, n_shards, data_res, man_res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--job-id", default="pretrain-data")
    ap.add_argument("--weights", default=None)
    ap.add_argument("--target-rows", type=int, default=4096)
    ap.add_argument("--chunks", type=int, default=8)
    ap.add_argument("--hash-buckets", type=int, default=1024)
    ap.add_argument("--bench", default=None,
                    help="parquet of benchmark docs; enables decontam")
    args = ap.parse_args()
    weights = json.loads(args.weights) if args.weights else None

    spark = SparkSession.builder.appName("pretrain-data").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    clean_table, clean_res = clean_phase(
        spark, args.docs, args.out, args.job_id, args.chunks,
        args.hash_buckets, args.bench,
    )
    n_rows, n_shards, data_res, man_res = shard_phases(
        spark, clean_table, args.out, args.job_id, weights,
        args.target_rows, args.chunks,
    )
    print(json.dumps({
        "job_id": args.job_id,
        "clean_rows": sum(r["rows"] for r in clean_res["lineage"]),
        "mixture_rows": n_rows,
        "n_shards": n_shards,
        "clean": {k: clean_res[k] for k in ("ran", "skipped", "recovered")},
        "data": {k: data_res[k] for k in ("ran", "skipped", "recovered")},
        "manifest": {k: man_res[k] for k in ("ran", "skipped", "recovered")},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
