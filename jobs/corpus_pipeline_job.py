"""Production entry point: training-corpus pipeline over a documents
table — quality filter -> (optional) benchmark decontamination ->
exact dedup -> stratified rebalance — chunked,
resumable, launched via spark-submit.

    python tools/make_pyfiles.py            # builds dist/ionex_spark.zip
    spark-submit --master local[32] \
        --py-files dist/ionex_spark.zip \
        jobs/corpus_pipeline_job.py \
        --docs /root/testdata/sf0.1/documents.parquet \
        --out /tmp/corpus_tbl --job-id run1 --chunks 8

Each chunk covers a deterministic hash range of doc ids, applies the
composed ingest filter (token bounds x quality floor x language
agreement — the corpus_quality_filter predicates), keeps only exact-dedup
representatives WITHIN the chunk's range (hash ranges partition the
corpus, and the dedup hash is the content hash, so duplicates spanning
chunks land in the same chunk by construction: the range key IS
md5(text)), then applies the deterministic per-language stratified
sample.  Completed chunks commit one snapshot + lineage record each;
re-running with the same --job-id skips them (crash-resume).
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession, functions as F

SAMPLE_FRACS = {"en": 0.9, "de": 0.7, "fr": 0.5, "es": 0.5}


def build_chunk(
    spark, docs_path: str, lo: int, hi: int, buckets: int,
    bench_path: str | None = None,
):
    from ionex_spark.operators import text as tx

    docs = spark.read.parquet(docs_path)
    # chunk by CONTENT-hash range so all copies of a duplicate document
    # fall into the same chunk — per-chunk dedup is then globally exact
    part = f"pmod(xxhash64(md5(text)), {buckets})"
    mine = docs.filter(f"{part} >= {lo} and {part} < {hi}")
    feats = tx.with_text_features(mine)
    kept = feats.filter(tx.QUALITY_FILTER_SQL)
    if bench_path:
        # benchmark DECONTAMINATION: drop any doc sharing a word-trigram
        # shingle with the eval set.  Chunk-safe by construction: the
        # predicate depends only on the doc's own shingles and the
        # GLOBAL (broadcast) benchmark index, never on other chunks.
        from ionex_spark.operators.decontam import contamination_hits

        bench = spark.read.parquet(bench_path).selectExpr(
            "doc_id as bench_id", "text"
        )
        dirty = contamination_hits(kept, bench).select("doc_id")
        kept = kept.join(dirty, "doc_id", "left_anti")
    from pyspark.sql.window import Window

    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    reps = (
        kept.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .drop("rn")
    )
    sampled = tx.stratified_sample(reps, "lang", SAMPLE_FRACS)
    return sampled.select(
        "doc_id", "lang", "n_tokens", "quality", "fingerprint"
    )


def chunk_ranges(hash_buckets: int, chunks: int) -> list[tuple[int, int]]:
    """Contiguous hash-bucket ranges covering [0, hash_buckets) in
    ``chunks`` pieces (last takes the remainder).  Shared by this job
    and jobs/pretrain_data_job.py so the range math lives once; chunks
    is clamped to hash_buckets so per-chunk width is never zero."""
    chunks = max(1, min(chunks, hash_buckets))
    per = hash_buckets // chunks
    return [
        (i * per, hash_buckets if i == chunks - 1 else (i + 1) * per)
        for i in range(chunks)
    ]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--job-id", default="corpus-pipeline")
    ap.add_argument("--chunks", type=int, default=8)
    ap.add_argument("--hash-buckets", type=int, default=1024)
    ap.add_argument("--bench", default=None,
                    help="parquet of benchmark docs (doc_id, text);"
                    " enables n-gram decontamination")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("corpus-pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from ionex_spark.sources.tableio import ResumableJob, SnapshotTable

    table = SnapshotTable(args.out)
    job = ResumableJob(table, args.job_id)
    chunks = [
        (
            f"chunk-{i:04d}",
            (lambda lo, hi: lambda s: build_chunk(
                s, args.docs, lo, hi, args.hash_buckets, args.bench
            ))(lo, hi),
        )
        for i, (lo, hi) in enumerate(
            chunk_ranges(args.hash_buckets, args.chunks)
        )
    ]
    result = job.run(spark, chunks)
    print(
        json.dumps(
            {
                "job_id": args.job_id,
                "ran": result["ran"],
                "skipped": result["skipped"],
                "recovered": result["recovered"],
                "rows_out": sum(r["rows"] for r in result["lineage"]),
                "snapshot": table.current_snapshot()["snapshot_id"],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
