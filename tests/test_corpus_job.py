"""Chunked corpus pipeline == single pass, including decontamination.

The job's correctness claim: chunking by CONTENT-hash range makes
per-chunk exact dedup globally exact, and the decontamination predicate
is per-document (global broadcast benchmark index), so the union of
chunk outputs must equal the unchunked run row-for-row.
"""

import importlib.util
import sys

import pytest

pytestmark = pytest.mark.spark

spec = importlib.util.spec_from_file_location(
    "corpus_pipeline_job", "/root/repo/jobs/corpus_pipeline_job.py"
)
job_mod = importlib.util.module_from_spec(spec)
sys.modules["corpus_pipeline_job"] = job_mod
spec.loader.exec_module(job_mod)


def test_chunked_equals_single_pass_with_decontam(spark, tmp_path):
    docs_path = "/root/testdata/sf0.001/documents.parquet"
    bench_path = str(tmp_path / "bench.parquet")
    # benchmark set: every 7th doc (so contamination actually triggers
    # through exact duplicates and shared shingles)
    spark.read.parquet(docs_path).filter("doc_id % 7 = 0").select(
        "doc_id", "text"
    ).write.parquet(bench_path)

    buckets = 64
    single = (
        job_mod.build_chunk(spark, docs_path, 0, buckets, buckets, bench_path)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    parts = []
    for lo, hi in ((0, 21), (21, 40), (40, 64)):
        parts.append(
            job_mod.build_chunk(
                spark, docs_path, lo, hi, buckets, bench_path
            ).toPandas()
        )
    import pandas as pd

    chunked = (
        pd.concat(parts).sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(single, chunked)
    # decontamination actually removed something (bench members' exact
    # duplicates and near-identical docs)
    no_bench = (
        job_mod.build_chunk(spark, docs_path, 0, buckets, buckets, None)
        .toPandas()
    )
    assert len(single) < len(no_bench)
