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


def test_pretrain_data_job_end_to_end_and_resume(spark, tmp_path):
    """The composed pipeline job: clean -> mixture -> shards ->
    manifests equals composing the operators directly, and a second
    invocation skips every chunk in all three phases."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "pretrain_data_job", "/root/repo/jobs/pretrain_data_job.py"
    )
    pj = importlib.util.module_from_spec(spec)
    sys.modules["pretrain_data_job"] = pj
    spec.loader.exec_module(pj)

    from ionex_spark.operators import shards as sh
    from ionex_spark.sources.tableio import SnapshotTable

    docs_path = "/root/testdata/sf0.001/documents.parquet"
    out = str(tmp_path / "pt")
    # only en survives the clean stage at sf0.001 (lang-agreement
    # filter drops synthetic non-en); single-domain mixture = keep-all
    weights = {"en": 1_000_000}
    target = 16
    buckets = 64
    n_chunks = 3

    clean_table, clean_res = pj.clean_phase(
        spark, docs_path, out, "t1", n_chunks, buckets, None
    )
    assert len(clean_res["ran"]) == n_chunks
    n_rows, n_shards, data_res, man_res = pj.shard_phases(
        spark, clean_table, out, "t1", weights, target, n_chunks
    )
    assert data_res["ran"] and man_res["ran"]

    # equality vs direct composition
    direct_clean = job_mod.build_chunk(spark, docs_path, 0, buckets, buckets, None)
    mixed = sh.corpus_mixture_sample(direct_clean, "lang", weights)
    assigned = sh.shard_assign(mixed, target)
    expect_manifest = {
        r.shard_id: (r.n_rows, r.content_hash)
        for r in sh.shard_manifest(
            assigned, text_col="fingerprint", bytes_col="n_tokens"
        ).collect()
    }
    got_manifest = {
        r.shard_id: (r.n_rows, r.content_hash)
        for r in SnapshotTable(out + "/shards_manifest").read(spark).collect()
    }
    assert got_manifest == expect_manifest and len(got_manifest) == n_shards
    assert SnapshotTable(out + "/shards").read(spark).count() == n_rows
    assert n_rows == mixed.count()

    # resume: everything skips
    _, clean_res2 = pj.clean_phase(
        spark, docs_path, out, "t1", n_chunks, buckets, None
    )
    assert not clean_res2["ran"] and len(clean_res2["skipped"]) == n_chunks
    _, _, data_res2, man_res2 = pj.shard_phases(
        spark, clean_table, out, "t1", weights, target, n_chunks
    )
    assert not data_res2["ran"] and not man_res2["ran"]
