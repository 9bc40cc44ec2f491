"""Mixture sampling + fixed-size sharding — independent Python/hashlib
references (no shared SQL fragments) and the shard-writer crash-resume.
"""

import hashlib
import importlib.util
import json
import sys

import pytest

sys.path.insert(0, "/root/repo")

from ionex_spark.operators import shards as sh  # noqa: E402

pytestmark = pytest.mark.spark

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _md5int(seed: int, value: str, nhex: int = 15) -> int:
    return int(hashlib.md5(f"{seed}:{value}".encode()).hexdigest()[:nhex], 16)


def test_mixture_thresholds_exact_arithmetic():
    """Thresholds re-derived with fractions.Fraction (fully independent
    of the integer-floor implementation) must agree after flooring."""
    from fractions import Fraction

    counts = {"en": 1000, "zh": 400, "de": 55}
    weights = {"en": 600_000, "zh": 300_000, "de": 100_000}
    got = sh.mixture_thresholds(counts, weights)
    c = min((Fraction(counts[d] * 1_000_000, w)) for d, w in weights.items())
    c = int(c)  # floor
    for d, w in weights.items():
        expect = int(Fraction(10_000 * c * w, 1_000_000 * counts[d]))
        assert got[d] == expect
    # composition: expected kept docs proportional to weights (within
    # the 1/10000 hash-gate granularity)
    kept = {d: got[d] * counts[d] / 10_000 for d in weights}
    total = sum(kept.values())
    for d, w in weights.items():
        assert abs(kept[d] / total - w / 1_000_000) < 0.01
    # no domain upsampled
    assert all(t <= 10_000 for t in got.values())


def test_mixture_thresholds_guards():
    with pytest.raises(ValueError, match="no rows"):
        sh.mixture_thresholds({"en": 10}, {"en": 500_000, "zh": 500_000})
    with pytest.raises(ValueError, match="positive"):
        sh.mixture_thresholds({"en": 10}, {"en": 0})


def test_mixture_sample_matches_hashlib_reference(spark):
    """The sampled id set recomputed row-by-row in pure Python hashlib
    (independent md5 path) must match the engine's output exactly."""
    docs = spark.read.parquet(DOCS)
    rows = docs.select("doc_id", "lang").collect()
    weights = {"en": 500_000, "zh": 300_000, "de": 200_000}
    counts = {}
    for r in rows:
        counts[r.lang] = counts.get(r.lang, 0) + 1
    thr = sh.mixture_thresholds(
        {d: counts[d] for d in weights}, weights
    )
    expect = {
        r.doc_id
        for r in rows
        if r.lang in thr
        and _md5int(7, f"mix:{r.doc_id}") % 10_000 < thr[r.lang]
    }
    got = {
        r.doc_id
        for r in sh.corpus_mixture_sample(docs, "lang", weights)
        .select("doc_id").collect()
    }
    assert got == expect and len(got) > 0


def test_shard_assign_matches_single_sort_reference(spark):
    """The two-phase bucketed global rank must equal a plain Python
    sort by (md5 order hash, id): same shard_id and shard_pos per doc,
    every shard exactly target-sized except the last."""
    docs = spark.read.parquet(DOCS)
    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    order = sorted(ids, key=lambda i: (_md5int(11, str(i)), i))
    target = 7
    expect = {
        doc: (rank // target, rank % target)
        for rank, doc in enumerate(order)
    }
    got = {
        r.doc_id: (r.shard_id, r.shard_pos)
        for r in sh.shard_assign(docs, target, n_buckets=5)
        .select("doc_id", "shard_id", "shard_pos").collect()
    }
    assert got == expect
    sizes = {}
    for s, _ in got.values():
        sizes[s] = sizes.get(s, 0) + 1
    n_shards = max(sizes) + 1
    for s in range(n_shards - 1):
        assert sizes[s] == target
    assert 1 <= sizes[n_shards - 1] <= target


def test_shard_manifest_checksum_hashlib_reference(spark):
    docs = spark.read.parquet(DOCS)
    content = {
        r.doc_id: (r.text, r.n_chars)
        for r in docs.select("doc_id", "text", "n_chars").collect()
    }
    target = 16
    assigned = sh.shard_assign(docs, target)
    man = {
        r.shard_id: r
        for r in sh.shard_manifest(assigned, bytes_col="n_chars").collect()
    }
    order = sorted(content, key=lambda i: (_md5int(11, str(i)), i))
    by_shard = {}
    for rank, doc in enumerate(order):
        by_shard.setdefault(rank // target, []).append(doc)
    assert set(man) == set(by_shard)
    for s, members in by_shard.items():
        assert man[s].n_rows == len(members)
        assert man[s].n_bytes == sum(content[d][1] for d in members)
        expect_hash = sum(
            int(
                hashlib.md5(f"13:{d}:{content[d][0]}".encode())
                .hexdigest()[:12],
                16,
            )
            for d in members
        )
        assert man[s].content_hash == expect_hash


def test_shard_assign_guards(spark):
    docs = spark.read.parquet(DOCS)
    with pytest.raises(ValueError, match="positive"):
        sh.shard_assign(docs, 0)
    with pytest.raises(ValueError, match="overflow"):
        sh.shard_assign(docs, 100_000)


def _load_job():
    spec = importlib.util.spec_from_file_location(
        "shard_writer_job", "/root/repo/jobs/shard_writer_job.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["shard_writer_job"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_shard_writer_job_crash_resume(spark, tmp_path):
    """Phase-1 data chunks are disjoint shard ranges; a lost lineage
    record resumes without duplicating rows, and the manifest table
    equals a direct shard_manifest over the data."""
    from ionex_spark.sources.tableio import ResumableJob, SnapshotTable

    job_mod = _load_job()
    weights = {"en": 500_000, "zh": 300_000, "de": 200_000}
    target = 8
    out = str(tmp_path / "shards")

    assigned = job_mod.assigned_docs(spark, DOCS, weights, target)
    n = assigned.count()
    n_shards = (n + target - 1) // target
    mid = n_shards // 2
    ranges = [(0, mid), (mid, n_shards)]

    data_table = SnapshotTable(out)
    job = ResumableJob(data_table, "t-data")
    chunks = [
        (
            f"shards-{lo:06d}-{hi:06d}",
            (lambda lo=lo, hi=hi: lambda s: job_mod.data_chunk(
                s, DOCS, weights, target, lo, hi
            ))(),
        )
        for lo, hi in ranges
    ]
    r1 = job.run(spark, chunks)
    assert len(r1["ran"]) == 2
    total = data_table.read(spark).count()
    assert total == n

    # crash window: drop chunk 0's lineage record; resume must recover
    # from the snapshot summary without re-appending
    recs = job.lineage()
    with open(job.lineage_path, "w") as fh:
        json.dump(recs[1:], fh)
    r2 = job.run(spark, chunks)
    assert r2["recovered"] == [chunks[0][0]] and not r2["ran"]
    assert data_table.read(spark).count() == total  # no duplicates

    # phase 2 equality: committed manifests == direct rollup
    man_table = SnapshotTable(out + "_m")
    mjob = ResumableJob(man_table, "t-man")
    mjob.run(spark, [
        (
            f"manifest-{lo:06d}-{hi:06d}",
            (lambda lo=lo, hi=hi: lambda s: job_mod.manifest_chunk(
                s, data_table, lo, hi
            ))(),
        )
        for lo, hi in ranges
    ])
    got = {
        r.shard_id: (r.n_rows, r.content_hash)
        for r in man_table.read(spark).collect()
    }
    expect = {
        r.shard_id: (r.n_rows, r.content_hash)
        for r in sh.shard_manifest(assigned).collect()
    }
    assert got == expect and len(got) == n_shards


def test_shard_assign_empty_input(spark):
    docs = spark.read.parquet(DOCS).filter("doc_id < 0")
    out = sh.shard_assign(docs, 8)
    assert out.count() == 0
    assert "shard_id" in out.columns and "shard_pos" in out.columns


def test_verify_shards_detects_planted_corruption(spark):
    """Clean data verifies empty; a dropped row, an edited payload, and
    a stale manifest row each surface as typed mismatch rows."""
    docs = spark.read.parquet(DOCS)
    assigned = sh.shard_assign(docs, 16).cache()
    manifest = sh.shard_manifest(assigned, bytes_col="n_chars").cache()

    clean = sh.verify_shards(assigned, manifest, bytes_col="n_chars")
    assert clean.count() == 0

    # drop one row -> n_rows + n_bytes + content_hash all flagged for
    # exactly that shard
    victim = assigned.limit(1).collect()[0]
    tampered = assigned.filter(f"doc_id != {victim.doc_id}")
    bad = sh.verify_shards(tampered, manifest, bytes_col="n_chars").collect()
    assert {r.shard_id for r in bad} == {victim.shard_id}
    assert {r.field for r in bad} == {"n_rows", "n_bytes", "content_hash"}

    # edit one payload (same length) -> ONLY content_hash flags
    import pyspark.sql.functions as F
    edited = assigned.withColumn(
        "text",
        F.expr(
            f"case when doc_id = {victim.doc_id}"
            " then concat('X', substr(text, 2)) else text end"
        ),
    )
    bad2 = sh.verify_shards(edited, manifest, bytes_col="n_chars").collect()
    assert [(r.shard_id, r.field) for r in bad2] == [
        (victim.shard_id, "content_hash")
    ]


def test_shard_assign_bytes_matches_single_sort_reference(spark):
    """Byte-budget sharding recomputed with a plain Python running sum
    over the (md5 order hash, id) order: identical (shard_id,
    shard_pos) per doc; no shard starts mid-document; every shard
    except the last crosses its byte budget only via its final doc."""
    docs = spark.read.parquet(DOCS)
    rows = {
        r.doc_id: r.n_chars
        for r in docs.select("doc_id", "n_chars").collect()
    }
    order = sorted(rows, key=lambda i: (_md5int(11, str(i)), i))
    target = 4000
    expect, cum, pos_in = {}, 0, {}
    for doc in order:
        sid = cum // target
        expect[doc] = (sid, pos_in.get(sid, 0))
        pos_in[sid] = pos_in.get(sid, 0) + 1
        cum += rows[doc]
    got = {
        r.doc_id: (r.shard_id, r.shard_pos)
        for r in sh.shard_assign_bytes(docs, target, n_buckets=5)
        .select("doc_id", "shard_id", "shard_pos").collect()
    }
    assert got == expect
    # shards are contiguous 0..max
    sids = {s for s, _ in got.values()}
    assert sids == set(range(max(sids) + 1)) and len(sids) > 2

    # manifest works on bytes-mode output too
    man = sh.shard_manifest(
        sh.shard_assign_bytes(docs, target), bytes_col="n_chars"
    ).collect()
    total_bytes = sum(r.n_bytes for r in man)
    assert total_bytes == sum(rows.values())


def test_shard_manifest_overflow_guard(spark):
    """>32768 rows in one shard must raise, not wrap the checksum."""
    from pyspark.sql.utils import PythonException

    docs = spark.range(33000).selectExpr(
        "id as doc_id", "cast('x' as string) as text",
        "cast(0 as bigint) as shard_id", "id as shard_pos",
    )
    with pytest.raises(Exception, match="32768|USER_RAISED"):
        sh.shard_manifest(docs).collect()


def test_shard_assign_xxhash_backend_exact_sizes_and_deterministic(spark):
    """The production xxhash64 order key (no DuckDB twin, JVM codegen)
    still yields exactly-sized, deterministic shards."""
    docs = spark.read.parquet(DOCS)
    a1 = {
        r.doc_id: (r.shard_id, r.shard_pos)
        for r in sh.shard_assign(docs, 7, backend="xxhash64")
        .select("doc_id", "shard_id", "shard_pos").collect()
    }
    a2 = {
        r.doc_id: (r.shard_id, r.shard_pos)
        for r in sh.shard_assign(docs, 7, n_buckets=13, backend="xxhash64")
        .select("doc_id", "shard_id", "shard_pos").collect()
    }
    assert a1 == a2  # bucket count never changes the assignment
    sizes = {}
    for s, _ in a1.values():
        sizes[s] = sizes.get(s, 0) + 1
    for s in range(max(sizes)):
        assert sizes[s] == 7
    with pytest.raises(ValueError, match="DuckDB"):
        sh.order_hash_sql("doc_id", dialect="duckdb", backend="xxhash64")
