"""Tokens -> training-shards last mile (round-5 verdict task #3).

The corpus pipeline filters, dedups, samples, packs, and decontaminates;
what an actual pretraining-data job runs LAST is (a) a weighted domain
MIXTURE over the cleaned pool and (b) a FIXED-SIZE SHARD writer with
per-shard manifests, so the training loader can stream shards with known
row counts and verify integrity.  Both are deterministic functions of
row ids — reruns, subsets, and engine swaps (the DuckDB oracle) produce
bit-identical output.

No counterpart in the reference (nav-solutions/ionex ends at grid
export, src/lib.rs:996-1080); this extends the engine's pipeline the way
its training-data brief requires.

Scale shapes:
- mixture: ONE tiny counts aggregation (|domains| rows to the driver)
  + a narrow hash-gated filter — no shuffle of the data itself.
- sharding: global total order WITHOUT a global sort — rows hash-bucket
  by the top bits of their order key, so bucket boundaries are order
  boundaries; per-bucket counts (tiny agg) give exact global offsets,
  and each bucket sorts locally.  One repartition + in-partition sort;
  no single-task bottleneck at any size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ionex_spark.operators import dedup as dd

PPM = 1_000_000
HASH_GATE = 10_000  # sampling-hash domain, shared with text.sample_hash_sql

# the portable md5 kernel yields 15 hex chars = 60 bits
ORDER_BITS = 60


def order_hash_sql(
    id_expr: str, dialect: str = "spark", backend: str = "md5"
) -> str:
    """Deterministic non-negative order key for shard assignment — the
    portable md5 kernel by default (DuckDB-reproducible, gate path),
    under its own seed so shard order is independent of sampling
    decisions.  backend='xxhash64' is the production fast path (JVM
    codegen, no hex round-trip — 20M-row probe: md5 order keys
    dominated shard_assign's wall time); masked to 60 bits so bucket
    spans match the md5 domain.  NOTE: Spark's xxhash64 has a FIXED
    seed (42) — the literal 11 here is hashed as an extra column, not a
    seed, so any port must compute xxhash64_seed42(str(id), 11) the
    same way or shard orders silently diverge (review finding)."""
    if backend == "xxhash64":
        if dialect != "spark":
            raise ValueError("xxhash64 backend has no DuckDB twin")
        return (
            f"(xxhash64(cast({id_expr} as string), 11)"
            f" & {(1 << ORDER_BITS) - 1})"
        )
    if dialect == "spark":
        return dd.token_hash_sql(f"cast({id_expr} as string)", 11)
    return dd.token_hash_duckdb_sql(f"CAST({id_expr} AS VARCHAR)", 11)


def row_content_hash_sql(
    id_expr: str, text_expr: str, dialect: str = "spark"
) -> str:
    """Per-row 48-bit content hash over (id, text) for the manifest's
    order-independent shard checksum.  48 bits (12 md5 hex chars) so a
    plain BIGINT SUM stays exact up to 2^63/2^48 = 32768 rows per shard
    — shard_assign enforces the bound; past it, widen to a modular sum."""
    # coalesce NULL text to '' in BOTH dialects: Spark concat(NULL) is
    # NULL (the row would silently vanish from the checksum sum) while
    # DuckDB concat skips NULL args (the row would hash differently) —
    # review finding; the empty string keeps every row counted and the
    # two engines bit-identical
    if dialect == "spark":
        payload = (
            f"concat(cast({id_expr} as string), ':',"
            f" coalesce({text_expr}, ''))"
        )
        return (
            f"cast(conv(substr(md5(concat('13:', {payload})), 1, 12),"
            f" 16, 10) as bigint)"
        )
    payload = (
        f"concat(CAST({id_expr} AS VARCHAR), ':',"
        f" coalesce({text_expr}, ''))"
    )
    return (
        f"CAST(concat('0x', substr(md5(concat('13:', {payload})),"
        f" 1, 12)) AS BIGINT)"
    )


# ------------------------------------------------------ weighted mixture

def mixture_thresholds(
    counts: dict[str, int], weights_ppm: dict[str, int]
) -> dict[str, int]:
    """Exact integer hash-gate thresholds for a weighted domain mixture.

    Given observed domain sizes ``counts`` and target mixture weights in
    parts-per-million, pick the LARGEST epoch C (total output docs in
    ppm-exact proportion) that never upsamples any domain:

        C     = min_d( n_d * 1e6 // w_d )
        thr_d = (1e4 * C * w_d) // (1e6 * n_d)        in [0, 1e4]

    All floor divisions in this exact order — the DuckDB oracle
    recomputes the same integers in SQL, so the sampled set is
    bit-reproducible across engines.  Python ints never overflow; the
    in-SQL twin is int64-safe while 1e4 * C * w_d < 2^63, i.e. up to
    ~9e8 rows per gate-scale domain (the operator itself uses this
    Python path, so 100 TB inputs are fine).

    Domains absent from ``weights_ppm`` get threshold 0 (dropped);
    weighted domains absent from the data raise (the caller's manifest
    is wrong, and silently emitting a skewed mixture would be worse)."""
    for d, w in weights_ppm.items():
        if w <= 0:
            raise ValueError(f"weight for {d!r} must be positive ppm, got {w}")
        if counts.get(d, 0) <= 0:
            raise ValueError(
                f"mixture domain {d!r} has no rows — cannot hit its"
                f" {w} ppm target without upsampling"
            )
    c = min(counts[d] * PPM // w for d, w in weights_ppm.items())
    thr = {
        d: HASH_GATE * c * w // (PPM * counts[d])
        for d, w in weights_ppm.items()
    }
    # ADVICE r6: a positively-weighted domain whose derived keep
    # fraction floors below 1/HASH_GATE would silently contribute ZERO
    # rows (e.g. counts={a:1e6, b:1e6}, weights={a:999999, b:1}) —
    # exactly the mixture skew the no-rows guard above exists to stop.
    # Raise instead of emitting a silently-wrong mixture.
    starved = [d for d, t in thr.items() if t == 0]
    if starved:
        raise ValueError(
            f"mixture threshold floors to 0 for {starved!r}: their ppm"
            f" weights are below the {HASH_GATE}-gate resolution at"
            " these domain sizes — raise the weight, drop the domain"
            " explicitly, or coarsen the mixture"
        )
    return thr


def corpus_mixture_sample(
    df: DataFrame,
    domain_col: str,
    weights_ppm: dict[str, int],
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted mixture across sources/domains.

    Unlike ``stratified_sample`` (caller fixes per-stratum KEEP
    fractions), the caller here fixes the OUTPUT COMPOSITION — e.g.
    'the training mix is 60% en / 30% zh / 10% de by documents' — and
    the per-domain keep fraction is derived from the observed domain
    sizes (one tiny counts aggregation), maximal without upsampling.
    Rows pass the gate iff their sampling hash (text.sample_hash_sql —
    the portable md5 kernel, so DuckDB agrees bit-for-bit) falls under
    their domain's threshold: no shuffle, no state, sf-independent,
    rerun-stable."""
    from ionex_spark.operators.text import sample_hash_sql, strata_threshold_case_sql

    counts = {
        r[0]: r[1]
        for r in df.groupBy(domain_col).agg(F.count(F.lit(1))).collect()
    }
    thr = mixture_thresholds(counts, weights_ppm)
    fractions = {d: t / HASH_GATE for d, t in thr.items()}
    return df.filter(
        F.expr(
            f"{sample_hash_sql(id_col, salt='mix')}"
            f" < {strata_threshold_case_sql(domain_col, fractions)}"
        )
    )


# ------------------------------------------------- fixed-size sharding

def shard_assign(
    df: DataFrame,
    target_rows: int,
    id_col: str = "doc_id",
    n_buckets: int = 64,
    backend: str = "md5",
) -> DataFrame:
    """Assign every row a deterministic (shard_id, shard_pos) so shards
    have exactly ``target_rows`` rows (last shard ragged).

    Global order = (order_hash(id), id): reproducible, uniform, and
    independent of input partitioning.  The order is realized WITHOUT a
    global sort: bucket = top bits of the order hash (so bucket ranges
    ARE order ranges), per-bucket counts -> exact global offsets (a
    |buckets|-row aggregate to the driver), then each bucket sorts
    locally and adds its offset.  shard_id = global_rank div target.

    At 10^12 rows: one repartition on bucket + in-partition sort of
    ~n/buckets rows each; pick n_buckets ~ cluster cores.  The window
    is partitioned by bucket — never a single global partition."""
    if target_rows <= 0:
        raise ValueError(f"target_rows must be positive, got {target_rows}")
    if target_rows > 32768:
        raise ValueError(
            f"target_rows {target_rows} > 32768: the manifest's 48-bit"
            " BIGINT checksum sum would risk int64 overflow — split"
            " shards or widen row_content_hash_sql to a modular sum"
        )
    span = (1 << ORDER_BITS) // n_buckets + 1
    keyed = df.withColumn(
        "_oh", F.expr(order_hash_sql(id_col, backend=backend))
    ).withColumn("_bucket", F.expr(f"_oh div {span}"))
    bucket_counts = {
        r[0]: r[1]
        for r in keyed.groupBy("_bucket").agg(F.count(F.lit(1))).collect()
    }
    if not bucket_counts:  # empty input: empty CASE would not parse
        return df.withColumn(
            "shard_id", F.lit(0).cast("bigint")
        ).withColumn("shard_pos", F.lit(0).cast("bigint"))
    offsets, acc = {}, 0
    for b in sorted(bucket_counts):
        offsets[b] = acc
        acc += bucket_counts[b]
    off_case = " ".join(
        f"WHEN _bucket = {b} THEN {o}" for b, o in offsets.items()
    )
    w = Window.partitionBy("_bucket").orderBy("_oh", id_col)
    ranked = (
        keyed.repartition(max(1, len(bucket_counts)), "_bucket")
        .withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "_grank",
            F.expr(f"(CASE {off_case} ELSE 0 END) + _rn - 1"),
        )
    )
    return (
        ranked.withColumn(
            "shard_id", F.expr(f"_grank div {target_rows}")
        )
        .withColumn(
            "shard_pos", F.expr(f"_grank % {target_rows}")
        )
        .drop("_oh", "_bucket", "_rn", "_grank")
    )


def shard_assign_bytes(
    df: DataFrame,
    target_bytes: int,
    bytes_col: str = "n_chars",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    backend: str = "md5",
) -> DataFrame:
    """BYTE-budget twin of shard_assign: greedy sequential fill of
    ~``target_bytes`` per shard in the same deterministic global order
    (order_hash, id) — a document lands wholly in the shard where its
    first byte falls, so shards overshoot by at most one document (the
    standard training-shard layout; documents are never split).

    Same no-global-sort shape: per-bucket BYTE subtotals (tiny agg to
    the driver) give exact global byte offsets; a windowed running sum
    inside each bucket completes the global cumulative, and
    shard_id = cum_bytes_exclusive div target.  shard_pos is the row's
    rank within its shard (second window, partitioned by the computed
    shard — bounded partitions by construction)."""
    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive, got {target_bytes}")
    span = (1 << ORDER_BITS) // n_buckets + 1
    keyed = df.withColumn(
        "_oh", F.expr(order_hash_sql(id_col, backend=backend))
    ).withColumn("_bucket", F.expr(f"_oh div {span}"))
    totals = {
        r[0]: (r[1], r[2])
        for r in keyed.groupBy("_bucket").agg(
            F.expr(f"cast(sum({bytes_col}) as bigint)"),
            F.count(F.lit(1)),
        ).collect()
    }
    if not totals:
        return df.withColumn(
            "shard_id", F.lit(0).cast("bigint")
        ).withColumn("shard_pos", F.lit(0).cast("bigint"))
    offsets, acc = {}, 0
    for b in sorted(totals):
        offsets[b] = acc
        acc += totals[b][0]
    off_case = " ".join(
        f"WHEN _bucket = {b} THEN {o}" for b, o in offsets.items()
    )
    w = Window.partitionBy("_bucket").orderBy("_oh", id_col)
    cum = (
        keyed.repartition(max(1, len(totals)), "_bucket")
        .withColumn("_cb", F.sum(bytes_col).over(w))
        .withColumn(
            "_gexcl",
            F.expr(
                f"(CASE {off_case} ELSE 0 END) + _cb - {bytes_col}"
            ),
        )
        .withColumn("shard_id", F.expr(f"_gexcl div {target_bytes}"))
    )
    wp = Window.partitionBy("shard_id").orderBy("_oh", id_col)
    return (
        cum.withColumn(
            "shard_pos",
            (F.row_number().over(wp) - F.lit(1)).cast("bigint"),
        )
        .drop("_oh", "_bucket", "_cb", "_gexcl")
    )


def shard_manifest(
    assigned: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bytes_col: str | None = None,
) -> DataFrame:
    """Per-shard manifest rows: (shard_id, n_rows, n_bytes,
    content_hash) — what the shard writer commits next to the data and
    the training loader verifies at read time.

    content_hash is the BIGINT SUM of per-row md5-48bit hashes over
    (id, text): order-independent (sums commute, unlike a rolling
    hash), exact within the shard_assign size bound, and recomputable
    by any engine with md5 — the same portability contract as the
    sampling kernel."""
    nb = (
        f"cast(sum({bytes_col}) as bigint)"
        if bytes_col
        else f"cast(sum(length({text_col})) as bigint)"
    )
    return assigned.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr(nb).alias("n_bytes"),
        # the 48-bit row hash sums exactly in int64 up to 32768 rows;
        # fail loudly past the bound (bytes-mode shards have no static
        # row cap) instead of wrapping into a silently-wrong checksum
        F.expr(
            "if(count(1) <= 32768, cast(sum("
            + row_content_hash_sql(id_col, text_col)
            + ") as bigint), cast(raise_error('shard exceeds 32768 rows:"
            " 48-bit checksum sum would overflow int64 — split shards or"
            " widen row_content_hash_sql to a modular sum') as bigint))"
        ).alias("content_hash"),
        F.min("shard_pos").alias("min_pos"),
        F.max("shard_pos").alias("max_pos"),
    )


def verify_shards(
    data: DataFrame,
    manifest: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bytes_col: str | None = None,
) -> DataFrame:
    """Training-loader-side integrity check: recompute each shard's
    manifest from the data it is about to consume and report every
    shard where ANY field disagrees with the committed manifest —
    (shard_id, field, expected, actual) rows, empty = clean.

    Catches truncated/duplicated shard files (n_rows), silent payload
    edits (content_hash — order-independent, so a reshuffled shard
    still verifies), and a manifest pointing at the wrong data
    generation.  One aggregation over the shard being loaded + a
    manifest-vs-rollup join of two per-shard frames (full outer so a
    shard missing from EITHER side surfaces; Spark cannot broadcast a
    full-outer join, and both sides are #shards rows, so the tiny
    shuffle is fine — review finding corrected an earlier broadcast
    claim here)."""
    recomputed = shard_manifest(data, id_col, text_col, bytes_col)
    m = manifest.select(
        "shard_id",
        F.col("n_rows").alias("m_rows"),
        F.col("n_bytes").alias("m_bytes"),
        F.col("content_hash").alias("m_hash"),
    )
    j = recomputed.join(m, "shard_id", "full_outer")
    checks = [
        ("n_rows", "m_rows", "n_rows"),
        ("n_bytes", "m_bytes", "n_bytes"),
        ("content_hash", "m_hash", "content_hash"),
    ]
    parts = [
        j.filter(
            f"{got} IS DISTINCT FROM {want}"
        ).selectExpr(
            "shard_id",
            f"'{field}' as field",
            f"cast({want} as string) as expected",
            f"cast({got} as string) as actual",
        )
        for got, want, field in checks
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
