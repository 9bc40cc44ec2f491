"""Count-Min sketch — the approximate heavy-hitter / frequency sketch a
100 TB token pipeline uses when the exact vocabulary count is too large
to materialize (Cormode & Muthukrishnan 2005).

Shape at scale: the sketch TABLE is depth x width rows (a few KB)
regardless of corpus size — one explode (depth rows per token
occurrence) + one groupBy shuffle whose key space is the tiny (d,
bucket) grid, so map-side combine collapses almost everything before
the exchange.  Estimation joins the (broadcastable) sketch back to any
probe set.  Guarantees: estimate >= true count always (overestimate
only); error <= e*N/width with prob 1-(1/2)^depth.

Hashes reuse the engine's portable md5 kernel (dedup.token_hash_sql), so
the DuckDB oracle reproduces the sketch bit-for-bit — an UNUSUAL
property for a sketch, bought by deterministic seeds."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ionex_spark.operators.dedup import token_hash_duckdb_sql, token_hash_sql

SEED0 = 7100  # seed base: keep sketch hashes disjoint from minhash seeds


def _bucket_sql(token_expr: str, d: int, width: int, backend: str) -> str:
    return f"pmod({token_hash_sql(token_expr, SEED0 + d, backend)}, {width})"


def bucket_duckdb_sql(token_expr: str, d: int, width: int) -> str:
    """DuckDB twin of the (depth d) bucket assignment (md5 hashes are
    non-negative, so plain % == pmod)."""
    return f"({token_hash_duckdb_sql(token_expr, SEED0 + d)} % {width})"


def countmin_sketch(
    toks: DataFrame,
    depth: int = 4,
    width: int = 256,
    token_col: str = "token",
    backend: str = "md5",
) -> DataFrame:
    """Build the sketch from (…, token) OCCURRENCE rows (not deduped).
    Output: (d, bucket, cnt) — depth*width rows max."""
    cells = toks.select(
        F.explode(
            F.array(
                *[
                    F.expr(
                        f"named_struct('d', {d}, 'bucket',"
                        f" {_bucket_sql(token_col, d, width, backend)})"
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c")
    )
    return cells.groupBy("c.d", "c.bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def countmin_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    depth: int = 4,
    width: int = 256,
    token_col: str = "token",
    backend: str = "md5",
) -> DataFrame:
    """Estimate each probe token's occurrence count: min over depths of
    its bucket counters.  Probes absent from the corpus may still
    collide into non-empty buckets (the overestimate guarantee includes
    them); a bucket missing entirely counts 0."""
    pb = probes.select(token_col).distinct().select(
        token_col,
        F.explode(
            F.array(
                *[
                    F.expr(
                        f"named_struct('d', {d}, 'bucket',"
                        f" {_bucket_sql(token_col, d, width, backend)})"
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c"),
    ).select(token_col, "c.d", "c.bucket")
    j = pb.join(F.broadcast(sketch), ["d", "bucket"], "left")
    return j.groupBy(token_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cm_est")
    )


# ----------------------------------------------- KMV distinct estimator

KMV_SEED = 7300  # disjoint from CMS + minhash seed ranges
KMV_SPACE = float(1 << 60)  # md5-15-hex hashes are uniform on [0, 2^60)


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
    backend: str = "md5",
) -> DataFrame:
    """K-Minimum-Values distinct-count estimator per group (Bar-Yossef
    et al. 2002): hash every value to [0, 2^60), keep the k smallest
    DISTINCT hashes per group, estimate |distinct| = (k-1) * 2^60 /
    kth_min.  Groups with fewer than k distinct values report the EXACT
    count (the sketch is exact below its capacity — the standard KMV
    property).

    Why this sketch here: approx_count_distinct (HLL) is not
    reproducible across engines, but KMV with the engine's deterministic
    md5 kernel is bit-portable — DuckDB computes the identical estimate,
    so the gate can oracle an APPROXIMATE algorithm exactly.

    Shape at 100 TB: the inner distinct + window-rank shuffle on
    (group, hash) — uniform by construction (hash keys); the per-group
    state is k values regardless of cardinality, and partial
    aggregation collapses duplicates map-side.

    Output: group_cols + (n_seen, kth_min, est_distinct)."""
    from ionex_spark.operators.dedup import token_hash_sql

    h = token_hash_sql(value_col, KMV_SEED, backend)
    if backend == "xxhash64":
        # xxhash64 is signed 64-bit; the estimator needs hashes uniform
        # on [0, 2^60).  2^64 is an exact multiple of 2^60, so pmod
        # folds the signed domain into [0, 2^60) perfectly uniformly.
        h = f"pmod({h}, {1 << 60})"
    elif backend != "md5":
        raise ValueError(
            f"kmv_distinct backend must be 'md5' or 'xxhash64', got {backend!r}"
        )
    # NB: each selectExpr argument is ONE expression — pass group columns
    # individually; the comma-join is only valid inside OVER(PARTITION BY).
    part = ", ".join(group_cols)
    hashes = df.selectExpr(*group_cols, f"{h} as hv").dropDuplicates(
        [*group_cols, "hv"]
    )
    ranked = hashes.selectExpr(
        *group_cols, "hv",
        f"row_number() over (partition by {part} order by hv) as rk",
    ).filter(f"rk <= {k}")
    return ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_seen"),
        F.max("hv").alias("kth_min"),
        F.expr(
            f"case when count(*) < {k} then cast(count(*) as double)"
            f" else ({k} - 1) * cast({KMV_SPACE!r} as double)"
            " / cast(max(hv) as double) end"
        ).alias("est_distinct"),
    )


# --------------------------------------------------- Bloom filter build/probe

BLOOM_SEED = 7500  # disjoint from CMS/KMV seed ranges


def bloom_build(
    df: DataFrame,
    value_col: str,
    m_bits: int = 4096,
    k: int = 5,
    backend: str = "md5",
) -> DataFrame:
    """Distributed BLOOM FILTER build: k deterministic hash positions
    per value, OR-folded into an m-bit bitmap stored as m/64 bigint
    words — (word_idx, word) rows.  The filter table is m/64 rows
    regardless of input size (the Count-Min property), construction is
    one explode + one bit_or groupBy with map-side combine, and two
    filters MERGE by bit_or on word_idx (the mergeability that makes
    Bloom filters the standard distributed semi-join prefilter).

    Unlike Spark's built-in bloom_filter_agg, the md5 backend makes the
    EXACT bitmap reproducible in DuckDB, so the gate can verify the
    filter bit-for-bit."""
    assert m_bits % 64 == 0
    pos = [
        f"pmod({token_hash_sql(value_col, BLOOM_SEED + j, backend)},"
        f" {m_bits})"
        for j in range(k)
    ]
    exploded = df.selectExpr(
        f"explode(array({', '.join(pos)})) as bitpos"
    )
    return (
        exploded.selectExpr(
            "cast(floor(bitpos / 64) as bigint) as word_idx",
            "shiftleft(cast(1 as bigint), cast(bitpos % 64 as int)) as w",
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(w)").alias("word"))
    )


def bloom_probe_sql(
    value_col: str,
    m_bits: int,
    k: int,
    backend: str = "md5",
) -> list[str]:
    """The k (word_idx, mask) probe expressions for a value — each must
    find its bit set in the filter for a MAYBE; any miss is a definite
    NO (used by joining probes against the filter table k ways or via a
    broadcast map)."""
    out = []
    for j in range(k):
        p = f"pmod({token_hash_sql(value_col, BLOOM_SEED + j, backend)}, {m_bits})"
        out.append(
            f"struct(cast(floor({p} / 64) as bigint) as word_idx,"
            f" shiftleft(cast(1 as bigint), cast({p} % 64 as int)) as mask)"
        )
    return out


def bloom_collect_words(bloom: DataFrame, m_bits: int) -> list[int]:
    """Collect the (word_idx, word) filter table into a dense m/64-long
    Python list (absent words = 0).  The bitmap is CONSTANT-SIZE by
    construction — m/64 rows regardless of corpus size (a 2 MB filter is
    32k longs) — so this is an O(m) driver transfer, not a data collect;
    it is what lets membership testing become a pure projection
    (bloom_membership_expr) instead of joins."""
    words = [0] * (m_bits // 64)
    for r in bloom.collect():
        words[int(r["word_idx"])] = int(r["word"])
    return words


def bloom_membership_expr(
    words: list[int],
    value_col: str,
    m_bits: int,
    k: int,
    backend: str = "md5",
) -> str:
    """Membership test as ONE narrow SQL expression over an inlined
    bitmap literal: all k bits set -> 1 else 0.  Replaces the
    explode(k) + broadcast-join + per-probe groupBy shape — zero joins,
    zero aggregation, stays inside whole-stage codegen (round 7; guide
    §2.4 remove shuffles outright).  Bit-identical to the join-based
    bloom_membership: same hash positions, same words."""
    arr = "array(" + ", ".join(f"{w}L" for w in words) + ")"
    tests = []
    for j in range(k):
        p = (
            f"pmod({token_hash_sql(value_col, BLOOM_SEED + j, backend)},"
            f" {m_bits})"
        )
        word = f"element_at({arr}, cast(floor({p} / 64) as int) + 1)"
        mask = f"shiftleft(cast(1 as bigint), cast({p} % 64 as int))"
        tests.append(f"(({word} & {mask}) = {mask})")
    return "cast((" + " and ".join(tests) + ") as int)"


def bloom_membership(
    probes: DataFrame,
    bloom: DataFrame,
    value_col: str,
    m_bits: int = 4096,
    k: int = 5,
    backend: str = "md5",
    id_col: str = "probe_id",
) -> DataFrame:
    """Membership test: a probe is MAYBE-present iff all k bits are set.
    The filter is tiny -> broadcast; the probe side explodes k rows,
    joins on word_idx, and counts matched bits — no shuffle of the
    probe table beyond the per-probe rollup."""
    pr = probes.selectExpr(
        id_col,
        f"explode(array({', '.join(bloom_probe_sql(value_col, m_bits, k, backend))}))"
        " as p",
    ).selectExpr(id_col, "p.word_idx as word_idx", "p.mask as mask")
    j = pr.join(F.broadcast(bloom), "word_idx", "left")
    return (
        j.selectExpr(
            id_col,
            "case when word is not null and (word & mask) = mask"
            " then 1 else 0 end as hit",
        )
        .groupBy(id_col)
        .agg(
            F.expr(f"cast(sum(hit) = {k} as int)").alias("maybe_present")
        )
    )


# -------------------------------------------- fixed-bin histogram sketch

def histogram_bins(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    bin_width: float,
) -> DataFrame:
    """Mergeable FIXED-BIN HISTOGRAM sketch per group: bin = floor(v /
    width), one count row per non-empty bin.  Two histograms merge by
    summing counts on (group, bin) — the property that lets a 100 TB
    scan build per-partition histograms map-side and combine them in
    one shuffle whose volume is #groups x #non-empty-bins, independent
    of row count.  Deterministic by construction, so unlike t-digest /
    approx_percentile the sketch is bit-reproducible across engines and
    oracle-able exactly."""
    return (
        df.selectExpr(
            *group_cols,
            f"cast(floor(({value_col}) / cast({bin_width!r} as double))"
            " as bigint) as bin",
        )
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def histogram_quantiles(
    bins: DataFrame,
    group_cols: list[str],
    bin_width: float,
    ps: list[float],
) -> DataFrame:
    """Quantile estimates from a fixed-bin histogram: for each p, the
    LOWER BOUNDARY of the first bin whose running count reaches
    ceil(p * total) — error bounded by bin_width, deterministic, and
    computed with one window scan over the (tiny) per-group bin rows.
    Output: group_cols + (q_<p> columns, total_n)."""
    part = ", ".join(group_cols)
    w = f"over (partition by {part} order by bin)"
    ranked = bins.selectExpr(
        *group_cols,
        "bin",
        f"sum(n) {w} as cum",
        f"sum(n) over (partition by {part}) as total",
    )
    # every float literal is cast(double): Spark parses bare 0.5 as
    # DECIMAL while DuckDB parses DOUBLE, silently changing ceil() inputs
    aggs = [
        F.expr(
            f"min(case when cum >= cast(ceil(cast({p!r} as double)"
            " * cast(total as double)) as bigint)"
            f" then bin * cast({bin_width!r} as double) end)"
        ).alias(f"q_{str(p).replace('.', '_')}")
        for p in ps
    ]
    return ranked.groupBy(*group_cols).agg(
        *aggs, F.max("total").alias("total_n")
    )
