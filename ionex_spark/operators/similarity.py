"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k of query vectors against the
  corpus.  Queries are a small broadcast side; the dot product runs as a
  JVM higher-order function (zip_with + aggregate over doubles — NO Python
  in the loop); ranking is one shuffle on query id.  At 100 TB this is the
  per-query-scan baseline: linear in corpus size but embarrassingly
  parallel and shuffle-light.
- ``lsh_bucket_topk``: random-hyperplane LSH — deterministic integer-
  arithmetic hyperplanes, sign-bit bucket key, candidates restricted to
  the query's bucket (and optionally neighboring buckets by hamming
  distance 1).  The scale path: candidate count ~ corpus / 2^n_planes per
  bucket, turning the scan into an equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


DOT_SQL = (
    "aggregate(zip_with({a}, {b}, (x, y) ->"
    " cast(x as double) * cast(y as double)),"
    " cast(0.0 as double), (acc, v) -> acc + v)"
)

NORM_SQL = (
    "sqrt(aggregate(transform({a}, x -> cast(x as double) * cast(x as double)),"
    " cast(0.0 as double), (acc, v) -> acc + v))"
)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k. queries must be small (broadcast).

    Output: (query_id, rank, vec_id, cos_sim); self-matches excluded;
    deterministic tie-break on (cos_sim desc, vec_id)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(id_col, vec_col)
    j = c.crossJoin(F.broadcast(q)).filter(F.col(id_col) != F.col("query_id"))
    dot = DOT_SQL.format(a=vec_col, b="qvec")
    na = NORM_SQL.format(a=vec_col)
    nb = NORM_SQL.format(a="qvec")
    j = j.withColumn("cos_sim", F.expr(f"({dot}) / (({na}) * ({nb}))"))
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.col(id_col)
    )
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "cos_sim")
    )


def planes_for(n: int, target_bucket: int = 1024) -> int:
    """Hyperplane count so the expected LSH bucket holds ~``target_bucket``
    vectors: planes = ceil(log2(n / target_bucket)), floor 1.

    THE SCALE RULE the fixture constants elide: candidate work is
    per-bucket-quadratic (~n * bucket_size / 2 self-join pairs for
    near-dup mining, ~bucket_size per probe for ANN), so planes MUST grow
    with corpus size — a fixed n_planes=4 lifted to 10^10 rows means
    n^2/16 verify pairs.  With planes_for, candidates stay ~n *
    target_bucket / 2: linear in n for a fixed target.  Recall falls as
    planes grow (P[all signs agree] ~ (1 - theta/pi)^planes); counter
    with multiprobe=True or a larger target_bucket, and verify stages are
    exact so extra candidates only cost time, never correctness."""
    import math

    if n <= 0:
        raise ValueError(f"corpus size must be positive, got {n}")
    return max(1, math.ceil(math.log2(max(2.0, n / target_bucket))))


def hyperplane_sql(vec_col: str, plane: int, dim: int) -> str:
    """Deterministic pseudo-random hyperplane dot product: coefficient for
    (plane p, dim d) = ((p*31 + d*17) % 19) - 9 (integer, zero-mean).
    Expressible identically in any engine; no stored plane table needed."""
    terms = " + ".join(
        f"cast({vec_col}[{d}] as double) * {((plane * 31 + d * 17) % 19) - 9}"
        for d in range(dim)
    )
    return f"({terms})"


def lsh_bucket_key(df: DataFrame, vec_col: str, n_planes: int, dim: int,
                   out: str = "bucket") -> DataFrame:
    """Sign-bit bucket key.  Rows with vectors shorter than ``dim`` are
    dropped first: under ANSI mode (Spark 4 default) an out-of-bounds
    array index raises instead of returning NULL."""
    df = df.filter(F.size(F.col(vec_col)) >= dim)
    bits = " + ".join(
        f"(case when {hyperplane_sql(vec_col, p, dim)} >= cast(0.0 as double)"
        f" then {1 << p} else 0 end)"
        for p in range(n_planes)
    )
    return df.withColumn(out, F.expr(f"cast({bits} as bigint)"))


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int | None = None,
    dim: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: bool = False,
) -> DataFrame:
    """ANN: cosine top-k within the query's LSH bucket.

    ``n_planes=None`` derives the plane count from the corpus size via
    ``planes_for`` (one count() job) so candidate cost stays ~constant
    per query as the corpus grows; pass an explicit value to pin it
    (fixtures, reproducing a stored bucket layout).

    With ``multiprobe=True`` the query side also probes every hamming-1
    neighbor bucket (n_planes+1 keys per query, a cheap explode on the
    SMALL side) — the standard recall fix for sign-LSH: as n_planes grows
    a true neighbor differs in one marginal sign bit with probability
    approaching 1, so exact-bucket recall falls off a cliff while
    hamming-1 probing recovers most of it for (n_planes+1)x candidate
    cost.  Probe keys are distinct and each corpus vector lives in exactly
    one bucket, so no candidate dedup is needed."""
    if n_planes is None:
        n_planes = planes_for(corpus.count())
    c = lsh_bucket_key(corpus.select(id_col, vec_col), vec_col, n_planes, dim)
    q = lsh_bucket_key(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
        ),
        "qvec",
        n_planes,
        dim,
    )
    if multiprobe:
        probes = ", ".join(
            ["bucket"] + [f"bucket ^ {1 << p}" for p in range(n_planes)]
        )
        q = q.select(
            "query_id",
            "qvec",
            F.explode(F.expr(f"array({probes})")).alias("bucket"),
        )
    j = c.join(F.broadcast(q), "bucket").filter(
        F.col(id_col) != F.col("query_id")
    )
    dot = DOT_SQL.format(a=vec_col, b="qvec")
    na = NORM_SQL.format(a=vec_col)
    nb = NORM_SQL.format(a="qvec")
    j = j.withColumn("cos_sim", F.expr(f"({dot}) / (({na}) * ({nb}))"))
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.col(id_col)
    )
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "bucket", "cos_sim")
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_planes: int | None = None,
    dim: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos >= threshold).

    Candidates come from LSH bucket equality (near-identical vectors share
    all sign bits with overwhelming probability), so the self-join is
    per-bucket instead of O(n^2); the exact cosine verifies.  The 100 TB
    shape: one shuffle on bucket, bucket sizes ~ n/2^planes —
    ``n_planes=None`` keeps that bucket size bounded via ``planes_for``
    as the corpus grows (a fixed plane count re-quadratizes the
    self-join at 10^10 rows)."""
    if n_planes is None:
        n_planes = planes_for(corpus.count())
    c = lsh_bucket_key(corpus.select(id_col, vec_col), vec_col, n_planes, dim)
    a = c.selectExpr(
        f"{id_col} as id_a", f"{vec_col} as va", "bucket"
    )
    b = c.selectExpr(
        f"{id_col} as id_b", f"{vec_col} as vb", "bucket"
    )
    j = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    dot = DOT_SQL.format(a="va", b="vb")
    na = NORM_SQL.format(a="va")
    nb = NORM_SQL.format(a="vb")
    j = j.withColumn("cos_sim", F.expr(f"({dot}) / (({na}) * ({nb}))"))
    return j.filter(F.col("cos_sim") >= threshold).select(
        "id_a", "id_b", "bucket", "cos_sim"
    )


def quantize_int8(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector symmetric int8 quantization (max-abs scale) — the 4x
    compression step an embedding store runs before ANN at 10^10 rows
    (float32 -> int8 quarters scan bytes; recall loss is bounded by the
    per-component error <= scale/2, asserted in pytest).

    Everything is JVM higher-order-function arithmetic, NARROW (zero
    shuffle): scale = max|x| / 127 (floored at 1e-30 so zero vectors
    quantize to zeros instead of dividing by zero), q_d = clamp(floor(
    x_d/scale + 0.5), -127, 127) — floor(+0.5) is the engine's portable
    round-half-up (Spark/DuckDB round() tie rules differ).

    Output keeps the int8 codes as qvec plus scalar audit columns
    (q_sum, q_dot_idx checksum, max_abs_err) so a gate query can compare
    engines without sorting on array columns.  EMPTY embeddings are
    dropped first (like lsh_bucket_key's short-vector rule): they carry
    no information, and engines disagree on empty-list folds (Spark
    aggregate -> 0, DuckDB list_aggregate sum -> NULL; Spark
    sequence(1, 0) is even the DESCENDING [1, 0])."""
    corpus = corpus.filter(F.size(F.col(vec_col)) > 0)
    v = f"transform({vec_col}, x -> cast(x as double))"
    amax = f"array_max(transform({v}, x -> abs(x)))"
    scale = f"(greatest({amax}, 1e-30d) / 127.0d)"
    q = (
        f"transform({v}, x -> cast(greatest(least("
        f"floor(x / _scale + 0.5d), 127.0d), -127.0d) as bigint))"
    )
    out = corpus.selectExpr(
        id_col, vec_col, f"{scale} as _scale"
    ).selectExpr(
        id_col,
        vec_col,
        "_scale as scale",
        f"{q} as qvec",
    )
    return out.selectExpr(
        id_col,
        "scale",
        "qvec",
        "aggregate(qvec, 0L, (a, x) -> a + x) as q_sum",
        "aggregate(zip_with(qvec, sequence(1, size(qvec)),"
        " (x, i) -> x * cast(i as bigint)), 0L, (a, x) -> a + x)"
        " as q_dot_idx",
        f"array_max(zip_with({vec_col}, qvec,"
        " (x, qx) -> abs(cast(x as double) - cast(qx as double) * scale)))"
        " as max_abs_err",
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out: str = "list_id",
) -> DataFrame:
    """IVF list assignment: each vector gets its nearest centroid —
    computed as a NARROW per-row argmax fold, zero shuffle.

    ``centroids`` is a small (id, vec) table; it is collapsed to ONE row
    holding a sorted array<struct<cent_id,cvec>> and broadcast, so the
    only join is a 1-row BroadcastNestedLoopJoin (no row amplification).
    The previous shape (crossJoin x n_lists through a row_number window)
    shuffled |corpus| x n_lists rows — a 1000x amplification at 2^10
    lists; the fold is the 100 TB-safe build pass: one corpus scan,
    n_lists x dim multiplies per row, output ready to be written
    bucketed by list_id so queries touch only nprobe lists.

    Ties break to the smallest cent_id (fold iterates the array in
    cent_id order and replaces only on strictly-greater sim), matching
    row_number() OVER (ORDER BY sim DESC, cent_id) = 1 exactly."""
    # centroid norms HOISTED into the broadcast array (same double value
    # as computing them per probe row, so bit-identical cosines — but
    # n_lists x dim multiplies cheaper per corpus row)
    c = centroids.selectExpr(
        f"{id_col} as cent_id",
        f"{vec_col} as cvec",
        f"{NORM_SQL.format(a=vec_col)} as cnorm",
    )
    cents = c.agg(
        F.expr(
            "sort_array(collect_list(struct(cent_id, cvec, cnorm)))"
        ).alias("cents")
    )
    # EMPTY centroids guard: agg over zero rows still yields ONE row with
    # an empty array, and array_max over it is NULL — every corpus row
    # would silently get list_id = NULL (a NULL-bucket table downstream).
    # Filtering the broadcast row restores the zero-rows-out contract.
    cents = cents.filter(F.size("cents") > 0)
    j = corpus.select(id_col, vec_col).crossJoin(F.broadcast(cents))
    na = NORM_SQL.format(a=vec_col)
    j = j.withColumn("_vnorm", F.expr(na))
    dot = DOT_SQL.format(a=vec_col, b="c.cvec")
    sim = f"(({dot}) / ((_vnorm) * (c.cnorm)))"
    # each cosine evaluated exactly ONCE: transform to (sim, -cent_id)
    # structs, array_max picks lexicographic max = (max sim, min cent_id)
    best = (
        f"array_max(transform(cents, c -> named_struct("
        f"'sim', {sim}, 'negcid', -c.cent_id)))"
    )
    return j.withColumn("_best", F.expr(best)).selectExpr(
        id_col, vec_col, f"-_best.negcid as {out}"
    )


def ivf_topk(
    corpus_lists: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF query: probe the nprobe nearest lists only.

    corpus_lists = output of ivf_assign (ideally written bucketed by
    list_id).  Query cost ~ corpus * nprobe / n_lists."""
    from pyspark.sql.window import Window

    c = centroids.selectExpr(f"{id_col} as cent_id", f"{vec_col} as cvec")
    q = queries.selectExpr(f"{id_col} as query_id", f"{vec_col} as qvec")
    qc = q.crossJoin(F.broadcast(c))
    dot = DOT_SQL.format(a="qvec", b="cvec")
    na = NORM_SQL.format(a="qvec")
    nb = NORM_SQL.format(a="cvec")
    qc = qc.withColumn("sim", F.expr(f"({dot}) / (({na}) * ({nb}))"))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.col("cent_id"))
    probes = (
        qc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= nprobe)
        .selectExpr("query_id", "qvec", "cent_id as list_id")
    )
    j = corpus_lists.join(F.broadcast(probes), "list_id").filter(
        F.col(id_col) != F.col("query_id")
    )
    dot2 = DOT_SQL.format(a=vec_col, b="qvec")
    na2 = NORM_SQL.format(a=vec_col)
    nb2 = NORM_SQL.format(a="qvec")
    j = j.withColumn("cos_sim", F.expr(f"({dot2}) / (({na2}) * ({nb2}))"))
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.col(id_col))
    return (
        j.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "list_id", "cos_sim")
    )


def embedding_group_stats(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    scale_fp: int = 1_000_000,
) -> DataFrame:
    """Per-group embedding CENTROIDS in fixed point — the monitoring
    aggregate a training-data pipeline tracks per domain/source (drift
    of the mean vector signals a distribution shift in new crawls).

    Values are quantized to integers (floor(v * scale_fp)) BEFORE
    summing, so the per-dimension sums are exact and merge-order-
    independent — a float sum would drift in the last ulp between
    partition orders and engines (the same reason pagerank is integer).
    Long-form output (group, dim, n, sum_fp, mean_fp) keeps the oracle
    a plain GROUP BY; mean_fp uses TRUNCATING integer division — both
    Spark's `div` and DuckDB's `//` truncate toward zero on negative
    sums (verified empirically; a floor-division pmod variant mismatched
    by one on negative dims).  One shuffle keyed (group, dim), map-side
    combining; rows x dim explode is narrow."""
    pairs = df.filter(f"size({vec_col}) > 0").selectExpr(
        group_col,
        f"posexplode({vec_col}) as (dim, _v)",
    ).selectExpr(
        group_col,
        "cast(dim as bigint) as dim",
        f"cast(floor(cast(_v as double) * {float(scale_fp)!r}) as bigint)"
        " as _v_fp",
    )
    return pairs.groupBy(group_col, "dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("cast(sum(_v_fp) as bigint)").alias("sum_fp"),
    ).selectExpr(
        group_col, "dim", "n", "sum_fp",
        "cast(sum_fp div n as bigint) as mean_fp",
    )
