"""Hierarchical-tile set algebra: Morton (Z-order) encoding and
cell-set compaction — the layout/compression layer of the tile system.

Morton keys: interleaving the (lat_i, lon_i) bits makes spatially-near
tiles numerically near, so SORTING/bucketing the 100 TB table by z-key
clusters each region into few files — parquet min/max row-group pruning
then turns an ROI filter into a near-contiguous scan instead of a full
sweep (the Delta/Iceberg Z-ORDER optimization, expressed as a plain
column).  Pure integer arithmetic, shared verbatim with the DuckDB
oracle.

Compaction (H3 compact/uncompact analog): replace every complete
4-child group by its parent, recursively — polygon covers shrink ~4x
per full level, which at 10^12 rows turns broadcastable cover sets from
megabytes into kilobytes.  One groupBy + one broadcast anti/semi join
per level; levels are bounded (res <= 10ish), so the loop is O(res)
rounds of narrow shuffles on uniform keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def morton_sql(lat_i: str, lon_i: str, bits: int = 7) -> str:
    """Z-order (Morton) interleave of two non-negative integer grid
    indices: lon bit b -> position 2b, lat bit b -> position 2b+1.
    floor-division spelling is portable Spark/DuckDB (both promote
    integer `/` to float; floor + cast recovers the integer bit)."""
    terms = []
    for b in range(bits):
        terms.append(
            f"(cast(floor(({lat_i}) / {1 << b}) as bigint) % 2)"
            f" * {1 << (2 * b + 1)}"
        )
        terms.append(
            f"(cast(floor(({lon_i}) / {1 << b}) as bigint) % 2)"
            f" * {1 << (2 * b)}"
        )
    return "(" + " + ".join(terms) + ")"


def compact_cells(
    cells: DataFrame,
    res_from: int,
    res_to: int,
    lat_col: str = "lat_i",
    lon_col: str = "lon_i",
) -> DataFrame:
    """H3-style COMPACT: given a set of distinct tiles at ``res_from``
    (columns lat_col, lon_col), return the minimal mixed-resolution
    cover (res, lat_i, lon_i): every complete 2x2 child group is
    replaced by its parent, applied recursively down to ``res_to``.

    uncompact_cells() inverts it exactly (pytest-pinned round trip)."""
    out = None
    cur = cells.select(
        F.col(lat_col).alias("lat_i"), F.col(lon_col).alias("lon_i")
    ).dropDuplicates(["lat_i", "lon_i"])
    for res in range(res_from, res_to, -1):
        # cur feeds BOTH the parent count and the remainder anti-join
        # (and, transitively, every deeper level): materialize it once
        # per level (eager localCheckpoint) so the upstream pipeline —
        # for a polygon cover, the whole polyfill PIP join — is not
        # re-evaluated 2x per level (guide §2.4; cell sets are tiny by
        # this operator's purpose)
        cur = cur.localCheckpoint(eager=True)
        parents = (
            cur.selectExpr(
                "cast(floor(lat_i / 2) as bigint) as p_lat",
                "cast(floor(lon_i / 2) as bigint) as p_lon",
            )
            .groupBy("p_lat", "p_lon")
            .agg(F.count(F.lit(1)).alias("n_children"))
        )
        full = parents.filter("n_children = 4").select("p_lat", "p_lon")
        rem = cur.join(
            full.withColumnRenamed("p_lat", "j_lat").withColumnRenamed(
                "p_lon", "j_lon"
            ),
            (F.expr("cast(floor(lat_i / 2) as bigint)") == F.col("j_lat"))
            & (F.expr("cast(floor(lon_i / 2) as bigint)") == F.col("j_lon")),
            "left_anti",
        ).selectExpr(f"{res} as res", "lat_i", "lon_i")
        out = rem if out is None else out.unionByName(rem)
        cur = full.selectExpr("p_lat as lat_i", "p_lon as lon_i")
    final = cur.selectExpr(f"{res_to} as res", "lat_i", "lon_i")
    return final if out is None else out.unionByName(final)


def uncompact_cells(
    compacted: DataFrame, res_to: int, min_res: int
) -> DataFrame:
    """Inverse of compact_cells: explode every cell back to its
    ``res_to`` descendants (4^(res_to - res) children each).  One
    arithmetic double-explode per resolution level present — levels are
    bounded and known (min_res..res_to), so the plan is a small union of
    narrow projections."""
    parts = []
    for r in range(min_res, res_to + 1):
        f = 1 << (res_to - r)
        parts.append(
            compacted.filter(f"res = {r}")
            .selectExpr(
                "lat_i", "lon_i", f"explode(sequence(0, {f - 1})) as di"
            )
            .selectExpr(
                "lat_i", "lon_i", "di",
                f"explode(sequence(0, {f - 1})) as dj",
            )
            .selectExpr(
                f"lat_i * {f} + di as lat_i",
                f"lon_i * {f} + dj as lon_i",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.dropDuplicates(["lat_i", "lon_i"])


GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_sql(lat: str, lon: str, chars: int = 6) -> str:
    """Standard GEOHASH string (base-32, lon bit first) as a portable
    SQL expression: quantize lat/lon to 15 bits each over their full
    ranges, interleave lon-first into a 30-bit code, then map each
    5-bit group through the geohash alphabet with substr (1-based in
    both Spark and DuckDB).  chars <= 6 (30 bits).

    Same per-row arithmetic shape as morton_sql — a narrow codegen
    projection; the string form exists for interop with systems keyed
    by geohash (the integer morton key remains the engine's preferred
    layout key)."""
    if not 1 <= chars <= 6:
        raise ValueError("chars must be in 1..6")
    nbits = 15
    latq = (
        f"greatest(least(cast(floor((({lat}) + 90.0) / 180.0"
        f" * {1 << nbits}) as bigint), {(1 << nbits) - 1}), 0)"
    )
    lonq = (
        f"greatest(least(cast(floor((({lon}) + 180.0) / 360.0"
        f" * {1 << nbits}) as bigint), {(1 << nbits) - 1}), 0)"
    )
    terms = []
    for b in range(nbits):
        # lon bit b -> even position 2b, lat bit b -> odd position 2b+1
        # (geohash counts from the MOST significant interleaved bit:
        # bit 0 of the 30-bit code = highest lon bit)
        terms.append(
            f"(cast(floor(_lonq / {1 << b}) as bigint) % 2) * {1 << (2 * b + 1)}"
        )
        terms.append(
            f"(cast(floor(_latq / {1 << b}) as bigint) % 2) * {1 << (2 * b)}"
        )
    code = "(" + " + ".join(terms) + ")"
    chunks = []
    for c in range(chars):
        shift = 5 * (6 - 1 - c)
        idx = f"(cast(floor(_code / {1 << shift}) as bigint) % 32)"
        chunks.append(f"substr('{GEOHASH32}', cast({idx} as int) + 1, 1)")
    expr = "concat(" + ", ".join(chunks) + ")"
    # single-expression form: inline the quantizers and code
    expr = expr.replace("_code", code)
    expr = expr.replace("_lonq", lonq).replace("_latq", latq)
    return expr


def tile_representative(
    df: DataFrame,
    tile_col: str,
    id_col: str,
    score_col: str,
    id_space: int = 1 << 31,
) -> DataFrame:
    """Deterministic REPRESENTATIVE selection per tile: the row with the
    smallest (score, id) — the mosaic/thumbnail pick of a 10^12-image
    raster↔vector pipeline (one canonical image per map tile; score =
    phash for visual canonicalization, quality for curation).

    Pure arithmetic argmin: (score, id) packs into ONE bigint
    (score * id_space + id), so the selection is a plain min()
    aggregate — one shuffle with map-side combine, no window sort, no
    struct-ordering engine differences to oracle around.  Output:
    (tile, n_rows, rep_id, rep_score).

    Domain contract, ENFORCED row-wise (review finding: Spark's % takes
    the dividend's sign and div truncates toward zero, so a negative
    score — e.g. a raw signed xxhash64 — would unpack into garbage
    silently): 0 <= score < 2^63 / id_space and 0 <= id < id_space;
    violations raise.  Normalize signed hashes first (pmod).  NULL
    score/id rows are ignored (NULL pkey never wins a min — the
    pre-guard behavior); a tile whose rows are ALL null yields NULL
    rep columns."""
    max_score = (1 << 63) // id_space
    pk = f"({score_col}) * cast({id_space} as bigint) + ({id_col})"
    guard = (
        f"({score_col}) >= 0 and ({score_col}) < {max_score}"
        f" and ({id_col}) >= 0 and ({id_col}) < {id_space}"
    )
    packed = df.selectExpr(
        f"{tile_col} as tile",
        f"case when ({score_col}) is null or ({id_col}) is null"
        f" then cast(null as bigint)"
        f" when {guard} then {pk}"
        f" else cast(raise_error('tile_representative:"
        f" score must be in [0, {max_score}) and id in [0, {id_space})')"
        " as bigint) end as pkey",
    )
    return (
        packed.groupBy("tile")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("pkey").alias("_min_pkey"),
        )
        .selectExpr(
            "tile",
            "n_rows",
            f"_min_pkey % cast({id_space} as bigint) as rep_id",
            # integer div, NOT floor(double/...): pkey can exceed 2^53
            f"_min_pkey div cast({id_space} as bigint) as rep_score",
        )
    )
