"""Spatial core: TEC-grid cells, point->cell assignment, interpolation joins.

The reference's point query (src/lib.rs:1107-1173) is a linear scan over
cells; the engine replaces it with the canonical Spark shape
(SURVEY.md §3.2):

    points --(arithmetic cell index, narrow)--> join broadcast(tec_cells)
           --(bilinear column expr, narrow)--> [temporal second join]
           --(weighted combine, narrow)--> result

Everything here is JVM-side: the cell index and both interpolation kernels
are plain column arithmetic (whole-stage codegen), the grid side is always
broadcast (a full worldwide day is ~126k cells ~ a few MB), so the ONLY
exchange in the whole pipeline is the broadcast itself.  At 100 TB of
points this plan stays shuffle-free end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ionex_spark.functions import sqlgen
from ionex_spark.functions.sqlgen import GRID


def build_tec_cells(
    spark: SparkSession,
    n_slots: int | None = None,
    corner_dtype: str = "double",
) -> DataFrame:
    """Enumerate the (slot, cell) dimension with the 4 corner TECs
    denormalized — the engine's ``tec_cells`` (SURVEY.md §1.3), generated
    from the deterministic integer field.

    Mirrors the reference's cell construction (src/lib.rs:921-997): the
    cartesian product epochs x lat-pairs x lon-pairs with 4 corner lookups —
    here a single ``spark.range`` decomposition, no joins, no shuffle.

    ``corner_dtype="float"`` halves broadcast-probe traffic (measured +36%
    pipeline throughput on the bandwidth-capped sandbox); float32 error at
    TECu<=60 is <=3.8e-6, inside the reference's own 1e-5 accuracy budget
    (src/tests/toolkit.rs:116).  The bit-exact oracle paths keep "double".
    """
    n_slots = n_slots or GRID.n_slots
    ncl, ncn = GRID.nlat - 1, GRID.nlon - 1
    df = spark.range(n_slots * ncl * ncn)
    decomp = [
        f"cast(id / {ncl * ncn} as bigint) as slot",
        f"cast((id % {ncl * ncn}) / {ncn} as bigint) as lat_i",
        f"id % {ncn} as lon_i",
    ]
    df = df.selectExpr(*decomp)
    out = df.selectExpr(
        "slot",
        "lat_i",
        "lon_i",
        f"{sqlgen.corner_tec_sql('lat_i', 'lon_i', 'slot')} as tec_sw",
        f"{sqlgen.corner_tec_sql('lat_i', '(lon_i + 1)', 'slot')} as tec_se",
        f"{sqlgen.corner_tec_sql('(lat_i + 1)', 'lon_i', 'slot')} as tec_nw",
        f"{sqlgen.corner_tec_sql('(lat_i + 1)', '(lon_i + 1)', 'slot')} as tec_ne",
    )
    if corner_dtype == "float":
        out = out.selectExpr(
            "slot", "lat_i", "lon_i",
            *[f"cast(tec_{c} as float) as tec_{c}"
              for c in ("sw", "se", "nw", "ne")],
        )
    return out


def cells_from_tec_points(tec_points: DataFrame) -> DataFrame:
    """Build ``tec_cells`` from a long ``tec_points`` DataFrame via a 4-way
    self-equi-join on neighbor indices — the general path for ingested
    (non-synthetic) grids, mirroring src/lib.rs:921-997's corner probes.

    Expects columns (slot, lat_i, lon_i, tecu); drops incomplete cells
    (inner joins = the reference's filter_map on missing corners).
    The grid is tiny relative to the point table, so this runs on the
    broadcast side of the pipeline; one shuffle here is irrelevant.
    """
    p = tec_points
    sw = p.selectExpr("slot", "lat_i", "lon_i", "tecu as tec_sw")
    se = p.selectExpr("slot", "lat_i", "lon_i - 1 as lon_i", "tecu as tec_se")
    nw = p.selectExpr("slot", "lat_i - 1 as lat_i", "lon_i", "tecu as tec_nw")
    ne = p.selectExpr(
        "slot", "lat_i - 1 as lat_i", "lon_i - 1 as lon_i", "tecu as tec_ne"
    )
    keys = ["slot", "lat_i", "lon_i"]
    return (
        sw.join(se, keys, "inner").join(nw, keys, "inner").join(ne, keys, "inner")
    )


def with_cell_index(points: DataFrame, lat: str = "lat", lon: str = "lon") -> DataFrame:
    """Narrow projection adding (lat_i, lon_i) — the O(1) replacement for
    the reference's linear containing-cell scan (src/lib.rs:1139-1144)."""
    return points.withColumns(
        {
            "lat_i": F.expr(sqlgen.lat_idx_sql(lat)),
            "lon_i": F.expr(sqlgen.lon_idx_sql(lon)),
        }
    )


def bilinear_tec_col(lat: str = "lat", lon: str = "lon", prefix: str = "tec_"):
    """Bilinear interpolation as a single column expression over a joined
    (point, cell) row — kernel of src/cell/mod.rs:412-432."""
    return F.expr(
        sqlgen.bilinear_sql(
            sqlgen.frac_p_sql(lat, "lat_i"),
            sqlgen.frac_q_sql(lon, "lon_i"),
            f"{prefix}sw",
            f"{prefix}se",
            f"{prefix}nw",
            f"{prefix}ne",
        )
    )


def packed_key_expr(slot: str = "slot", lat_i: str = "lat_i",
                    lon_i: str = "lon_i") -> str:
    """Pack (slot, lat_i, lon_i) into ONE bigint join key.

    A single-long key lets Spark build a LongHashedRelation instead of a
    generic 3-column UnsafeHashedRelation — measured 8-10x faster probes
    and the difference between a join stage that stops scaling at ~12M
    rows/s total and one that does ~100M rows/s on 32 cores.  At 100 TB
    this is also the smaller shuffle/bucket key."""
    ncells = (GRID.nlat - 1) * (GRID.nlon - 1)
    return f"(({slot}) * {ncells} + ({lat_i}) * {GRID.nlon - 1} + ({lon_i}))"


def spatial_join_bilinear(
    points: DataFrame,
    cells: DataFrame,
    slot_col: str = "slot",
    lat: str = "lat",
    lon: str = "lon",
    out: str = "tec",
) -> DataFrame:
    """points x broadcast(cells) equi-join on the packed cell key + bilinear.

    The aligned-epoch path of the reference's point query
    (src/lib.rs:1138-1173) for a whole point table at once.
    """
    p = with_cell_index(points, lat, lon).withColumn(
        "ck", F.expr(packed_key_expr(slot_col))
    )
    c = cells.withColumn("ck", F.expr(packed_key_expr())).drop(
        "slot", "lat_i", "lon_i"
    )
    j = p.join(F.broadcast(c), "ck", "inner")
    return j.withColumn(out, bilinear_tec_col(lat, lon)).drop(
        "tec_sw", "tec_se", "tec_nw", "tec_ne", "ck"
    )


def build_tec_cell_pairs(cells: DataFrame) -> DataFrame:
    """Bracket-pair dimension: one row per (slot0, cell) carrying the 8
    corners of BOTH bracket epochs (t0 = slot0, t1 = slot0 + 1).

    Built once on the (tiny) grid side so the temporal point query costs a
    SINGLE broadcast probe per row instead of two — halves hash-probe and
    row-allocation work in the hot stage."""
    c0 = cells.selectExpr(
        "slot as slot0", "lat_i", "lon_i",
        "tec_sw as sw0", "tec_se as se0", "tec_nw as nw0", "tec_ne as ne0",
    )
    c1 = cells.selectExpr(
        "slot - 1 as slot0", "lat_i", "lon_i",
        "tec_sw as sw1", "tec_se as se1", "tec_nw as nw1", "tec_ne as ne1",
    )
    return c0.join(c1, ["slot0", "lat_i", "lon_i"], "inner").selectExpr(
        f"{packed_key_expr('slot0')} as ck0",
        "sw0", "se0", "nw0", "ne0", "sw1", "se1", "nw1", "ne1",
    )


def temporal_spatial_join(
    points: DataFrame,
    cells: DataFrame,
    tsec_col: str = "tsec",
    lat: str = "lat",
    lon: str = "lon",
    out: str = "tec",
) -> DataFrame:
    """Unaligned-epoch path: bracket t in [t0, t1), bilinear at both bracket
    epochs via two broadcast joins, then the linear temporal combine
    (src/cell/mod.rs:799-830).  w=0 exactness at map epochs; points beyond
    the last map epoch are dropped by the inner join on slot1 (the
    reference's TemporalMismatch -> no row)."""
    p = with_cell_index(points, lat, lon).withColumns(
        {
            "slot0": F.expr(sqlgen.bracket_slot0_sql(tsec_col)),
            "w1": F.expr(sqlgen.bracket_w1_sql(tsec_col)),
        }
    ).withColumn("ck0", F.expr(packed_key_expr("slot0")))
    p = p.filter(F.expr(sqlgen.bracket_valid_sql("w1")))
    pairs = build_tec_cell_pairs(cells)
    j = p.join(F.broadcast(pairs), "ck0", "inner").drop("ck0")
    p_expr = sqlgen.frac_p_sql(lat, "lat_i")
    q_expr = sqlgen.frac_q_sql(lon, "lon_i")
    tec0 = sqlgen.bilinear_sql(p_expr, q_expr, "sw0", "se0", "nw0", "ne0")
    tec1 = sqlgen.bilinear_sql(p_expr, q_expr, "sw1", "se1", "nw1", "ne1")
    return j.withColumn(
        out, F.expr(f"(1.0 - w1) * {tec0} + w1 * {tec1}")
    ).drop("sw0", "se0", "nw0", "ne0", "sw1", "se1", "nw1", "ne1")


def _irregular_intervals(
    epochs: DataFrame,
    epoch_col: str = "esec",
    slot_col: str | None = None,
) -> DataFrame:
    """(t0, t1, tmax[, slot0, slot1]) interval table over an irregular
    epoch axis: lead() window over the distinct sorted epochs.  The
    epoch table is tiny (map-count rows) so the single-partition window
    is irrelevant; carrying ``slot_col`` maps each bracket epoch to its
    TEC-map slot for the end-to-end interpolation path."""
    from pyspark.sql.window import Window

    w = Window.orderBy(epoch_col)
    wall = Window.partitionBy()
    cols = [epoch_col] + ([slot_col] if slot_col else [])
    iv = epochs.select(*cols).distinct().withColumn(
        "t1", F.lead(epoch_col).over(w)
    )
    if slot_col:
        iv = iv.withColumn("slot1", F.lead(slot_col).over(w)).withColumnRenamed(
            slot_col, "slot0"
        )
    return (
        iv.withColumn("tmax", F.max(epoch_col).over(wall))
        .filter(F.col("t1").isNotNull())
        .withColumnRenamed(epoch_col, "t0")
    )


def bracket_irregular(
    points: DataFrame,
    epochs: DataFrame,
    tsec_col: str = "tsec",
    epoch_col: str = "esec",
    slot_col: str | None = None,
    intervals: DataFrame | None = None,
) -> DataFrame:
    """Temporal bracketing for an IRREGULAR epoch axis.

    The regular axis uses pure arithmetic (bracket_slot0_sql); when map
    epochs are unevenly spaced (the reference's sorted-epochs
    tuple_windows, src/lib.rs:1123-1137), build the interval table with a
    lead() window over the distinct epochs and range-join
    ``t0 <= t < t1`` (t == t1 accepted on the FINAL interval only — the
    reference's backward branch at the last epoch).  The epoch table is
    tiny -> broadcast, so the range join is a BroadcastNestedLoop over a
    handful of intervals, not a shuffle; output adds (t0, t1, w1), plus
    (slot0, slot1) when ``slot_col`` names the epochs' map-slot column.
    Pass a precomputed ``intervals`` table to share it with other
    consumers (temporal_spatial_join_irregular builds it once)."""
    if intervals is None:
        intervals = _irregular_intervals(epochs, epoch_col, slot_col)
    cond = (F.col(tsec_col) >= F.col("t0")) & (
        (F.col(tsec_col) < F.col("t1"))
        | ((F.col(tsec_col) == F.col("t1")) & (F.col("t1") == F.col("tmax")))
    )
    j = points.join(F.broadcast(intervals), cond, "inner").drop("tmax")
    return j.withColumn(
        "w1",
        F.expr(
            f"(cast({tsec_col} as double) - cast(t0 as double))"
            " / (cast(t1 as double) - cast(t0 as double))"
        ),
    )


def build_tec_cell_pairs_irregular(
    cells: DataFrame, slot_pairs: DataFrame
) -> DataFrame:
    """Bracket-pair dimension for an ARBITRARY (slot0, slot1) interval
    table — the irregular-axis twin of build_tec_cell_pairs (which
    hard-codes slot1 = slot0 + 1).  slot0 uniquely identifies its
    interval, so the probe key stays the single packed long on slot0."""
    c0 = cells.selectExpr(
        "slot as slot0", "lat_i", "lon_i",
        "tec_sw as sw0", "tec_se as se0", "tec_nw as nw0", "tec_ne as ne0",
    )
    c1 = cells.selectExpr(
        "slot as slot1", "lat_i", "lon_i",
        "tec_sw as sw1", "tec_se as se1", "tec_nw as nw1", "tec_ne as ne1",
    )
    return (
        c0.join(F.broadcast(slot_pairs.select("slot0", "slot1")), "slot0")
        .join(c1, ["slot1", "lat_i", "lon_i"])
        .selectExpr(
            f"{packed_key_expr('slot0')} as ck0",
            "sw0", "se0", "nw0", "ne0", "sw1", "se1", "nw1", "ne1",
        )
    )


def temporal_spatial_join_irregular(
    points: DataFrame,
    cells: DataFrame,
    epochs: DataFrame,
    tsec_col: str = "tsec",
    lat: str = "lat",
    lon: str = "lon",
    out: str = "tec",
    epoch_col: str = "esec",
    slot_col: str = "slot",
) -> DataFrame:
    """END-TO-END irregular-axis interpolation: bracket tsec on the
    irregular epoch axis (range join against the tiny broadcast interval
    table), then ONE broadcast cell-pair probe + bilinear at both bracket
    epochs + linear temporal combine — the irregular twin of
    temporal_spatial_join, completing the reference's bracketing path
    (src/lib.rs:1123-1137) with the §2.8 combine.  ``epochs`` maps each
    irregular epoch second to its TEC-map slot: (esec, slot).

    Same 100 TB shape as the regular path: the point side stays narrow
    (bracket + cell index are per-row), both joins are broadcasts."""
    intervals = _irregular_intervals(epochs, epoch_col, slot_col)
    br = bracket_irregular(
        points, epochs, tsec_col, epoch_col, slot_col, intervals=intervals
    )
    p = with_cell_index(br, lat, lon).withColumn(
        "ck0", F.expr(packed_key_expr("slot0"))
    )
    pairs = build_tec_cell_pairs_irregular(cells, intervals)
    j = p.join(F.broadcast(pairs), "ck0", "inner").drop("ck0")
    p_expr = sqlgen.frac_p_sql(lat, "lat_i")
    q_expr = sqlgen.frac_q_sql(lon, "lon_i")
    tec0 = sqlgen.bilinear_sql(p_expr, q_expr, "sw0", "se0", "nw0", "ne0")
    tec1 = sqlgen.bilinear_sql(p_expr, q_expr, "sw1", "se1", "nw1", "ne1")
    return j.withColumn(
        out, F.expr(f"(1.0 - w1) * {tec0} + w1 * {tec1}")
    ).drop("sw0", "se0", "nw0", "ne0", "sw1", "se1", "nw1", "ne1")


def gap_fill_series(
    sparse: DataFrame,
    n_slots: int,
    keys: list[str],
    slot_col: str = "slot",
    value_col: str = "tecu",
) -> DataFrame:
    """Fill missing slots of a per-key time series by LINEAR interpolation
    between the nearest present bracketing slots — the reference's
    epoch-bracketed temporal interpolation (src/lib.rs:1123-1137,
    src/cell/mod.rs:799-830) applied to series repair.  Leading/trailing
    gaps (no bracket on one side) stay absent.

    Output: keys + (slot, value_col, was_gap) for every slot that is
    present or fillable.  Shape at 100 TB: the dense axis is an
    arithmetic sequence EXPLODED per key (no join against a slot table),
    and both ignore-nulls window scans run in the SAME per-key window
    partitioning — one exchange keyed by the (uniform) series key, then
    narrow arithmetic."""
    keyexpr = ", ".join(keys)
    dense = (
        sparse.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_n"))
        .selectExpr(
            *keys, f"explode(sequence(0, {n_slots - 1})) as {slot_col}"
        )
    )
    full = dense.join(sparse, [*keys, slot_col], "left")
    w = f"partition by {keyexpr} order by {slot_col}"
    filled = full.selectExpr(
        *keys,
        slot_col,
        value_col,
        f"last({value_col}, true) over ({w} rows between unbounded"
        f" preceding and current row) as _v0",
        f"last(case when {value_col} is not null then {slot_col} end, true)"
        f" over ({w} rows between unbounded preceding and current row)"
        " as _s0",
        f"first({value_col}, true) over ({w} rows between current row"
        " and unbounded following) as _v1",
        f"first(case when {value_col} is not null then {slot_col} end, true)"
        f" over ({w} rows between current row and unbounded following)"
        " as _s1",
    )
    return filled.selectExpr(
        *keys,
        slot_col,
        f"""case when {value_col} is not null then cast({value_col} as double)
             else _v0 + (_v1 - _v0)
                  * (cast({slot_col} - _s0 as double)
                     / cast(_s1 - _s0 as double))
            end as {value_col}_filled""",
        f"cast(case when {value_col} is null then 1 else 0 end as int)"
        " as was_gap",
    ).filter(f"{value_col}_filled is not null")


# ------------------------------------------------- 3-D (height-axis) grid

def packed_key3_expr(
    slot: str = "slot",
    alt_i: str = "alt_i",
    lat_i: str = "lat_i",
    lon_i: str = "lon_i",
) -> str:
    """Pack (slot, alt_i, lat_i, lon_i) into ONE bigint join key — the
    3-D twin of packed_key_expr (same LongHashedRelation rationale)."""
    ncells = (GRID.nlat - 1) * (GRID.nlon - 1)
    nalt = sqlgen.ALT.nh - 1
    return (
        f"(((({slot}) * {nalt} + ({alt_i})) * {ncells})"
        f" + ({lat_i}) * {GRID.nlon - 1} + ({lon_i}))"
    )


def build_tec_cells_3d(
    spark: SparkSession, n_slots: int | None = None
) -> DataFrame:
    """Cell dimension for a `MAP DIMENSION 3` grid (src/header/mod.rs:
    64-70): one row per (slot, height-cell, lat-cell, lon-cell) carrying
    the 8 corner TECs of BOTH bounding height planes, so the trilinear
    point query costs a SINGLE broadcast probe per row (the
    build_tec_cell_pairs trick applied to the altitude axis).

    Size: slots x (nh-1) x 70 x 72 cells — a worldwide 3-D day is still
    only a few hundred MB of broadcast state at double precision, far
    below executor memory; at larger height grids, restrict n_slots or
    feed a pre-filtered plane range."""
    n_slots = n_slots or GRID.n_slots
    ncl, ncn = GRID.nlat - 1, GRID.nlon - 1
    nalt = sqlgen.ALT.nh - 1
    per_slot = nalt * ncl * ncn
    df = spark.range(n_slots * per_slot).selectExpr(
        f"cast(id / {per_slot} as bigint) as slot",
        f"cast((id % {per_slot}) / {ncl * ncn} as bigint) as alt_i",
        f"cast((id % {ncl * ncn}) / {ncn} as bigint) as lat_i",
        f"id % {ncn} as lon_i",
    )
    corners = {}
    for tag, ai in (("lo", "alt_i"), ("hi", "(alt_i + 1)")):
        for c, (la, lo) in {
            "sw": ("lat_i", "lon_i"),
            "se": ("lat_i", "(lon_i + 1)"),
            "nw": ("(lat_i + 1)", "lon_i"),
            "ne": ("(lat_i + 1)", "(lon_i + 1)"),
        }.items():
            corners[f"{c}_{tag}"] = sqlgen.corner_tec3_sql(la, lo, ai, "slot")
    return df.selectExpr(
        "slot", "alt_i", "lat_i", "lon_i",
        *[f"{expr} as {name}" for name, expr in corners.items()],
    )


def trilinear_join(
    points: DataFrame,
    cells3: DataFrame,
    slot_col: str = "slot",
    lat: str = "lat",
    lon: str = "lon",
    alt: str = "alt",
    out: str = "tec",
) -> DataFrame:
    """points x broadcast(3-D cells) equi-join on the packed 3-D key +
    trilinear interpolation: bilinear (reference kernel) at the two
    bounding height planes, linear combine in altitude.  Completes the
    reference's parsed-but-never-computed height axis
    (src/record/parsing.rs:174-175) with the same plan shape as the 2-D
    flagship: narrow arithmetic index, one broadcast hash probe, no
    shuffle at any point-table scale."""
    p = with_cell_index(points, lat, lon).withColumns(
        {
            "alt_i": F.expr(sqlgen.alt_idx_sql(alt)),
        }
    ).withColumn("ck", F.expr(packed_key3_expr(slot_col)))
    c = cells3.withColumn("ck", F.expr(packed_key3_expr())).drop(
        "slot", "alt_i", "lat_i", "lon_i"
    )
    j = p.join(F.broadcast(c), "ck", "inner").drop("ck")
    expr = sqlgen.trilinear_sql(
        sqlgen.frac_p_sql(lat, "lat_i"),
        sqlgen.frac_q_sql(lon, "lon_i"),
        sqlgen.frac_r_sql(alt, "alt_i"),
        ("sw_lo", "se_lo", "nw_lo", "ne_lo"),
        ("sw_hi", "se_hi", "nw_hi", "ne_hi"),
    )
    drop = [f"{c}_{t}" for t in ("lo", "hi") for c in ("sw", "se", "nw", "ne")]
    return j.withColumn(out, F.expr(expr)).drop(*drop)
