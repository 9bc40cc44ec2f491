"""The engine's query registry — drives __spark_entry__.queries()/oracle_sql().

Every entry pairs a Spark DataFrame plan (the ENGINE path: real operators,
broadcast joins, windows) with an equivalent DuckDB SQL oracle built from
the SAME arithmetic fragments (ionex_spark.functions.sqlgen), so float
results match bit-for-bit while the plans are genuinely different.

Synthetic geospatial inputs are derived deterministically from integer id
columns of the driver's parquet tables (events/lineitem/...) — no external
data, reproducible in both engines.
"""

from __future__ import annotations

import json
import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from ionex_spark.functions import sqlgen
from ionex_spark.functions.sqlgen import GRID
from ionex_spark.operators import knn as knn_ops
from ionex_spark.operators import pip as pip_ops
from ionex_spark.operators import spatial
from ionex_spark.core import synth

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}
PRIORITY: dict[str, int] = {}

# The round driver's oracle gate checks only the FIRST 50 entries of
# __spark_entry__.queries() in iteration order (round-3 verdict finding
# #1: 13 of 63 queries silently fell outside the window).  register()
# carries a priority tag:
#   100 = novel/recently-changed work that MUST have driver evidence
#         THIS round (demote to 50 once a green driver row lands)
#    50 = default
#    10 = trivial + long-stable (simple scans/filters whose operator is
#         also pytest-covered)
# Since round 5 the ordering is STALENESS-DOMINANT (round-4 verdict
# task #1): after the explicit priority-100 block, entries sort by how
# old their last green driver row is (gate_history.json, regenerated
# from the driver's own CORRECTNESS_r*.json via
# tools/gen_gate_history.py).  With an 89-entry registry and a 50-entry
# window this rotates every oracled query through the hard gate at
# least once every 2 rounds; tests/test_registry_order.py pins that
# invariant.


def register(name: str, oracle: str | None = None, priority: int = 50):
    def deco(fn):
        QUERIES[name] = fn
        PRIORITY[name] = priority
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


_HISTORY_PATH = os.path.join(os.path.dirname(__file__), "gate_history.json")

# Evidence tiers for the rotation invariant (round-5 verdict task #9):
# a query with >= DEEP_EVIDENCE green driver rounds is "deeply verified"
# and may rotate on a relaxed 3-round cycle; everything else must hit
# the driver gate at least every 2 rounds.  With ~100 registered queries
# and a 50-entry gate window this keeps rotation feasible while new
# priority-100 work still claims window slots each round.
DEEP_EVIDENCE = 3


def _green_rounds(repo_root: str, pattern: str) -> tuple[int, dict[str, list[int]]]:
    """(latest_round, {query: [green rounds]}) from files matching
    ``pattern`` (rNN-numbered JSONs of {name: {rows_match, hash_match,
    schema_match, ...}} rows)."""
    import glob
    import re

    rounds: dict[str, list[int]] = {}
    latest = 0
    for path in sorted(glob.glob(os.path.join(repo_root, pattern))):
        m = re.search(r"r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        latest = max(latest, rnd)
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            green = bool(
                row.get("rows_match")
                and row.get("hash_match")
                and row.get("schema_match", True)
            )
            if green:
                rounds.setdefault(name, []).append(rnd)
    return latest, {k: sorted(v) for k, v in sorted(rounds.items())}


def build_history(repo_root: str) -> dict:
    """Derive the gate history from the evidence JSONs on disk.

    Two independent sources (round-6 verdict task #1 — the 115-query
    registry arithmetically outgrew the driver's 50-entry gate window, so
    rotation needs a second, compensating evidence channel):

    - ``rounds``: the DRIVER's CORRECTNESS_r*.json files — a query's
      entry lists every round with a fully green driver row (rows +
      schema + hash match).  The registry never self-certifies here.
    - ``builder_rounds``: committed BUILDER-run full-registry oracle
      reports (ORACLE_REPORT_r*.json, written by
      tools/gen_oracle_report.py which replays the driver's gate check —
      same row shape — over EVERY registered query at sf0.01).  These
      keep the staleness invariant satisfiable for queries the window
      cannot reach this round; the window ordering itself still rotates
      on driver evidence only, so driver rows stay the preferred
      evidence and every query keeps cycling through the hard gate."""
    latest, rounds = _green_rounds(repo_root, "CORRECTNESS_r*.json")
    _, builder = _green_rounds(repo_root, "ORACLE_REPORT_r*.json")
    return {
        "latest_round": latest,
        "rounds": rounds,
        "builder_rounds": builder,
    }


def _committed_history() -> dict:
    try:
        with open(_HISTORY_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):  # fresh checkout / corrupt merge artifact
        return {"latest_round": 0, "rounds": {}}


def gate_history() -> dict:
    """Per-query green-driver-round history ({name: [rounds]}, latest_round).

    SELF-HEALING (round-5 verdict task #1): if a CORRECTNESS_r*.json
    newer than the committed JSON exists on disk — the driver writes one
    at each round boundary, after the builder's last commit — the history
    is regenerated in-memory from the driver files and written back
    best-effort, so a driver write can never strand a stale rotation
    order (or red freshness tests) across a round boundary.  When the
    package runs from a zip (spark-submit --py-files) the repo root is
    absent and the committed JSON is used as-is."""
    committed = _committed_history()
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    try:
        fresh = build_history(repo_root)
    except (OSError, ValueError):
        return committed
    # compare CONTENT, not just latest_round: a driver re-write of the
    # SAME round's CORRECTNESS file (changed green set, same round
    # number) must also heal (review finding).  fresh == empty means
    # we're outside a checkout (zip) — trust the committed JSON.
    if fresh["latest_round"] == 0 or fresh == committed:
        return committed
    try:  # keep the committed file in sync for zip consumers —
        # atomically, so concurrent callers can't interleave a
        # truncated write into the git-tracked file (review finding)
        tmp = _HISTORY_PATH + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(fresh, f, indent=1, sort_keys=True)
            f.write("\n")
        os.replace(tmp, _HISTORY_PATH)
    except OSError:
        pass
    return fresh


def last_driver_round(name: str, hist: dict | None = None) -> int:
    """Newest round with a fully green driver row for `name` (0 = never)."""
    h = hist if hist is not None else gate_history()
    rounds = h["rounds"].get(name)
    return rounds[-1] if rounds else 0


def last_evidence_round(name: str, hist: dict | None = None) -> int:
    """Newest round with ANY fully green independent evidence for `name`:
    a driver CORRECTNESS row or a committed builder-run full-registry
    oracle report row (0 = never).  The staleness invariant runs on this;
    window ORDERING stays driver-only (last_driver_round) so builder
    reports never displace a query's turn at the hard gate."""
    h = hist if hist is not None else gate_history()
    b = h.get("builder_rounds", {}).get(name)
    return max(last_driver_round(name, h), b[-1] if b else 0)


def evidence_depth(name: str, hist: dict | None = None) -> int:
    """Number of distinct rounds with a green driver row for `name`."""
    h = hist if hist is not None else gate_history()
    return len(h["rounds"].get(name, ()))


def max_staleness(name: str, hist: dict | None = None) -> int:
    """Rounds a query may go without a green driver row before the
    rotation invariant fails: 2 normally, 3 once deeply verified
    (>= DEEP_EVIDENCE green rounds)."""
    return 3 if evidence_depth(name, hist) >= DEEP_EVIDENCE else 2


def current_round() -> int:
    """The round now being built = latest recorded driver round + 1."""
    return gate_history()["latest_round"] + 1


def ordered_names() -> list[str]:
    """Registry names, most-gate-worthy first.

    Sort key: (new-work block first, last green driver round ascending,
    evidence depth ascending, priority descending, name).  Priority 100
    pins this round's new/changed queries to the top; everything else
    rotates by evidence staleness so never-checked and oldest-checked
    queries always reach the driver's 50-entry window.  Among equally
    stale entries, the ones with FEWER lifetime green rounds rotate in
    first — deeply verified entries (>= DEEP_EVIDENCE greens) are the
    ones allowed a relaxed 3-round cycle, so they yield window slots to
    less-proven work.  Name is the final tiebreak — NOT registration
    order, which depends on Python import order (a consumer importing
    queries_ref before queries_data would silently reshuffle the gate
    window; found the hard way in round 4)."""
    hist = gate_history()
    return sorted(
        QUERIES,
        key=lambda n: (
            0 if PRIORITY[n] >= 100 else 1,
            last_driver_round(n, hist),
            evidence_depth(n, hist),
            -PRIORITY[n],
            n,
        ),
    )


def _t(sf_dir: str, table: str) -> str:
    return f"{sf_dir}/{table}.parquet"


def read_split(spark: SparkSession, path: str) -> DataFrame:
    """Parquet read that guarantees per-row compute can use every core.

    The driver's test tables are ONE parquet file with ONE row group, so
    a plain scan is a single task no matter the cluster size — and the
    engine evaluates its per-row-expensive expressions (8-seed md5
    minhash, tokenization, embedding folds) below the first exchange,
    i.e. on one core of 32 (round-7 measurement: the minhash signature
    stage alone was ~2.1 s single-task vs ~0.2 s spread).  Guide §2.5
    names the fix: "input skew: one huge unsplittable file ...
    repartition immediately after the read".

    Scale-adaptive, not a local[32] constant: when the scan already
    yields at least the session's default parallelism in splits (any
    production-sized table), this is a NO-OP — no extra exchange.  The
    explicit partition count pins the exchange against AQE re-coalescing
    it back to one partition (tiny-bytes advisory).

    Two measured refinements over the naive version:
    - the split count is estimated from FILE SIZES (pure metadata; the
      .rdd.getNumPartitions() probe compiles a physical plan and cost
      ~80 ms per call — a real tax across 86 bench queries), falling
      back to the probe off the local filesystem;
    - the redistribution HASH-partitions on the table's leading column
      (every table here leads with its high-cardinality integer id)
      instead of round-robin: keyless repartition(n) first pays a
      LOCAL SORT of its input for retry determinism (guide §2.5,
      SPARK-23207) — a single-task sort of the whole table exactly in
      the case this helper fires for.  A deterministic id-hash is the
      guide's own retry-safe alternative, and measured faster on both
      light and heavy consumers (minhash sigs 0.62 s round-robin vs
      0.32 s id-hash)."""
    df = spark.read.parquet(path)
    target = spark.sparkContext.defaultParallelism
    try:
        p = path[5:] if path.startswith("file:") else path
        if os.path.isfile(p):
            sizes = [os.path.getsize(p)]
        else:
            import glob as _glob

            sizes = [
                os.path.getsize(f)
                for f in _glob.glob(os.path.join(p, "*.parquet"))
            ]
        if not sizes:
            raise OSError(f"no parquet files under {p}")
        maxpb = 128 * 1024 * 1024
        try:
            maxpb = int(
                str(
                    spark.conf.get(
                        "spark.sql.files.maxPartitionBytes", str(maxpb)
                    )
                ).rstrip("b")
            )
        except ValueError:
            pass
        est = sum(-(-s // maxpb) for s in sizes)
    except OSError:  # non-local fs: pay the plan-compile probe once
        est = df.rdd.getNumPartitions()
    if est < target:
        df = df.repartition(target, df.columns[0])
    return df


# ------------------------------------------------------------ point synthesis

_PTS_COLS = {
    "id": "event_id",
    "lat": sqlgen.lat_from_id_sql("event_id"),
    "lon": sqlgen.lon_from_id_sql("event_id"),
    "slot": sqlgen.slot_from_id_sql("event_id"),
    "tsec": sqlgen.tsec_from_id_sql("event_id"),
}

_PTS_SQL = (
    "SELECT "
    + ", ".join(f"{expr} AS {name}" for name, expr in _PTS_COLS.items())
    + " FROM events"
)


def event_points(
    spark: SparkSession, sf_dir: str, split: bool = True
) -> DataFrame:
    """``split=False`` keeps the plain one-split scan: queries whose
    per-row work on the derived points is trivial (plain filters,
    rollups) measured FASTER without the read_split exchange — the
    fan-out only pays for itself when heavy arithmetic (HOF sorts,
    joins, hashing) follows (round-7 per-query A/B, OPTIMIZATION_r07.md)."""
    reader = read_split(spark, _t(sf_dir, "events")) if split else (
        spark.read.parquet(_t(sf_dir, "events"))
    )
    df = reader.select("event_id")
    return df.selectExpr(
        *[f"{expr} as {name}" for name, expr in _PTS_COLS.items()]
    )


# ---------------------------------------------------------------- flagship

_TEC_EXPR_ORACLE = sqlgen.bilinear_sql(
    sqlgen.frac_p_sql("lat", "lat_i"),
    sqlgen.frac_q_sql("lon", "lon_i"),
    sqlgen.corner_tec_sql("lat_i", "lon_i", "slot"),
    sqlgen.corner_tec_sql("lat_i", "(lon_i + 1)", "slot"),
    sqlgen.corner_tec_sql("(lat_i + 1)", "lon_i", "slot"),
    sqlgen.corner_tec_sql("(lat_i + 1)", "(lon_i + 1)", "slot"),
)

_TILE_RES = 6


@register(
    "tile_bilinear",
    oracle=f"""
WITH pts AS ({_PTS_SQL}),
idx AS (
  SELECT id, lat, lon, slot,
         {sqlgen.lat_idx_sql('lat')} AS lat_i,
         {sqlgen.lon_idx_sql('lon')} AS lon_i
  FROM pts
)
SELECT id, slot, lat_i, lon_i,
       {sqlgen.cell_id_sql('lat', 'lon', _TILE_RES)} AS tile_id,
       {_TEC_EXPR_ORACLE} AS tec
FROM idx
""",
)
def tile_bilinear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP: point -> cell assignment -> broadcast spatial join ->
    bilinear TEC -> hierarchical tile id.  The reference's aligned-epoch
    point query (src/lib.rs:1138-1173) over a whole table, shuffle-free."""
    pts = event_points(spark, sf_dir)
    cells = spatial.build_tec_cells(spark)
    out = spatial.spatial_join_bilinear(pts, cells)
    return out.select(
        "id",
        "slot",
        "lat_i",
        "lon_i",
        F.expr(sqlgen.cell_id_sql("lat", "lon", _TILE_RES)).alias("tile_id"),
        "tec",
    )


@register(
    "temporal_interp",
    oracle=f"""
WITH pts AS ({_PTS_SQL}),
idx AS (
  SELECT id, lat, lon, tsec,
         {sqlgen.lat_idx_sql('lat')} AS lat_i,
         {sqlgen.lon_idx_sql('lon')} AS lon_i,
         {sqlgen.bracket_slot0_sql('tsec')} AS slot0,
         {sqlgen.bracket_w1_sql('tsec')} AS w1
  FROM pts
)
SELECT id, slot0, w1,
       ({sqlgen.D(1.0)} - w1) * {_TEC_EXPR_ORACLE.replace('slot', 'slot0')}
       + w1 * {_TEC_EXPR_ORACLE.replace('slot', '(slot0 + 1)')} AS tec
FROM idx
WHERE {sqlgen.bracket_valid_sql('w1')}
""",
)
def temporal_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unaligned epochs: bracket t in [t0, t1), bilinear at both epochs via
    two broadcast joins, linear combine (src/cell/mod.rs:799-830)."""
    pts = event_points(spark, sf_dir)
    cells = spatial.build_tec_cells(spark)
    out = spatial.temporal_spatial_join(pts, cells)
    return out.select("id", "slot0", "w1", "tec")


@register(
    "cell_rollup",
    oracle=f"""
WITH pts AS ({_PTS_SQL})
SELECT {sqlgen.cell_id_sql('lat', 'lon', 4)} AS cell4,
       count(*) AS n_points,
       min(id) AS min_id
FROM pts
GROUP BY 1
""",
)
def cell_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical tile rollup: encode at res 6, roll up to parent res 4,
    count per parent — the raster-side aggregation path."""
    pts = event_points(spark, sf_dir, split=False)
    enc = pts.withColumn(
        "cell6", F.expr(sqlgen.cell_id_sql("lat", "lon", 6))
    ).withColumn("cell4", F.expr(sqlgen.cell_parent_sql("cell6", 6, 4)))
    return enc.groupBy("cell4").agg(
        F.count(F.lit(1)).alias("n_points"), F.min("id").alias("min_id")
    )


@register(
    "knn_grid",
    oracle=f"""
WITH pts AS ({_PTS_SQL}),
idx AS (
  SELECT id, lat, lon,
         {sqlgen.lat_idx_sql('lat')} AS lat_i,
         {sqlgen.lon_idx_sql('lon')} AS lon_i
  FROM pts
),
cand AS (
  SELECT id, lat, lon,
         lat_i + di AS g_lat_i, lon_i + dj AS g_lon_i
  FROM idx
  CROSS JOIN (SELECT di.d AS di, dj.d AS dj
              FROM (VALUES (-1),(0),(1),(2)) di(d),
                   (VALUES (-1),(0),(1),(2)) dj(d)) offs
  WHERE lat_i + di BETWEEN 0 AND {GRID.nlat - 1}
    AND lon_i + dj BETWEEN 0 AND {GRID.nlon - 1}
),
scored AS (
  SELECT id, g_lat_i, g_lon_i,
         {sqlgen.cell_lat0_sql('g_lat_i')} AS g_lat,
         {sqlgen.cell_lon0_sql('g_lon_i')} AS g_lon,
         (lat - {sqlgen.cell_lat0_sql('g_lat_i')})
           * (lat - {sqlgen.cell_lat0_sql('g_lat_i')})
         + (lon - {sqlgen.cell_lon0_sql('g_lon_i')})
           * (lon - {sqlgen.cell_lon0_sql('g_lon_i')}) AS dist2
  FROM cand
)
SELECT id, rank, g_lat_i, g_lon_i, g_lat, g_lon, dist2
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY id ORDER BY dist2, g_lat_i, g_lon_i) AS rank
  FROM scored
)
WHERE rank <= 4
""",
)
def knn_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k=4 nearest grid points per query point (SURVEY.md §2.3 kNN)."""
    pts = event_points(spark, sf_dir)
    out = knn_ops.knn_grid_points(pts, k=4)
    # row_number() is int32 in Spark but bigint in DuckDB: align schemas
    return out.selectExpr(
        "id", "cast(rank as bigint) as rank",
        "g_lat_i", "g_lon_i", "g_lat", "g_lon", "dist2",
    )


def _polygon_edges_values() -> str:
    rows = pip_ops.edges_from_rings(synth.polygon_rings())
    vals = ", ".join(
        f"('{pid}', {x1!r}, {y1!r}, {x2!r}, {y2!r}, {sh})"
        for pid, x1, y1, x2, y2, sh in rows
    )
    return f"(VALUES {vals}) edges(poly_id, x1, y1, x2, y2, shifted)"


@register(
    "pip_polygons",
    oracle=f"""
WITH pts AS ({_PTS_SQL}),
hits AS (
  SELECT id, poly_id, count(*) AS crossings
  FROM pts JOIN {_polygon_edges_values()}
    ON {pip_ops.CROSSING_COND.format(px='lon', py='lat')}
  GROUP BY id, poly_id
)
SELECT id, poly_id FROM hits WHERE crossings % 2 = 1
""",
)
def pip_polygons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon join against the fixture polygon set (convex,
    concave, dateline-adjacent) — edge-table crossing number, built-ins
    only (reference containment: src/cell/mod.rs:307-309)."""
    pts = event_points(spark, sf_dir)
    edges = pip_ops.edges_df(spark, synth.polygon_rings())
    return pip_ops.pip_edges_join(pts, edges)


@register(
    "roi_filter",
    oracle=f"""
WITH pts AS ({_PTS_SQL})
SELECT {sqlgen.lat_idx_sql('lat')} AS lat_i,
       {sqlgen.lon_idx_sql('lon')} AS lon_i,
       count(*) AS n_points
FROM pts
WHERE lat >= -30.0 AND lat <= 30.0 AND lon >= -30.0 AND lon <= 30.0
GROUP BY 1, 2
""",
)
def roi_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROI reduction: rect containment filter + per-cell count — mirrors
    to_regional_ionex's (-30..30)^2 fixture (src/lib.rs:621-656,
    src/tests/roi.rs)."""
    pts = event_points(spark, sf_dir, split=False)
    roi = pts.filter(
        (F.col("lat") >= -30.0) & (F.col("lat") <= 30.0)
        & (F.col("lon") >= -30.0) & (F.col("lon") <= 30.0)
    )
    return (
        spatial.with_cell_index(roi)
        .groupBy("lat_i", "lon_i")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )


# ------------------------------------------------ grid construction / merge

_TEC_POINTS_SQL = f"""
  SELECT cast(floor(g.range / {(GRID.nlat) * (GRID.nlon)}) as bigint) AS slot,
         cast(floor((g.range % {(GRID.nlat) * (GRID.nlon)}) / {GRID.nlon}) as bigint) AS lat_i,
         (g.range % {GRID.nlon}) AS lon_i
  FROM range({3 * GRID.nlat * GRID.nlon}) g
"""


@register(
    "grid_cells_join",
    oracle=f"""
WITH pts AS (
  SELECT slot, lat_i, lon_i,
         {sqlgen.corner_tec_sql('lat_i', 'lon_i', 'slot')} AS tecu
  FROM ({_TEC_POINTS_SQL})
)
SELECT sw.slot, sw.lat_i, sw.lon_i,
       sw.tecu AS tec_sw, se.tecu AS tec_se,
       nw.tecu AS tec_nw, ne.tecu AS tec_ne
FROM pts sw
JOIN pts se ON se.slot = sw.slot AND se.lat_i = sw.lat_i
           AND se.lon_i = sw.lon_i + 1
JOIN pts nw ON nw.slot = sw.slot AND nw.lat_i = sw.lat_i + 1
           AND nw.lon_i = sw.lon_i
JOIN pts ne ON ne.slot = sw.slot AND ne.lat_i = sw.lat_i + 1
           AND ne.lon_i = sw.lon_i + 1
""",
)
def grid_cells_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell construction from long tec_points via 4-way self-equi-join —
    the reference's 4-corner probe loop (src/lib.rs:921-997) as joins."""
    n = 3 * GRID.nlat * GRID.nlon
    pts = spark.range(n).selectExpr(
        f"cast(floor(id / {GRID.nlat * GRID.nlon}) as bigint) as slot",
        f"cast(floor((id % {GRID.nlat * GRID.nlon}) / {GRID.nlon}) as bigint) as lat_i",
        f"id % {GRID.nlon} as lon_i",
    ).selectExpr(
        "slot", "lat_i", "lon_i",
        f"{sqlgen.corner_tec_sql('lat_i', 'lon_i', 'slot')} as tecu",
    )
    cells = spatial.cells_from_tec_points(pts)
    return cells.select(
        "slot", "lat_i", "lon_i", "tec_sw", "tec_se", "tec_nw", "tec_ne"
    )


@register(
    "grid_merge",
    oracle=f"""
WITH a AS (
  SELECT slot, lat_i, lon_i,
         {sqlgen.corner_tec_sql('lat_i', 'lon_i', 'slot')} AS tecu
  FROM ({_TEC_POINTS_SQL}) WHERE slot < 2
),
b AS (
  SELECT slot + 1 AS slot, lat_i, lon_i,
         ({sqlgen.corner_tec_sql('lat_i', 'lon_i', '(slot + 1)')} + {sqlgen.D(100.0)}) AS tecu
  FROM ({_TEC_POINTS_SQL}) WHERE slot < 2
)
SELECT coalesce(a.slot, b.slot) AS slot,
       coalesce(a.lat_i, b.lat_i) AS lat_i,
       coalesce(a.lon_i, b.lon_i) AS lon_i,
       coalesce(a.tecu, b.tecu) AS tecu
FROM a FULL OUTER JOIN b
  ON a.slot = b.slot AND a.lat_i = b.lat_i AND a.lon_i = b.lon_i
""",
)
def grid_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed merge of two overlapping grids preferring lhs — the
    reference's merge_mut semantics (src/record/qc.rs:12-31,
    src/lib.rs:1290-1323): full outer join + coalesce."""
    n = 3 * GRID.nlat * GRID.nlon
    base = spark.range(n).selectExpr(
        f"cast(floor(id / {GRID.nlat * GRID.nlon}) as bigint) as slot",
        f"cast(floor((id % {GRID.nlat * GRID.nlon}) / {GRID.nlon}) as bigint) as lat_i",
        f"id % {GRID.nlon} as lon_i",
    )
    a = base.filter("slot < 2").selectExpr(
        "slot", "lat_i", "lon_i",
        f"{sqlgen.corner_tec_sql('lat_i', 'lon_i', 'slot')} as tecu",
    )
    b = base.filter("slot < 2").selectExpr(
        "slot + 1 as slot", "lat_i", "lon_i",
        f"({sqlgen.corner_tec_sql('lat_i', 'lon_i', '(slot + 1)')} + {sqlgen.D(100.0)}) as tecu",
    )
    m = a.alias("a").join(
        b.alias("b"),
        ["slot", "lat_i", "lon_i"],
        "full_outer",
    )
    return m.select(
        "slot", "lat_i", "lon_i",
        F.coalesce(F.col("a.tecu"), F.col("b.tecu")).alias("tecu"),
    )
