"""Reference-operator parity queries (SURVEY.md §2.2-2.7) + general OLAP.

Each maps one reference operator family onto the driver tables with a
bit-exact DuckDB oracle.  Naming: alias every computed column identically
in the Spark plan and the oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ionex_spark.functions import sqlgen
from ionex_spark.functions.sqlgen import GRID, D
from ionex_spark.plans.queries import register, event_points, read_split, _PTS_SQL


# ----------------------------------------------------- epoch aggregations

@register(
    "epochs_distinct",
    priority=10,
    oracle=f"""
WITH pts AS ({_PTS_SQL})
SELECT slot, count(*) AS n FROM pts GROUP BY slot
""",
)
def epochs_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct+sorted epochs with counts — Record::epochs_iter /
    synchronous grouping (src/lib.rs:796-798, src/record/mod.rs:143-145).
    (Driver compare is order-insensitive; orderBy shown for plan parity.)"""
    pts = event_points(spark, sf_dir)
    return (
        pts.groupBy("slot").agg(F.count(F.lit(1)).alias("n")).orderBy("slot")
    )


@register(
    "epoch_bounds",
    priority=10,
    oracle=f"""
WITH pts AS ({_PTS_SQL})
SELECT min(slot) AS first_epoch, max(slot) AS last_epoch,
       count(DISTINCT slot) AS n_epochs
FROM pts
""",
)
def epoch_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last epoch + cardinality (src/record/mod.rs:148-150,
    temporal-bounds check src/lib.rs:1022-1024)."""
    pts = event_points(spark, sf_dir)
    return pts.agg(
        F.min("slot").alias("first_epoch"),
        F.max("slot").alias("last_epoch"),
        F.countDistinct("slot").alias("n_epochs"),
    )


@register(
    "epoch_mask_filters",
    priority=10,
    oracle=f"""
WITH pts AS ({_PTS_SQL})
SELECT
  CAST(sum(CASE WHEN slot =  12 THEN 1 ELSE 0 END) AS BIGINT) AS n_eq,
  CAST(sum(CASE WHEN slot != 12 THEN 1 ELSE 0 END) AS BIGINT) AS n_ne,
  CAST(sum(CASE WHEN slot >  12 THEN 1 ELSE 0 END) AS BIGINT) AS n_gt,
  CAST(sum(CASE WHEN slot >= 12 THEN 1 ELSE 0 END) AS BIGINT) AS n_ge,
  CAST(sum(CASE WHEN slot <  12 THEN 1 ELSE 0 END) AS BIGINT) AS n_lt,
  CAST(sum(CASE WHEN slot <= 12 THEN 1 ELSE 0 END) AS BIGINT) AS n_le
FROM pts
""",
)
def epoch_mask_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The six epoch mask predicates (orphan module src/mask.rs:4-31)."""
    pts = event_points(spark, sf_dir)
    return pts.selectExpr(
        "sum(CASE WHEN slot =  12 THEN 1 ELSE 0 END) AS n_eq",
        "sum(CASE WHEN slot != 12 THEN 1 ELSE 0 END) AS n_ne",
        "sum(CASE WHEN slot >  12 THEN 1 ELSE 0 END) AS n_gt",
        "sum(CASE WHEN slot >= 12 THEN 1 ELSE 0 END) AS n_ge",
        "sum(CASE WHEN slot <  12 THEN 1 ELSE 0 END) AS n_lt",
        "sum(CASE WHEN slot <= 12 THEN 1 ELSE 0 END) AS n_le",
    )


# ------------------------------------------------- filename attribute scan

_FNAME = (
    "concat(CASE WHEN event_id % 3 = 0 THEN 'CKM' WHEN event_id % 3 = 1"
    " THEN 'JPL' ELSE 'UQR' END,"
    " CASE WHEN event_id % 2 = 0 THEN 'G' ELSE 'R' END,"
    " lpad(cast(1 + (event_id % 365) as string), 3, '0'), '0.',"
    " lpad(cast(event_id % 100 as string), 2, '0'), 'I',"
    " CASE WHEN event_id % 5 = 0 THEN '.gz' ELSE '' END)"
)

_FNAME_RE = "([A-Z0-9]{3})([GR])([0-9]{3})0\\.([0-9]{2})I"


@register(
    "filename_attributes",
    priority=10,
    oracle=f"""
WITH f AS (SELECT event_id, {_FNAME} AS fname FROM events)
SELECT event_id, fname,
       regexp_extract(fname, '{_FNAME_RE}', 1) AS agency,
       regexp_extract(fname, '{_FNAME_RE}', 2) AS region,
       cast(regexp_extract(fname, '{_FNAME_RE}', 3) as bigint) AS doy,
       cast(regexp_extract(fname, '{_FNAME_RE}', 4) as bigint) AS yy,
       CASE WHEN fname LIKE '%.gz' THEN 1 ELSE 0 END AS gzipped
FROM f
""",
)
def filename_attributes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGS filename parse `AAAR DDD0.YYI[.gz]` -> attributes
    (FileAttributes::from_str, src/file_attributes.rs:115-155) as
    regexp_extract over a generated filename column."""
    ev = read_split(spark, f"{sf_dir}/events.parquet").select("event_id")
    f = ev.selectExpr("event_id", f"{_FNAME} as fname")
    return f.selectExpr(
        "event_id",
        "fname",
        f"regexp_extract(fname, '{_FNAME_RE}', 1) as agency",
        f"regexp_extract(fname, '{_FNAME_RE}', 2) as region",
        f"cast(regexp_extract(fname, '{_FNAME_RE}', 3) as bigint) as doy",
        f"cast(regexp_extract(fname, '{_FNAME_RE}', 4) as bigint) as yy",
        "CASE WHEN fname LIKE '%.gz' THEN 1 ELSE 0 END as gzipped",
    )


# --------------------------------------------------- quantization round trip

@register(
    "quantize_roundtrip",
    priority=10,
    oracle=f"""
WITH pts AS ({_PTS_SQL}),
q AS (
  SELECT id, lat, lon,
         cast(floor(lat * {D(10.0)} + {D(0.5)}) as bigint) AS lat_q,
         cast(floor(lon * {D(10.0)} + {D(0.5)}) as bigint) AS lon_q
  FROM pts WHERE lat >= {D(0.0)} AND lon >= {D(0.0)}
)
SELECT id, lat_q, lon_q,
       lat_q / {D(10.0)} AS lat_rt,
       lon_q / {D(10.0)} AS lon_rt
FROM q
""",
)
def quantize_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized::new / real_value round trip as column ops
    (src/quantized.rs:55-70): value = round(v*10^e) as int64, real = q/10^e.
    floor(x*s + 0.5) == round-half-away for the non-negative inputs used
    here, and is portable (Spark/DuckDB round() tie rules differ)."""
    pts = event_points(spark, sf_dir).filter("lat >= 0.0 and lon >= 0.0")
    return pts.selectExpr(
        "id",
        f"cast(floor(lat * {D(10.0)} + {D(0.5)}) as bigint) as lat_q",
        f"cast(floor(lon * {D(10.0)} + {D(0.5)}) as bigint) as lon_q",
    ).selectExpr(
        "id", "lat_q", "lon_q",
        f"lat_q / {D(10.0)} as lat_rt",
        f"lon_q / {D(10.0)} as lon_rt",
    )


# ----------------------------------------------------- nearest grid lines

@register(
    "nearest_grid_lines",
    priority=10,
    oracle=f"""
WITH pts AS ({_PTS_SQL})
SELECT id,
  {sqlgen.cell_lat0_sql(sqlgen.lat_idx_sql('lat'))} AS lat_lower,
  {sqlgen.cell_lon0_sql(sqlgen.lon_idx_sql('lon'))} AS lon_lower,
  ({sqlgen.cell_lat0_sql(sqlgen.lat_idx_sql('lat'))} + {D(GRID.dlat)})
    AS lat_above,
  ({sqlgen.cell_lon0_sql(sqlgen.lon_idx_sql('lon'))} + {D(GRID.dlon)})
    AS lon_above
FROM pts
""",
)
def nearest_grid_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linspace::nearest_lower / nearest_above (src/linspace.rs:163-179)
    vectorized over a point table, with grid-edge clamping."""
    pts = event_points(spark, sf_dir)
    lat_low = sqlgen.cell_lat0_sql(sqlgen.lat_idx_sql("lat"))
    lon_low = sqlgen.cell_lon0_sql(sqlgen.lon_idx_sql("lon"))
    return pts.selectExpr(
        "id",
        f"{lat_low} as lat_lower",
        f"{lon_low} as lon_lower",
        f"({lat_low} + {D(GRID.dlat)}) as lat_above",
        f"({lon_low} + {D(GRID.dlon)}) as lon_above",
    )


# ------------------------------------------------ timeseries + cross dims

@register(
    "timeseries_cells",
    priority=10,
    oracle=f"""
SELECT s.slot, l.lat_i,
       {sqlgen.corner_tec_sql('l.lat_i', '0', 's.slot')} AS tec_west
FROM (SELECT unnest(range(0, {GRID.n_slots})) AS slot) s
CROSS JOIN (SELECT unnest(range(0, {GRID.nlat})) AS lat_i) l
""",
)
def timeseries_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TimeSeries enumeration x grid dimension (sequence + explode +
    crossJoin) — the reference's timeseries x lat_pairs cartesian
    (src/lib.rs:929-930, src/header/mod.rs:126-132)."""
    slots = spark.range(GRID.n_slots).selectExpr("id as slot")
    lats = spark.range(GRID.nlat).selectExpr("id as lat_i")
    j = slots.crossJoin(lats)
    return j.selectExpr(
        "slot", "lat_i",
        f"{sqlgen.corner_tec_sql('lat_i', '0', 'slot')} as tec_west",
    )


# --------------------------------------------------------- general OLAP

@register(
    "agg_pricing_summary",
    priority=10,
    oracle="""
SELECT l_returnflag, l_linestatus,
       cast(sum(cast(l_quantity as decimal(18,2))) as double) AS sum_qty,
       cast(sum(cast(l_extendedprice as decimal(18,2))) as double)
         AS sum_base_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= timestamp '1998-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style grouped aggregate.  Float sums are order-dependent
    across engines, so money columns are summed as DECIMAL (exact,
    associative) and cast to double at the end — the engine's standard
    recipe for reproducible aggregates."""
    li = read_split(spark, f"{sf_dir}/lineitem.parquet")
    return (
        li.filter("l_shipdate <= timestamp '1998-09-01 00:00:00'")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr(
                "cast(sum(cast(l_quantity as decimal(18,2))) as double)"
            ).alias("sum_qty"),
            F.expr(
                "cast(sum(cast(l_extendedprice as decimal(18,2))) as double)"
            ).alias("sum_base_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "join_orders_customers",
    priority=10,
    oracle="""
SELECT c.c_mktsegment,
       count(*) AS n_orders,
       cast(sum(cast(o.o_totalprice as decimal(18,2))) as double)
         AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""",
)
def join_orders_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dimension join + rollup (customer is the small side)."""
    o = read_split(spark, f"{sf_dir}/orders.parquet")
    c = read_split(spark, f"{sf_dir}/customer.parquet")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.expr(
                "cast(sum(cast(o_totalprice as decimal(18,2))) as double)"
            ).alias("revenue"),
        )
    )


def bucketed_join_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write orders + customer BUCKETED on the join key, then co-located
    SortMergeJoin with ZERO Exchange (plan-asserted in tests/
    test_bucketed.py) — shared by the registered rollup query below.

    Table names carry the session's application id: two concurrent local
    sessions (e.g. a gate run next to a plan dump) would otherwise race
    on drop/write of the same managed-table location."""
    from ionex_spark.sources import bucketed

    suffix = bucketed.session_suffix(spark)
    bucketed.purge_session_tables(spark, "gate_bucketed_", suffix)
    t_orders = f"gate_bucketed_orders_{suffix}"
    t_customer = f"gate_bucketed_customer_{suffix}"
    o = read_split(spark, f"{sf_dir}/orders.parquet").select(
        "o_custkey", "o_orderstatus", "o_totalprice"
    )
    c = read_split(spark, f"{sf_dir}/customer.parquet").selectExpr(
        "c_custkey as o_custkey", "c_mktsegment"
    )
    bucketed.write_bucketed(o, t_orders, "o_custkey", buckets=8)
    bucketed.write_bucketed(c, t_customer, "o_custkey", buckets=8)
    return bucketed.cobucketed_join(
        spark, t_orders, t_customer, "o_custkey", force_smj=True
    )


@register(
    "bucketed_join_rollup",
    oracle="""
SELECT o.o_orderstatus, c.c_mktsegment,
       count(*) AS n,
       cast(sum(cast(o.o_totalprice as decimal(18,2))) as double) AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1, 2
""",
)
def bucketed_join_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big-big equi-join with NO runtime shuffle on either side: both
    tables are written bucketed on the join key (sources/bucketed.py), so
    the SortMergeJoin reads co-located buckets directly — the write
    amortizes the shuffle, the right lever for a repeatedly-joined 100 TB
    table.  The oracle is the plain (shuffled) join: identical semantics
    is the point.  Zero-Exchange plan asserted in tests/test_bucketed.py."""
    j = bucketed_join_frames(spark, sf_dir)
    return j.groupBy("o_orderstatus", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(
            "cast(sum(cast(o_totalprice as decimal(18,2))) as double)"
        ).alias("revenue"),
    )


@register(
    "rollup_pricing_levels",
    priority=100,  # r7: stranded-since-r4 promotion (verdict task #7)
    oracle="""
SELECT l_returnflag, l_linestatus,
       count(*) AS n,
       cast(sum(cast(l_quantity as decimal(18,2))) as double) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def rollup_pricing_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level aggregation: GROUP BY ROLLUP over (returnflag,
    linestatus) — per-pair, per-flag subtotal, and grand-total rows in
    ONE pass (Spark expands grouping sets inside a single shuffle; the
    alternative of unioning three aggregations scans the fact table
    three times).  DECIMAL sums keep every level bit-exact."""
    li = read_split(spark, f"{sf_dir}/lineitem.parquet")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(
            "cast(sum(cast(l_quantity as decimal(18,2))) as double)"
        ).alias("sum_qty"),
    )


@register(
    "semi_join_active_customers",
    priority=100,  # r7: stranded-since-r4 promotion (verdict task #7)
    oracle="""
SELECT c.c_mktsegment, count(*) AS n_customers, min(c.c_custkey) AS min_key
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_totalprice > 150000.0)
GROUP BY c.c_mktsegment
""",
)
def semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT-SEMI join (EXISTS): customers with at least one high-value
    order, rolled up per segment.  The semi form never duplicates the
    left side however many orders match — the dedup-free existence
    check a naive inner-join + distinct pays a shuffle for."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        "o_totalprice > 150000.0"
    )
    kept = c.join(o, c.c_custkey == o.o_custkey, "left_semi")
    return kept.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.min("c_custkey").alias("min_key"),
    )


@register(
    "topk_orders_per_customer",
    priority=10,
    oracle="""
SELECT o_custkey, rank, o_orderkey, o_totalprice FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rank
  FROM orders
) WHERE rank <= 2
""",
)
def topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via ranking window (deterministic tie-break)."""
    o = read_split(spark, f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey")
    )
    return (
        o.withColumn("rank", F.row_number().over(w))
        .filter("rank <= 2")
        .selectExpr(
            "o_custkey", "cast(rank as bigint) as rank",
            "o_orderkey", "o_totalprice",
        )
    )


@register(
    "sessionize_events",
    priority=50,
    oracle="""
WITH t AS (
  SELECT user_id, event_id, CAST(floor(epoch_ms(ts) / 1000.0) AS BIGINT) AS tsec
  FROM events
),
gaps AS (
  SELECT user_id, event_id, tsec,
         CASE WHEN tsec - lag(tsec) OVER w > 1800 OR
                   lag(tsec) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY tsec, event_id)
)
SELECT user_id, session_id, count(*) AS n_events,
       min(tsec) AS session_start, max(tsec) AS session_end
FROM (
  SELECT user_id, event_id, tsec,
         CAST(sum(new_s) OVER (PARTITION BY user_id
                               ORDER BY tsec, event_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
  FROM gaps
)
GROUP BY user_id, session_id
""",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: lag-gap detection + running-sum session ids
    (30-minute gap) — lag/cumsum windows (SURVEY.md §2.5 family)."""
    ev = read_split(spark, f"{sf_dir}/events.parquet").selectExpr(
        "user_id", "event_id", "unix_timestamp(ts) as tsec"
    )
    w = Window.partitionBy("user_id").orderBy("tsec", "event_id")
    gaps = ev.withColumn(
        "new_s",
        F.expr(
            "CASE WHEN tsec - lag(tsec) OVER (PARTITION BY user_id"
            " ORDER BY tsec, event_id) > 1800 OR lag(tsec) OVER"
            " (PARTITION BY user_id ORDER BY tsec, event_id) IS NULL"
            " THEN 1 ELSE 0 END"
        ),
    )
    sess = gaps.withColumn(
        "session_id",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("tsec").alias("session_start"),
        F.max("tsec").alias("session_end"),
    )


@register(
    "windowed_event_counts",
    priority=50,
    oracle="""
SELECT (CAST(floor(epoch_ms(ts) / 1000.0) AS BIGINT) - (CAST(floor(epoch_ms(ts) / 1000.0) AS BIGINT) % 3600))
         AS window_start,
       event_type,
       count(*) AS n,
       cast(sum(cast(value as decimal(18,6))) as double) AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def windowed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h event-time windows (batch twin of the streaming
    windowed rollup in streaming/stream.py)."""
    ev = read_split(spark, f"{sf_dir}/events.parquet")
    return (
        ev.selectExpr(
            "unix_timestamp(ts) - (unix_timestamp(ts) % 3600)"
            " as window_start",
            "event_type",
            "value",
        )
        .groupBy("window_start", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(
                "cast(sum(cast(value as decimal(18,6))) as double)"
            ).alias("sum_value"),
        )
    )


@register(
    "skew_salted_rollup",
    priority=50,
    oracle="""
SELECT event_type,
       count(*) AS n,
       cast(sum(cast(value as decimal(18,6))) as double) AS sum_value
FROM events
GROUP BY 1
""",
)
def skew_salted_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation on a hot-key column (few event types
    = Zipfian groups): stage 1 spreads each key over 16 salt buckets,
    stage 2 merges the tiny partials — same answer as a plain GROUP BY
    (the oracle), which is the point: identical semantics, skew-immune
    shuffle (operators/skew.salted_rollup).  Sums go through DECIMAL so
    the two-stage re-combination is exact."""
    from ionex_spark.operators import skew

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").selectExpr(
        "event_id as id",
        "event_type",
        "cast(value as decimal(18,6)) as value_d",
    )
    out = skew.salted_rollup(
        ev, ["event_type"], {"id": "count", "value_d": "sum"},
        n_salts=16, entropy_col="id",
    )
    return out.selectExpr(
        "event_type",
        "count_id as n",
        "cast(sum_value_d as double) as sum_value",
    )


# -------------------------------------------- hierarchical tile k-ring

_KRES = 6
_KNLAT = 1 << _KRES          # 64 lat rows at res 6
_KNLON = 1 << (_KRES + 1)    # 128 lon cols
_KRES_MULT = 1 << 58
_KLAT_MULT = 1 << 29


@register(
    "tile_kring_counts",
    priority=50,
    oracle=f"""
WITH pts AS ({_PTS_SQL}),
enc AS (
  SELECT id, {sqlgen.cell_id_sql('lat', 'lon', _KRES)} AS cell6 FROM pts
),
dec AS (
  SELECT id,
         CAST(((cell6 % {_KRES_MULT}) - ((cell6 % {_KRES_MULT})
           % {_KLAT_MULT})) / {_KLAT_MULT} AS BIGINT) AS lat_i,
         cell6 % {_KLAT_MULT} AS lon_i
  FROM enc
),
offs AS (SELECT di.d AS di, dj.d AS dj
         FROM (VALUES (-1),(0),(1)) di(d), (VALUES (-1),(0),(1)) dj(d)),
ring AS (
  SELECT d.id, d.lat_i + o.di AS n_lat_i,
         ((d.lon_i + o.dj) % {_KNLON} + {_KNLON}) % {_KNLON} AS n_lon_i
  FROM dec d CROSS JOIN offs o
  WHERE d.lat_i + o.di BETWEEN 0 AND {_KNLAT - 1}
)
SELECT CAST({_KRES} * {_KRES_MULT} + n_lat_i * {_KLAT_MULT} + n_lon_i
       AS BIGINT) AS ring_cell, count(*) AS n_points
FROM ring GROUP BY 1
""",
)
def tile_kring_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3/S2-style grid-disk (k=1 ring) on the HIERARCHICAL tile grid:
    decode each point's res-6 tile id back to (lat_i, lon_i), enumerate
    the 3x3 neighbor disk with longitude wrap + pole clamp, re-encode,
    and count points per ring tile — the neighborhood-density rollup that
    pairs with cell_rollup's parent rollup for the north_star's cell
    algebra (encode / parent / neighbors).  Broadcast offsets explode +
    one groupBy: the standard skew-safe shape."""
    pts = event_points(spark, sf_dir, split=False)
    enc = pts.selectExpr(
        "id", f"{sqlgen.cell_id_sql('lat', 'lon', _KRES)} as cell6"
    )
    dec = enc.selectExpr(
        "id",
        f"(cell6 % {_KRES_MULT}) div {_KLAT_MULT} as lat_i",
        f"cell6 % {_KLAT_MULT} as lon_i",
    )
    offs = spark.createDataFrame(
        [(di, dj) for di in (-1, 0, 1) for dj in (-1, 0, 1)],
        "di int, dj int",
    )
    ring = (
        dec.crossJoin(F.broadcast(offs))
        .selectExpr(
            "id",
            "lat_i + di as n_lat_i",
            f"((lon_i + dj) % {_KNLON} + {_KNLON}) % {_KNLON} as n_lon_i",
        )
        .filter(f"n_lat_i between 0 and {_KNLAT - 1}")
    )
    return ring.selectExpr(
        f"cast({_KRES} * {_KRES_MULT} + n_lat_i * {_KLAT_MULT} + n_lon_i"
        " as bigint) as ring_cell"
    ).groupBy("ring_cell").agg(F.count(F.lit(1)).alias("n_points"))


# ------------------------------------------------ geodesic cell metrics

@register(
    "cell_geodesic_metrics",
    priority=50,
    # The iterative quadrature kernel cannot be spelled in SQL; the oracle
    # reads the pinned 5,040-row sidecar generated by
    # tools/gen_geodesic_sidecar.py from the INDEPENDENT numpy twin
    # (core/geodesic.py enumerated driver-side, no Spark — the
    # gen_ipp_sidecar.py pattern), so this gate row compares the Spark
    # mapInPandas path against a separately-computed answer;
    # tests/test_geodesic.py additionally pins the reference golden
    # constants (src/cell/mod.rs:855-859) so neither side can drift from
    # reference semantics.
    oracle="""
SELECT lat_i, lon_i, perimeter_m, area_m2
FROM '/root/repo/ionex_spark/data/geodesic_golden.parquet'
""",
)
def cell_geodesic_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell geodesic perimeter/area (MapCell::geodesic_perimeter/area,
    src/cell/mod.rs:296-303) as an Arrow-batched pandas UDF over the slot-0
    cell dimension.  Golden-pinned in tests/test_geodesic.py; oracle is the
    parquet sidecar twin (see tools/gen_geodesic_sidecar.py) because the
    kernel is an iterative ODE solve that plain SQL cannot reproduce."""
    import pandas as pd
    from collections.abc import Iterator

    from ionex_spark.operators import spatial

    cells = spatial.build_tec_cells(spark).filter("slot = 0").selectExpr(
        "lat_i", "lon_i",
        f"{sqlgen.cell_lat0_sql('lat_i')} as lat0",
        f"{sqlgen.cell_lon0_sql('lon_i')} as lon0",
    )

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ionex_spark.core import geodesic as g

        for pdf in it:
            lat0 = pdf["lat0"].to_numpy()
            lon0 = pdf["lon0"].to_numpy()
            lat1 = lat0 + GRID.dlat
            lon1 = lon0 + GRID.dlon
            yield pd.DataFrame(
                {
                    "lat_i": pdf["lat_i"],
                    "lon_i": pdf["lon_i"],
                    "perimeter_m": np.atleast_1d(
                        g.rect_geodesic_perimeter(lon0, lat0, lon1, lat1)
                    ),
                    "area_m2": np.atleast_1d(
                        g.rect_geodesic_area(lon0, lat0, lon1, lat1)
                    ),
                }
            )

    return cells.mapInPandas(
        fn, "lat_i bigint, lon_i bigint, perimeter_m double, area_m2 double"
    )


# ------------------------------------------------ ionosphere pierce point

@register(
    "ipp_slant",
    priority=50,
    # JVM and libm transcendentals can differ in the last ulp, so the
    # DuckDB oracle reads a pinned parquet sidecar generated from THIS
    # query's own output (tools/gen_ipp_sidecar.py) while tests/test_ipp.py
    # independently verifies the trigonometry against the numpy twin —
    # the cell_geodesic_metrics pattern.
    oracle="""
SELECT obs_id, ipp_lat, ipp_lon, slant
FROM '/root/repo/ionex_spark/data/ipp_golden.parquet'
""",
)
def ipp_slant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thin-shell ionosphere pierce point + COSZ slant factor over a
    deterministic receiver/satellite geometry sweep (operators/ipp.py —
    BEYOND reference parity: /root/reference/src/ipp.rs:18-27 stubs the
    computation).  The sweep covers high-latitude poleward looks and
    antimeridian crossings, the two branchy regimes of the pole-safe
    atan2 destination formula."""
    from ionex_spark.operators import ipp

    geom = spark.range(2000).selectExpr(
        "id as obs_id",
        "cast(-84.0 + (id % 57) * 3.0 as double) as lat",
        "cast(-180.0 + (id % 96) * 3.75 as double) as lon",
        "cast(5.0 + (id % 18) * 4.7 as double) as elev",
        "cast((id % 73) * 5.0 as double) as azim",
    )
    out = ipp.with_ipp(geom)
    return out.select("obs_id", "ipp_lat", "ipp_lon", "slant")


# ---------------------------------------------- Cell3x3 neighborhood ops

_TP2 = f"""
  SELECT cast(floor(g.range / {GRID.nlat * GRID.nlon}) as bigint) AS slot,
         cast(floor((g.range % {GRID.nlat * GRID.nlon}) / {GRID.nlon}) as bigint) AS lat_i,
         (g.range % {GRID.nlon}) AS lon_i
  FROM range({2 * GRID.nlat * GRID.nlon}) g
"""

@register(
    "grid_3x3_mean",
    priority=50,
    oracle=f"""
WITH pts AS (
  SELECT slot, lat_i, lon_i,
         {sqlgen.corner_tec_sql('lat_i', 'lon_i', 'slot')} AS tecu
  FROM ({_TP2})
),
offs AS (
  SELECT di.d AS di, dj.d AS dj
  FROM (VALUES (-1),(0),(1)) di(d), (VALUES (-1),(0),(1)) dj(d)
),
neigh AS (
  SELECT p.slot, p.lat_i - o.di AS lat_i,
         ((p.lon_i - o.dj) % {GRID.nlon} + {GRID.nlon}) % {GRID.nlon} AS lon_i,
         p.tecu
  FROM pts p CROSS JOIN offs o
)
SELECT n.slot, n.lat_i, n.lon_i,
       count(*) AS n_neighbors,
       cast(sum(cast(n.tecu as decimal(18,6))) as double)
         / cast(count(*) as double) AS mean_tec
FROM neigh n
WHERE n.lat_i BETWEEN 0 AND {GRID.nlat - 1}
GROUP BY n.slot, n.lat_i, n.lon_i
""",
)
def grid_3x3_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell3x3 neighborhood rollup (reference src/cell/three_by_three.rs:
    37-64): 3x3 mean filter over the grid, longitude wrapping, latitude
    clamped at the poles — offsets explode + groupBy(center)."""
    n = 2 * GRID.nlat * GRID.nlon
    pts = spark.range(n).selectExpr(
        f"cast(floor(id / {GRID.nlat * GRID.nlon}) as bigint) as slot",
        f"cast(floor((id % {GRID.nlat * GRID.nlon}) / {GRID.nlon}) as bigint) as lat_i",
        f"id % {GRID.nlon} as lon_i",
    ).selectExpr(
        "slot", "lat_i", "lon_i",
        f"{sqlgen.corner_tec_sql('lat_i', 'lon_i', 'slot')} as tecu",
    )
    offs = spark.createDataFrame(
        [(di, dj) for di in (-1, 0, 1) for dj in (-1, 0, 1)], "di int, dj int"
    )
    neigh = pts.crossJoin(F.broadcast(offs)).selectExpr(
        "slot",
        "lat_i - di as lat_i",
        f"((lon_i - dj) % {GRID.nlon} + {GRID.nlon}) % {GRID.nlon} as lon_i",
        "tecu",
    ).filter(f"lat_i between 0 and {GRID.nlat - 1}")
    return neigh.groupBy("slot", "lat_i", "lon_i").agg(
        F.count(F.lit(1)).alias("n_neighbors"),
        F.expr(
            "cast(sum(cast(tecu as decimal(18,6))) as double)"
            " / cast(count(*) as double)"
        ).alias("mean_tec"),
    )


# --------------------------------------------------- grid resample (regrid)

@register(
    "grid_resample",
    priority=50,
    oracle=f"""
WITH newpts AS (
  SELECT cast(floor(g.range / 145) as bigint) AS lat_j,
         (g.range % 145) AS lon_j,
         ({D(-87.5)} + cast(floor(g.range / 145) as bigint) * {D(1.25)}) AS lat,
         ({D(-180.0)} + (g.range % 145) * {D(2.5)}) AS lon
  FROM range({141 * 145}) g
),
idx AS (
  SELECT lat_j, lon_j, lat, lon,
         {sqlgen.lat_idx_sql('lat')} AS lat_i,
         {sqlgen.lon_idx_sql('lon')} AS lon_i
  FROM newpts
)
SELECT lat_j, lon_j,
       {sqlgen.bilinear_sql(
           sqlgen.frac_p_sql('lat', 'lat_i'),
           sqlgen.frac_q_sql('lon', 'lon_i'),
           sqlgen.corner_tec_sql('lat_i', 'lon_i', '0'),
           sqlgen.corner_tec_sql('lat_i', '(lon_i + 1)', '0'),
           sqlgen.corner_tec_sql('(lat_i + 1)', 'lon_i', '0'),
           sqlgen.corner_tec_sql('(lat_i + 1)', '(lon_i + 1)', '0'),
       )} AS tec
FROM idx
""",
)
def grid_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regrid to 2x finer spacing (dlat 1.25, dlon 2.5): enumerate the new
    grid, bilinear-interpolate from the old grid via the engine's spatial
    join.  Completes the reference's unfinished resample path
    (src/linspace.rs:98-116 resample spec; src/lib.rs:689-912 stretching
    left commented) with the documented kernel as the contract."""
    from ionex_spark.operators import spatial

    newpts = spark.range(141 * 145).selectExpr(
        "cast(floor(id / 145) as bigint) as lat_j",
        "id % 145 as lon_j",
        f"({D(-87.5)} + cast(floor(id / 145) as bigint) * {D(1.25)}) as lat",
        f"({D(-180.0)} + (id % 145) * {D(2.5)}) as lon",
    ).selectExpr("lat_j", "lon_j", "lat", "lon", "0 as slot")
    cells = spatial.build_tec_cells(spark, n_slots=1)
    out = spatial.spatial_join_bilinear(newpts, cells)
    return out.select("lat_j", "lon_j", "tec")


# --------------------------------------------- interval-overlap range join

_WINDOWS_SQL = """
SELECT w AS win_id, (w * 7000) AS w_start, (w * 7000 + 5400) AS w_end
FROM (SELECT unnest(range(0, 12)) AS w)
"""


@register(
    "range_join_windows",
    priority=50,
    oracle=f"""
WITH pts AS ({_PTS_SQL}),
win AS ({_WINDOWS_SQL})
SELECT w.win_id, count(*) AS n_events, min(p.id) AS min_id,
       max(p.tsec) AS last_tsec
FROM pts p JOIN win w ON p.tsec >= w.w_start AND p.tsec < w.w_end
GROUP BY w.win_id
""",
)
def range_join_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic INTERVAL-OVERLAP range join: events against a small table
    of (possibly overlapping, gapped) time windows — the maintenance-
    window / campaign-attribution join OLAP engines special-case.  The
    window table is tiny -> broadcast nested-loop on the range predicate
    (the point side stays unshuffled); only the per-window rollup
    exchanges.  Distinct from as-of bracketing (asof_irregular): a point
    may match MANY windows, or none."""
    pts = event_points(spark, sf_dir, split=False)
    win = spark.range(12).selectExpr(
        "id as win_id",
        "id * 7000 as w_start",
        "id * 7000 + 5400 as w_end",
    )
    j = pts.join(
        F.broadcast(win),
        (pts.tsec >= win.w_start) & (pts.tsec < win.w_end),
        "inner",
    )
    return j.groupBy("win_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("id").alias("min_id"),
        F.max("tsec").alias("last_tsec"),
    )


# ----------------------------------------------- exact distributed median

@register(
    "median_value_by_type",
    priority=50,
    oracle="""
WITH r AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type,
       cast(sum(CASE WHEN rn IN ((n + 1) // 2, (n + 2) // 2)
                     THEN cast(value as decimal(18,6))
                     ELSE cast(0.0 as decimal(18,6)) END)
            as double)
         / cast(sum(CASE WHEN rn IN ((n + 1) // 2, (n + 2) // 2)
                         THEN 1 ELSE 0 END) as double) AS median_value,
       max(n) AS n
FROM r GROUP BY event_type
""",
)
def median_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distributed median per group via rank arithmetic: rank the
    group, select the middle rank(s) — for odd n the single rank
    (n+1) div 2 == (n+2) div 2 matches ONE row, for even n the two
    distinct middle ranks match TWO rows — sum through DECIMAL and
    divide by the COUNT of matched ranks (1 or 2).  Deterministic and
    bit-identical across engines, unlike percentile()/quantile_cont()
    whose interpolation order differs.  One window shuffle per group
    column; ties broken by event_id so ranks are stable.

    Round-3 advice fix: the previous formula divided by a constant 2,
    which halved the median for odd-sized groups (the single matched
    middle row was only counted once); dividing by the matched-rank
    count restores the textbook median for both parities
    (tests/test_spark_ops.py::test_median_odd_even_groups pins
    hand-computed medians for a 3-row and a 4-row group)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    r = ev.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    return r.groupBy("event_type").agg(
        F.expr(
            "cast(sum(CASE WHEN rn IN ((n + 1) div 2, (n + 2) div 2)"
            " THEN cast(value as decimal(18,6))"
            " ELSE cast(0.0 as decimal(18,6)) END) as double)"
            " / cast(sum(CASE WHEN rn IN ((n + 1) div 2, (n + 2) div 2)"
            " THEN 1 ELSE 0 END) as double)"
        ).alias("median_value"),
        F.max("n").alias("n"),
    )


# ------------------------------------------- irregular-axis as-of bracket

_IRREG_EPOCHS = "SELECT (s.s * s.s * 600) AS esec FROM (SELECT unnest(range(0, 13)) AS s) s"


@register(
    "asof_irregular",
    priority=50,
    oracle=f"""
WITH pts AS ({_PTS_SQL}),
ep AS ({_IRREG_EPOCHS}),
iv AS (
  SELECT esec AS t0, lead(esec) OVER (ORDER BY esec) AS t1,
         max(esec) OVER () AS tmax
  FROM (SELECT DISTINCT esec FROM ep)
)
SELECT p.id, i.t0, i.t1,
       (cast(p.tsec as double) - cast(i.t0 as double))
       / (cast(i.t1 as double) - cast(i.t0 as double)) AS w1
FROM pts p JOIN iv i ON p.tsec >= i.t0
  AND (p.tsec < i.t1 OR (p.tsec = i.t1 AND i.t1 = i.tmax))
WHERE i.t1 IS NOT NULL
""",
)
def asof_irregular(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of bracketing on an irregular (quadratically spaced) epoch axis:
    lead-window interval table + broadcast range join — the fallback the
    regular-axis arithmetic can't cover (SURVEY.md §2.3 bracketing row)."""
    from ionex_spark.operators import spatial
    from ionex_spark.plans.queries import event_points

    pts = event_points(spark, sf_dir)
    epochs = spark.range(13).selectExpr("id * id * 600 as esec")
    out = spatial.bracket_irregular(pts, epochs)
    return out.select("id", "t0", "t1", "w1")


def _tec_at(slot_expr: str) -> str:
    return sqlgen.bilinear_sql(
        sqlgen.frac_p_sql("lat", "lat_i"),
        sqlgen.frac_q_sql("lon", "lon_i"),
        sqlgen.corner_tec_sql("lat_i", "lon_i", slot_expr),
        sqlgen.corner_tec_sql("lat_i", "(lon_i + 1)", slot_expr),
        sqlgen.corner_tec_sql("(lat_i + 1)", "lon_i", slot_expr),
        sqlgen.corner_tec_sql("(lat_i + 1)", "(lon_i + 1)", slot_expr),
    )


@register(
    "temporal_interp_irregular",
    priority=50,
    oracle=f"""
WITH pts AS ({_PTS_SQL}),
ep AS (SELECT (s.s * s.s * 600) AS esec, s.s AS slot
       FROM (SELECT unnest(range(0, 13)) AS s) s),
iv AS (
  SELECT esec AS t0, lead(esec) OVER (ORDER BY esec) AS t1,
         slot AS slot0, lead(slot) OVER (ORDER BY esec) AS slot1,
         max(esec) OVER () AS tmax
  FROM ep
),
br AS (
  SELECT p.id, p.lat, p.lon, i.slot0, i.slot1,
         (cast(p.tsec as double) - cast(i.t0 as double))
         / (cast(i.t1 as double) - cast(i.t0 as double)) AS w1
  FROM pts p JOIN iv i ON p.tsec >= i.t0
    AND (p.tsec < i.t1 OR (p.tsec = i.t1 AND i.t1 = i.tmax))
  WHERE i.t1 IS NOT NULL
),
idx AS (
  SELECT id, lat, lon, slot0, slot1, w1,
         {sqlgen.lat_idx_sql('lat')} AS lat_i,
         {sqlgen.lon_idx_sql('lon')} AS lon_i
  FROM br
)
SELECT id, slot0, w1,
       ({D(1.0)} - w1) * {_tec_at('slot0')}
       + w1 * {_tec_at('slot1')} AS tec
FROM idx
""",
)
def temporal_interp_irregular(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END interpolation on an IRREGULAR (quadratically spaced)
    epoch axis: range-join bracketing -> single broadcast cell-pair probe
    -> bilinear at both bracket maps -> linear temporal combine — the
    reference's sorted-epoch bracketing (src/lib.rs:1123-1137) composed
    with the §2.8 kernel, which asof_irregular alone stopped short of."""
    from ionex_spark.operators import spatial

    pts = event_points(spark, sf_dir)
    epochs = spark.range(13).selectExpr(
        "id * id * 600 as esec", "id as slot"
    )
    cells = spatial.build_tec_cells(spark, n_slots=13)
    out = spatial.temporal_spatial_join_irregular(pts, cells, epochs)
    return out.select("id", "slot0", "w1", "tec")


# ------------------------------------------------ general point-corpus kNN

@register(
    "knn_points",
    priority=100,  # r7: plan restructured (see NEW_THIS_ROUND)
    oracle=f"""
WITH pts AS ({_PTS_SQL}),
q AS (SELECT id AS qid, lat AS q_lat, lon AS q_lon FROM pts
      WHERE id % 97 = 0),
scored AS (
  SELECT q.qid, p.id AS cid,
         (q.q_lat - p.lat) * (q.q_lat - p.lat)
         + (q.q_lon - p.lon) * (q.q_lon - p.lon) AS dist2
  FROM q JOIN pts p ON p.id != q.qid
)
SELECT qid, cast(rank as bigint) AS rank, cid, dist2 FROM (
  SELECT qid, cid, dist2,
         row_number() OVER (PARTITION BY qid ORDER BY dist2, cid) AS rank
  FROM scored
) WHERE rank <= 3
""",
)
def knn_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT kNN against an arbitrary point corpus (not the fixed grid):
    cell-ring filter-refine + certificate + brute-force fallback
    (operators/knn.knn_points).  The oracle is the exhaustive exact kNN,
    so this row proves the distributed filter-refine is EXACT, not
    approximate."""
    from ionex_spark.operators import knn as knn_ops
    from ionex_spark.plans.queries import event_points

    pts = event_points(spark, sf_dir)
    corpus = pts.selectExpr("id as cid", "lat", "lon")
    queries = pts.filter("id % 97 = 0").selectExpr(
        "id as qid", "lat", "lon"
    )
    out = knn_ops.knn_points(queries, corpus, k=3, cell_deg=5.0)
    return out.selectExpr(
        "qid", "cast(rank as bigint) as rank", "cid", "dist2"
    )


# --------------------------------------------- polygon polyfill (vector->raster)

_PF_RES = 6
_PF_NLAT = 1 << _PF_RES
_PF_NLON = 1 << (_PF_RES + 1)
_PF_STEP = 180.0 / _PF_NLAT  # 2.8125, exact in binary


def _pf_center_lat(lat_i: str) -> str:
    return f"({D(-90.0)} + (({lat_i}) + {D(0.5)}) * {D(_PF_STEP)})"


def _pf_center_lon(lon_i: str) -> str:
    return f"({D(-180.0)} + (({lon_i}) + {D(0.5)}) * {D(_PF_STEP)})"


def _polyfill_oracle() -> str:
    from ionex_spark.operators import pip as pip_ops
    from ionex_spark.plans.queries import _polygon_edges_values

    return f"""
WITH cells AS (
  SELECT cast(floor(g.range / {_PF_NLON}) as bigint) AS lat_i,
         (g.range % {_PF_NLON}) AS lon_i
  FROM range({_PF_NLAT * _PF_NLON}) g
),
ctr AS (
  SELECT cast({_PF_RES} * {1 << 58} + lat_i * {1 << 29} + lon_i as bigint)
           AS cell6,
         {_pf_center_lat('lat_i')} AS lat_c,
         {_pf_center_lon('lon_i')} AS lon_c
  FROM cells
),
hits AS (
  SELECT cell6, lat_c, lon_c, poly_id, count(*) AS crossings
  FROM ctr JOIN {_polygon_edges_values()}
    ON {pip_ops.CROSSING_COND.format(px='lon_c', py='lat_c')}
  GROUP BY cell6, lat_c, lon_c, poly_id
)
SELECT poly_id, cell6, lat_c, lon_c FROM hits WHERE crossings % 2 = 1
"""


@register("tile_polyfill", oracle=_polyfill_oracle(), priority=50)
def tile_polyfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polygon POLYFILL (H3 polyfill analog): the set of res-6 hierarchical
    tiles whose CENTER falls inside each fixture polygon — the
    vector->raster direction of the north_star's raster<->vector tile
    assignment (points->tiles being the raster->vector direction).
    Center-containment semantics match H3's polyfill contract.  Shape:
    the tile dimension is an arithmetic range (no input scan), the edge
    table is broadcast, PIP is the same edge-crossing join the point
    query uses (operators/pip.pip_edges_join) — at a finer resolution the
    range just grows and partitions evenly; no shuffle except the parity
    rollup keyed by (cell, polygon)."""
    from ionex_spark.core import synth
    from ionex_spark.operators import pip as pip_ops

    cells = spark.range(_PF_NLAT * _PF_NLON).selectExpr(
        f"cast(floor(id / {_PF_NLON}) as bigint) as lat_i",
        f"id % {_PF_NLON} as lon_i",
    ).selectExpr(
        f"cast({_PF_RES} * {1 << 58} + lat_i * {1 << 29} + lon_i as bigint)"
        " as cell6",
        f"{_pf_center_lat('lat_i')} as lat_c",
        f"{_pf_center_lon('lon_i')} as lon_c",
    )
    edges = pip_ops.edges_df(spark, synth.polygon_rings())
    inside = pip_ops.pip_edges_join(
        cells, edges, id_col="cell6", x="lon_c", y="lat_c"
    )
    # decode centers back from the tile id (arithmetic, no rejoin)
    return inside.selectExpr(
        "poly_id",
        "cell6",
        f"{_pf_center_lat(f'(cell6 % {1 << 58}) div {1 << 29}')} as lat_c",
        f"{_pf_center_lon(f'cell6 % {1 << 29}')} as lon_c",
    )


# ------------------------------------------------ haversine radius search

@register(
    "radius_search_sites",
    priority=50,
    # JVM and libm transcendentals differ in the last ulp, so the DuckDB
    # oracle reads a pinned sidecar generated from this query's output
    # (tools/gen_radius_sidecar.py) while tests/test_geo.py independently
    # verifies counts EXACTLY and distances allclose against a numpy
    # brute force with NO latitude-band prefilter — proving the band
    # prefilter loses no hits (the ipp_slant evidence pattern).
    oracle="""
SELECT qid, n_within, nearest_id, nearest_km
FROM '/root/repo/ionex_spark/data/radius_golden.parquet'
""",
)
def radius_search_sites(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Great-circle RADIUS SEARCH: every corpus point within 500 km of
    each site (every 97th point), rolled up per site with the nearest
    neighbor (operators/geo.radius_search).  The geodesic counterpart of
    knn_points' planar filter-refine: provably-safe latitude-band
    prefilter inside a broadcast join, exact haversine on survivors.
    The point corpus is a FIXED 20k-row synthetic sweep (sf-independent:
    the pinned sidecar oracle must not depend on which sf the gate runs
    at), using the same id->lat/lon map as the event tables."""
    from ionex_spark.operators import geo

    pts = spark.range(20000).selectExpr(
        "id",
        f"{sqlgen.lat_from_id_sql('id')} as lat",
        f"{sqlgen.lon_from_id_sql('id')} as lon",
    )
    sites = pts.filter("id % 97 = 0").selectExpr(
        "id as qid", "lat as q_lat", "lon as q_lon"
    )
    return geo.radius_search(pts, sites, radius_km=500.0)


# ------------------------------------------------ epoch gap filling

_GF_GAP = "(slot * 31 + lat_i * 7 + lon_i * 13) % 5 = 0"

_GF_SPARSE = f"""
  SELECT cast(floor(g.range / {GRID.nlat * GRID.nlon}) as bigint) AS slot,
         cast(floor((g.range % {GRID.nlat * GRID.nlon}) / {GRID.nlon}) as bigint) AS lat_i,
         (g.range % {GRID.nlon}) AS lon_i
  FROM range({GRID.n_slots * GRID.nlat * GRID.nlon}) g
"""


def _gapfill_oracle() -> str:
    wp = "PARTITION BY lat_i, lon_i ORDER BY slot"
    back = f"{wp} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    fwd = f"{wp} ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING"
    return f"""
WITH sparse AS (
  SELECT slot, lat_i, lon_i,
         {sqlgen.corner_tec_sql('lat_i', 'lon_i', 'slot')} AS tecu
  FROM ({_GF_SPARSE}) WHERE NOT ({_GF_GAP})
),
keys AS (SELECT DISTINCT lat_i, lon_i FROM sparse),
dense AS (
  SELECT k.lat_i, k.lon_i, s.slot
  FROM keys k CROSS JOIN
       (SELECT unnest(range(0, {GRID.n_slots})) AS slot) s
),
f AS (
  SELECT d.lat_i, d.lon_i, d.slot, sp.tecu
  FROM dense d LEFT JOIN sparse sp
    ON sp.lat_i = d.lat_i AND sp.lon_i = d.lon_i AND sp.slot = d.slot
),
w AS (
  SELECT lat_i, lon_i, slot, tecu,
    last_value(tecu IGNORE NULLS) OVER ({back}) AS _v0,
    last_value(CASE WHEN tecu IS NOT NULL THEN slot END IGNORE NULLS)
      OVER ({back}) AS _s0,
    first_value(tecu IGNORE NULLS) OVER ({fwd}) AS _v1,
    first_value(CASE WHEN tecu IS NOT NULL THEN slot END IGNORE NULLS)
      OVER ({fwd}) AS _s1
  FROM f
)
SELECT lat_i, lon_i, slot,
  CASE WHEN tecu IS NOT NULL THEN cast(tecu as double)
       ELSE _v0 + (_v1 - _v0) * (cast(slot - _s0 as double)
                                 / cast(_s1 - _s0 as double)) END
    AS tecu_filled,
  CAST(CASE WHEN tecu IS NULL THEN 1 ELSE 0 END AS INT) AS was_gap
FROM w
WHERE tecu IS NOT NULL OR (_v0 IS NOT NULL AND _v1 IS NOT NULL)
"""


@register("gap_fill_epochs", oracle=_gapfill_oracle(), priority=50)
def gap_fill_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch GAP FILLING: a per-cell TEC time series with ~20% of slots
    deterministically knocked out is repaired by linear interpolation
    between the nearest present bracketing epochs
    (operators/spatial.gap_fill_series) — the reference's temporal
    interpolation kernel applied to series repair; leading/trailing gaps
    stay absent.  One window exchange keyed by the (uniform) cell key;
    the dense axis is exploded arithmetically, never joined."""
    from ionex_spark.operators import spatial

    n = GRID.n_slots * GRID.nlat * GRID.nlon
    sparse = spark.range(n).selectExpr(
        f"cast(floor(id / {GRID.nlat * GRID.nlon}) as bigint) as slot",
        f"cast(floor((id % {GRID.nlat * GRID.nlon}) / {GRID.nlon}) as bigint) as lat_i",
        f"id % {GRID.nlon} as lon_i",
    ).filter(f"not ({_GF_GAP})").selectExpr(
        "slot", "lat_i", "lon_i",
        f"{sqlgen.corner_tec_sql('lat_i', 'lon_i', 'slot')} as tecu",
    )
    out = spatial.gap_fill_series(
        sparse, GRID.n_slots, keys=["lat_i", "lon_i"]
    )
    return out.select("lat_i", "lon_i", "slot", "tecu_filled", "was_gap")


# --------------------------------------------- Z-order (Morton) layout key

def _zorder_oracle() -> str:
    from ionex_spark.operators.tiles import morton_sql

    z = morton_sql(
        sqlgen.lat_idx_sql("lat"), sqlgen.lon_idx_sql("lon"), bits=7
    )
    return f"""
WITH pts AS ({_PTS_SQL}),
enc AS (SELECT id, {z} AS zkey FROM pts)
SELECT cast(floor(zkey / 256) as bigint) AS zblock,
       count(*) AS n_points,
       count(DISTINCT zkey) AS n_cells,
       min(zkey) AS z_min,
       max(zkey) AS z_max
FROM enc GROUP BY 1
"""


@register("zorder_blocks", oracle=_zorder_oracle(), priority=50)
def zorder_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER layout audit: encode every point's grid cell as a Morton
    key (operators/tiles.morton_sql — bit-interleaved lat_i/lon_i) and
    roll up per 256-key block: row count, distinct cells, z span.  The
    clustering key behind Delta/Iceberg Z-ORDER: sorting the 100 TB
    table by z co-locates spatial neighbors into the same files, so
    parquet min/max row-group pruning turns an ROI filter into a
    near-contiguous scan.  Pure integer arithmetic shared verbatim with
    the oracle."""
    from ionex_spark.operators.tiles import morton_sql

    pts = event_points(spark, sf_dir, split=False)
    z = morton_sql(
        sqlgen.lat_idx_sql("lat"), sqlgen.lon_idx_sql("lon"), bits=7
    )
    enc = pts.selectExpr("id", f"{z} as zkey")
    return (
        enc.selectExpr("cast(floor(zkey / 256) as bigint) as zblock", "zkey")
        .groupBy("zblock")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.countDistinct("zkey").alias("n_cells"),
            F.min("zkey").alias("z_min"),
            F.max("zkey").alias("z_max"),
        )
    )


# ------------------------------------------------- tile-cover compaction

def _pf_cells_sql(polys: tuple[str, ...]) -> str:
    """Polyfill cell set (DISTINCT lat_i, lon_i at res 6) for the given
    fixture polygons — the compact oracle's input CTE body."""
    from ionex_spark.operators import pip as pip_ops
    from ionex_spark.plans.queries import _polygon_edges_values

    plist = ", ".join(f"'{p}'" for p in polys)
    return f"""
  SELECT DISTINCT lat_i, lon_i FROM (
    SELECT c.lat_i, c.lon_i, edges.poly_id, count(*) AS crossings
    FROM (
      SELECT cast(floor(g.range / {_PF_NLON}) as bigint) AS lat_i,
             (g.range % {_PF_NLON}) AS lon_i,
             {_pf_center_lat(f'cast(floor(g.range / {_PF_NLON}) as bigint)')} AS lat_c,
             {_pf_center_lon(f'(g.range % {_PF_NLON})')} AS lon_c
      FROM range({_PF_NLAT * _PF_NLON}) g
    ) c
    JOIN {_polygon_edges_values()}
      ON {pip_ops.CROSSING_COND.format(px='c.lon_c', py='c.lat_c')}
    WHERE poly_id IN ({plist})
    GROUP BY c.lat_i, c.lon_i, edges.poly_id
  ) h WHERE crossings % 2 = 1
"""


def _compact_oracle() -> str:
    def lvl(cin: str, res: int) -> str:
        return f"""
p{res} AS (
  SELECT cast(floor(lat_i / 2.0) as bigint) AS pl,
         cast(floor(lon_i / 2.0) as bigint) AS pn, count(*) AS n
  FROM {cin} GROUP BY 1, 2
),
full{res} AS (SELECT pl, pn FROM p{res} WHERE n = 4),
rem{res + 1} AS (
  SELECT c.lat_i, c.lon_i FROM {cin} c
  LEFT JOIN full{res} f
    ON f.pl = cast(floor(c.lat_i / 2.0) as bigint)
   AND f.pn = cast(floor(c.lon_i / 2.0) as bigint)
  WHERE f.pl IS NULL
),
c{res} AS (SELECT pl AS lat_i, pn AS lon_i FROM full{res})"""

    return f"""
WITH c6 AS ({_pf_cells_sql(('roi_rect', 'concave'))}),
{lvl('c6', 5)},
{lvl('c5', 4)}
SELECT 6 AS res, lat_i, lon_i FROM rem6
UNION ALL SELECT 5 AS res, lat_i, lon_i FROM rem5
UNION ALL SELECT 4 AS res, lat_i, lon_i FROM c4
"""


@register("tile_compact", oracle=_compact_oracle(), priority=50)
def tile_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3-style COMPACT of a polygon tile cover: the res-6 polyfill of
    the rect + concave fixture polygons, with every complete 2x2 child
    group replaced by its parent recursively down to res 4
    (operators/tiles.compact_cells) — the minimal mixed-resolution
    cover.  At 10^12 rows this is what keeps polygon covers broadcast-
    small (a country cover shrinks ~4x per full level).
    tests/test_spark_ops.py pins compact->uncompact == original."""
    from ionex_spark.operators import tiles

    pf = tile_polyfill(spark, sf_dir).filter(
        "poly_id in ('roi_rect', 'concave')"
    )
    cells6 = pf.selectExpr(
        f"(cell6 % {1 << 58}) div {1 << 29} as lat_i",
        f"cell6 % {1 << 29} as lon_i",
    ).dropDuplicates(["lat_i", "lon_i"])
    comp = tiles.compact_cells(cells6, 6, 4)
    return comp.selectExpr("res", "lat_i", "lon_i")


# ---------------------------------------------- per-user trajectory summary

@register(
    "user_tracks",
    priority=50,
    oracle=f"""
WITH pts AS ({_PTS_SQL}),
ev AS (
  SELECT e.user_id, p.id, p.lat, p.lon, p.tsec
  FROM events e JOIN pts p ON p.id = e.event_id
),
legs AS (
  SELECT user_id, id, lat, lon, tsec,
         lag(lat) OVER w AS plat, lag(lon) OVER w AS plon
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY tsec, id)
),
d AS (
  SELECT user_id, lat, lon,
         CASE WHEN plat IS NULL THEN cast(0 as decimal(38,0))
              ELSE cast(floor(sqrt((lat - plat) * (lat - plat)
                                   + (lon - plon) * (lon - plon))
                              * cast(1000000000000.0 as double))
                        as decimal(38,0)) END AS leg_fp
  FROM legs
)
SELECT user_id,
       count(*) AS n_points,
       cast(sum(leg_fp) as double)
         / cast(1000000000000.0 as double) AS track_deg,
       min(lat) AS lat_min, max(lat) AS lat_max,
       min(lon) AS lon_min, max(lon) AS lon_max
FROM d GROUP BY user_id
""",
)
def user_tracks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user TRAJECTORY summary: events ordered by time become track
    legs (planar degree-space length — sqrt is correctly rounded per
    IEEE 754, so the leg lengths are bit-portable; the great-circle
    variant is radius_search's haversine, sidecar-oracled), summed
    through DECIMAL for order-independence, plus the bounding box.  The
    movement-analytics composition: window lag per entity + geo
    arithmetic + rollup — one window exchange keyed by user, then the
    group-by reuses the same partitioning (Catalyst elides the second
    shuffle)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id"
    )
    pts = event_points(spark, sf_dir, split=False)
    j = ev.join(pts, ev.event_id == pts.id).select(
        "user_id", "id", "lat", "lon", "tsec"
    )
    w = "partition by user_id order by tsec, id"
    legs = j.selectExpr(
        "user_id", "lat", "lon",
        f"lag(lat) over ({w}) as plat",
        f"lag(lon) over ({w}) as plon",
    )
    # fixed-point legs: floor(leg * 1e12) — IEEE multiply + floor are
    # deterministic in BOTH engines, where decimal-cast ROUNDING is not
    # (half-up vs half-even produced last-ulp sum drift)
    d = legs.selectExpr(
        "user_id", "lat", "lon",
        "CASE WHEN plat IS NULL THEN cast(0 as decimal(38,0))"
        " ELSE cast(floor(sqrt((lat - plat) * (lat - plat)"
        " + (lon - plon) * (lon - plon))"
        " * cast(1000000000000.0 as double)) as decimal(38,0)) END"
        " as leg_fp",
    )
    return d.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.expr(
            "cast(sum(leg_fp) as double)"
            " / cast(1000000000000.0 as double)"
        ).alias("track_deg"),
        F.min("lat").alias("lat_min"),
        F.max("lat").alias("lat_max"),
        F.min("lon").alias("lon_min"),
        F.max("lon").alias("lon_max"),
    )


# ------------------------------------------------- tile coverage gaps

@register(
    "tile_coverage_gaps",
    priority=50,
    oracle=f"""
WITH pts AS ({_PTS_SQL}),
occupied AS (
  SELECT DISTINCT {sqlgen.cell_id_sql('lat', 'lon', 5)} AS cell5 FROM pts
),
allc AS (
  SELECT cast(5 * {1 << 58} + cast(floor(g.range / 64) as bigint)
              * {1 << 29} + (g.range % 64) as bigint) AS cell5
  FROM range({32 * 64}) g
)
SELECT a.cell5 FROM allc a
LEFT JOIN occupied o ON o.cell5 = a.cell5
WHERE o.cell5 IS NULL
""",
)
def tile_coverage_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coverage-GAP detection: res-5 tiles containing NO points — the
    anti-join complement of cell_rollup's density map (data-quality /
    acquisition-gap audit; the polar bands beyond the +-87.5deg point
    sweep guarantee a non-empty answer, so a bug that returns nothing
    cannot hide).  The occupied side collapses to distinct tile ids
    FIRST (tiny: <= 2048 tiles regardless of input size), so the
    anti-join is a broadcast against the enumerated tile dimension —
    the 100 TB corpus contributes one distinct-aggregation, nothing
    else."""
    pts = event_points(spark, sf_dir, split=False)
    occupied = pts.selectExpr(
        f"{sqlgen.cell_id_sql('lat', 'lon', 5)} as cell5"
    ).dropDuplicates(["cell5"])
    allc = spark.range(32 * 64).selectExpr(
        f"cast(5 * {1 << 58} + cast(floor(id / 64) as bigint) * {1 << 29}"
        " + (id % 64) as bigint) as cell5"
    )
    return allc.join(occupied, "cell5", "left_anti")


# ----------------------------------- end-to-end IONEX file -> bilinear query

_IFB_N = 4000


@register(
    "ionex_file_bilinear",
    priority=50,
    oracle=f"""
WITH p0 AS (SELECT g.range AS id, (g.range % 3) AS slot FROM range({_IFB_N}) g),
pts AS (
  SELECT id, slot,
         {sqlgen.lat_from_id_sql('id')} AS lat,
         {sqlgen.lon_from_id_sql('id')} AS lon
  FROM p0
),
idx AS (
  SELECT id, slot, lat, lon,
         {sqlgen.lat_idx_sql('lat')} AS lat_i,
         {sqlgen.lon_idx_sql('lon')} AS lon_i
  FROM pts
)
SELECT id, slot,
       {sqlgen.bilinear_sql(
           sqlgen.frac_p_sql('lat', 'lat_i'),
           sqlgen.frac_q_sql('lon', 'lon_i'),
           sqlgen.corner_tec_sql('lat_i', 'lon_i', 'slot'),
           sqlgen.corner_tec_sql('lat_i', '(lon_i + 1)', 'slot'),
           sqlgen.corner_tec_sql('(lat_i + 1)', 'lon_i', 'slot'),
           sqlgen.corner_tec_sql('(lat_i + 1)', '(lon_i + 1)', 'slot'),
       )} AS tec
FROM idx
""",
)
def ionex_file_bilinear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END through the REAL FILE PATH: parse the pinned sample
    IONEX ASCII file (binaryFile -> mapInPandas block parser,
    sources/ionex_source.read_ionex), rebuild the cell dimension from
    the parsed long rows (4-way self-join, cells_from_tec_points), and
    bilinear-interpolate 4k probe points.  The file carries the
    SQL-reproducible integer field (tools/gen_sample_ionex.py), so the
    DuckDB oracle recomputes every value from pure arithmetic WITHOUT
    ever seeing the file — parser, quantization (tecu_q/10 at exponent
    -1), grid reassembly, and kernel are all under one independent
    bit-exact check (the reference's from_file -> interpolate flow,
    src/lib.rs:403-510 + 1138-1173)."""
    from ionex_spark.operators import spatial
    from ionex_spark.sources.ionex_source import read_ionex

    path = "/root/repo/ionex_spark/data/sample_CKMG0010.22I.gz"
    raw = read_ionex(spark, path)
    tp = raw.selectExpr(
        "cast((unix_timestamp(epoch) - unix_timestamp("
        "timestamp '2022-01-02 00:00:00')) / 3600 as bigint) as slot",
        f"cast(round((lat - {D(GRID.lat0)}) / {D(GRID.dlat)}) as bigint)"
        " as lat_i",
        f"cast(round((lon - {D(GRID.lon0)}) / {D(GRID.dlon)}) as bigint)"
        " as lon_i",
        # exponent is -1 (asserted by the exp column in pytest ingest
        # tests); division matches corner_tec_sql's /10.0 bit-for-bit
        f"cast(tecu_q as double) / {D(10.0)} as tecu",
    )
    cells = spatial.cells_from_tec_points(tp)
    probes = spark.range(_IFB_N).selectExpr(
        "id",
        "id % 3 as slot",
        f"{sqlgen.lat_from_id_sql('id')} as lat",
        f"{sqlgen.lon_from_id_sql('id')} as lon",
    )
    out = spatial.spatial_join_bilinear(probes, cells)
    return out.select("id", "slot", "tec")


# ------------------------------------------- exact distributed quartiles

@register(
    "quartiles_value_by_type",
    priority=50,
    oracle="""
WITH r AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type,
       max(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT)
                THEN value END) AS p25,
       max(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT)
                THEN value END) AS p50,
       max(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT)
                THEN value END) AS p75,
       max(n) AS n
FROM r GROUP BY event_type
""",
)
def quartiles_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distributed quartiles per group via TYPE-1 (inverse-ECDF)
    order statistics: the value at rank ceil(p*n) — pure integer rank
    arithmetic, bit-identical across engines where interpolating
    percentile()/quantile_cont() definitions are not (the
    median_value_by_type companion; note type-1 p50 takes the UPPER
    middle for even n rather than averaging).  One window shuffle,
    conditional-aggregation extract — adding more quantiles costs zero
    extra passes."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    r = ev.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    return r.groupBy("event_type").agg(
        F.expr(
            "max(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT)"
            " THEN value END)"
        ).alias("p25"),
        F.expr(
            "max(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT)"
            " THEN value END)"
        ).alias("p50"),
        F.expr(
            "max(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT)"
            " THEN value END)"
        ).alias("p75"),
        F.max("n").alias("n"),
    )


# ------------------------------------------------- Voronoi site rollup

@register(
    "voronoi_site_rollup",
    # r7: stranded-since-r4 promotion (verdict task #7); the pinned
    # sidecar oracle stays the weakest row type — the strong evidence
    # remains the unfiltered numpy argmin equality in tests/test_geo.py
    priority=100,
    oracle="""
SELECT qid, n_points, min_km, max_km
FROM '/root/repo/ionex_spark/data/voronoi_golden.parquet'
""",
)
def voronoi_site_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VORONOI partition census: every point assigned to its great-
    circle-nearest site via the zero-shuffle broadcast argmin fold
    (operators/geo.nearest_site_assign), rolled up per site.  The
    sf-independent 20k-point sweep keeps the pinned sidecar oracle
    valid at any gate sf (tools/gen_voronoi_sidecar.py)."""
    from ionex_spark.operators import geo

    pts = spark.range(20000).selectExpr(
        "id",
        f"{sqlgen.lat_from_id_sql('id')} as lat",
        f"{sqlgen.lon_from_id_sql('id')} as lon",
    )
    sites = pts.filter("id % 97 = 0").selectExpr(
        "id as qid", "lat as q_lat", "lon as q_lon"
    )
    assigned = geo.nearest_site_assign(pts, sites)
    return assigned.groupBy("qid").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.min("dist_km").alias("min_km"),
        F.max("dist_km").alias("max_km"),
    )


# ---------------------------------------- multi-way dim join (TPC-H Q5-lite)

@register(
    "revenue_by_nation",
    # priority 10: the OLAP multi-way-join family is long-stable (join_
    # orders_customers gated two rounds); past-cap but check_oracle-able
    priority=10,
    oracle="""
SELECT n.n_name AS nation,
       cast(sum(cast(l.l_extendedprice * (cast(1.0 as double) - l.l_discount)
                     as decimal(18,4))) as double) AS revenue,
       count(*) AS n_lineitems
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE o.o_orderdate >= timestamp '1996-01-01 00:00:00'
  AND o.o_orderdate <  timestamp '1997-01-01 00:00:00'
GROUP BY n.n_name
""",
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-lite: revenue per nation for one order year through the
    lineitem -> orders -> customer -> nation join chain — the multi-way
    star join exercising Catalyst's join reordering + broadcast of the
    two dim tables (customer at sf<=1 and nation always broadcast; at
    100 TB customer graduates to a shuffle join and AQE decides).
    Revenue = price*(1-discount) cast to DECIMAL(18,4): both factors
    carry <=2 decimals, so the 4dp cast recovers the EXACT product and
    the sum is order-independent."""
    li = read_split(spark, f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = read_split(spark, f"{sf_dir}/orders.parquet").filter(
        "o_orderdate >= timestamp '1996-01-01 00:00:00'"
        " and o_orderdate < timestamp '1997-01-01 00:00:00'"
    ).select("o_orderkey", "o_custkey")
    c = read_split(spark, f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    n = read_split(spark, f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    return j.groupBy(F.col("n_name").alias("nation")).agg(
        F.expr(
            "cast(sum(cast(l_extendedprice * (cast(1.0 as double)"
            " - l_discount) as decimal(18,4))) as double)"
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


# ------------------------------------------------------- geohash encoding

def _geohash_oracle() -> str:
    from ionex_spark.operators.tiles import geohash_sql

    return f"""
WITH pts AS ({_PTS_SQL})
SELECT {geohash_sql('lat', 'lon', 4)} AS gh4,
       count(*) AS n_points,
       min(id) AS min_id
FROM pts GROUP BY 1
"""


@register(
    "geohash_prefix_counts",
    # priority 10: interop-surface twin of the gated zorder_blocks
    # (same interleave arithmetic, string alphabet on top); past-cap
    # but check_oracle-able
    priority=10,
    oracle=_geohash_oracle(),
)
def geohash_prefix_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard GEOHASH cell rollup at 4 characters (operators/tiles.
    geohash_sql — canonical test vector u4pruy pinned in pytest): the
    base-32 string interop surface over the same lon-first interleave
    arithmetic as the Morton layout key.  Narrow codegen projection +
    one rollup exchange."""
    from ionex_spark.operators.tiles import geohash_sql

    pts = event_points(spark, sf_dir)
    return (
        pts.selectExpr("id", f"{geohash_sql('lat', 'lon', 4)} as gh4")
        .groupBy("gh4")
        .agg(F.count(F.lit(1)).alias("n_points"), F.min("id").alias("min_id"))
    )


# ------------------------------------------------------ 3-step event funnel

@register(
    "funnel_view_click_purchase",
    # priority 10: conditional-aggregation composition of gated window
    # machinery; past-cap but check_oracle-able
    priority=10,
    oracle="""
WITH t AS (
  SELECT user_id, event_type,
         CAST(floor(epoch_ms(ts) / 1000.0) AS BIGINT) AS tsec
  FROM events
),
s1 AS (SELECT user_id, min(tsec) AS t_view FROM t
       WHERE event_type = 'view' GROUP BY user_id),
s2 AS (SELECT t.user_id, min(t.tsec) AS t_click
       FROM t JOIN s1 ON s1.user_id = t.user_id
       WHERE t.event_type = 'click' AND t.tsec >= s1.t_view
       GROUP BY t.user_id),
s3 AS (SELECT t.user_id, min(t.tsec) AS t_purchase
       FROM t JOIN s2 ON s2.user_id = t.user_id
       WHERE t.event_type = 'purchase' AND t.tsec >= s2.t_click
       GROUP BY t.user_id)
SELECT
  (SELECT count(*) FROM s1) AS n_view,
  (SELECT count(*) FROM s2) AS n_view_click,
  (SELECT count(*) FROM s3) AS n_view_click_purchase,
  (SELECT CAST(coalesce(sum(s3.t_purchase - s1.t_view), 0) AS BIGINT)
   FROM s3 JOIN s1 ON s1.user_id = s3.user_id) AS total_funnel_seconds
""",
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-step ORDERED event funnel (view -> click -> purchase): stage N
    counts users whose step-N event happens at or after their step-N-1
    time — the behavioral-analytics sequence query (sessionize's
    companion).  Each stage is a filtered min-aggregation semi-joined to
    the previous stage; all stage tables are user-grained (small), so
    the chain is broadcast-friendly and the events table is scanned
    ONCE per stage predicate with the aggregation pushed map-side."""
    ev = read_split(spark, f"{sf_dir}/events.parquet").selectExpr(
        "user_id", "event_type", "unix_timestamp(ts) as tsec"
    )
    s1 = ev.filter("event_type = 'view'").groupBy("user_id").agg(
        F.min("tsec").alias("t_view")
    )
    s2 = (
        ev.filter("event_type = 'click'")
        .join(s1, "user_id")
        .filter("tsec >= t_view")
        .groupBy("user_id")
        .agg(F.min("tsec").alias("t_click"))
    )
    s3 = (
        ev.filter("event_type = 'purchase'")
        .join(s2, "user_id")
        .filter("tsec >= t_click")
        .groupBy("user_id")
        .agg(F.min("tsec").alias("t_purchase"))
    )
    funnel_time = (
        s3.join(s1, "user_id")
        .agg(
            F.expr(
                "cast(coalesce(sum(t_purchase - t_view), 0) as bigint)"
            ).alias("total_funnel_seconds")
        )
    )
    counts = (
        s1.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(s2.agg(F.count(F.lit(1)).alias("n_view_click")))
        .crossJoin(
            s3.agg(F.count(F.lit(1)).alias("n_view_click_purchase"))
        )
    )
    return counts.crossJoin(funnel_time)


# ------------------------------------------------------- zonal statistics

def _zonal_tec_expr() -> str:
    from ionex_spark.plans.queries import _TEC_EXPR_ORACLE

    return _TEC_EXPR_ORACLE


def _zonal_edges() -> str:
    from ionex_spark.plans.queries import _polygon_edges_values

    return _polygon_edges_values()


def _zonal_cond() -> str:
    from ionex_spark.operators.pip import CROSSING_COND

    return CROSSING_COND.format(px="t.lon", py="t.lat")


@register(
    "zonal_stats_polygons",
    # r7: stranded-since-r4 promotion (verdict task #7)
    priority=100,
    oracle=f"""
WITH pts AS ({_PTS_SQL}),
idx AS (
  SELECT id, lat, lon, slot,
         {sqlgen.lat_idx_sql('lat')} AS lat_i,
         {sqlgen.lon_idx_sql('lon')} AS lon_i
  FROM pts
),
tec AS (
  SELECT id, lat, lon, {_zonal_tec_expr()} AS tec FROM idx
),
hits AS (
  SELECT t.id, t.tec, poly_id, count(*) AS crossings
  FROM tec t JOIN {_zonal_edges()}
    ON {_zonal_cond()}
  GROUP BY t.id, t.tec, poly_id
)
SELECT poly_id,
       count(*) AS n_points,
       CAST(sum(cast(floor(tec * cast(1000000000.0 as double))
                     as decimal(38,0))) AS BIGINT) AS tec_sum_fp,
       min(id) AS min_id
FROM hits WHERE crossings % 2 = 1
GROUP BY poly_id
""",
)
def zonal_stats_polygons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZONAL STATISTICS — the classic raster-over-vector aggregation:
    per fixture polygon, the count and fixed-point TEC sum of every
    contained point, with TEC bilinear-interpolated from the grid at
    each point's own epoch (the raster side).  Composition of the gated
    PIP edge-crossing join and the gated bilinear kernel; the TEC sum
    goes through floor(tec*1e9) fixed-point so the aggregate is
    order-independent AND free of decimal-cast rounding divergence
    (mean = tec_sum_fp / (n_points * 1e9) downstream)."""
    from ionex_spark.core import synth
    from ionex_spark.operators import pip as pip_ops
    from ionex_spark.operators import spatial

    pts = event_points(spark, sf_dir)
    cells = spatial.build_tec_cells(spark)
    tec = spatial.spatial_join_bilinear(pts, cells)
    edges = pip_ops.edges_df(spark, synth.polygon_rings())
    inside = pip_ops.pip_edges_join(
        tec.select("id", "lat", "lon", "tec"), edges
    )
    j = inside.join(tec.select("id", "tec"), "id")
    return j.groupBy("poly_id").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.expr(
            "cast(sum(cast(floor(tec * cast(1000000000.0 as double))"
            " as decimal(38,0))) as bigint)"
        ).alias("tec_sum_fp"),
        F.min("id").alias("min_id"),
    )


# ------------------------------------------- attribution interval join

@register(
    "attribution_interval_join",
    priority=50,
    oracle="""
WITH t AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch_ms(ts) / 1000.0) AS BIGINT) AS tsec
  FROM events
),
v AS (SELECT user_id, event_id AS view_id, tsec AS view_t
      FROM t WHERE event_type = 'view'),
c AS (SELECT user_id, event_id AS click_id, tsec AS click_t
      FROM t WHERE event_type = 'click')
SELECT v.user_id, v.view_id, c.click_id,
       (c.click_t - v.view_t) AS lag_s
FROM v JOIN c ON c.user_id = v.user_id
  AND v.view_t <= c.click_t AND c.click_t <= v.view_t + 3600
""",
)
def attribution_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCH TWIN of the stream-stream attribution join
    (streaming/stream.streaming_interval_join): every (view, click)
    pair of the same user with the click at most 1 hour after the view
    — tests/test_streaming_interval_join.py proves the watermarked
    stream-stream join produces exactly this pair set, so the driver
    row is hard evidence for the streaming semantics.  Equi-join on
    user plus a two-sided time predicate; both sides are event-grained
    projections of one scan."""
    ev = read_split(spark, f"{sf_dir}/events.parquet").selectExpr(
        "user_id", "event_id", "event_type", "unix_timestamp(ts) as tsec"
    )
    v = ev.filter("event_type = 'view'").selectExpr(
        "user_id", "event_id as view_id", "tsec as view_t"
    )
    c = ev.filter("event_type = 'click'").selectExpr(
        "user_id as c_user_id", "event_id as click_id", "tsec as click_t"
    )
    j = v.join(
        c,
        (v.user_id == c.c_user_id)
        & (v.view_t <= c.click_t)
        & (c.click_t <= v.view_t + 3600),
    )
    return j.selectExpr(
        "user_id", "view_id", "click_id", "(click_t - view_t) as lag_s"
    )


# ------------------------------------- trilinear altitude interpolation

_ALT_PTS_SQL = (
    "SELECT "
    + ", ".join(
        f"{expr} AS {name}"
        for name, expr in {
            "id": "event_id",
            "lat": sqlgen.lat_from_id_sql("event_id"),
            "lon": sqlgen.lon_from_id_sql("event_id"),
            "alt": sqlgen.alt_from_id_sql("event_id"),
            "slot": sqlgen.slot_from_id_sql("event_id"),
        }.items()
    )
    + " FROM events"
)

_TEC3_ORACLE = sqlgen.trilinear_sql(
    sqlgen.frac_p_sql("lat", "lat_i"),
    sqlgen.frac_q_sql("lon", "lon_i"),
    sqlgen.frac_r_sql("alt", "alt_i"),
    tuple(
        sqlgen.corner_tec3_sql(la, lo, "alt_i", "slot")
        for la, lo in (
            ("lat_i", "lon_i"),
            ("lat_i", "(lon_i + 1)"),
            ("(lat_i + 1)", "lon_i"),
            ("(lat_i + 1)", "(lon_i + 1)"),
        )
    ),
    tuple(
        sqlgen.corner_tec3_sql(la, lo, "(alt_i + 1)", "slot")
        for la, lo in (
            ("lat_i", "lon_i"),
            ("lat_i", "(lon_i + 1)"),
            ("(lat_i + 1)", "lon_i"),
            ("(lat_i + 1)", "(lon_i + 1)"),
        )
    ),
)


@register(
    "alt_interp_trilinear",
    priority=50,
    oracle=f"""
WITH pts AS ({_ALT_PTS_SQL}),
idx AS (
  SELECT id, lat, lon, alt, slot,
         {sqlgen.lat_idx_sql('lat')} AS lat_i,
         {sqlgen.lon_idx_sql('lon')} AS lon_i,
         {sqlgen.alt_idx_sql('alt')} AS alt_i
  FROM pts
)
SELECT id, slot, alt_i, lat_i, lon_i, {_TEC3_ORACLE} AS tec
FROM idx
""",
)
def alt_interp_trilinear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRILINEAR interpolation over a `MAP DIMENSION 3` height grid: the
    reference parses the altitude axis (src/header/mod.rs:64-70,
    with_altitude_grid :222-225) but leaves computing over height maps
    TODO (src/record/parsing.rs:174-175); this completes the axis —
    bilinear (the exact src/cell/mod.rs:421-429 kernel) at both bounding
    height planes + linear combine in altitude, via ONE broadcast probe
    of the 3-D cell dimension on a packed 4-component long key.  Same
    shuffle-free 100 TB shape as the 2-D flagship."""
    from ionex_spark.operators import spatial

    ev = read_split(spark, f"{sf_dir}/events.parquet").select("event_id")
    pts = ev.selectExpr(
        "event_id as id",
        f"{sqlgen.lat_from_id_sql('event_id')} as lat",
        f"{sqlgen.lon_from_id_sql('event_id')} as lon",
        f"{sqlgen.alt_from_id_sql('event_id')} as alt",
        f"{sqlgen.slot_from_id_sql('event_id')} as slot",
    )
    cells3 = spatial.build_tec_cells_3d(spark)
    out = spatial.trilinear_join(pts, cells3)
    return out.select("id", "slot", "alt_i", "lat_i", "lon_i", "tec")


# ------------------------------------------------ salted big-big join

@register(
    "skew_salted_join",
    priority=50,
    oracle="""
WITH facts AS (
  SELECT event_id,
         CASE WHEN event_id % 10 < 9 THEN CAST(0 AS BIGINT)
              ELSE event_id % 50 END AS k,
         event_id % 1000 AS fv
  FROM events
),
dim AS (SELECT g.range AS k, g.range * 7 + 3 AS dv FROM range(50) g)
SELECT f.k,
       count(*) AS n,
       CAST(sum(CAST(f.fv + d.dv AS DECIMAL(38,0))) AS BIGINT) AS sum_fp
FROM facts f JOIN dim d ON f.k = d.k
GROUP BY 1
""",
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SALTED BIG-BIG JOIN gate row (the salting ladder's join rung —
    round-4 verdict task #5): ~90% of fact rows share join key 0
    (Zipfian hot key), the dim side is joined via
    operators/skew.salted_join — fact side salted 8 ways, dim rows
    replicated once per salt, equi-join on (key, salt) under a
    shuffle_hash hint so no broadcast can hide the skew path.  The
    oracle is the PLAIN unsalted join: identical semantics is the whole
    claim.  Integer fixed-point sum keeps the rollup order-independent
    and bit-exact."""
    from ionex_spark.operators import skew

    facts = spark.read.parquet(f"{sf_dir}/events.parquet").selectExpr(
        "event_id",
        "case when event_id % 10 < 9 then cast(0 as bigint)"
        " else event_id % 50 end as k",
        "event_id % 1000 as fv",
    )
    dim = spark.range(50).selectExpr("id as k", "id * 7 + 3 as dv")
    j = skew.salted_join(
        facts, dim, ["k"], n_salts=8, entropy_col="event_id"
    )
    return j.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(
            "cast(sum(cast(fv + dv as decimal(38,0))) as bigint)"
        ).alias("sum_fp"),
    )


# ------------------------------------- knn_points fallback observability

@register(
    "knn_points_metrics",
    priority=100,  # r7: plan restructured (see NEW_THIS_ROUND)
    oracle=f"""
WITH pts AS ({_PTS_SQL}),
qm AS (
  SELECT id AS qid, lat AS q_lat, lon AS q_lon,
         CAST(floor(lat / CAST(5.0 AS DOUBLE)) AS BIGINT) AS qcx,
         CAST(floor(lon / CAST(5.0 AS DOUBLE)) AS BIGINT) AS qcy
  FROM pts WHERE id % 97 = 0
),
q2 AS (
  SELECT *,
         least(q_lat - (qcx - 1) * CAST(5.0 AS DOUBLE),
               (qcx + 2) * CAST(5.0 AS DOUBLE) - q_lat,
               q_lon - (qcy - 1) * CAST(5.0 AS DOUBLE),
               (qcy + 2) * CAST(5.0 AS DOUBLE) - q_lon) AS margin
  FROM qm
),
c AS (
  SELECT id AS cid, lat AS c_lat, lon AS c_lon,
         CAST(floor(lat / CAST(5.0 AS DOUBLE)) AS BIGINT) AS cx,
         CAST(floor(lon / CAST(5.0 AS DOUBLE)) AS BIGINT) AS cy
  FROM pts
),
scored AS (
  SELECT q2.qid, q2.margin, c.cid,
         (q2.q_lat - c.c_lat) * (q2.q_lat - c.c_lat)
         + (q2.q_lon - c.c_lon) * (q2.q_lon - c.c_lon) AS dist2
  FROM q2 JOIN c ON c.cx BETWEEN q2.qcx - 1 AND q2.qcx + 1
                AND c.cy BETWEEN q2.qcy - 1 AND q2.qcy + 1
  WHERE c.cid != q2.qid
),
topk AS (
  SELECT * FROM (
    SELECT qid, margin, dist2,
           row_number() OVER (PARTITION BY qid ORDER BY dist2, cid) AS rank
    FROM scored
  ) WHERE rank <= 3
),
cert AS (
  SELECT qid, count(*) AS n_cand, max(dist2) AS kth2, min(margin) AS margin
  FROM topk GROUP BY qid
),
split AS (
  SELECT q2.qid,
         CASE WHEN cert.n_cand = 3 AND cert.kth2 < cert.margin * cert.margin
              THEN 1 ELSE 0 END AS is_exact
  FROM q2 LEFT JOIN cert ON cert.qid = q2.qid
)
SELECT count(*) AS n_queries,
       CAST(sum(is_exact) AS BIGINT) AS n_exact,
       CAST(sum(1 - is_exact) AS BIGINT) AS n_fallback,
       CAST(sum(1 - is_exact) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         AS fallback_frac
FROM split
""",
)
def knn_points_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FALLBACK OBSERVABILITY for knn_points (round-4 verdict task #6):
    the certificate split ('cell' certified vs 'brute' fallback) as a
    metrics row — (n_queries, n_exact, n_fallback, fallback_frac).
    The oracle RECOMPUTES the certificate independently in SQL (3x3
    ring candidates, top-k window, kth-distance-vs-block-margin test),
    so a drifted certificate in the engine breaks the hash even though
    both paths return exact kNN rows."""
    from ionex_spark.operators import knn as knn_ops
    from ionex_spark.plans.queries import event_points

    pts = event_points(spark, sf_dir)
    corpus = pts.selectExpr("id as cid", "lat", "lon")
    queries = pts.filter("id % 97 = 0").selectExpr("id as qid", "lat", "lon")
    tagged = knn_ops.knn_points(
        queries, corpus, k=3, cell_deg=5.0, tag_path=True
    )
    return knn_ops.knn_fallback_metrics(tagged, queries=queries)


# ---------------------------------- adaptive-cell knn (round 6 task #6)

@register(
    "knn_points_adaptive",
    priority=100,  # r7: plan restructured (see NEW_THIS_ROUND)
    oracle=f"""
WITH pts AS ({_PTS_SQL}),
cd AS (
  SELECT least(sqrt((max(lat) - min(lat)) * (max(lon) - min(lon))
               * CAST(64.0 AS DOUBLE) / CAST(count(*) AS DOUBLE)),
               greatest(max(lat) - min(lat), max(lon) - min(lon))) AS v
  FROM pts
),
qm AS (
  SELECT id AS qid, lat AS q_lat, lon AS q_lon,
         CAST(floor(lat / cd.v) AS BIGINT) AS qcx,
         CAST(floor(lon / cd.v) AS BIGINT) AS qcy
  FROM pts CROSS JOIN cd WHERE id % 97 = 0
),
q2 AS (
  SELECT qm.*,
         least(q_lat - (qcx - 1) * cd.v,
               (qcx + 2) * cd.v - q_lat,
               q_lon - (qcy - 1) * cd.v,
               (qcy + 2) * cd.v - q_lon) AS margin
  FROM qm CROSS JOIN cd
),
c AS (
  SELECT id AS cid, lat AS c_lat, lon AS c_lon,
         CAST(floor(lat / cd.v) AS BIGINT) AS cx,
         CAST(floor(lon / cd.v) AS BIGINT) AS cy
  FROM pts CROSS JOIN cd
),
scored AS (
  SELECT q2.qid, q2.margin, c.cid,
         (q2.q_lat - c.c_lat) * (q2.q_lat - c.c_lat)
         + (q2.q_lon - c.c_lon) * (q2.q_lon - c.c_lon) AS dist2
  FROM q2 JOIN c ON c.cx BETWEEN q2.qcx - 1 AND q2.qcx + 1
                AND c.cy BETWEEN q2.qcy - 1 AND q2.qcy + 1
  WHERE c.cid != q2.qid
),
topk AS (
  SELECT * FROM (
    SELECT qid, margin, dist2,
           row_number() OVER (PARTITION BY qid ORDER BY dist2, cid) AS rank
    FROM scored
  ) WHERE rank <= 3
),
cert AS (
  SELECT qid, count(*) AS n_cand, max(dist2) AS kth2, min(margin) AS margin
  FROM topk GROUP BY qid
),
split AS (
  SELECT q2.qid,
         CASE WHEN cert.n_cand = 3 AND cert.kth2 < cert.margin * cert.margin
              THEN 1 ELSE 0 END AS is_exact
  FROM q2 LEFT JOIN cert ON cert.qid = q2.qid
)
SELECT count(*) AS n_queries,
       CAST(sum(is_exact) AS BIGINT) AS n_exact,
       CAST(sum(1 - is_exact) AS BIGINT) AS n_fallback,
       CAST(sum(1 - is_exact) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         AS fallback_frac,
       (SELECT v FROM cd) AS cell_deg
FROM split
""",
)
def knn_points_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """knn_points with DENSITY-DERIVED cell size (round-5 verdict task
    #6): cell_deg=None triggers derive_cell_deg's count/extent pre-agg
    (average ~64 corpus points per cell).  The metrics row carries the
    derived cell_deg itself, and the oracle recomputes it from the SAME
    IEEE expression over min/max/count in SQL — every operation
    (differences, products, division, correctly-rounded sqrt) is
    deterministic binary64, so the derived size and the certificate
    split must both match bit-for-bit.  The sparse-corpus pytest
    (test_knn_adaptive_cell_beats_fixed_sparse) pins the behavioral
    claim: adaptive keeps fallback < 5% where the fixed default
    degrades past 50%."""
    from ionex_spark.operators import knn as knn_ops
    from ionex_spark.plans.queries import event_points

    pts = event_points(spark, sf_dir)
    corpus = pts.selectExpr("id as cid", "lat", "lon")
    queries = pts.filter("id % 97 = 0").selectExpr("id as qid", "lat", "lon")
    cd = knn_ops.derive_cell_deg(corpus)
    tagged = knn_ops.knn_points(
        queries, corpus, k=3, cell_deg=cd, tag_path=True
    )
    return knn_ops.knn_fallback_metrics(tagged, queries=queries).withColumn(
        "cell_deg", F.lit(cd)
    )
