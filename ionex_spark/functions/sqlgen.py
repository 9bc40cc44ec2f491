"""SQL fragment builders shared by the Spark plans and the DuckDB oracle.

The driver's correctness gate hashes query output values, so float results
must match the oracle BIT-FOR-BIT.  IEEE-754 +,-,*,/ and floor are exactly
specified, so any expression built ONLY from those (no transcendentals, no
engine-specific hash functions) produces identical doubles in Spark and
DuckDB **as long as the expression tree is identical**.  This module is the
single source of truth for those trees: the Spark operators evaluate them
via ``F.expr``, and ``__spark_entry__.oracle_sql`` splices the same strings
into plain SQL.

The synthetic-point derivations map an integer id column onto the
reference's worldwide TEC grid (SURVEY.md §1.2, FIXTURES.md §1.2):
lat 87.5..-87.5 step 2.5 (71 lines), lon -180..180 step 5 (73 lines),
25 hourly epochs; cell indexing follows the engine's ascending-from-south
convention.  Corner TEC values come from the integer field
``tecu_q = ((lat_i*31 + lon_i*17 + slot*13) % 500) + 10`` at exponent -1
(ionex_spark.core.synth.tecu_q_int).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class GridSpec:
    lat0: float = -87.5
    dlat: float = 2.5
    nlat: int = 71
    lon0: float = -180.0
    dlon: float = 5.0
    nlon: int = 73
    n_slots: int = 25
    sampling_s: int = 3600


GRID = GridSpec()


def D(x: float) -> str:
    """Render a float literal portably as double: Spark parses bare ``10.0``
    as DecimalType while DuckDB parses it as DOUBLE, which silently changes
    arithmetic result types; an explicit cast pins both engines to f64."""
    return f"cast({x!r} as double)"



# ------------------------------------------------- synthetic point columns

def lat_from_id_sql(id_col: str) -> str:
    """Deterministic latitude in [-87.5, 87.5] from an integer id."""
    return f"({D(-87.5)} + ((({id_col}) * 7919) % 1751) / {D(10.0)})"


def lon_from_id_sql(id_col: str) -> str:
    """Deterministic longitude in [-180.0, 179.9] from an integer id."""
    return f"({D(-180.0)} + ((({id_col}) * 104729) % 3600) / {D(10.0)})"


def slot_from_id_sql(id_col: str, n_slots: int | None = None) -> str:
    """Deterministic aligned epoch slot in [0, n_slots)."""
    n = n_slots or GRID.n_slots
    return f"((({id_col}) * 2654435761) % {n})"


def tsec_from_id_sql(id_col: str) -> str:
    """Deterministic unaligned time-of-day seconds in [0, 86400)."""
    return f"((({id_col}) * 48271) % 86400)"


# ------------------------------------------------------ TEC-grid cell index

def lat_idx_sql(lat: str) -> str:
    """Cell row index, ascending from south; clamped to [0, nlat-2] so the
    top grid line belongs to the last cell (grid-edge clamping,
    reference src/linspace.rs:163-179 / SURVEY.md §2.8)."""
    g = GRID
    return (
        f"greatest(least(cast(floor((({lat}) - {D(g.lat0)}) / {D(g.dlat)}) as bigint),"
        f" {g.nlat - 2}), 0)"
    )


def lon_idx_sql(lon: str) -> str:
    g = GRID
    return (
        f"greatest(least(cast(floor((({lon}) - {D(g.lon0)}) / {D(g.dlon)}) as bigint),"
        f" {g.nlon - 2}), 0)"
    )


def cell_lat0_sql(lat_i: str) -> str:
    return f"({D(GRID.lat0)} + ({lat_i}) * {D(GRID.dlat)})"


def cell_lon0_sql(lon_i: str) -> str:
    return f"({D(GRID.lon0)} + ({lon_i}) * {D(GRID.dlon)})"


# --------------------------------------------------------- synthetic field

def corner_tec_sql(lat_i: str, lon_i: str, slot: str) -> str:
    """TECu of the grid point (lat_i, lon_i) at epoch slot (exponent -1)."""
    return f"((((({lat_i}) * 31 + ({lon_i}) * 17 + ({slot}) * 13) % 500) + 10) / {D(10.0)})"


# ------------------------------------------------------- bilinear kernel

def bilinear_sql(p: str, q: str, sw: str, se: str, nw: str, ne: str) -> str:
    """The reference's exact coefficient assignment (src/cell/mod.rs:421-429):
    latitude fraction p weights SE, longitude fraction q weights NW."""
    return (
        f"(({D(1.0)} - ({p})) * ({D(1.0)} - ({q})) * ({sw})"
        f" + ({p}) * ({D(1.0)} - ({q})) * ({se})"
        f" + ({q}) * ({D(1.0)} - ({p})) * ({nw})"
        f" + ({p}) * ({q}) * ({ne}))"
    )


def frac_p_sql(lat: str, lat_i: str) -> str:
    return f"((({lat}) - {cell_lat0_sql(lat_i)}) / {D(GRID.dlat)})"


def frac_q_sql(lon: str, lon_i: str) -> str:
    return f"((({lon}) - {cell_lon0_sql(lon_i)}) / {D(GRID.dlon)})"


# -------------------------------------------- hierarchical global cell ids

_RES_MULT = 1 << 58
_LAT_MULT = 1 << 29


def cell_id_sql(lat: str, lon: str, res: int) -> str:
    """Portable-SQL twin of core.cellid.cell_encode (same bit layout)."""
    nlat = 1 << res
    nlon = 1 << (res + 1)
    edge = D(180.0 / nlat)
    lon_n = (
        f"(({lon}) - {D(360.0)} * floor((({lon}) + {D(180.0)}) / {D(360.0)}))"
    )
    lat_i = (
        f"greatest(least(cast(floor((({lat}) + {D(90.0)}) / {edge}) as bigint),"
        f" {nlat - 1}), 0)"
    )
    lon_i = (
        f"greatest(least(cast(floor(({lon_n} + {D(180.0)}) / {edge}) as bigint),"
        f" {nlon - 1}), 0)"
    )
    return f"({res} * {_RES_MULT} + {lat_i} * {_LAT_MULT} + {lon_i})"


def _idiv(a: str, b: int) -> str:
    """Portable exact integer division for non-negative a and power-of-two b:
    (a - a%b) is an exact multiple of b, so the double division is exact
    (trailing zero bits keep the mantissa within 53 bits). Spark's `div` and
    DuckDB's `//` are not common syntax, hence this idiom."""
    return f"cast(((({a}) - (({a}) % {b})) / {b}) as bigint)"


def cell_parent_sql(cell_id: str, res: int, parent_res: int) -> str:
    """Ancestor id via arithmetic shifts on the packed fields."""
    shift = 1 << (res - parent_res)
    lat_i = _idiv(f"(({cell_id}) % {_RES_MULT})", _LAT_MULT)
    lon_i = f"(({cell_id}) % {_LAT_MULT})"
    return (
        f"({parent_res} * {_RES_MULT}"
        f" + {_idiv(lat_i, shift)} * {_LAT_MULT} + {_idiv(lon_i, shift)})"
    )


# ---------------------------------------------------- temporal bracketing

def bracket_slot0_sql(tsec: str) -> str:
    """t0 slot = floor(t / sampling), clamped to the LAST interval so a
    point exactly at the final map epoch brackets as (last-1, last) with
    w1 = 1 — the reference's backward branch accepts t == t1
    (src/cell/mod.rs:819) and the engine's numpy kernel allows w1 == 1.
    Out-of-range epochs are rejected by the w1-in-[0,1] validity filter,
    not by the clamp."""
    raw = f"cast(floor(({tsec}) / {D(float(GRID.sampling_s))}) as bigint)"
    return f"least({raw}, {GRID.n_slots - 2})"


def bracket_w1_sql(tsec: str) -> str:
    """weight of the upper bracket epoch; inside the map span it is in
    [0, 1] (1 exactly at the last epoch); outside it leaves [0, 1] and the
    caller's validity filter drops the row (reference TemporalMismatch)."""
    s = GRID.sampling_s
    return f"((({tsec}) - {bracket_slot0_sql(tsec)} * {D(float(s))}) / {D(float(s))})"


def bracket_valid_sql(w1: str = "w1") -> str:
    return f"(({w1}) >= {D(0.0)} and ({w1}) <= {D(1.0)})"


# ------------------------------------------------- altitude (height) axis

@dataclass(frozen=True)
class AltSpec:
    """3-D IONEX height grid (reference `MAP DIMENSION 3`,
    src/header/mod.rs:64-70 + with_altitude_grid at :222-225): bottom
    plane h0 km, dh km spacing, nh planes.  The reference parses the
    axis but leaves computing over it TODO (src/record/parsing.rs:
    174-175); the engine completes it with trilinear interpolation."""

    h0: float = 200.0
    dh: float = 50.0
    nh: int = 5


ALT = AltSpec()


def alt_from_id_sql(id_col: str) -> str:
    """Deterministic altitude in [h0, h0 + (nh-1)*dh) km from an id."""
    span10 = int((ALT.nh - 1) * ALT.dh * 10)  # tenth-km quantized span
    return f"({D(ALT.h0)} + ((({id_col}) * 7907) % {span10}) / {D(10.0)})"


def alt_idx_sql(alt: str) -> str:
    """Height-plane index, clamped to [0, nh-2] like the lat/lon axes
    (grid-edge clamping, src/linspace.rs:163-179)."""
    a = ALT
    return (
        f"greatest(least(cast(floor((({alt}) - {D(a.h0)}) / {D(a.dh)}) as"
        f" bigint), {a.nh - 2}), 0)"
    )


def frac_r_sql(alt: str, alt_i: str) -> str:
    """Fractional position inside the height cell, in [0, 1]."""
    return (
        f"((({alt}) - ({D(ALT.h0)} + ({alt_i}) * {D(ALT.dh)})) / {D(ALT.dh)})"
    )


def corner_tec3_sql(lat_i: str, lon_i: str, alt_i: str, slot: str) -> str:
    """Synthetic 3-D TEC field: the 2-D integer field plus an alt_i term
    (exponent -1), so every height plane is a distinct deterministic map."""
    return (
        f"((((({lat_i}) * 31 + ({lon_i}) * 17 + ({alt_i}) * 7"
        f" + ({slot}) * 13) % 500) + 10) / {D(10.0)})"
    )


def trilinear_sql(
    p: str,
    q: str,
    r: str,
    lo: tuple[str, str, str, str],
    hi: tuple[str, str, str, str],
) -> str:
    """Trilinear = linear-in-altitude combine of the reference's exact
    bilinear kernel (src/cell/mod.rs:421-429) evaluated at the two
    bounding height planes — the §2.8 temporal-combine shape applied to
    the third grid axis."""
    b_lo = bilinear_sql(p, q, *lo)
    b_hi = bilinear_sql(p, q, *hi)
    return f"(({D(1.0)} - ({r})) * {b_lo} + ({r}) * {b_hi})"
