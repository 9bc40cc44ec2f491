"""IONEX ASCII reader/writer — the text source/sink format of the engine.

Implements the IONEX 1.0 layout the reference reads and writes
(/root/reference/src/header/formatting.rs:11-172,
src/record/formatting.rs:14-207, src/header/parsing.rs:15-188,
src/record/parsing.rs:25-238), re-derived from the format spec — not a code
port.  Layout contract:

- every line = 60-char left-padded content + marker (fmt_ionex,
  src/lib.rs:138-157); comments wrap at ceil(len/60) lines.
- header: marker-dispatched; grid lines ``  %6.1f%6.1f%6.1f``; epoch lines
  ``  %04d    %2d    %2d    %2d    %2d    %2d`` (body) — parsing is
  whitespace-split so either is accepted (src/epoch.rs:23-68).
- record: per epoch ``START OF TEC MAP``/index, epoch line, then per
  latitude (N->S, i.e. grid order with negative dlat) a
  ``LAT/LON1/LON2/DLON/H`` spec line ``  %6.1f x5`` followed by data lines
  of 16 x 5-char ints (``%5d``), west->east; missing points = `` 9999``
  sentinel (src/record/parsing.rs:146-150); optional RMS map pass; then
  ``END OF TEC MAP`` / ``END OF FILE``.

Parser is a marker state machine over (content, marker) splits at col 60,
tolerant of short lines; data values accumulate per grid-spec row and flush
on the next spec/END marker — mirroring the reference's buffer-flush
semantics (src/record/parsing.rs:132-195) without copying its code.

Data model here: plain numpy arrays + a small ``IonexHeader`` dataclass;
the Spark layer wraps this in mapInPandas (one file = one task).
"""

from __future__ import annotations

import gzip
import io
from dataclasses import dataclass, field

import numpy as np

from ionex_spark.core.linspace import Grid, Linspace
from ionex_spark.core.meta import MappingFunction, Version


@dataclass
class IonexHeader:
    version: tuple[int, int] = (1, 0)
    # observation source on the VERSION / TYPE line (src/system.rs):
    # a constellation code, other system, or theoretical model
    reference_system: str = "GNSS"
    program: str = "ionex_spark"
    run_by: str = "ionex_spark"
    description: list[str] = field(default_factory=list)
    map_dimension: int = 2
    grid: Grid = None
    interval_s: int = 3600
    epoch_first: np.datetime64 = None
    epoch_last: np.datetime64 = None
    number_of_maps: int = 0
    elevation_cutoff: float = 0.0
    mapping_function: str = "NONE"
    base_radius_km: float = 6371.0
    exponent: int = -1
    comments: list[str] = field(default_factory=list)
    # filled by parse_ionex: exponent in effect for each returned TEC map
    # (IONEX allows in-record EXPONENT updates, src/record/parsing.rs:72-84;
    # a single header-level exponent cannot represent such files)
    exp_per_map: list[int] | None = None
    # filled by parse_ionex when the file carries HEIGHT maps — the
    # reference leaves these as a TODO (src/record/parsing.rs:174-175);
    # we parse them into a dense (T, nlat, nlon) grid like TEC/RMS
    height_q: "np.ndarray | None" = None


def _fmt_line(content: str, marker: str) -> list[str]:
    """60-col left-pad + marker; wrap long content (src/lib.rs:138-157)."""
    if len(content) < 60:
        return [f"{content:<60}{marker}"]
    n = -(-len(content) // 60)
    return [f"{content[i*60:(i+1)*60]:<60}{marker}" for i in range(n)]


def _fmt_epoch_body(e: np.datetime64) -> str:
    t = e.astype("datetime64[s]").item()
    return (
        f"  {t.year:04}    {t.month:>2}    {t.day:>2}"
        f"    {t.hour:>2}    {t.minute:>2}    {t.second:>2}"
    )


def _parse_epoch(content: str) -> np.datetime64:
    f = content.split()
    y, mo, d, hh, mi, ss = (int(x) for x in f[:6])
    return np.datetime64(f"{y:04d}-{mo:02d}-{d:02d}T{hh:02d}:{mi:02d}:{ss:02d}")


# -------------------------------------------------------------------- write

def write_ionex(
    header: IonexHeader,
    epochs: np.ndarray,
    tecu_q: np.ndarray,
    rms_q: np.ndarray | None = None,
) -> str:
    """Serialize a dense grid to IONEX ASCII.

    ``epochs``: (T,) datetime64[s]; ``tecu_q``/``rms_q``: (T, nlat, nlon)
    int arrays in GRID ORDER (row 0 = grid.lat.start, which is the
    northernmost line when dlat < 0), sentinel 9999 for missing.
    """
    g = header.grid
    out: list[str] = []
    maj, mino = header.version
    out += _fmt_line(
        f"{maj:6}.{mino:01}            IONOSPHERE MAPS"
        f"     {header.reference_system}",
        "IONEX VERSION / TYPE",
    )
    out += _fmt_line(
        f"{header.program:<20}{header.run_by:<20}{'':<20}", "PGM / RUN BY / DATE"
    )
    for line in header.description:
        out += _fmt_line(line, "DESCRIPTION")
    out += _fmt_line(f"{header.map_dimension:6}", "MAP DIMENSION")
    out += _fmt_line(f"{header.number_of_maps:6}", "# OF MAPS IN FILE")
    for ls, marker in (
        (g.alt, "HGT1 / HGT2 / DHGT"),
        (g.lat, "LAT1 / LAT2 / DLAT"),
        (g.lon, "LON1 / LON2 / DLON"),
    ):
        out += _fmt_line(
            f"  {ls.start:6.1f}{ls.end:6.1f}{ls.spacing:6.1f}", marker
        )
    out += _fmt_line(f"{header.interval_s:6}", "INTERVAL")
    out += _fmt_line(_fmt_epoch_body(header.epoch_first), "EPOCH OF FIRST MAP")
    out += _fmt_line(_fmt_epoch_body(header.epoch_last), "EPOCH OF LAST MAP")
    out += _fmt_line(f"{header.elevation_cutoff:6.1f}", "ELEVATION CUTOFF")
    out += _fmt_line(f"  {header.mapping_function}", "MAPPING FUNCTION")
    out += _fmt_line(f"{header.base_radius_km:6.1f}", "BASE RADIUS")
    out += _fmt_line(f"{header.exponent:6}", "EXPONENT")
    for c in header.comments:
        out += _fmt_line(c, "COMMENT")
    out += _fmt_line("", "END OF HEADER")

    def emit_map(vals: np.ndarray, kind: str, nth: int, epoch) -> None:
        out.extend(_fmt_line(f"{nth:6}", f"START OF {kind} MAP"))
        out.extend(_fmt_line(_fmt_epoch_body(epoch), "EPOCH OF CURRENT MAP"))
        lats = g.lat.values()
        for li in range(vals.shape[0]):
            out.extend(
                _fmt_line(
                    f"  {lats[li]:6.1f}{g.lon.start:6.1f}{g.lon.end:6.1f}"
                    f"{g.lon.spacing:6.1f}{g.alt.start:6.1f}",
                    "LAT/LON1/LON2/DLON/H",
                )
            )
            row = vals[li]
            for off in range(0, len(row), 16):
                out.append("".join(f"{int(v):5}" for v in row[off : off + 16]))
        out.extend(_fmt_line(f"{nth:6}", f"END OF {kind} MAP"))

    for t, epoch in enumerate(epochs):
        emit_map(tecu_q[t], "TEC", t + 1, epoch)
    if rms_q is not None:
        for t, epoch in enumerate(epochs):
            emit_map(rms_q[t], "RMS", t + 1, epoch)
    out += _fmt_line("", "END OF FILE")
    return "\n".join(out) + "\n"


# --------------------------------------------------------------------- read

def parse_ionex(text: str) -> tuple[IonexHeader, np.ndarray, np.ndarray, np.ndarray | None]:
    """Parse IONEX ASCII -> (header, epochs, tecu_q, rms_q).

    Returns dense (T, nlat, nlon) int64 grids with 9999 where missing.
    """
    lines = text.splitlines()
    header = IonexHeader()
    lat = lon = alt = None
    i = 0
    while i < len(lines):
        line = lines[i]
        i += 1
        content, marker = line[:60], line[60:]
        if "END OF HEADER" in marker:
            break
        if "COMMENT" in marker:
            header.comments.append(content.rstrip())
        elif "IONEX VERSION / TYPE" in marker:
            toks = content.split()
            header.version = Version.parse(toks[0]).as_tuple()
            # trailing token is the reference system (src/system.rs);
            # 'IONOSPHERE MAPS' sits between version and system
            if len(toks) >= 2 and toks[-1] not in ("MAPS", "IONOSPHERE"):
                header.reference_system = toks[-1]
        elif "# OF MAPS IN FILE" in marker:
            header.number_of_maps = int(content.split()[0])
        elif "MAP DIMENSION" in marker:
            header.map_dimension = int(content.split()[0])
        elif "ELEVATION CUTOFF" in marker:
            header.elevation_cutoff = float(content.split()[0])
        elif "DESCRIPTION" in marker:
            header.description.append(content.rstrip())
        elif "EPOCH OF FIRST MAP" in marker:
            header.epoch_first = _parse_epoch(content)
        elif "EPOCH OF LAST MAP" in marker:
            header.epoch_last = _parse_epoch(content)
        elif "PGM / RUN BY / DATE" in marker:
            header.program = content[0:20].strip()
            header.run_by = content[20:40].strip()
        elif "INTERVAL" in marker:
            header.interval_s = int(float(content.split()[0]))
        elif "BASE RADIUS" in marker:
            header.base_radius_km = float(content.split()[0])
        elif "EXPONENT" in marker:
            header.exponent = int(content.split()[0])
        elif "MAPPING FUNCTION" in marker:
            mf = content.strip()
            # normalize through the enum (src/mapf.rs: NONE/COSZ/QFAC,
            # 'cosine' alias); unknown functions kept verbatim so odd
            # agency files still ingest
            header.mapping_function = (
                MappingFunction.parse(mf)
                if MappingFunction.is_valid(mf)
                else mf
            )
        elif "LAT1 / LAT2 / DLAT" in marker:
            a, b, c = (float(x) for x in _split_grid_triple(content))
            lat = Linspace(a, b, c)
        elif "LON1 / LON2 / DLON" in marker:
            a, b, c = (float(x) for x in _split_grid_triple(content))
            lon = Linspace(a, b, c)
        elif "HGT1 / HGT2 / DHGT" in marker:
            a, b, c = (float(x) for x in _split_grid_triple(content))
            alt = Linspace(a, b, c)
    header.grid = Grid(lat=lat, lon=lon, alt=alt)

    nlat, nlon = len(lat), len(lon)
    lat_vals = lat.values()
    epochs: list[np.datetime64] = []
    maps: dict[str, dict[int, np.ndarray]] = {"TEC": {}, "RMS": {}}
    cur_epoch_idx = -1
    cur_kind = "TEC"
    cur_lat_row = -1
    cur_vals: list[int] = []
    # per-row longitude spec: IONEX permits each LAT/LON1/LON2/DLON/H row
    # to carry its own lon axis (the reference re-parses GridSpecs per row,
    # src/record/parsing.rs); default to the header axis
    cur_lon1 = lon.start
    cur_dlon = lon.spacing
    exponent = header.exponent
    exp_of_map: dict[int, int] = {}

    def flush_row() -> None:
        nonlocal cur_vals
        if cur_lat_row >= 0 and cur_vals:
            grid = maps[cur_kind].setdefault(
                cur_epoch_idx, np.full((nlat, nlon), 9999, dtype=np.int64)
            )
            # map values to columns via the ROW's own lon spec; raise on
            # misalignment rather than silently misplacing values
            idx = np.arange(len(cur_vals), dtype=np.float64)
            cols = (cur_lon1 + idx * cur_dlon - lon.start) / lon.spacing
            coli = np.rint(cols).astype(np.int64)
            if not (
                np.all(np.abs(cols - coli) < 1e-6)
                and coli.min() >= 0
                and coli.max() < nlon
            ):
                raise ValueError(
                    f"row lon spec (LON1={cur_lon1}, DLON={cur_dlon},"
                    f" n={len(cur_vals)}) does not align with the header"
                    f" longitude axis"
                )
            grid[cur_lat_row, coli] = cur_vals
        cur_vals = []

    _MARKERS = (
        "EPOCH OF CURRENT MAP", "START OF TEC MAP", "START OF RMS MAP",
        "START OF HEIGHT MAP", "EXPONENT", "LAT/LON1/LON2/DLON/H", "END OF",
    )
    while i < len(lines):
        line = lines[i]
        i += 1
        content, marker = line[:60], line[60:]
        if any(m in marker for m in _MARKERS):
            if "EPOCH OF CURRENT MAP" in marker:
                e = _parse_epoch(content)
                if cur_epoch_idx < 0 or (
                    len(epochs) and e != epochs[cur_epoch_idx]
                ):
                    if e in epochs:
                        cur_epoch_idx = epochs.index(e)
                    else:
                        epochs.append(e)
                        cur_epoch_idx = len(epochs) - 1
                if cur_kind == "TEC":
                    exp_of_map.setdefault(cur_epoch_idx, exponent)
            elif "START OF TEC MAP" in marker:
                flush_row()
                cur_kind = "TEC"
            elif "START OF RMS MAP" in marker:
                flush_row()
                cur_kind = "RMS"
            elif "START OF HEIGHT MAP" in marker:
                flush_row()
                cur_kind = "HEIGHT"
                maps.setdefault("HEIGHT", {})
            elif "EXPONENT" in marker:
                # applies to values parsed AFTER this line; maps already
                # flushed keep their exponent (association happens at the
                # next EPOCH OF CURRENT MAP).  A mid-map update would need
                # value-level exponents — rejected as out of scope, like
                # the reference it would mis-scale only pathological files.
                exponent = int(content.split()[0])
                header.exponent = exponent
            elif "LAT/LON1/LON2/DLON/H" in marker:
                flush_row()
                row_lat = float(content[2:8])
                cur_lat_row = int(np.argmin(np.abs(lat_vals - row_lat)))
                # fixed 6-char fields: lat, lon1, lon2, dlon, h
                try:
                    cur_lon1 = float(content[8:14])
                    cur_dlon = float(content[20:26])
                except ValueError:
                    cur_lon1, cur_dlon = lon.start, lon.spacing
            elif "END OF" in marker:
                flush_row()
                if "END OF FILE" in marker:
                    break
        elif marker.strip() and any(c.isalpha() for c in marker.strip()):
            # unknown marker inside the record section (COMMENT, AUX DATA,
            # ...): tolerated and skipped, like the reference's data branch
            # which logs unparseable items and continues
            # (src/record/parsing.rs data arm)
            continue
        else:
            # 16 x 5-char data values (data lines are up to 80 chars wide)
            row = line.rstrip("\n")
            for off in range(0, len(row), 5):
                item = row[off : off + 5].strip()
                if item:
                    try:
                        cur_vals.append(int(item))
                    except ValueError:
                        # positional format: dropping the item would shift
                        # every later value one column west — substitute
                        # the missing-data sentinel instead
                        cur_vals.append(9999)
    flush_row()

    ep = np.array(epochs, dtype="datetime64[s]")
    order = np.argsort(ep)
    ep = ep[order]
    header.exp_per_map = [
        exp_of_map.get(int(o), header.exponent) for o in order
    ]
    tec = np.stack(
        [
            maps["TEC"].get(int(o), np.full((nlat, nlon), 9999, dtype=np.int64))
            for o in order
        ]
    )
    rms = None
    if maps["RMS"]:
        rms = np.stack(
            [
                maps["RMS"].get(int(o), np.full((nlat, nlon), 9999, np.int64))
                for o in order
            ]
        )
    if maps.get("HEIGHT"):
        header.height_q = np.stack(
            [
                maps["HEIGHT"].get(
                    int(o), np.full((nlat, nlon), 9999, np.int64)
                )
                for o in order
            ]
        )
    return header, ep, tec, rms


def _split_grid_triple(content: str) -> tuple[str, str, str]:
    """Grid lines are 6-char fixed-width fields after 2 leading spaces
    (they may abut without whitespace, e.g. ``     2.5-180.0 180.0``)."""
    c = content[2:]
    return c[0:6], c[6:12], c[12:18]


# ------------------------------------------------------------- file helpers

def read_ionex_file(path: str) -> tuple[IonexHeader, np.ndarray, np.ndarray, np.ndarray | None]:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        return parse_ionex(f.read())


def write_ionex_file(path: str, header, epochs, tecu_q, rms_q=None) -> None:
    text = write_ionex(header, epochs, tecu_q, rms_q)
    if path.endswith(".gz"):
        with gzip.open(path, "wt", compresslevel=5) as f:
            f.write(text)
    else:
        with io.open(path, "wt") as f:
            f.write(text)


# -------------------------------------------------- long-format conversion

def grids_to_long(header: IonexHeader, epochs, tecu_q, rms_q=None):
    """Dense (T, nlat, nlon) -> long arrays (epoch, lat, lon, tecu_q, rms_q)
    with 9999-sentinel points dropped (the reference's sparse-in semantics,
    src/record/parsing.rs:146-150).

    A point is KEPT if it has a TEC value OR an RMS value: the reference's
    RMS branch inserts a key with default TEC when only the RMS map covers
    it, so RMS-only points must survive ingest.  tecu_q/rms_q come back as
    float64 with NaN where the sentinel was (NaN maps to NULL on the Spark
    side)."""
    g = header.grid
    T, nlat, nlon = tecu_q.shape
    ee, li, lo = np.meshgrid(
        np.arange(T), np.arange(nlat), np.arange(nlon), indexing="ij"
    )
    mask = tecu_q != 9999
    if rms_q is not None:
        mask = mask | (rms_q != 9999)
    lat_vals = g.lat.values()
    lon_vals = g.lon.values()
    tq = tecu_q[mask].astype(np.float64)
    tq[tecu_q[mask] == 9999] = np.nan
    rq = None
    if rms_q is not None:
        rq = rms_q[mask].astype(np.float64)
        rq[rms_q[mask] == 9999] = np.nan
    out = {
        "epoch": np.asarray(epochs)[ee[mask]],
        "lat": lat_vals[li[mask]],
        "lon": lon_vals[lo[mask]],
        "tecu_q": tq,
        "rms_q": rq,
    }
    return out
