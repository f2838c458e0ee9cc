"""Hexagonal hierarchical cell index (H3-style), pure numpy.

The north rule mandates an H3 sibling index next to S2 (BASELINE.json;
SURVEY §1.3/Appendix B). No `h3` library exists in this environment to
be binary-compatible with, so this module implements the H3 *algorithmic
role* honestly from first principles:

  - pointy-top hexagonal grid in the (lon, lat) degree plane, axial
    coordinates (q, r) via the standard hex-pixel transform;
  - aperture-7-style hierarchy: cell size shrinks by sqrt(7) per
    resolution (H3's aperture), parent(cell) = encode(center, res-1)
    with H3's own fuzzy-containment caveat (children are not strictly
    inside parents - true of real H3 too);
  - k-ring (hex-disk) neighbor generation, bbox covering, and a
    latitude-aware ring distance certificate for kNN.

IDs are NOT Uber-H3 binary compatible (documented limitation); every
engine contract (spatial join, kNN, cell counts) is index-agnostic and
certified by exact refine stages (PIP / haversine), so the index only
has to be a consistent hierarchical space partitioner - which this is.

Non-wrapping at the antimeridian: cells at lon +/-180 do not join
across; kNN's brute-force straggler pass and the PIP refine keep
results exact regardless.

Determinism contract: `latlon_to_cell_id` uses floor(x+0.5) rounding
(half-up, NOT numpy banker's rounding) and the literal constants below,
so the encode is reproducible bit-for-bit in ANSI SQL - the DuckDB
oracle for the hex battery query recomputes it independently.
"""

from __future__ import annotations

import numpy as np

MAX_RES = 15
# Literal constants shared with the SQL oracle (do not recompute).
SQRT3 = 1.7320508075688772
SQRT3_3 = 0.5773502691896258   # sqrt(3)/3
APERTURE = 2.6457513110645907  # sqrt(7)
S0 = 8.0                       # res-0 circumradius in degrees
OFF = 1 << 27                  # axial offset for non-negative packing
EARTH_RADIUS_M = 6371010.0
DEG_TO_RAD = 0.017453292519943295


def size_for_res(res: int) -> float:
    """Hex circumradius in degrees at `res` (aperture-7 shrink)."""
    return S0 / APERTURE ** res


def _cube_round(qf: np.ndarray, rf: np.ndarray
                ) -> tuple[np.ndarray, np.ndarray]:
    """Nearest-hex rounding in cube coords, half-up tie policy."""
    x, z = qf, rf
    y = -x - z
    rx = np.floor(x + 0.5)
    ry = np.floor(y + 0.5)
    rz = np.floor(z + 0.5)
    dx, dy, dz = np.abs(rx - x), np.abs(ry - y), np.abs(rz - z)
    fix_x = (dx > dy) & (dx > dz)
    fix_y = ~fix_x & (dy > dz)
    fix_z = ~fix_x & ~fix_y
    rx = np.where(fix_x, -ry - rz, rx)
    ry = np.where(fix_y, -rx - rz, ry)
    rz = np.where(fix_z, -rx - ry, rz)
    return rx.astype(np.int64), rz.astype(np.int64)


def latlon_to_axial(lat_deg, lon_deg, res: int
                    ) -> tuple[np.ndarray, np.ndarray]:
    lat = np.asarray(lat_deg, dtype=np.float64)
    lon = np.asarray(lon_deg, dtype=np.float64)
    s = size_for_res(res)
    qf = (SQRT3_3 * lon - lat / 3.0) / s
    rf = (2.0 / 3.0 * lat) / s
    return _cube_round(qf, rf)


def pack(q: np.ndarray, r: np.ndarray, res: int) -> np.ndarray:
    """(q, r, res) -> int64: [4-bit res @56][28-bit q+OFF][28-bit r+OFF].

    28 bits per axial coordinate covers |q| <= ~4.6e7, beyond the res-15
    extreme (~4.5e7); res at bit 56 keeps ids positive for res <= 15."""
    return ((np.int64(res) << np.int64(56))
            | ((q + OFF).astype(np.int64) << np.int64(28))
            | (r + OFF).astype(np.int64))


def unpack(cell_id) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    c = np.asarray(cell_id, dtype=np.int64)
    res = c >> np.int64(56)
    q = ((c >> np.int64(28)) & np.int64((1 << 28) - 1)) - OFF
    r = (c & np.int64((1 << 28) - 1)) - OFF
    return q, r, res


def latlon_to_cell_id(lat_deg, lon_deg, res: int) -> np.ndarray:
    q, r = latlon_to_axial(lat_deg, lon_deg, res)
    return pack(q, r, res)


def level_of(cell_id) -> np.ndarray:
    return np.asarray(cell_id, dtype=np.int64) >> np.int64(56)


def cell_center(cell_id) -> tuple[np.ndarray, np.ndarray]:
    """(lat_deg, lon_deg) of the cell center."""
    q, r, res = unpack(cell_id)
    s = S0 / APERTURE ** res.astype(np.float64)
    lon = s * (SQRT3 * q + SQRT3 / 2.0 * r)
    lat = s * 1.5 * r
    return lat, lon


def parent(cell_id, res: int) -> np.ndarray:
    """Coarser-res cell containing this cell's CENTER (H3 semantics:
    fuzzy containment, like real H3 aperture-7 parents)."""
    lat, lon = cell_center(cell_id)
    return latlon_to_cell_id(lat, lon, res)


def _disk_offsets(ring: int) -> np.ndarray:
    """(n, 2) axial offsets of the hex disk of radius `ring`."""
    out = []
    for dq in range(-ring, ring + 1):
        for dr in range(max(-ring, -dq - ring), min(ring, -dq + ring) + 1):
            out.append((dq, dr))
    return np.asarray(out, dtype=np.int64)


def neighbors_ring(cell_id, res: int, ring: int) -> np.ndarray:
    """(n_cells, disk_size) int64: hex disk of radius `ring` per cell.

    Disk (filled), matching the s2 twin's (2r+1)^2 block contract: the
    caller equi-joins candidates against these and dedups."""
    q, r, _ = unpack(cell_id)
    offs = _disk_offsets(ring)
    qq = q[:, None] + offs[None, :, 0]
    rr = r[:, None] + offs[None, :, 1]
    return pack(qq, rr, res)


def ring_bound_m(cell_id, res: int, ring: int) -> np.ndarray:
    """Per-cell conservative lower bound (meters) on the great-circle
    distance from any point in the cell to any point OUTSIDE the hex
    disk of radius `ring` around it.

    Planar: outside the disk means hex distance >= ring+1 from the
    center cell, and the minimum center-to-center degree distance at
    hex distance d is the disk INRADIUS 1.5*d*s (NOT the flat-to-flat
    multiple - the former r1 constant sqrt(3)*d*s overclaimed by up to
    ~15%); subtract one circumradius per cell for the two points'
    offsets within their cells: B = 1.5*(ring+1)*s - 2s.
    Sphere: for the bound-minimizing point |dlat| <= B (else |dlat|
    alone exceeds B radians-worth), so both latitudes are below
    phi_max = |lat_c| + B + s. With c = cos(phi_max)*(2/pi) (the 2/pi
    is the exact same-latitude chord slack), distance_rad >=
    max(|dlat|, c*|dlon|) over sqrt(dlat^2+dlon^2) >= B, minimized at
    the branch balance point: >= B * c / sqrt(1 + c^2). (The r1 form
    dropped the component-split factor entirely and was only saved by
    the 2/pi slack; this form is a proof, not incidental headroom.)
    The planar grid does NOT wrap, so the whole bound is additionally
    capped by the true distance to the antimeridian and to the nearest
    pole - beyond either "portal" a sphere path can be shorter than any
    planar reasoning admits. Near the seam/poles the certificate
    degrades to 0 and the kNN straggler pass takes over (exactness is
    never lost, only the fast path).
    """
    lat, lon = cell_center(cell_id)
    s = size_for_res(res)
    r_m = EARTH_RADIUS_M
    margin_m = 2.0 * s * DEG_TO_RAD * r_m  # query offset within its cell
    b_deg = max(1.5 * (ring + 1) * s - 2.0 * s, 0.0)
    phi_max = np.minimum(np.abs(lat) + b_deg + s, 89.999)
    c = np.minimum(1.0, np.cos(np.radians(phi_max))) * (2.0 / np.pi)
    planar = b_deg * DEG_TO_RAD * r_m * c / np.sqrt(1.0 + c * c)
    # Distance to the antimeridian: arcsin(cos(lat) sin(dlon)) >=
    # cos(lat) sin(dlon) for dlon <= 90 deg.
    dlon_am = np.clip(180.0 - np.abs(lon), 0.0, 90.0)
    am_cap = (np.cos(np.radians(lat))
              * np.sin(np.radians(dlon_am)) * r_m) - margin_m
    pole_cap = (90.0 - np.abs(lat)) * DEG_TO_RAD * r_m - margin_m
    return np.maximum(np.minimum(np.minimum(planar, am_cap), pole_cap), 0.0)


def min_width_rad(res: int) -> float:
    """Equatorial flat-to-flat width in radians (schedule sizing only;
    the exact certificate is the latitude-aware `ring_bound_m`)."""
    return SQRT3 * size_for_res(res) * DEG_TO_RAD


def cover_bbox(lat_min, lat_max, lon_min, lon_max, res: int) -> np.ndarray:
    """Superset of cells intersecting the bbox (cell center within the
    bbox expanded by one circumradius covers every intersecting cell)."""
    s = size_for_res(res)
    corners_lat = np.array([lat_min, lat_min, lat_max, lat_max])
    corners_lon = np.array([lon_min, lon_max, lon_min, lon_max])
    qc, rc = latlon_to_axial(corners_lat, corners_lon, res)
    pad = 2
    qs = np.arange(qc.min() - pad, qc.max() + pad + 1)
    rs = np.arange(rc.min() - pad, rc.max() + pad + 1)
    qq, rr = np.meshgrid(qs, rs, indexing="ij")
    qq, rr = qq.ravel(), rr.ravel()
    cells = pack(qq, rr, res)
    lat, lon = cell_center(cells)
    keep = ((lat >= lat_min - 1.5 * s) & (lat <= lat_max + 1.5 * s) &
            (lon >= lon_min - 1.5 * s) & (lon <= lon_max + 1.5 * s))
    return cells[keep]


def hex_cell_sql(lat_sql: str, lon_sql: str, res: int) -> str:
    """Scalar SQL expression (DuckDB) computing the packed hex cell id.

    Mirrors latlon_to_axial + _cube_round + pack exactly: identical
    IEEE-754 operation sequence, identical literals, floor(x+0.5)."""
    s = repr(size_for_res(res))
    x = f"(({SQRT3_3!r} * ({lon_sql}) - ({lat_sql}) / 3.0) / {s})"
    z = f"((2.0 / 3.0 * ({lat_sql})) / {s})"
    y = f"(-{x} - {z})"
    rx = f"floor({x} + 0.5)"
    ry = f"floor({y} + 0.5)"
    rz = f"floor({z} + 0.5)"
    dx = f"abs({rx} - {x})"
    dy = f"abs({ry} - {y})"
    dz = f"abs({rz} - {z})"
    fq = (f"(CASE WHEN {dx} > {dy} AND {dx} > {dz} "
          f"THEN -{ry} - {rz} ELSE {rx} END)")
    fr = (f"(CASE WHEN NOT ({dx} > {dy} AND {dx} > {dz}) "
          f"AND NOT ({dy} > {dz}) THEN -{rx} - {ry} ELSE {rz} END)")
    return (f"(CAST({res} AS BIGINT) * 72057594037927936"  # << 56
            f" + (CAST({fq} AS BIGINT) + {OFF}) * 268435456"  # << 28
            f" + (CAST({fr} AS BIGINT) + {OFF}))")
