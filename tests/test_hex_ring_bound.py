"""Property test for hex.ring_bound_m: the kNN completeness certificate
must LOWER-bound the true great-circle distance from any point in a
cell to any point outside its hex disk — swept over high rings and
latitudes incl. the antimeridian seam (the r2 advice item: the old
planar constant overclaimed and exactness rested on incidental slack).
"""

import numpy as np
import pytest

from geeflow_spark.functions import hex as hx

R_M = hx.EARTH_RADIUS_M


def _haversine(lat1, lon1, lat2, lon2):
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dl = np.radians(lon2 - lon1)
    dp = p2 - p1
    a = np.sin(dp / 2) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl / 2) ** 2
    return 2 * R_M * np.arcsin(np.minimum(1.0, np.sqrt(a)))


def _hex_dist(c1, c2):
    q1, r1, _ = hx.unpack(np.asarray([c1]))
    q2, r2, _ = hx.unpack(c2)
    dq, dr = q2 - q1, r2 - r1
    return (np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) // 2


CENTERS = [(0.0, 0.0), (55.0, 10.0), (-72.0, 170.0), (85.0, -179.0),
           (-85.0, 5.0), (80.0, 179.5), (62.0, -179.9), (89.0, 0.0)]


@pytest.mark.parametrize("res", [3, 5, 7])
def test_ring_bound_is_true_lower_bound(res):
    rng = np.random.default_rng(res)
    s = hx.size_for_res(res)
    # global random points + dense points near each center
    glat = rng.uniform(-89.9, 89.9, 4000)
    glon = rng.uniform(-180.0, 180.0, 4000)
    for lat0, lon0 in CENTERS:
        cell = int(hx.latlon_to_cell_id(np.array([lat0]),
                                        np.array([lon0]), res)[0])
        # query points: inside the center cell (verified by re-encode)
        ang = np.linspace(0, 2 * np.pi, 9)[:-1]
        qlat = np.concatenate([[0.0], 0.45 * s * np.sin(ang)]) + \
            hx.cell_center(np.array([cell]))[0][0]
        qlon = np.concatenate([[0.0], 0.45 * s * np.cos(ang)]) + \
            hx.cell_center(np.array([cell]))[1][0]
        inside = hx.latlon_to_cell_id(qlat, qlon, res) == cell
        qlat, qlon = qlat[inside], qlon[inside]
        assert len(qlat)
        for ring in (1, 2, 4, 8, 16, 32):
            bound = float(hx.ring_bound_m(np.array([cell]), res, ring)[0])
            if bound <= 0:
                continue
            # targeted: points in cells at hex distance ring+1/ring+2
            offs = hx._disk_offsets(ring + 2)
            d = (np.abs(offs[:, 0]) + np.abs(offs[:, 1])
                 + np.abs(offs[:, 0] + offs[:, 1])) // 2
            offs = offs[d > ring]
            q0, r0, _ = hx.unpack(np.array([cell]))
            bcells = hx.pack(q0 + offs[:, 0], r0 + offs[:, 1], res)
            blat, blon = hx.cell_center(bcells)
            # sample within each boundary cell: center + 8 offsets
            plat = (blat[:, None]
                    + 0.45 * s * np.sin(ang)[None, :]).ravel()
            plon = (blon[:, None]
                    + 0.45 * s * np.cos(ang)[None, :]).ravel()
            plat = np.concatenate([plat, glat])
            plon = np.concatenate([plon, glon])
            # keep only points whose OWN cell is outside the disk
            pcells = hx.latlon_to_cell_id(plat, plon, res)
            outside = _hex_dist(cell, pcells) > ring
            plat, plon = plat[outside], plon[outside]
            if not len(plat):
                continue
            dmin = min(
                float(_haversine(ql, qo, plat, plon).min())
                for ql, qo in zip(qlat, qlon))
            assert dmin >= bound - 1e-6 * max(bound, 1.0), (
                f"res={res} center=({lat0},{lon0}) ring={ring}: "
                f"bound {bound:.1f} m > true min {dmin:.1f} m")
