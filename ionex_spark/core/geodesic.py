"""Geodesic perimeter/area of lat/lon rectangles on WGS84 — numerical.

Mirrors the reference's geo-crate usage (MapCell::geodesic_perimeter /
geodesic_area, /root/reference/src/cell/mod.rs:296-303) with the golden
constants for the unit 1-degree cell at the origin:
perimeter ~ 443770 m (+/-1), unsigned area ~ 12308778361 m^2 (+/-1)
(src/cell/mod.rs:855-859, doctest :225-229).

Method (pure numpy, machine-precision, no hand-ported series):
- meridian edges: arc length = integral of M(phi) dphi via Gauss-Legendre;
- parallel-endpoint edges (the rect's top/bottom connected by GEODESICS,
  which sag poleward of the parallel): solve the geodesic phi(lambda) by
  RK4 on  dphi/dlam = N cos(phi) cos(alpha) / (M sin(alpha)),
          dalpha/dlam = sin(phi)            (Clairaut),
  shooting on the initial azimuth alpha0 (secant) until the arc returns to
  the same latitude at the far meridian; arc length from
  ds/dlam = N cos(phi)/sin(alpha);
- area: Green's theorem A = closed-integral F(phi) dlam with
  F(phi) = b^2/2 [ sin(phi)/(1 - e^2 sin^2(phi)) + atanh(e sin(phi))/e ]
  (dF/dphi = M N cos(phi) exactly); meridian edges contribute 0, parallel
  band terms are closed-form, the geodesic sag correction integrates
  F(phi(lambda)) - F(phi_edge) by Simpson along the shot path.

Everything is vectorized over arrays of rectangles.
"""

from __future__ import annotations

import numpy as np

A_WGS84 = 6378137.0
F_WGS84 = 1.0 / 298.257223563
B_WGS84 = A_WGS84 * (1.0 - F_WGS84)
E2 = F_WGS84 * (2.0 - F_WGS84)
E = np.sqrt(E2)

_GL_NODES, _GL_WEIGHTS = np.polynomial.legendre.leggauss(64)


def _w2(phi):
    return 1.0 - E2 * np.sin(phi) ** 2


def meridian_arc(phi1, phi2) -> np.ndarray:
    """Meridian arc length between latitudes (radians in, meters out)."""
    phi1 = np.asarray(phi1, np.float64)
    phi2 = np.asarray(phi2, np.float64)
    mid = 0.5 * (phi1 + phi2)
    half = 0.5 * (phi2 - phi1)
    # Gauss-Legendre over [phi1, phi2]
    phis = mid[..., None] + half[..., None] * _GL_NODES
    m = A_WGS84 * (1.0 - E2) / _w2(phis) ** 1.5
    return (m * _GL_WEIGHTS).sum(axis=-1) * half


def area_band_fn(phi):
    """F(phi): cumulative area per radian of longitude from equator."""
    s = np.sin(phi)
    return 0.5 * B_WGS84**2 * (s / (1.0 - E2 * s * s) + np.arctanh(E * s) / E)


def _geodesic_same_lat(phi0, dlam, n_steps: int = 512):
    """Geodesic connecting (0, phi0) -> (dlam, phi0), phi0 in radians,
    dlam > 0.  Returns (phi path at n_steps+1 nodes, arc length).

    Vectorized over phi0/dlam arrays via RK4 + secant shooting on alpha0.
    By symmetry the azimuth at the far end is pi - alpha0.
    """
    phi0 = np.atleast_1d(np.asarray(phi0, np.float64))
    dlam = np.atleast_1d(np.asarray(dlam, np.float64))
    phi0, dlam = np.broadcast_arrays(phi0, dlam)
    shape = phi0.shape
    h = dlam / n_steps

    def dphi_dlam(phi, alpha):
        # N/M * cos(phi) * cot(alpha); N/M = w^2/(1-e^2)
        return _w2(phi) / (1.0 - E2) * np.cos(phi) / np.tan(alpha)

    def integrate(alpha0, want_path=False):
        phi = phi0.copy()
        alpha = alpha0.copy()
        path = np.empty((n_steps + 1,) + shape) if want_path else None
        if want_path:
            path[0] = phi
        for i in range(n_steps):
            # RK4 on (phi, alpha) over lambda
            k1p = dphi_dlam(phi, alpha)
            k1a = np.sin(phi)
            p2 = phi + 0.5 * h * k1p
            a2 = alpha + 0.5 * h * k1a
            k2p = dphi_dlam(p2, a2)
            k2a = np.sin(p2)
            p3 = phi + 0.5 * h * k2p
            a3 = alpha + 0.5 * h * k2a
            k3p = dphi_dlam(p3, a3)
            k3a = np.sin(p3)
            p4 = phi + h * k3p
            a4 = alpha + h * k3a
            k4p = dphi_dlam(p4, a4)
            k4a = np.sin(p4)
            phi = phi + h / 6.0 * (k1p + 2 * k2p + 2 * k3p + k4p)
            alpha = alpha + h / 6.0 * (k1a + 2 * k2a + 2 * k3a + k4a)
            if want_path:
                path[i + 1] = phi
        return phi, path

    # initial azimuth guess: symmetric arc, alpha(mid)=pi/2,
    # alpha0 = pi/2 - sin(phi0)*dlam/2 (flat guess)
    a_lo = np.full(shape, np.pi / 2) - np.sin(phi0) * dlam * 0.75
    a_hi = np.full(shape, np.pi / 2) - np.sin(phi0) * dlam * 0.25
    f_lo = integrate(a_lo)[0] - phi0
    f_hi = integrate(a_hi)[0] - phi0
    alpha0 = a_hi.copy()
    f_cur = f_hi
    prev_a, prev_f = a_lo, f_lo
    for _ in range(60):
        denom = f_cur - prev_f
        step = np.where(
            np.abs(denom) > 0, f_cur * (alpha0 - prev_a) / np.where(denom == 0, 1, denom), 0.0
        )
        new_a = alpha0 - step
        prev_a, prev_f = alpha0, f_cur
        alpha0 = new_a
        f_cur = integrate(alpha0)[0] - phi0
        if np.all(np.abs(f_cur) < 1e-14):
            break

    # final integration capturing the path + arc length via Simpson
    _, path = integrate(alpha0, want_path=True)
    # ds/dlam = N cos(phi) / sin(alpha); recover alpha along path via
    # Clairaut on the ellipsoid: sin(alpha) * N * cos(phi) = const
    #   (geodesic invariant in geographic lat on the ellipsoid uses the
    #    reduced latitude; equivalently integrate alpha alongside — we
    #    re-integrate alpha cheaply here)
    alpha = alpha0.copy()
    sin_a_path = np.empty_like(path)
    sin_a_path[0] = np.sin(alpha)
    phi = phi0.copy()
    for i in range(n_steps):
        k1a = np.sin(phi)
        k1p = dphi_dlam(phi, alpha)
        p2 = phi + 0.5 * h * k1p
        a2 = alpha + 0.5 * h * k1a
        k2p = dphi_dlam(p2, a2)
        k2a = np.sin(p2)
        p3 = phi + 0.5 * h * k2p
        a3 = alpha + 0.5 * h * k2a
        k3p = dphi_dlam(p3, a3)
        k3a = np.sin(p3)
        p4 = phi + h * k3p
        a4 = alpha + h * k3a
        k4p = dphi_dlam(p4, a4)
        k4a = np.sin(p4)
        phi = phi + h / 6.0 * (k1p + 2 * k2p + 2 * k3p + k4p)
        alpha = alpha + h / 6.0 * (k1a + 2 * k2a + 2 * k3a + k4a)
        sin_a_path[i + 1] = np.sin(alpha)

    n_of_phi = A_WGS84 / np.sqrt(_w2(path))
    ds_dlam = n_of_phi * np.cos(path) / sin_a_path
    length = _simpson(ds_dlam, h)
    return path, length


def _simpson(y, h):
    """Composite Simpson along axis 0 (y has odd node count)."""
    n = y.shape[0] - 1
    w = np.ones(y.shape[0])
    w[1:-1:2] = 4.0
    w[2:-1:2] = 2.0
    return (w[:, *([None] * (y.ndim - 1))] * y).sum(axis=0) * h / 3.0


def rect_geodesic_perimeter(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Perimeter of the rect (corners connected by geodesics), degrees in."""
    lam = np.radians(np.abs(np.asarray(lon2, np.float64) - lon1))
    p1 = np.radians(np.asarray(lat1, np.float64))
    p2 = np.radians(np.asarray(lat2, np.float64))
    _, s_bottom = _geodesic_same_lat(p1, lam)
    _, s_top = _geodesic_same_lat(p2, lam)
    m = meridian_arc(np.minimum(p1, p2), np.maximum(p1, p2))
    out = s_bottom + s_top + 2.0 * m
    return out if out.shape != (1,) else float(out[0])


def rect_geodesic_area(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Unsigned area of the rect with geodesic edges (degrees in, m^2 out).

    A = [F(path_top) - F(path_bottom)] integrated over lambda; the
    meridian edges contribute nothing (dlam = 0).
    """
    lam = np.radians(np.abs(np.asarray(lon2, np.float64) - lon1))
    p_lo = np.radians(np.minimum(np.asarray(lat1, np.float64), lat2))
    p_hi = np.radians(np.maximum(np.asarray(lat1, np.float64), lat2))
    path_lo, _ = _geodesic_same_lat(p_lo, lam)
    path_hi, _ = _geodesic_same_lat(p_hi, lam)
    h = np.atleast_1d(lam) / (path_lo.shape[0] - 1)
    area = _simpson(area_band_fn(path_hi) - area_band_fn(path_lo), h)
    area = np.abs(area)
    return area if area.shape != (1,) else float(area[0])
