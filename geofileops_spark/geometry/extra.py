"""Extra geometry kernels: affine warp, sliver test, line merge.

- ``affine_transform``: the engine's ``warp`` core (geofileops
  ``geoops.py:1561`` -> ``_geoops_ogr.py:80-110`` supports affine/poly/TPS
  via GCPs; we implement the affine order-1 case exactly and leave
  higher orders to ``apply_vectorized``).
- ``is_sliver``: geofileops' sliver predicate (``_geoops_sql.py:4059-4130``):
  a polygon is a sliver when its average width ``2*area/perimeter`` is
  below tolerance AND it collapses under ``reduce_precision``.
- ``line_merge``: ST_LineMerge (used by dissolve on line layers,
  ``_geoops_sql.py:4765-4771``): join linestrings sharing endpoints.
"""

from __future__ import annotations

import numpy as np

from .geom import (
    GEOMETRYCOLLECTION,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    Geometry,
)


def _affine_coords(arr: np.ndarray, m) -> np.ndarray:
    a, b, c, d, e, f = m
    out = np.empty_like(arr)
    out[:, 0] = a * arr[:, 0] + b * arr[:, 1] + c
    out[:, 1] = d * arr[:, 0] + e * arr[:, 1] + f
    return out


def affine_transform(geom: Geometry, matrix) -> Geometry:
    """Apply (a, b, c, d, e, f): x' = a*x + b*y + c; y' = d*x + e*y + f."""
    t, dd = geom.typ, geom.data
    if t == POINT:
        if geom.is_empty():
            return geom
        return Geometry(POINT, _affine_coords(dd.reshape(1, 2), matrix)[0])
    if t in (MULTIPOINT, LINESTRING):
        return Geometry(t, _affine_coords(np.asarray(dd), matrix) if len(dd) else dd)
    if t in (MULTILINESTRING, POLYGON):
        return Geometry(t, [_affine_coords(x, matrix) for x in dd])
    if t == MULTIPOLYGON:
        return Geometry(t, [[_affine_coords(r, matrix) for r in p] for p in dd])
    return Geometry(GEOMETRYCOLLECTION, [affine_transform(g, matrix) for g in dd])


def is_sliver(geom: Geometry, tolerance: float) -> bool:
    """True when every polygon part is a sliver (avg width < tolerance
    and precision-reduction collapses it); non-areal -> False."""
    from .kernels import area, length, set_precision

    polys = geom.polygons()
    if not polys:
        return False
    a = area(geom)
    p = length(geom)
    if p <= 0:
        return True
    if 2.0 * a / p >= tolerance:
        return False
    reduced = set_precision(geom, tolerance)
    return reduced is None or reduced.is_empty()


def line_merge(geom: Geometry) -> Geometry:
    """Join linestrings that share endpoints into maximal paths."""
    lines = [np.asarray(ls) for ls in geom.lines() if len(ls) >= 2]
    if not lines:
        return geom
    merged: list[np.ndarray] = []
    pool = list(lines)
    while pool:
        cur = pool.pop()
        changed = True
        while changed:
            changed = False
            for i, other in enumerate(pool):
                if np.allclose(cur[-1], other[0]):
                    cur = np.vstack([cur, other[1:]])
                elif np.allclose(cur[-1], other[-1]):
                    cur = np.vstack([cur, other[::-1][1:]])
                elif np.allclose(cur[0], other[-1]):
                    cur = np.vstack([other, cur[1:]])
                elif np.allclose(cur[0], other[0]):
                    cur = np.vstack([other[::-1], cur[1:]])
                else:
                    continue
                pool.pop(i)
                changed = True
                break
        merged.append(cur)
    if len(merged) == 1:
        return Geometry(LINESTRING, merged[0])
    return Geometry(MULTILINESTRING, merged)


def coords_transform(geom: Geometry, fn) -> Geometry:
    """Apply an arbitrary vectorized coordinate mapping ``fn: (n,2)->(n,2)``
    to every vertex (the generic core under polynomial / TPS warps)."""
    t, dd = geom.typ, geom.data
    if t == POINT:
        if geom.is_empty():
            return geom
        return Geometry(POINT, fn(dd.reshape(1, 2))[0])
    if t in (MULTIPOINT, LINESTRING):
        return Geometry(t, fn(np.asarray(dd)) if len(dd) else dd)
    if t in (MULTILINESTRING, POLYGON):
        return Geometry(t, [fn(x) for x in dd])
    if t == MULTIPOLYGON:
        return Geometry(t, [[fn(r) for r in p] for p in dd])
    return Geometry(GEOMETRYCOLLECTION, [coords_transform(g, fn) for g in dd])


def _poly_terms(x: np.ndarray, y: np.ndarray, order: int) -> np.ndarray:
    """Design matrix columns x^i * y^j for i+j <= order (GDAL GCP
    polynomial model)."""
    cols = []
    for deg in range(order + 1):
        for i in range(deg, -1, -1):
            j = deg - i
            cols.append((x ** i) * (y ** j))
    return np.stack(cols, axis=1)


def fit_gcp_polynomial(gcps: list, order: int | None = None):
    """Least-squares 2-D polynomial from GCPs ((sx, sy, dx, dy[, z])
    tuples, the reference's warp input — ``_geoops_ogr.py:80-110``).
    Returns a vectorized (n,2)->(n,2) mapping."""
    sx = np.asarray([g[0] for g in gcps], dtype=np.float64)
    sy = np.asarray([g[1] for g in gcps], dtype=np.float64)
    dx = np.asarray([g[2] for g in gcps], dtype=np.float64)
    dy = np.asarray([g[3] for g in gcps], dtype=np.float64)
    if order is None:
        # GDAL-style: the highest order the GCP count supports (max 3)
        order = 3 if len(gcps) >= 10 else 2 if len(gcps) >= 6 else 1
    A = _poly_terms(sx, sy, order)
    cx, *_ = np.linalg.lstsq(A, dx, rcond=None)
    cy, *_ = np.linalg.lstsq(A, dy, rcond=None)

    def mapping(arr: np.ndarray) -> np.ndarray:
        T = _poly_terms(arr[:, 0], arr[:, 1], order)
        return np.stack([T @ cx, T @ cy], axis=1)

    return mapping


def fit_gcp_tps(gcps: list):
    """Thin-plate-spline mapping from GCPs (the reference's
    ``algorithm="tps"``): standard TPS system with kernel
    U(r) = r^2 log r^2."""
    src = np.asarray([[g[0], g[1]] for g in gcps], dtype=np.float64)
    dst = np.asarray([[g[2], g[3]] for g in gcps], dtype=np.float64)
    n = len(src)

    def U(r2: np.ndarray) -> np.ndarray:
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.where(r2 > 0, r2 * np.log(r2), 0.0)

    d2 = ((src[:, None, :] - src[None, :, :]) ** 2).sum(axis=2)
    K = U(d2)
    P = np.hstack([np.ones((n, 1)), src])
    L = np.zeros((n + 3, n + 3))
    L[:n, :n] = K
    L[:n, n:] = P
    L[n:, :n] = P.T
    rhs = np.zeros((n + 3, 2))
    rhs[:n] = dst
    sol = np.linalg.solve(L, rhs)
    w, a = sol[:n], sol[n:]

    def mapping(arr: np.ndarray) -> np.ndarray:
        r2 = ((arr[:, None, :] - src[None, :, :]) ** 2).sum(axis=2)
        base = np.hstack([np.ones((len(arr), 1)), arr])
        return U(r2) @ w + base @ a

    return mapping
