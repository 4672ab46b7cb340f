"""Single-geometry transforms: buffer, convex hull, simplify, subdivide.

From-scratch equivalents of the reference's per-row geometry operations
(geofileops ``geoops.py:637-854`` buffer with endcap/join styles,
``:908-982`` convexhull, ``:1787`` simplify,
``util/_sqlite_userdefined.py:217-270`` gfo_subdivide).

Buffers are polygonal approximations built from edge rectangles + vertex
arcs unioned with the clip module (GEOS builds the same offset curve
analytically; we compose it from pieces, which matches to within the arc
discretization the reference also has via ``quadrantsegments``).
"""

from __future__ import annotations

import numpy as np

from .clip import mp_difference, union_all_polys, _geom_to_mp, _mp_to_geom
from .geom import (
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    Geometry,
)
from .kernels import EPS, ring_signed_area


# ------------------------------------------------------------------- buffer
def _circle(center, r, quad_segs: int) -> np.ndarray:
    n = max(4, 4 * quad_segs)
    ang = np.linspace(0.0, 2 * np.pi, n, endpoint=False)
    ring = np.stack(
        [center[0] + r * np.cos(ang), center[1] + r * np.sin(ang)], axis=1
    )
    return np.vstack([ring, ring[:1]])


def _square(center, r) -> np.ndarray:
    x, y = center
    return np.array(
        [[x - r, y - r], [x + r, y - r], [x + r, y + r], [x - r, y + r], [x - r, y - r]]
    )


def _segment_rect(p, q, d, extend_start=0.0, extend_end=0.0) -> np.ndarray | None:
    v = q - p
    L = np.hypot(v[0], v[1])
    if L < EPS:
        return None
    u = v / L
    n = np.array([-u[1], u[0]]) * d
    p2 = p - u * extend_start
    q2 = q + u * extend_end
    return np.array([p2 + n, q2 + n, q2 - n, p2 - n, p2 + n])


def _path_sausage(
    path: np.ndarray,
    d: float,
    quad_segs: int,
    cap_style: str,
    join_style: str,
    closed: bool,
) -> list[np.ndarray]:
    """Offset pieces (rings) for one polyline: rectangles per edge +
    join/cap shapes per vertex."""
    pieces: list[np.ndarray] = []
    n = len(path)
    for i in range(n - 1):
        ext_s = ext_e = 0.0
        if not closed and cap_style == "square":
            if i == 0:
                ext_s = d
            if i == n - 2:
                ext_e = d
        rect = _segment_rect(path[i], path[i + 1], d, ext_s, ext_e)
        if rect is not None:
            pieces.append(rect)
    # joins at interior vertices (and all vertices when closed)
    idxs = range(n - 1) if closed else range(1, n - 1)
    for i in idxs:
        if join_style == "mitre":
            # mitre approximated with a square patch bounded by mitre_limit
            pieces.append(_square(path[i], d * 1.0))
        else:
            pieces.append(_circle(path[i], d, quad_segs))
    # caps at the two endpoints
    if not closed and cap_style == "round":
        pieces.append(_circle(path[0], d, quad_segs))
        pieces.append(_circle(path[-1], d, quad_segs))
    return pieces


def buffer_geom(
    geom: Geometry,
    distance: float,
    quad_segs: int = 8,
    cap_style: str = "round",
    join_style: str = "round",
    mitre_limit: float = 5.0,
    single_sided: bool = False,
) -> Geometry:
    """ST_Buffer. Negative distance erodes polygons (keeps polygons only —
    matching the reference's ``ST_CollectionExtract(ST_Buffer(..),3)`` for
    distance<0, geofileops ``_geoops_sql.py:74-78``)."""
    if geom is None or geom.is_empty():
        return Geometry.empty(MULTIPOLYGON)
    if abs(distance) < EPS:
        return geom if geom.dim() == 2 else Geometry.empty(MULTIPOLYGON)

    if distance < 0:
        d = -distance
        polys = _geom_to_mp(geom)
        if not polys:
            return Geometry.empty(MULTIPOLYGON)
        # erosion: P minus a sausage around its boundary rings
        pieces: list[np.ndarray] = []
        for rings in polys:
            for ring in rings:
                pieces.extend(
                    _path_sausage(ring, d, quad_segs, "round", "round", closed=True)
                )
        # subtract each sausage piece individually: pre-unioning the
        # sausage can drop pieces on collinear-degenerate retries, leaving
        # boundary strips un-eroded
        eroded = mp_difference(polys, [[p if ring_signed_area(p) > 0 else p[::-1].copy()] for p in pieces])
        return _mp_to_geom(eroded)

    d = float(distance)
    pieces = []
    # points -> discs
    pts = geom.points()
    for i in range(len(pts)):
        if cap_style == "square":
            pieces.append(_square(pts[i], d))
        else:
            pieces.append(_circle(pts[i], d, quad_segs))
    # lines -> sausages
    for ls in geom.lines():
        if single_sided:
            for i in range(len(ls) - 1):
                v = ls[i + 1] - ls[i]
                L = np.hypot(v[0], v[1])
                if L < EPS:
                    continue
                u = v / L
                nvec = np.array([-u[1], u[0]]) * d
                if d < 0:
                    nvec = -nvec
                pieces.append(
                    np.array(
                        [ls[i], ls[i + 1], ls[i + 1] + nvec, ls[i] + nvec, ls[i]]
                    )
                )
        else:
            pieces.extend(
                _path_sausage(ls, d, quad_segs, cap_style, join_style, closed=False)
            )
    # polygons -> original + boundary sausage
    base = _geom_to_mp(geom)
    for rings in base:
        for ring in rings:
            pieces.extend(
                _path_sausage(ring, d, quad_segs, "round", join_style, closed=True)
            )
    all_polys = list(base) + [[p if ring_signed_area(p) > 0 else p[::-1].copy()] for p in pieces]
    return _mp_to_geom(union_all_polys(all_polys))


# -------------------------------------------------------------- convex hull
def convex_hull(geom: Geometry) -> Geometry:
    """Andrew's monotone chain."""
    pts = geom.coords()
    pts = pts[~np.isnan(pts[:, 0])]
    if len(pts) == 0:
        return Geometry.empty(POLYGON)
    pts = np.unique(pts, axis=0)
    if len(pts) == 1:
        return Geometry(POINT, pts[0])
    if len(pts) == 2:
        return Geometry(LINESTRING, pts)
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    P = pts[order]

    def half(points):
        out = []
        for p in points:
            while (
                len(out) >= 2
                and (out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                - (out[-1][1] - out[-2][1]) * (p[0] - out[-2][0])
                <= 0
            ):
                out.pop()
            out.append(p)
        return out

    lower = half(P)
    upper = half(P[::-1])
    hull = np.asarray(lower[:-1] + upper[:-1])
    if len(hull) < 3:
        return Geometry(LINESTRING, np.asarray([P[0], P[-1]]))
    ring = np.vstack([hull, hull[:1]])
    if ring_signed_area(ring) < 0:
        ring = ring[::-1].copy()
    return Geometry(POLYGON, [ring])


# ----------------------------------------------------------------- simplify
def _rdp_mask(path: np.ndarray, tol: float) -> np.ndarray:
    """Ramer-Douglas-Peucker keep-mask (iterative)."""
    n = len(path)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = path[j] - path[i]
        L = np.hypot(seg[0], seg[1])
        pts = path[i + 1 : j]
        if L < EPS:
            dist = np.hypot(pts[:, 0] - path[i][0], pts[:, 1] - path[i][1])
        else:
            dist = (
                np.abs(
                    seg[0] * (path[i][1] - pts[:, 1])
                    - seg[1] * (path[i][0] - pts[:, 0])
                )
                / L
            )
        k = int(np.argmax(dist))
        if dist[k] > tol:
            keep[i + 1 + k] = True
            stack.append((i, i + 1 + k))
            stack.append((i + 1 + k, j))
    return keep


def _vw_path(path: np.ndarray, tol: float) -> np.ndarray:
    """Visvalingam-Whyatt: drop vertices whose triangle area < tol^2/2."""
    pts = list(map(tuple, path))
    min_area = tol * tol / 2.0
    changed = True
    while changed and len(pts) > 3:
        changed = False
        areas = []
        for i in range(1, len(pts) - 1):
            a, b, c = pts[i - 1], pts[i], pts[i + 1]
            areas.append(
                abs((b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])) / 2
            )
        if not areas:
            break
        k = int(np.argmin(areas))
        if areas[k] < min_area:
            pts.pop(k + 1)
            changed = True
    return np.asarray(pts)


def simplify_geom(geom: Geometry, tolerance: float, algorithm: str = "rdp") -> Geometry | None:
    """ST_SimplifyPreserveTopology-style per-part simplification
    (geofileops ``_geoops_sql.py:477-524``; RDP/VW per
    ``util/_geometry_util.py:10-38``). Parts that collapse are dropped."""
    if geom is None or geom.is_empty() or tolerance is None:
        return geom

    def simp(path, closed):
        if algorithm == "vw":
            out = _vw_path(path, tolerance)
        else:
            out = path[_rdp_mask(path, tolerance)]
        if closed:
            if len(out) < 4 or abs(ring_signed_area(out)) < EPS:
                return None
        elif len(out) < 2:
            return None
        return out

    t = geom.typ
    if t in (POINT, MULTIPOINT):
        return geom
    if t in (LINESTRING, MULTILINESTRING):
        parts = [simp(ls, False) for ls in geom.lines()]
        parts = [p for p in parts if p is not None]
        if not parts:
            return None
        if t == LINESTRING and len(parts) == 1:
            return Geometry(LINESTRING, parts[0])
        return Geometry(MULTILINESTRING, parts)
    polys_out = []
    for rings in geom.polygons():
        rings_new = []
        for i, ring in enumerate(rings):
            r = simp(ring, True)
            if r is None:
                if i == 0:
                    rings_new = None
                    break
                continue
            rings_new.append(r)
        if rings_new:
            polys_out.append(rings_new)
    if not polys_out:
        return None
    if t == POLYGON and len(polys_out) == 1:
        return Geometry(POLYGON, polys_out[0])
    return Geometry(MULTIPOLYGON, polys_out)


# ---------------------------------------------------------------- subdivide
def subdivide(geom: Geometry, max_coords: int = 2000) -> list[Geometry]:
    """Split complex geometries into parts of <= max_coords vertices by
    recursive bbox halving (the reference subdivides complex inputs before
    overlays, ``_geoops_sql.py:1358-1444``, defaults per op in
    ``helpers/_options.py:625-765``)."""
    from .clip import intersection as g_intersection
    from .kernels import bounds as g_bounds

    if geom is None or geom.is_empty() or geom.num_coords() <= max_coords:
        return [geom]
    out: list[Geometry] = []
    stack = [geom]
    guard = 0
    while stack and guard < 10000:
        guard += 1
        g = stack.pop()
        if g.num_coords() <= max_coords:
            out.append(g)
            continue
        minx, miny, maxx, maxy = g_bounds(g)
        if maxx - minx >= maxy - miny:
            midx = (minx + maxx) / 2.0
            left = Geometry.box(minx - 1, miny - 1, midx, maxy + 1)
            right = Geometry.box(midx, miny - 1, maxx + 1, maxy + 1)
        else:
            midy = (miny + maxy) / 2.0
            left = Geometry.box(minx - 1, miny - 1, maxx + 1, midy)
            right = Geometry.box(minx - 1, midy, maxx + 1, maxy + 1)
        halves = []
        for boxg in (left, right):
            piece = g_intersection(g, boxg)
            if piece is not None and not piece.is_empty():
                halves.append(piece)
        if len(halves) <= 1:
            out.append(g)  # cannot split further
        else:
            stack.extend(halves)
    out.extend(stack)
    return out
