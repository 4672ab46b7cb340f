"""Split a geometry by a blade (twin of the reference's ``gfo_split``
SQL UDF, ``/root/reference/geofileops/util/_sqlite_userdefined.py:158-214``,
which delegates to shapely.ops.split).

Semantics (matching the reference):
- polygon split by a LINESTRING blade -> the faces induced by cutting
  the polygon along the blade (parts where the blade fully crosses;
  dangling blade ends are ignored);
- line split by a line blade -> sub-lines between crossings;
- empty/None blade returns the input; a split that removes everything
  returns None.

Implementation: planar-subdivision face extraction. The polygon
boundary (noded at blade crossings) contributes one directed edge per
segment (region on the left: CCW exterior / CW holes); interior blade
pieces contribute BOTH directions; faces are walked with the
most-counterclockwise-turn rule and positive-area faces are the parts.
The same noding + walking machinery as the union edge-weld
(clip._weld_pair), driven from computed intersection points instead of
shared vertices.
"""

from __future__ import annotations

import math

import numpy as np

from .geom import (
    LINESTRING,
    MULTILINESTRING,
    MULTIPOLYGON,
    POLYGON,
    Geometry,
)
from .kernels import points_in_polygon, ring_signed_area


def _seg_params(sa, ea, sb, eb):
    """All (i, j, t, u) intersections between segment sets, endpoint
    touches included (t/u in [0, 1])."""
    d1 = ea - sa
    d2 = eb - sb
    denom = d1[:, None, 0] * d2[None, :, 1] - d1[:, None, 1] * d2[None, :, 0]
    ex = sb[None, :, 0] - sa[:, None, 0]
    ey = sb[None, :, 1] - sa[:, None, 1]
    scale = np.maximum(np.abs(d1).sum(axis=1), 1e-300)[:, None] * np.maximum(
        np.abs(d2).sum(axis=1), 1e-300
    )[None, :]
    nz = np.abs(denom) > 1e-14 * scale
    safe = np.where(nz, denom, 1.0)
    t = (ex * d2[None, :, 1] - ey * d2[None, :, 0]) / safe
    u = (ex * d1[:, None, 1] - ey * d1[:, None, 0]) / safe
    tol = 1e-9
    hit = nz & (t >= -tol) & (t <= 1 + tol) & (u >= -tol) & (u <= 1 + tol)
    ii, jj = np.nonzero(hit)
    return ii, jj, np.clip(t[ii, jj], 0.0, 1.0), np.clip(u[ii, jj], 0.0, 1.0)


def _split_path(path: np.ndarray, cuts: dict[int, list[tuple[float, tuple]]]):
    """Insert cut points (seg index -> [(t, point)]) into a path."""
    out = [path[0]]
    for i in range(len(path) - 1):
        for t, pt in sorted(cuts.get(i, [])):
            if 1e-12 < t < 1 - 1e-12:
                out.append(np.asarray(pt))
        out.append(path[i + 1])
    res = [out[0]]
    for p in out[1:]:
        if abs(p[0] - res[-1][0]) > 1e-12 or abs(p[1] - res[-1][1]) > 1e-12:
            res.append(p)
    return np.asarray(res)


def _key(p) -> tuple:
    return (round(float(p[0]), 9), round(float(p[1]), 9))


def _walk_faces(edges: list[tuple[tuple, tuple]]) -> list[np.ndarray]:
    """Closed rings from directed edges (most-CCW-turn successor rule)."""
    outgoing: dict[tuple, list[tuple]] = {}
    for a, b in edges:
        outgoing.setdefault(a, []).append(b)
    used: set[tuple] = set()
    rings = []
    for a, b in edges:
        if (a, b) in used:
            continue
        ring = [a, b]
        used.add((a, b))
        prv, cur = a, b
        ok = True
        for _ in range(len(edges) + 1):
            if cur == ring[0]:
                break
            outs = [w for w in outgoing.get(cur, []) if (cur, w) not in used]
            if not outs:
                ok = False
                break
            if len(outs) == 1:
                nxt = outs[0]
            else:
                din = math.atan2(cur[1] - prv[1], cur[0] - prv[0])

                def turn(w):
                    ang = math.atan2(w[1] - cur[1], w[0] - cur[0]) - din + math.pi
                    # exact reversal (U-turn) maps to 0 = least preferred
                    while ang < 0:
                        ang += 2 * math.pi
                    while ang >= 2 * math.pi:
                        ang -= 2 * math.pi
                    return ang

                nxt = max(outs, key=turn)
            used.add((cur, nxt))
            ring.append(nxt)
            prv, cur = cur, nxt
        if ok and cur == ring[0]:
            rings.append(np.asarray(ring, dtype=np.float64))
    return rings


def _split_polygon(rings: list[np.ndarray], blade_paths: list[np.ndarray]):
    """One polygon (closed rings, exterior first) split by line paths.
    Returns list of polygons (each a list of rings) or None on a
    configuration this construction can't handle (caller returns the
    input unchanged, like the reference does on split failures)."""
    from .clip import _ccw, _cw

    ext = _ccw(rings[0])
    holes = [_cw(h) for h in rings[1:]]
    ring_list = [ext] + holes

    # --- node every ring and every blade path at mutual crossings
    ring_cuts: list[dict] = [dict() for _ in ring_list]
    blade_cuts: list[dict] = [dict() for _ in blade_paths]
    for ri, ring in enumerate(ring_list):
        rs, re_ = ring[:-1], ring[1:]
        for bi, bp in enumerate(blade_paths):
            bs, be = bp[:-1], bp[1:]
            ii, jj, t, u = _seg_params(rs, re_, bs, be)
            for k in range(len(ii)):
                pt = tuple(rs[ii[k]] + t[k] * (re_[ii[k]] - rs[ii[k]]))
                ring_cuts[ri].setdefault(int(ii[k]), []).append((float(t[k]), pt))
                blade_cuts[bi].setdefault(int(jj[k]), []).append((float(u[k]), pt))
    noded_rings = [
        _split_path(r, ring_cuts[i]) for i, r in enumerate(ring_list)
    ]
    noded_blades = [
        _split_path(b, blade_cuts[i]) for i, b in enumerate(blade_paths)
    ]

    # --- blade sub-edges whose midpoint lies strictly inside the polygon
    closed = [np.vstack([r, r[:1]]) if not np.array_equal(r[0], r[-1]) else r
              for r in noded_rings]
    blade_edges: list[tuple[tuple, tuple]] = []
    for b in noded_blades:
        mids = (b[:-1] + b[1:]) / 2.0
        cls = points_in_polygon(mids, closed)
        for i in range(len(b) - 1):
            if cls[i] == 2:
                blade_edges.append((_key(b[i]), _key(b[i + 1])))
            elif cls[i] == 1:
                return None  # blade runs along the boundary: degenerate

    if not blade_edges:
        return [rings]  # no interior crossing: unchanged

    # --- drop dangling blade edges (endpoints not shared with anything)
    boundary_edges: list[tuple[tuple, tuple]] = []
    for r in closed:
        for i in range(len(r) - 1):
            a, b = _key(r[i]), _key(r[i + 1])
            if a != b:
                boundary_edges.append((a, b))
    changed = True
    while changed and blade_edges:
        deg: dict[tuple, int] = {}
        for a, b in blade_edges + boundary_edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = []
        changed = False
        for a, b in blade_edges:
            if deg[a] < 2 or deg[b] < 2:
                changed = True
            else:
                keep.append((a, b))
        blade_edges = keep
    if not blade_edges:
        return [rings]

    # --- walk faces: boundary single-direction + blade both directions
    edges = boundary_edges + blade_edges + [(b, a) for a, b in blade_edges]
    faces = _walk_faces(edges)
    parts = [f for f in faces if ring_signed_area(f) > 1e-12]
    if not parts:
        return None
    # conservation: faces partition the polygon area
    area_in = abs(ring_signed_area(np.vstack([ext, ext[:1]])))
    for h in holes:
        area_in -= abs(ring_signed_area(np.vstack([h, h[:1]])))
    area_out = sum(ring_signed_area(f) for f in parts)
    # faces that wrap a hole traverse the (CW) hole edges, so hole area
    # is already excluded from the walked faces
    if abs(area_out - area_in) > 1e-6 * max(area_in, 1.0):
        return None
    return [[f] for f in parts]


def split_geom(geom: Geometry, blade: Geometry) -> Geometry | None:
    """gfo_split twin: split ``geom`` by ``blade``; None when everything
    was removed, the input when the blade misses / is empty."""
    if geom is None or geom.is_empty():
        return geom
    if blade is None or blade.is_empty():
        return geom
    blade_paths = [p for p in blade.lines() if len(p) >= 2]
    if not blade_paths:
        return geom
    if geom.dim() == 2:
        out_polys: list[list[np.ndarray]] = []
        for rings in geom.polygons():
            r = _split_polygon(rings, blade_paths)
            if r is None:
                out_polys.append(rings)  # unsplittable part passes through
            else:
                out_polys.extend(
                    [[np.vstack([q, q[:1]]) if not np.array_equal(q[0], q[-1])
                      else q for q in p] for p in r]
                )
        if not out_polys:
            return None
        return Geometry(MULTIPOLYGON, out_polys)
    if geom.dim() == 1:
        # line split by line: cut each path at blade crossings
        out_lines: list[np.ndarray] = []
        for path in geom.lines():
            cuts: dict[int, list] = {}
            ps, pe = path[:-1], path[1:]
            for bp in blade_paths:
                ii, jj, t, u = _seg_params(ps, pe, bp[:-1], bp[1:])
                for k in range(len(ii)):
                    pt = tuple(ps[ii[k]] + t[k] * (pe[ii[k]] - ps[ii[k]]))
                    cuts.setdefault(int(ii[k]), []).append((float(t[k]), pt))
            noded = _split_path(path, cuts)
            cut_keys = {
                _key(pt) for lst in cuts.values() for _, pt in lst
            }
            cur = [noded[0]]
            for p in noded[1:]:
                cur.append(p)
                if _key(p) in cut_keys:
                    if len(cur) >= 2:
                        out_lines.append(np.asarray(cur))
                    cur = [p]
            if len(cur) >= 2:
                out_lines.append(np.asarray(cur))
        if not out_lines:
            return None
        return Geometry(MULTILINESTRING, out_lines)
    return geom  # points are never split
