"""Spatial predicates and an approximate DE-9IM ``relate`` implementation.

The reference compiles its ``join_by_location`` query mini-language into
SQLite ``ST_Relate``/``ST_RelateMatch`` calls or specialized ``ST_<pred>``
functions (geofileops ``_geoops_sql.py:2345-2578``). Here the same named
predicates {equals, touches, within, overlaps, crosses, intersects,
contains, covers, coveredby, disjoint} and raw 9-char DE-9IM masks are
evaluated against a from-scratch intersection-matrix computation.

The matrix is exact for point/line/polygon vertex-and-crossing structure
and uses edge-midpoint sampling for coverage entries (IE/BE/EB), which is
robust for non-pathological inputs (documented approximation).
"""

from __future__ import annotations

import numpy as np

from .geom import Geometry
from .kernels import (
    EPS,
    any_segment_intersection,
    bbox_intersects,
    bounds,
    geom_segments,
    points_in_multipolygon,
    points_to_segments_dist,
    ring_signed_area,
    segments_cross,
)

NAMED_PREDICATES = (
    "equals",
    "touches",
    "within",
    "overlaps",
    "crosses",
    "intersects",
    "contains",
    "covers",
    "coveredby",
    "disjoint",
)

_TOL = 1e-9


# ----------------------------------------------------------------- utilities
def line_boundary_points(geom: Geometry) -> np.ndarray:
    """Boundary of a (multi)linestring = endpoints occurring an odd number
    of times (mod-2 rule)."""
    from collections import Counter

    cnt: Counter = Counter()
    for ls in geom.lines():
        if len(ls) < 2:
            continue
        if np.allclose(ls[0], ls[-1]):
            continue  # closed ring: no boundary
        cnt[(round(ls[0, 0], 9), round(ls[0, 1], 9))] += 1
        cnt[(round(ls[-1, 0], 9), round(ls[-1, 1], 9))] += 1
    pts = [k for k, v in cnt.items() if v % 2 == 1]
    return np.array(pts, dtype=np.float64) if pts else np.empty((0, 2))


def classify_points_vs_line(pts: np.ndarray, geom: Geometry) -> np.ndarray:
    """0 = off the line, 1 = at a boundary endpoint, 2 = on line interior."""
    if len(pts) == 0:
        return np.empty(0, dtype=np.int8)
    s, e = geom_segments(geom)
    if len(s) == 0:
        return np.zeros(len(pts), dtype=np.int8)
    d = points_to_segments_dist(pts, s, e)
    on = d <= _TOL
    res = np.where(on, 2, 0).astype(np.int8)
    bpts = line_boundary_points(geom)
    if len(bpts):
        diff = pts[:, None, :] - bpts[None, :, :]
        at_b = (np.sqrt((diff * diff).sum(axis=2)) <= _TOL).any(axis=1)
        res[on & at_b] = 1
    return res


def classify_points_vs_points(pts: np.ndarray, geom: Geometry) -> np.ndarray:
    """0 = not coincident, 2 = coincides with a point of geom."""
    gp = geom.points()
    if len(pts) == 0:
        return np.empty(0, dtype=np.int8)
    if len(gp) == 0:
        return np.zeros(len(pts), dtype=np.int8)
    diff = pts[:, None, :] - gp[None, :, :]
    hit = (np.sqrt((diff * diff).sum(axis=2)) <= _TOL).any(axis=1)
    return np.where(hit, 2, 0).astype(np.int8)


def classify(pts: np.ndarray, geom: Geometry) -> np.ndarray:
    """Classify points vs geom closure: 0 exterior, 1 boundary, 2 interior."""
    d = geom.dim()
    if d == 2:
        return points_in_multipolygon(pts, geom)
    if d == 1:
        return classify_points_vs_line(pts, geom)
    return classify_points_vs_points(pts, geom)


def interior_point(rings: list[np.ndarray]) -> np.ndarray | None:
    """A point guaranteed strictly inside a polygon (scanline-midpoint,
    same idea as 'representative point')."""
    if not rings:
        return None
    ext = rings[0]
    ys = np.unique(ext[:, 1])
    # scan a few candidate rows between distinct vertex ys
    cand_ys = []
    miny, maxy = ys.min(), ys.max()
    cand_ys.append((miny + maxy) / 2.0)
    for i in range(len(ys) - 1):
        cand_ys.append((ys[i] + ys[i + 1]) / 2.0)
    best = None
    best_w = -1.0
    for y in cand_ys:
        xs = []
        for ring in rings:
            x1, y1 = ring[:-1, 0], ring[:-1, 1]
            x2, y2 = ring[1:, 0], ring[1:, 1]
            cond = (y1 > y) != (y2 > y)
            if not cond.any():
                continue
            with np.errstate(divide="ignore", invalid="ignore"):
                xi = x1[cond] + (y - y1[cond]) * (x2[cond] - x1[cond]) / (
                    y2[cond] - y1[cond]
                )
            xs.extend(xi.tolist())
        xs = sorted(xs)
        for j in range(0, len(xs) - 1, 2):
            w = xs[j + 1] - xs[j]
            if w > best_w:
                best_w = w
                best = np.array([(xs[j] + xs[j + 1]) / 2.0, y])
        if best_w > EPS:
            break
    return best


def geom_interior_points(geom: Geometry) -> np.ndarray:
    """One representative interior point per polygon part."""
    pts = []
    for rings in geom.polygons():
        p = interior_point(rings)
        if p is not None:
            pts.append(p)
    return np.vstack(pts) if pts else np.empty((0, 2))


def edge_midpoints(geom: Geometry) -> np.ndarray:
    s, e = geom_segments(geom)
    if len(s) == 0:
        return np.empty((0, 2))
    return (s + e) / 2.0


def _collinear_overlap(ga: Geometry, gb: Geometry) -> bool:
    """Any pair of segments sharing a collinear overlap of positive length."""
    sa, ea = geom_segments(ga)
    sb, eb = geom_segments(gb)
    if len(sa) == 0 or len(sb) == 0:
        return False
    # midpoint of each a-segment on b's segments AND direction parallel
    for i in range(len(sa)):
        d1 = ea[i] - sa[i]
        L1 = np.hypot(d1[0], d1[1])
        if L1 < EPS:
            continue
        d2 = eb - sb
        L2 = np.hypot(d2[:, 0], d2[:, 1])
        cross = np.abs(d1[0] * d2[:, 1] - d1[1] * d2[:, 0])
        parallel = cross <= _TOL * np.maximum(L1 * L2, EPS) * 1e3
        if not parallel.any():
            continue
        # overlap test: project b endpoints on a-segment axis, require
        # positive-length 1-D overlap and zero perpendicular offset
        u = d1 / L1
        perp0 = np.abs((sb - sa[i]) @ np.array([-u[1], u[0]]))
        on_line = parallel & (perp0 <= _TOL * 1e3)
        if not on_line.any():
            continue
        t0 = ((sb - sa[i]) @ u) / L1
        t1 = ((eb - sa[i]) @ u) / L1
        lo = np.minimum(t0, t1)
        hi = np.maximum(t0, t1)
        ov = np.minimum(hi, 1.0) - np.maximum(lo, 0.0)
        if (on_line & (ov > _TOL)).any():
            return True
    return False


# -------------------------------------------------------------------- relate
def relate_matrix(ga: Geometry, gb: Geometry) -> str:
    """Approximate DE-9IM matrix as a 9-char string (row-major:
    II IB IE / BI BB BE / EI EB EE)."""
    if ga is None or gb is None or ga.is_empty() or gb.is_empty():
        m = ["F"] * 9
        if ga is not None and not ga.is_empty():
            m[2] = str(max(ga.dim(), 0))
            m[5] = "F" if ga.dim() != 2 else "1"
        if gb is not None and not gb.is_empty():
            m[6] = str(max(gb.dim(), 0))
            m[7] = "F" if gb.dim() != 2 else "1"
        m[8] = "2"
        return "".join(m)

    da, db = ga.dim(), gb.dim()
    if da == 2 and db == 2:
        m = _relate_poly_poly(ga, gb)
    elif da == 2 and db < 2:
        m = _transpose(_relate_lower_vs_poly(gb, ga))
    elif db == 2:
        m = _relate_lower_vs_poly(ga, gb)
    elif da == 1 and db == 1:
        m = _relate_line_line(ga, gb)
    elif da == 1 and db == 0:
        m = _transpose(_relate_point_line(gb, ga))
    elif da == 0 and db == 1:
        m = _relate_point_line(ga, gb)
    else:
        m = _relate_point_point(ga, gb)
    return "".join(m)


def _transpose(m: list[str]) -> list[str]:
    return [m[0], m[3], m[6], m[1], m[4], m[7], m[2], m[5], m[8]]


def _relate_point_point(ga, gb):
    pa, pb = ga.points(), gb.points()
    ca = classify_points_vs_points(pa, gb)
    cb = classify_points_vs_points(pb, ga)
    m = ["F"] * 9
    m[8] = "2"
    if (ca == 2).any():
        m[0] = "0"
    if (ca == 0).any():
        m[2] = "0"
    if (cb == 0).any():
        m[6] = "0"
    return m


def _relate_point_line(ga, gb):
    """A = points, B = line."""
    pa = ga.points()
    c = classify_points_vs_line(pa, gb)
    m = ["F"] * 9
    m[8] = "2"
    if (c == 2).any():
        m[0] = "0"  # II
    if (c == 1).any():
        m[1] = "0"  # IB
    if (c == 0).any():
        m[2] = "0"  # IE
    # EI: line interior beyond the points (a line has infinitely many pts)
    m[6] = "1"
    bpts = line_boundary_points(gb)
    if len(bpts):
        cb = classify_points_vs_points(bpts, ga)
        m[7] = "F" if (cb == 2).all() else "0"
    return m


def _relate_lower_vs_poly(ga, gb):
    """A = points or line, B = polygon(s)."""
    da = ga.dim()
    m = ["F"] * 9
    m[8] = "2"
    if da == 0:
        c = points_in_multipolygon(ga.points(), gb)
        if (c == 2).any():
            m[0] = "0"
        if (c == 1).any():
            m[1] = "0"
        if (c == 0).any():
            m[2] = "0"
        m[6] = "2"  # polygon interior extends beyond points
        m[7] = "1"  # polygon boundary not coverable by points
        return m
    # A is a line
    verts = ga.coords()
    mids = edge_midpoints(ga)
    sample = np.vstack([verts, mids]) if len(mids) else verts
    cs = points_in_multipolygon(sample, gb)
    proper, touching = any_segment_intersection(ga, gb)
    ii = (cs == 2).any() or proper
    ie = (cs == 0).any() or proper
    m[0] = "1" if ii else "F"
    m[2] = "1" if ie else "F"
    # IB: line interior on polygon boundary
    if _collinear_overlap(ga, gb):
        m[1] = "1"
    elif (cs == 1).any() or proper or touching:
        m[1] = "0"
    bpts = line_boundary_points(ga)
    if len(bpts):
        cb = points_in_multipolygon(bpts, gb)
        if (cb == 2).any():
            m[3] = "0"
        if (cb == 1).any():
            m[4] = "0"
        if (cb == 0).any():
            m[5] = "0"
    m[6] = "2"
    # EB: polygon boundary beyond the line — sample poly boundary points
    pb_sample = np.vstack([gb.coords(), edge_midpoints(gb)])
    on_line = classify_points_vs_line(pb_sample, ga)
    m[7] = "F" if (on_line > 0).all() else "1"
    return m


def _covers_poly(ga: Geometry, gb: Geometry, proper: bool) -> bool:
    """Does polygon A cover polygon B (closure containment)?"""
    if proper:
        return False
    sample = np.vstack([gb.coords(), edge_midpoints(gb), geom_interior_points(gb)])
    c = points_in_multipolygon(sample, ga)
    return bool((c > 0).all())


def _relate_poly_poly(ga, gb):
    m = ["F"] * 9
    m[8] = "2"
    if not bbox_intersects(bounds(ga), bounds(gb), margin=_TOL):
        m[2] = "2"
        m[5] = "1"
        m[6] = "2"
        m[7] = "1"
        return m
    proper, touching = any_segment_intersection(ga, gb)
    va, vb = ga.coords(), gb.coords()
    ca = points_in_multipolygon(va, gb)  # A verts vs B
    cb = points_in_multipolygon(vb, ga)
    ipa = geom_interior_points(ga)
    ipb = geom_interior_points(gb)
    ia = points_in_multipolygon(ipa, gb) if len(ipa) else np.empty(0, np.int8)
    ib = points_in_multipolygon(ipb, ga) if len(ipb) else np.empty(0, np.int8)

    ii = (
        proper
        or (ca == 2).any()
        or (cb == 2).any()
        or (ia == 2).any()
        or (ib == 2).any()
    )
    m[0] = "2" if ii else "F"

    # boundaries
    bb = proper or touching or (ca == 1).any() or (cb == 1).any()
    if bb:
        m[4] = "1" if _collinear_overlap(ga, gb) else "0"

    covers_ab = _covers_poly(ga, gb, proper)  # A covers B
    covers_ba = _covers_poly(gb, ga, proper)

    # IB: B boundary passes through A interior
    mb = edge_midpoints(gb)
    cb_mid = points_in_multipolygon(mb, ga)
    if proper or (cb == 2).any() or (cb_mid == 2).any():
        m[1] = "1"
    # BI
    ma = edge_midpoints(ga)
    ca_mid = points_in_multipolygon(ma, gb)
    if proper or (ca == 2).any() or (ca_mid == 2).any():
        m[3] = "1"
    # IE / BE : A extends outside B unless B covers A
    if not covers_ba:
        m[2] = "2"
    if not ((ca > 0).all() and (ca_mid > 0).all() and not proper):
        m[5] = "1"
    # EI / EB
    if not covers_ab:
        m[6] = "2"
    if not ((cb > 0).all() and (cb_mid > 0).all() and not proper):
        m[7] = "1"
    return m


def _relate_line_line(ga, gb):
    m = ["F"] * 9
    m[8] = "2"
    proper, touching = any_segment_intersection(ga, gb)
    col = _collinear_overlap(ga, gb)
    va = np.vstack([ga.coords(), edge_midpoints(ga)])
    vb = np.vstack([gb.coords(), edge_midpoints(gb)])
    ca = classify_points_vs_line(va, gb)  # A samples vs B
    cb = classify_points_vs_line(vb, ga)
    ba = line_boundary_points(ga)
    bb_pts = line_boundary_points(gb)
    cba = classify_points_vs_line(ba, gb) if len(ba) else np.empty(0, np.int8)
    cbb = classify_points_vs_line(bb_pts, ga) if len(bb_pts) else np.empty(0, np.int8)

    # II: proper cross (0-dim) or collinear overlap (1-dim)
    if col:
        m[0] = "1"
    elif proper:
        m[0] = "0"
    else:
        # touching might still be interior-interior (X touch at non-endpoints)
        # interior sample of A on interior of B
        ia_on_ib = False
        mask_interior_a = np.ones(len(va), dtype=bool)
        if len(ba):
            diff = va[:, None, :] - ba[None, :, :]
            mask_interior_a &= ~(
                (np.sqrt((diff * diff).sum(axis=2)) <= _TOL).any(axis=1)
            )
        if (ca[mask_interior_a] == 2).any():
            ia_on_ib = True
        if touching and ia_on_ib:
            m[0] = "0"
    # IB: interior of A at boundary point of B
    if len(bb_pts) and (cbb == 2).any():
        m[1] = "0"
    # IE: A has points off B
    if (ca == 0).any() or proper and not col:
        m[2] = "1"
    # BI / BB / BE
    if len(ba):
        if (cba == 2).any():
            m[3] = "0"
        if (cba == 1).any():
            m[4] = "0"
        if (cba == 0).any():
            m[5] = "0"
    # EI: B has points off A
    if (cb == 0).any():
        m[6] = "1"
    # EB: B boundary off A
    if len(bb_pts) and (cbb == 0).any():
        m[7] = "0"
    return m


# ---------------------------------------------------------------- predicates
def relate_match(matrix: str, pattern: str) -> bool:
    """ST_RelateMatch semantics."""
    if len(pattern) != 9:
        raise ValueError(f"DE-9IM pattern must be 9 chars: {pattern!r}")
    for mc, pc in zip(matrix, pattern):
        pc = pc.upper() if pc in "tf" else pc
        if pc == "*":
            continue
        if pc == "T":
            if mc == "F":
                return False
        elif pc == "F":
            if mc != "F":
                return False
        else:
            if mc != pc:
                return False
    return True


def relate_pattern(ga: Geometry, gb: Geometry, pattern: str) -> bool:
    return relate_match(relate_matrix(ga, gb), pattern)


def intersects(ga, gb) -> bool:
    # area×area fast path (the spatial-join hot predicate): boundary
    # segment-sets cross (one numpy broadcast), else either disjoint or
    # one side wholly contains the other — decided by ONE representative
    # vertex per polygon part (no crossing => a part is entirely in or
    # entirely out). Avoids building the full DE-9IM matrix.
    if ga.dim() == 2 and gb.dim() == 2 and not ga.is_empty() and not gb.is_empty():
        from .kernels import (
            any_segment_intersection,
            bbox_intersects,
            bounds,
            points_in_multipolygon,
        )

        if not bbox_intersects(bounds(ga), bounds(gb), margin=_TOL):
            return False
        proper, touching = any_segment_intersection(ga, gb)
        if proper or touching:
            return True
        reps_a = np.asarray([rings[0][0] for rings in ga.polygons()])
        if len(reps_a) and (points_in_multipolygon(reps_a, gb) > 0).any():
            return True
        reps_b = np.asarray([rings[0][0] for rings in gb.polygons()])
        return bool(len(reps_b)) and bool(
            (points_in_multipolygon(reps_b, ga) > 0).any()
        )
    m = relate_matrix(ga, gb)
    return m[0] != "F" or m[1] != "F" or m[3] != "F" or m[4] != "F"


def disjoint(ga, gb) -> bool:
    return not intersects(ga, gb)


def within(ga, gb) -> bool:
    return relate_pattern(ga, gb, "T*F**F***")


def contains(ga, gb) -> bool:
    return within(gb, ga)


def covers(ga, gb) -> bool:
    m = relate_matrix(ga, gb)
    for p in ("T*****FF*", "*T****FF*", "***T**FF*", "****T*FF*"):
        if relate_match(m, p):
            return True
    return False


def coveredby(ga, gb) -> bool:
    return covers(gb, ga)


def touches(ga, gb) -> bool:
    m = relate_matrix(ga, gb)
    return any(
        relate_match(m, p) for p in ("FT*******", "F**T*****", "F***T****")
    )


def crosses(ga, gb) -> bool:
    da, db = ga.dim(), gb.dim()
    m = relate_matrix(ga, gb)
    if da < db:
        return relate_match(m, "T*T******")
    if da > db:
        return relate_match(m, "T*****T**")
    if da == 1 and db == 1:
        return relate_match(m, "0********")
    return False


def overlaps(ga, gb) -> bool:
    da, db = ga.dim(), gb.dim()
    if da != db:
        return False
    m = relate_matrix(ga, gb)
    if da == 1:
        return relate_match(m, "1*T***T**")
    return relate_match(m, "T*T***T**")


def equals(ga, gb) -> bool:
    return relate_pattern(ga, gb, "T*F**FFF*")


PREDICATE_FNS = {
    "equals": equals,
    "touches": touches,
    "within": within,
    "overlaps": overlaps,
    "crosses": crosses,
    "intersects": intersects,
    "contains": contains,
    "covers": covers,
    "coveredby": coveredby,
    "disjoint": disjoint,
}
