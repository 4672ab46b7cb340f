"""Numpy geometry kernels: measures, point-in-polygon, segment tests,
distances.

These are the from-scratch equivalents of the scalar functions the
reference calls in its SQL templates (``ST_Area, ST_Perimeter, ST_Length,
ST_Distance, ST_Centroid, ST_MinX/MaxX/MinY/MaxY, ST_NPoints`` —
geofileops SURVEY §2.8) — implemented batch-vectorized where the math
allows, so they run fast inside Arrow pandas UDFs.
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

EPS = 1e-12


# -------------------------------------------------------------------- bounds
def bounds(geom: Geometry) -> tuple[float, float, float, float]:
    """(minx, miny, maxx, maxy); NaNs for empty. Memoized per instance."""
    cached = getattr(geom, "_bounds_cache", None)
    if cached is not None:
        return cached
    c = geom.coords()
    c = c[~np.isnan(c[:, 0])]
    if len(c) == 0:
        out = (np.nan, np.nan, np.nan, np.nan)
    else:
        out = (
            float(c[:, 0].min()),
            float(c[:, 1].min()),
            float(c[:, 0].max()),
            float(c[:, 1].max()),
        )
    try:
        geom._bounds_cache = out
    except AttributeError:
        pass
    return out


def bbox_intersects(b1, b2, margin: float = 0.0) -> bool:
    return not (
        b1[2] + margin < b2[0]
        or b2[2] + margin < b1[0]
        or b1[3] + margin < b2[1]
        or b2[3] + margin < b1[1]
    )


# ------------------------------------------------------------------ measures
def ring_signed_area(ring: np.ndarray) -> float:
    """Shoelace; positive = CCW."""
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1]))


def area(geom: Geometry) -> float:
    total = 0.0
    for rings in geom.polygons():
        if not rings:
            continue
        total += abs(ring_signed_area(rings[0]))
        for hole in rings[1:]:
            total -= abs(ring_signed_area(hole))
    return total


def _path_length(arr: np.ndarray) -> float:
    if len(arr) < 2:
        return 0.0
    d = np.diff(arr, axis=0)
    return float(np.sqrt((d * d).sum(axis=1)).sum())


def length(geom: Geometry) -> float:
    """ST_Length for lines, ST_Perimeter for polygons."""
    total = 0.0
    for ls in geom.lines():
        total += _path_length(ls)
    for rings in geom.polygons():
        for ring in rings:
            total += _path_length(ring)
    return total


def centroid(geom: Geometry) -> Geometry:
    """Area-weighted (polygons) / length-weighted (lines) / mean (points)."""
    polys = geom.polygons()
    if polys:
        cx = cy = a_sum = 0.0
        for rings in polys:
            for i, ring in enumerate(rings):
                x, y = ring[:-1, 0], ring[:-1, 1]
                x1, y1 = ring[1:, 0], ring[1:, 1]
                cross = x * y1 - x1 * y
                a = cross.sum() / 2.0
                if abs(a) < EPS:
                    continue
                sign = 1.0 if i == 0 else -1.0
                a_eff = abs(a) * sign
                cx += float(((x + x1) * cross).sum() / (6.0 * a)) * a_eff
                cy += float(((y + y1) * cross).sum() / (6.0 * a)) * a_eff
                a_sum += a_eff
        if abs(a_sum) > EPS:
            return Geometry.point(cx / a_sum, cy / a_sum)
    lines = geom.lines()
    if lines:
        cx = cy = w_sum = 0.0
        for ls in lines:
            d = np.diff(ls, axis=0)
            w = np.sqrt((d * d).sum(axis=1))
            mid = (ls[:-1] + ls[1:]) / 2.0
            cx += float((mid[:, 0] * w).sum())
            cy += float((mid[:, 1] * w).sum())
            w_sum += float(w.sum())
        if w_sum > EPS:
            return Geometry.point(cx / w_sum, cy / w_sum)
    pts = geom.coords()
    pts = pts[~np.isnan(pts[:, 0])]
    if len(pts) == 0:
        return Geometry.empty(POINT)
    return Geometry.point(float(pts[:, 0].mean()), float(pts[:, 1].mean()))


# ------------------------------------------------------- point in ring/poly
def points_in_ring(pts: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized crossing-number test for many points vs one ring.

    Returns int8 array: 0 = outside, 1 = on boundary, 2 = inside.

    Dense (n_pts x n_edges) when the product is small; y-banded sweep
    otherwise — a point's crossing parity and boundary hits only involve
    edges whose y-interval straddles the point's y, so bucketing edges
    into y-bands turns the giant welded-ring case (160k edges x 10k
    midpoints in the weld certification scan) from O(n*m) into
    ~O(n * m/bands) with identical results.
    """
    n = len(pts)
    if n == 0:
        return np.empty(0, dtype=np.int8)
    m = len(ring) - 1
    if n == 1:
        # overlay kernels issue MILLIONS of 1-point containment probes
        # (orientation picks, interior-point tests) against small rings;
        # the dense (n,m) broadcast path costs ~0.35 ms of pure numpy
        # setup per call — the flat single-point path is ~5x cheaper
        out = np.empty(1, dtype=np.int8)
        out[0] = _pir_single(float(pts[0, 0]), float(pts[0, 1]), ring)
        return out
    if n * m > 2_000_000 and m > 512:
        return _points_in_ring_banded(pts, ring)
    x, y = pts[:, 0:1], pts[:, 1:2]  # (n,1)
    x1, y1 = ring[:-1, 0][None, :], ring[:-1, 1][None, :]  # (1,m)
    x2, y2 = ring[1:, 0][None, :], ring[1:, 1][None, :]

    # --- boundary test: point on segment (collinear + within bbox)
    dx, dy = x2 - x1, y2 - y1
    cross = (x - x1) * dy - (y - y1) * dx
    seg_len2 = dx * dx + dy * dy
    # distance^2 to infinite line scaled: cross^2 / len2 <= eps^2
    on_line = cross * cross <= (EPS * 1e6) ** 2 * np.maximum(seg_len2, EPS)
    dot = (x - x1) * dx + (y - y1) * dy
    within = (dot >= -EPS) & (dot <= seg_len2 + EPS)
    on_boundary = (on_line & within).any(axis=1)

    # --- crossing number (half-open rule avoids double count at vertices)
    cond = (y1 > y) != (y2 > y)
    with np.errstate(divide="ignore", invalid="ignore"):
        xints = x1 + (y - y1) * dx / np.where(dy == 0, np.inf, dy)
    crossings = (cond & (x < xints)).sum(axis=1)
    inside = (crossings % 2).astype(bool)

    out = np.zeros(n, dtype=np.int8)
    out[inside] = 2
    out[on_boundary] = 1
    return out


def _pir_single(px: float, py: float, ring: np.ndarray) -> int:
    """One point vs one closed ring — flat 1-D twin of the dense path
    (formulas identical, including every EPS threshold); returns the
    same 0/1/2 code. Exists purely to kill the (n,1)x(1,m) broadcast
    setup cost on the million-call single-probe pattern."""
    x1 = ring[:-1, 0]
    y1 = ring[:-1, 1]
    x2 = ring[1:, 0]
    y2 = ring[1:, 1]
    dx = x2 - x1
    dy = y2 - y1
    rx = px - x1
    ry = py - y1
    cross = rx * dy - ry * dx
    seg2 = dx * dx + dy * dy
    on_line = cross * cross <= (EPS * 1e6) ** 2 * np.maximum(seg2, EPS)
    if on_line.any():
        dot = rx * dx + ry * dy
        if (on_line & (dot >= -EPS) & (dot <= seg2 + EPS)).any():
            return 1
    cond = (y1 > py) != (y2 > py)
    idx = np.nonzero(cond)[0]
    if len(idx) == 0:
        return 0
    # dy is never 0 where cond holds (the endpoints straddle py strictly
    # on one side), so the division needs no errstate guard
    xints = x1[idx] + (py - y1[idx]) * dx[idx] / dy[idx]
    return 2 if (np.count_nonzero(px < xints) & 1) else 0


def _pir_dense(px, py, ex1, ey1, ex2, ey2):
    """The dense point-vs-edges core shared by both paths: returns
    (on_boundary bool[n], crossings int[n]) — formulas identical to the
    inline ones in :func:`points_in_ring`."""
    x, y = px[:, None], py[:, None]
    x1, y1 = ex1[None, :], ey1[None, :]
    x2, y2 = ex2[None, :], ey2[None, :]
    dx, dy = x2 - x1, y2 - y1
    cross = (x - x1) * dy - (y - y1) * dx
    seg_len2 = dx * dx + dy * dy
    on_line = cross * cross <= (EPS * 1e6) ** 2 * np.maximum(seg_len2, EPS)
    dot = (x - x1) * dx + (y - y1) * dy
    within = (dot >= -EPS) & (dot <= seg_len2 + EPS)
    on_boundary = (on_line & within).any(axis=1)
    cond = (y1 > y) != (y2 > y)
    with np.errstate(divide="ignore", invalid="ignore"):
        xints = x1 + (y - y1) * dx / np.where(dy == 0, np.inf, dy)
    crossings = (cond & (x < xints)).sum(axis=1)
    return on_boundary, crossings


def _points_in_ring_banded(pts: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Y-banded sweep variant of :func:`points_in_ring` for big
    point-set x big-ring products.  Crossing parity only involves edges
    whose y-interval straddles the point's y, and an on-boundary hit
    lies within the segment's y-interval padded by the boundary
    tolerance — so testing each point against only its y-band's edges
    is exact, not approximate."""
    ex1, ey1 = np.ascontiguousarray(ring[:-1, 0]), np.ascontiguousarray(ring[:-1, 1])
    ex2, ey2 = np.ascontiguousarray(ring[1:, 0]), np.ascontiguousarray(ring[1:, 1])
    m = len(ex1)
    n = len(pts)
    px, py = pts[:, 0], pts[:, 1]
    pad = EPS * 1e6 + EPS  # perpendicular tolerance + endpoint overrun
    lo = np.minimum(ey1, ey2) - pad
    hi = np.maximum(ey1, ey2) + pad
    y0 = float(min(lo.min(), py.min()))
    y1v = float(max(hi.max(), py.max()))
    nbands = int(np.clip(int(np.sqrt(m)), 16, 2048))
    h = (y1v - y0) / nbands
    out = np.zeros(n, dtype=np.int8)
    if h <= 0.0:  # degenerate: everything at one y — chunked dense
        step = max(1, int(2_000_000 // max(m, 1)))
        for s in range(0, n, step):
            ob, cr = _pir_dense(px[s : s + step], py[s : s + step], ex1, ey1, ex2, ey2)
            o = np.where(cr % 2 == 1, 2, 0).astype(np.int8)
            o[ob] = 1
            out[s : s + step] = o
        return out
    pb = np.clip(((py - y0) / h).astype(np.int64), 0, nbands - 1)
    eb0 = np.clip(((lo - y0) / h).astype(np.int64), 0, nbands - 1)
    eb1 = np.clip(((hi - y0) / h).astype(np.int64), 0, nbands - 1)
    span = eb1 - eb0 + 1
    tot = int(span.sum())
    edge_of = np.repeat(np.arange(m), span)
    first = np.repeat(np.cumsum(span) - span, span)
    band_of = np.repeat(eb0, span) + (np.arange(tot) - first)
    eorder = np.argsort(band_of, kind="stable")
    estarts = np.searchsorted(band_of[eorder], np.arange(nbands + 1))
    porder = np.argsort(pb, kind="stable")
    pstarts = np.searchsorted(pb[porder], np.arange(nbands + 1))
    for b in range(nbands):
        ps, pe = pstarts[b], pstarts[b + 1]
        if ps == pe:
            continue
        es, ee = estarts[b], estarts[b + 1]
        if es == ee:
            continue  # no nearby edges: outside (crossings 0)
        pidx = porder[ps:pe]
        eidx = edge_of[eorder[es:ee]]
        lx1, ly1, lx2, ly2 = ex1[eidx], ey1[eidx], ex2[eidx], ey2[eidx]
        step = max(1, int(4_000_000 // max(len(eidx), 1)))
        for s in range(0, len(pidx), step):
            sel = pidx[s : s + step]
            ob, cr = _pir_dense(px[sel], py[sel], lx1, ly1, lx2, ly2)
            o = np.where(cr % 2 == 1, 2, 0).astype(np.int8)
            o[ob] = 1
            out[sel] = o
    return out


def points_in_polygon(pts: np.ndarray, rings: list[np.ndarray]) -> np.ndarray:
    """0 = outside, 1 = boundary, 2 = interior — for polygon with holes."""
    if not rings:
        return np.zeros(len(pts), dtype=np.int8)
    res = points_in_ring(pts, rings[0])
    for hole in rings[1:]:
        h = points_in_ring(pts, hole)
        # inside hole -> outside polygon; on hole boundary -> boundary
        res = np.where((res == 2) & (h == 2), 0, res)
        res = np.where((res == 2) & (h == 1), 1, res)
    return res


def points_in_multipolygon(pts: np.ndarray, geom: Geometry) -> np.ndarray:
    """Max classification over polygon parts."""
    res = np.zeros(len(pts), dtype=np.int8)
    for rings in geom.polygons():
        res = np.maximum(res, points_in_polygon(pts, rings))
    return res


# ----------------------------------------------------- segment intersection
def segments_cross(a1, a2, b_starts, b_ends):
    """One segment (a1,a2) vs many segments. Returns (proper, touching)
    boolean arrays: proper = interiors cross; touching = intersect at an
    endpoint / collinear overlap."""
    a1 = np.asarray(a1, dtype=np.float64)
    a2 = np.asarray(a2, dtype=np.float64)
    d1 = a2 - a1
    d2 = b_ends - b_starts  # (m,2)
    diff = b_starts - a1  # (m,2)
    denom = d1[0] * d2[:, 1] - d1[1] * d2[:, 0]
    t_num = diff[:, 0] * d2[:, 1] - diff[:, 1] * d2[:, 0]
    u_num = diff[:, 0] * d1[1] - diff[:, 1] * d1[0]
    scale = (
        np.maximum(np.abs(d1).sum(), EPS) * np.maximum(np.abs(d2).sum(axis=1), EPS)
    )
    nz = np.abs(denom) > EPS * scale
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.where(nz, t_num / np.where(nz, denom, 1.0), np.nan)
        u = np.where(nz, u_num / np.where(nz, denom, 1.0), np.nan)
    tol = 1e-9
    hit = nz & (t > -tol) & (t < 1 + tol) & (u > -tol) & (u < 1 + tol)
    proper = nz & (t > tol) & (t < 1 - tol) & (u > tol) & (u < 1 - tol)
    touching = hit & ~proper

    # collinear overlap: denom == 0 and points collinear and ranges overlap
    col = ~nz & (np.abs(t_num) <= 1e-9 * scale)
    if col.any():
        # project endpoints of b onto a's direction
        L2 = max(float(d1 @ d1), EPS)
        s0 = ((b_starts - a1) @ d1) / L2
        s1 = ((b_ends - a1) @ d1) / L2
        lo = np.minimum(s0, s1)
        hi = np.maximum(s0, s1)
        overlap = col & (hi >= -tol) & (lo <= 1 + tol)
        touching = touching | overlap
    return proper, touching


def path_segments(arr: np.ndarray):
    """(starts, ends) for a coordinate path."""
    return arr[:-1], arr[1:]


def geom_segments(geom: Geometry):
    """All boundary/line segments of a geometry as (starts, ends).
    Memoized on the Geometry instance: the pair-refine UDF's geometry
    cache reuses decoded objects across candidate pairs, so each
    geometry's segment arrays are built once per task, not per pair."""
    cached = getattr(geom, "_segs_cache", None)
    if cached is not None:
        return cached
    from .geom import POLYGON

    if geom.typ == POLYGON and len(geom.data) == 1:
        # single-ring polygon (the parcel hot case): plain views, no
        # vstack — measured ~10us/geometry saved across every predicate
        ring = geom.data[0]
        out = (ring[:-1], ring[1:])
        try:
            geom._segs_cache = out
        except AttributeError:
            pass
        return out
    starts, ends = [], []
    for ls in geom.lines():
        s, e = path_segments(ls)
        starts.append(s)
        ends.append(e)
    for rings in geom.polygons():
        for ring in rings:
            s, e = path_segments(ring)
            starts.append(s)
            ends.append(e)
    if not starts:
        out = (np.empty((0, 2)), np.empty((0, 2)))
    elif len(starts) == 1:
        out = (starts[0], ends[0])
    else:
        out = (np.vstack(starts), np.vstack(ends))
    try:
        geom._segs_cache = out
    except AttributeError:
        pass
    return out


def segment_sets_cross(sa, ea, sb, eb):
    """All segments of set A vs all of set B in ONE numpy broadcast
    ((n, m) element-wise, no Python loop). Returns (any_proper,
    any_touch) booleans — the hot kernel behind every polygon-pair
    ``intersects`` refine."""
    d1 = ea - sa  # (n,2)
    d2 = eb - sb  # (m,2)
    denom = d1[:, None, 0] * d2[None, :, 1] - d1[:, None, 1] * d2[None, :, 0]
    ex = sb[None, :, 0] - sa[:, None, 0]
    ey = sb[None, :, 1] - sa[:, None, 1]
    t_num = ex * d2[None, :, 1] - ey * d2[None, :, 0]
    u_num = ex * d1[:, None, 1] - ey * d1[:, None, 0]
    scale = np.maximum(np.abs(d1).sum(axis=1), EPS)[:, None] * np.maximum(
        np.abs(d2).sum(axis=1), EPS
    )[None, :]
    nz = np.abs(denom) > EPS * scale
    safe = np.where(nz, denom, 1.0)
    t = t_num / safe
    u = u_num / safe
    tol = 1e-9
    hit = nz & (t > -tol) & (t < 1 + tol) & (u > -tol) & (u < 1 + tol)
    proper = nz & (t > tol) & (t < 1 - tol) & (u > tol) & (u < 1 - tol)
    any_proper = bool(proper.any())
    any_touch = bool((hit & ~proper).any())
    if not any_touch:
        # collinear overlap: parallel + collinear + 1-D range overlap
        col = ~nz & (np.abs(t_num) <= 1e-9 * scale)
        if col.any():
            ai, bi = np.nonzero(col)
            L2 = np.maximum((d1[ai] * d1[ai]).sum(axis=1), EPS)
            s0 = ((sb[bi] - sa[ai]) * d1[ai]).sum(axis=1) / L2
            s1 = ((eb[bi] - sa[ai]) * d1[ai]).sum(axis=1) / L2
            lo = np.minimum(s0, s1)
            hi = np.maximum(s0, s1)
            any_touch = bool(((hi >= -tol) & (lo <= 1 + tol)).any())
    return any_proper, any_touch


def batch_segment_hits(
    seg_a: list, seg_b: list, windows: np.ndarray | None = None,
    chunk: int = 65536,
) -> np.ndarray:
    """Per-pair "do any two segments intersect?" over MANY segment-set
    pairs in flattened element-wise sweeps (the batchclip-style
    amortization of :func:`segment_sets_cross`'s per-call numpy
    overhead).

    ``seg_a[i]``/``seg_b[i]`` are (starts, ends) tuples. ``windows``
    (P, 4), when given, is each pair's bbox-overlap window: any segment
    crossing must lie inside it, so segments whose bbox misses the
    window are pruned BEFORE the cartesian combos are built — on
    parcel-sized pairs this cuts the combo count ~10-20x.

    Returns a bool array: True means the pair CERTAINLY has an
    intersecting segment pair (same formulas/tolerances as
    ``segment_sets_cross``, minus the collinear-overlap probe); False
    means "no crossing found" — callers needing exact semantics
    (collinear-overlap touches, containment) must re-check False pairs
    with the exact per-pair predicate.
    """
    P = len(seg_a)
    hit = np.zeros(P, dtype=bool)
    if P == 0:
        return hit
    tol = 1e-9
    n0 = np.fromiter((len(s[0]) for s in seg_a), dtype=np.int64, count=P)
    m0 = np.fromiter((len(s[0]) for s in seg_b), dtype=np.int64, count=P)

    # stack all segments once; per-pair slices via offsets
    A_off = np.concatenate(([0], np.cumsum(n0)))
    B_off = np.concatenate(([0], np.cumsum(m0)))
    SA = (
        np.concatenate([s[0] for s in seg_a])
        if A_off[-1]
        else np.empty((0, 2))
    )
    EA = (
        np.concatenate([s[1] for s in seg_a])
        if A_off[-1]
        else np.empty((0, 2))
    )
    SB = (
        np.concatenate([s[0] for s in seg_b])
        if B_off[-1]
        else np.empty((0, 2))
    )
    EB = (
        np.concatenate([s[1] for s in seg_b])
        if B_off[-1]
        else np.empty((0, 2))
    )

    if windows is not None and len(SA) and len(SB):
        # window prune: a crossing point lies in bbox_a ∩ bbox_b, so a
        # segment whose own bbox misses the (slightly grown) window
        # cannot participate in any crossing
        grow = tol * np.maximum(1.0, np.abs(windows).max(axis=1))
        w0 = windows[:, 0] - grow
        w1 = windows[:, 1] - grow
        w2 = windows[:, 2] + grow
        w3 = windows[:, 3] + grow

        def _filter(S, E, offs, counts):
            sx, sy = S[:, 0], S[:, 1]
            ex2, ey2 = E[:, 0], E[:, 1]
            keepm = (
                (np.minimum(sx, ex2) <= np.repeat(w2, counts))
                & (np.maximum(sx, ex2) >= np.repeat(w0, counts))
                & (np.minimum(sy, ey2) <= np.repeat(w3, counts))
                & (np.maximum(sy, ey2) >= np.repeat(w1, counts))
            )
            kept = np.nonzero(keepm)[0]
            nz = counts > 0
            new_counts = np.zeros(P, dtype=np.int64)
            idxp = np.nonzero(nz)[0]
            if len(idxp):
                # reduceat on the raw bool would stay bool: cast first
                new_counts[idxp] = np.add.reduceat(
                    keepm.astype(np.int64), offs[idxp]
                )
            return S[kept], E[kept], new_counts

        SA, EA, n = _filter(SA, EA, A_off[:-1], n0)
        SB, EB, m = _filter(SB, EB, B_off[:-1], m0)
    else:
        n, m = n0, m0

    counts = n * m
    # blocks of pairs whose cumulative combos stay ~chunk-sized: EVERY
    # working array below is block-local (a single flattened index build
    # over a 262k-row Arrow batch would allocate gigabytes)
    a_off_all = np.concatenate(([0], np.cumsum(n)[:-1]))
    b_off_all = np.concatenate(([0], np.cumsum(m)[:-1]))
    blk_lo = 0
    while blk_lo < P:
        blk_hi = blk_lo
        combos = 0
        while blk_hi < P and (combos == 0 or combos + counts[blk_hi] <= chunk):
            combos += counts[blk_hi]
            blk_hi += 1
        bcnt = counts[blk_lo:blk_hi]
        nz_pairs = bcnt > 0
        if not nz_pairs.any():
            blk_lo = blk_hi
            continue
        bn = n[blk_lo:blk_hi]
        bm = m[blk_lo:blk_hi]
        total = int(bcnt.sum())
        start = np.concatenate(([0], np.cumsum(bcnt)[:-1]))
        offs = np.arange(total, dtype=np.int64) - np.repeat(start, bcnt)
        m_rep = np.maximum(np.repeat(bm, bcnt), 1)
        ai = np.repeat(a_off_all[blk_lo:blk_hi], bcnt) + offs // m_rep
        bi = np.repeat(b_off_all[blk_lo:blk_hi], bcnt) + offs % m_rep
        sa, ea = SA[ai], EA[ai]
        sb, eb = SB[bi], EB[bi]
        d1 = ea - sa
        d2 = eb - sb
        denom = d1[:, 0] * d2[:, 1] - d1[:, 1] * d2[:, 0]
        ex = sb[:, 0] - sa[:, 0]
        ey = sb[:, 1] - sa[:, 1]
        t_num = ex * d2[:, 1] - ey * d2[:, 0]
        u_num = ex * d1[:, 1] - ey * d1[:, 0]
        scale = np.maximum(np.abs(d1).sum(axis=1), EPS) * np.maximum(
            np.abs(d2).sum(axis=1), EPS
        )
        nz = np.abs(denom) > EPS * scale
        safe = np.where(nz, denom, 1.0)
        t = t_num / safe
        u = u_num / safe
        hitflat = nz & (t > -tol) & (t < 1 + tol) & (u > -tol) & (u < 1 + tol)
        # reduce only over pairs with combos: their starts are strictly
        # increasing, so each reduceat slice covers exactly one pair
        idx = np.nonzero(nz_pairs)[0]
        hit[blk_lo + idx] = np.logical_or.reduceat(hitflat, start[idx])
        blk_lo = blk_hi
    return hit


def any_segment_intersection(ga: Geometry, gb: Geometry):
    """(any_proper_cross, any_touch) between segment sets of two geometries."""
    sa, ea = geom_segments(ga)
    sb, eb = geom_segments(gb)
    if len(sa) == 0 or len(sb) == 0:
        return False, False
    if len(sa) >= 2048 or len(sb) >= 2048:
        # asymmetric-size hot case (parcel vs a 10k-edge subdivided
        # part): any boundary contact lies in the bbox overlap — prune
        # both sides against it before the O(n*m) broadcast
        ba, bb = bounds(ga), bounds(gb)
        w0, w1 = max(ba[0], bb[0]), max(ba[1], bb[1])
        w2, w3 = min(ba[2], bb[2]), min(ba[3], bb[3])
        sa, ea = window_segments(ga, w0, w1, w2, w3)
        sb, eb = window_segments(gb, w0, w1, w2, w3)
        if len(sa) == 0 or len(sb) == 0:
            return False, False
    if len(sa) * len(sb) <= 1_000_000:
        return segment_sets_cross(sa, ea, sb, eb)
    # huge pair: chunk set A to bound the broadcast allocation
    any_proper = any_touch = False
    step = max(1, 1_000_000 // max(len(sb), 1))
    for i in range(0, len(sa), step):
        p, t = segment_sets_cross(sa[i : i + step], ea[i : i + step], sb, eb)
        any_proper = any_proper or p
        any_touch = any_touch or t
        if any_proper and any_touch:
            break
    return any_proper, any_touch


# ------------------------------------------------------------------ distance
def points_to_segments_dist(pts: np.ndarray, s: np.ndarray, e: np.ndarray):
    """Min distance from each point to a set of segments. (n,) array."""
    if len(s) == 0 or len(pts) == 0:
        return np.full(len(pts), np.inf)
    d = e - s  # (m,2)
    len2 = np.maximum((d * d).sum(axis=1), EPS)  # (m,)
    # (n,m)
    t = ((pts[:, None, :] - s[None, :, :]) * d[None, :, :]).sum(axis=2) / len2
    t = np.clip(t, 0.0, 1.0)
    proj = s[None, :, :] + t[:, :, None] * d[None, :, :]
    diff = pts[:, None, :] - proj
    return np.sqrt((diff * diff).sum(axis=2)).min(axis=1)


def distance(ga: Geometry, gb: Geometry) -> float:
    """Min planar distance; 0 if they intersect."""
    if ga.is_empty() or gb.is_empty():
        return float("nan")
    pa, pb = ga.points(), gb.points()
    sa, ea = geom_segments(ga)
    sb, eb = geom_segments(gb)
    best = np.inf
    # point-point
    if len(pa) and len(pb):
        diff = pa[:, None, :] - pb[None, :, :]
        best = min(best, float(np.sqrt((diff * diff).sum(axis=2)).min()))
    # point-segment both directions
    if len(pa) and len(sb):
        best = min(best, float(points_to_segments_dist(pa, sb, eb).min()))
    if len(pb) and len(sa):
        best = min(best, float(points_to_segments_dist(pb, sa, ea).min()))
    # segment-segment: endpoint distances + crossing
    if len(sa) and len(sb):
        va = np.vstack([sa, ea])
        vb = np.vstack([sb, eb])
        best = min(best, float(points_to_segments_dist(va, sb, eb).min()))
        best = min(best, float(points_to_segments_dist(vb, sa, ea).min()))
        if best > 0:
            proper, touching = any_segment_intersection(ga, gb)
            if proper or touching:
                best = 0.0
    # containment: point of one inside polygon of other
    if best > 0:
        if ga.polygons():
            cb = gb.coords()
            cb = cb[~np.isnan(cb[:, 0])]
            if len(cb) and points_in_multipolygon(cb[:1], ga)[0] > 0:
                best = 0.0
        if best > 0 and gb.polygons():
            ca = ga.coords()
            ca = ca[~np.isnan(ca[:, 0])]
            if len(ca) and points_in_multipolygon(ca[:1], gb)[0] > 0:
                best = 0.0
    return float(best)


# ---------------------------------------------------------------- precision
def set_precision(geom: Geometry, grid_size: float) -> Geometry | None:
    """Snap all coordinates to a grid (ST_ReducePrecision / gridsize —
    geofileops ``_geoops_sql.py:4884-4900``). Degenerate parts (collapsed
    rings/lines) are dropped; returns None if everything collapses
    (matching GFO_ReducePrecision's NULL-on-failure,
    ``util/_sqlite_userdefined.py:97-155``)."""
    if grid_size is None or grid_size <= 0 or geom is None:
        return geom

    def snap(arr):
        return np.round(np.asarray(arr) / grid_size) * grid_size

    t, d = geom.typ, geom.data
    if t == POINT:
        return Geometry(POINT, snap(d))
    if t == MULTIPOINT:
        pts = np.unique(snap(d), axis=0) if len(d) else d
        return Geometry(MULTIPOINT, pts)
    if t in (LINESTRING, MULTILINESTRING):
        lss = geom.lines()
        out = []
        for ls in lss:
            s = snap(ls)
            keep = np.ones(len(s), dtype=bool)
            keep[1:] = (np.abs(np.diff(s, axis=0)).sum(axis=1)) > 0
            s = s[keep]
            if len(s) >= 2:
                out.append(s)
        if not out:
            return None
        if t == LINESTRING:
            return Geometry(LINESTRING, out[0]) if len(out) == 1 else Geometry(
                MULTILINESTRING, out
            )
        return Geometry(MULTILINESTRING, out)
    if t in (POLYGON, MULTIPOLYGON):
        polys_out = []
        for rings in geom.polygons():
            rings_out = []
            for i, ring in enumerate(rings):
                r = snap(ring)
                keep = np.ones(len(r), dtype=bool)
                keep[1:] = (np.abs(np.diff(r, axis=0)).sum(axis=1)) > 0
                r = r[keep]
                if len(r) and (r[0] != r[-1]).any():
                    r = np.vstack([r, r[:1]])
                if len(r) >= 4 and abs(ring_signed_area(r)) > 0:
                    rings_out.append(r)
                elif i == 0:
                    rings_out = None
                    break
            if rings_out:
                polys_out.append(rings_out)
        if not polys_out:
            return None
        if t == POLYGON:
            return (
                Geometry(POLYGON, polys_out[0])
                if len(polys_out) == 1
                else Geometry(MULTIPOLYGON, polys_out)
            )
        return Geometry(MULTIPOLYGON, polys_out)
    if t == GEOMETRYCOLLECTION:
        subs = [set_precision(g, grid_size) for g in d]
        subs = [g for g in subs if g is not None]
        return Geometry(GEOMETRYCOLLECTION, subs) if subs else None
    return geom  # pragma: no cover


def geom_segment_bboxes(geom: Geometry):
    """Per-segment bbox arrays (x0, x1, y0, y1), cached on the geometry —
    the probe index for :func:`window_segments`."""
    cached = getattr(geom, "_segbb_cache", None)
    if cached is not None:
        return cached
    s, e = geom_segments(geom)
    cached = (
        np.minimum(s[:, 0], e[:, 0]),
        np.maximum(s[:, 0], e[:, 0]),
        np.minimum(s[:, 1], e[:, 1]),
        np.maximum(s[:, 1], e[:, 1]),
    )
    try:
        geom._segbb_cache = cached
    except AttributeError:
        pass
    return cached


def window_segments(
    geom: Geometry, w0: float, w1: float, w2: float, w3: float,
    min_edges: int = 2048,
):
    """Segments of ``geom`` whose bbox overlaps the (slightly grown)
    window — identity for small geometries. Callers building per-pair
    segment lists for :func:`batch_segment_hits` MUST pre-prune large
    geometries here: the batched sweep concatenates every pair's full
    segment set first, so a 10k-edge polygon appearing in thousands of
    pairs otherwise materializes GBs before the sweep's own prune."""
    s, e = geom_segments(geom)
    if len(s) < min_edges:
        return (s, e)
    x0, x1, y0, y1 = geom_segment_bboxes(geom)
    grow = 1e-7 * max(1.0, abs(w0), abs(w1), abs(w2), abs(w3))
    m = (
        (x0 <= w2 + grow)
        & (x1 >= w0 - grow)
        & (y0 <= w3 + grow)
        & (y1 >= w1 - grow)
    )
    return (s[m], e[m])
