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


def _mitre_wedge(pp, p, pn, d, mitre_limit) -> np.ndarray | None:
    """Join patch for a mitre corner on the OUTER side of the turn: the
    wedge between the two edge rectangles up to the miter apex, beveled
    at mitre_limit*d from the vertex (GEOS semantics). None for straight/
    degenerate corners (no patch needed) and u-turns (caller squares)."""
    v_in = p - pp
    v_out = pn - p
    L1 = np.hypot(v_in[0], v_in[1])
    L2 = np.hypot(v_out[0], v_out[1])
    if L1 < EPS or L2 < EPS:
        return _square(p, d)
    u_in = v_in / L1
    u_out = v_out / L2
    c = u_in[0] * u_out[1] - u_in[1] * u_out[0]
    if abs(c) < 1e-12:
        if float(u_in @ u_out) > 0:
            return None  # straight (rectangles already cover it)
        return _square(p, d)  # u-turn: bisector undefined
    # outer side of the turn: a LEFT turn (c > 0) leaves the join gap on
    # the RIGHT of travel (right normal of u is (u_y, -u_x))
    sgn = 1.0 if c > 0 else -1.0
    n_in = np.array([u_in[1], -u_in[0]]) * sgn
    n_out = np.array([u_out[1], -u_out[0]]) * sgn
    a = p + n_in * d
    b = p + n_out * d
    w = n_in + n_out
    wn = np.hypot(w[0], w[1])
    if wn < 1e-9:
        return _square(p, d)  # near-u-turn
    w = w / wn
    cos_half = float(w @ n_in)
    if cos_half <= 1e-9:
        return _square(p, d)
    m = p + w * (d / cos_half)
    if d / cos_half > mitre_limit * d:
        q = p + w * (mitre_limit * d)
        den1 = float(u_in @ w)
        den2 = float(u_out @ w)
        m1 = a + u_in * (float((q - a) @ w) / den1) if abs(den1) > 1e-12 else q
        m2 = b + u_out * (float((q - b) @ w) / den2) if abs(den2) > 1e-12 else q
        ring = np.array([p, a, m1, m2, b, p])
    else:
        ring = np.array([p, a, m, b, p])
    return ring


def _path_sausage(
    path: np.ndarray,
    d: float,
    quad_segs: int,
    cap_style: str,
    join_style: str,
    closed: bool,
    mitre_limit: float = 5.0,
    skip_reflex_joins: bool = False,
) -> list[np.ndarray]:
    """Offset pieces (rings) for one polyline: rectangles per edge +
    join/cap shapes per vertex.

    ``skip_reflex_joins``: polygon-boundary mode. With the interior-left
    ring convention (CCW exterior, CW holes) the buffer grows on the
    RIGHT of travel, and the join gap appears on the outer side of the
    turn — so a mitre wedge is needed exactly at left-turn corners
    (cross > 0); at reflex corners the wedge side faces the already-
    filled region and a limit-length wedge can poke through a thin wall
    into exterior space > d from the boundary (measured overshoot on
    spiky star fixtures). Open lines keep wedges at every turn (GEOS
    line-mitre semantics: both sides are exterior)."""
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
            pp = path[i - 1] if i > 0 else path[n - 2]
            if skip_reflex_joins:
                v_in = path[i] - pp
                v_out = path[i + 1] - path[i]
                if v_in[0] * v_out[1] - v_in[1] * v_out[0] <= 0:
                    continue  # reflex/straight: rectangles + base cover it
            wedge = _mitre_wedge(pp, path[i], path[i + 1], d, mitre_limit)
            if wedge is not None:  # None = straight corner, no patch
                pieces.append(wedge)
        else:
            pieces.append(_circle(path[i], d, quad_segs))
    # caps at the two endpoints
    if not closed and cap_style == "round":
        pieces.append(_circle(path[0], d, quad_segs))
        pieces.append(_circle(path[-1], d, quad_segs))
    return pieces


def _offset_ring(
    ring_open: np.ndarray, d: float, quad_segs: int, join_style: str,
    mitre_limit: float = 5.0,
) -> np.ndarray | None:
    """Analytic offset of one simple ring by ``d`` (the classic offset-
    curve construction GEOS's buffer is built on): every edge shifts
    along its right-hand normal; at vertices where the shifted edges
    diverge an arc (round) or miter point (mitre) is inserted, where
    they cross the offset lines are trimmed to their intersection.

    Convention: the region lies on the LEFT of travel (CCW exterior, CW
    holes), so d > 0 always grows the region and d < 0 shrinks it —
    for both exteriors and holes with the same code.

    Returns the closed offset ring, or None when the construction is not
    locally resolvable (caller falls back to the piece-union buffer).
    The caller must still check global self-intersection.
    """
    p = np.asarray(ring_open, dtype=np.float64)
    n = len(p)
    if n < 3:
        return None
    u = np.roll(p, -1, axis=0) - p  # edge vectors
    L = np.hypot(u[:, 0], u[:, 1])
    if (L < EPS).any():
        return None
    u = u / L[:, None]
    # right-hand normal scaled by d: moves the boundary away from the
    # region for d > 0
    nrm = np.stack([u[:, 1], -u[:, 0]], axis=1) * d
    up = np.roll(u, 1, axis=0)  # incoming edge direction at each vertex
    a = p + np.roll(nrm, 1, axis=0)  # end of previous offset edge
    b = p + nrm  # start of next offset edge
    c = up[:, 0] * u[:, 1] - up[:, 1] * u[:, 0]
    dotdir = (up * u).sum(axis=1)

    straight = (np.abs(c) < 1e-12) & (dotdir > 0)
    arc = (~straight) & (c * d > 0) & (join_style != "mitre")
    trim = ~straight & ~arc
    parallel = trim & (np.abs(c) < 1e-12)
    trim = trim & ~parallel

    # trim / miter: intersection of the two offset lines (vectorized)
    ex = b[:, 0] - a[:, 0]
    ey = b[:, 1] - a[:, 1]
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (ex * u[:, 1] - ey * u[:, 0]) / np.where(np.abs(c) < 1e-12, 1.0, c)
    m = a + t[:, None] * up

    # mitre_limit (GEOS semantics): a miter point further than
    # limit*|d| from the vertex is BEVELED — the spike is cut by the
    # line perpendicular to the corner bisector at the limit distance,
    # emitting the two intersections with the offset lines instead
    if join_style == "mitre":
        mdist = np.hypot(m[:, 0] - p[:, 0], m[:, 1] - p[:, 1])
        # GEOS applies mitre_limit to OUTSIDE joins only (c*d > 0):
        # beveling a reflex trim would split the true trim point into two
        # points whose offset segments self-cross, forcing excision or
        # the exact fallback on perfectly resolvable polygons
        bevel = trim & (c * d > 0) & (mdist > mitre_limit * abs(d))
    else:
        bevel = np.zeros(n, dtype=bool)
    trim = trim & ~bevel

    # arcs: ragged vectorization (one concatenated angle array)
    two_pi = 2.0 * np.pi
    ang_a = np.arctan2(a[:, 1] - p[:, 1], a[:, 0] - p[:, 0])
    ang_b = np.arctan2(b[:, 1] - p[:, 1], b[:, 0] - p[:, 0])
    if d > 0:
        ang_b = np.where(arc & (ang_b < ang_a), ang_b + two_pi, ang_b)
    else:
        ang_b = np.where(arc & (ang_b > ang_a), ang_b - two_pi, ang_b)
    span = np.abs(ang_b - ang_a)
    steps = np.where(
        arc, np.maximum(1, np.ceil(quad_segs * span / (np.pi / 2)).astype(np.int64)), 0
    )

    counts = np.where(
        straight,
        1,
        np.where(arc, steps + 1, np.where(parallel | bevel, 2, 1)),
    )
    offsets = np.concatenate([[0], np.cumsum(counts)])
    total = int(offsets[-1])
    out = np.empty((total, 2), dtype=np.float64)
    # single-point entries (straight -> a, trim -> m)
    onep = straight | trim
    out[offsets[:-1][onep]] = np.where(straight[onep, None], a[onep], m[onep])
    # parallel fallback: a then b
    if parallel.any():
        po = offsets[:-1][parallel]
        out[po] = a[parallel]
        out[po + 1] = b[parallel]
    if bevel.any():
        bi = np.nonzero(bevel)[0]
        w = (m[bi] - p[bi]) / mdist[bi, None]
        q = p[bi] + w * (mitre_limit * abs(d))
        den1 = (up[bi] * w).sum(axis=1)
        den2 = (u[bi] * w).sum(axis=1)
        t1 = ((q - a[bi]) * w).sum(axis=1) / np.where(
            np.abs(den1) < 1e-12, 1.0, den1
        )
        t2 = ((q - b[bi]) * w).sum(axis=1) / np.where(
            np.abs(den2) < 1e-12, 1.0, den2
        )
        bo = offsets[:-1][bi]
        out[bo] = a[bi] + t1[:, None] * up[bi]
        out[bo + 1] = b[bi] + t2[:, None] * u[bi]
    if arc.any():
        ai = np.nonzero(arc)[0]
        st = steps[ai]
        reps = st + 1
        vid = np.repeat(ai, reps)
        base = np.repeat(offsets[:-1][ai], reps)
        within = np.arange(len(vid)) - np.repeat(
            np.concatenate([[0], np.cumsum(reps)])[:-1], reps
        )
        frac = within / np.repeat(st, reps)
        angs = ang_a[vid] + frac * (ang_b[vid] - ang_a[vid])
        out[base + within, 0] = p[vid, 0] + abs(d) * np.cos(angs)
        out[base + within, 1] = p[vid, 1] + abs(d) * np.sin(angs)
    if total < 3:
        return None
    return np.vstack([out, out[:1]])


# max input vertices per flattened offset sweep: full-batch sweeps build
# ~40 temporaries of (total arc-expanded vertices) elements, and on the
# target VM multi-MB fresh temporaries page-fault (measured on 20k
# parcels/500k verts: one full sweep 1.2-34 s across the VM's fast/slow
# modes vs a stable 0.4-0.5 s in 60k-vert groups — identical output).
# Cache-resident groups also make the buffer bench mode-immune.
_SWEEP_VERTS = 60_000


def batch_offset_rings(
    rings_open: list, d: float, quad_segs: int, join_style: str,
    mitre_limit: float = 5.0,
) -> list:
    """:func:`_offset_ring` over MANY open rings in flattened numpy
    sweeps of at most ``_SWEEP_VERTS`` input vertices each (the batchclip
    amortization + chunking pattern). Identical formulas/tolerances;
    returns per ring the closed offset ring or None (degenerate ->
    caller falls back per ring)."""
    total = sum(len(r) for r in rings_open)
    if total > _SWEEP_VERTS and len(rings_open) > 1:
        out: list = []
        grp: list = []
        verts = 0
        for r in rings_open:
            if grp and verts + len(r) > _SWEEP_VERTS:
                out.extend(
                    _offset_rings_sweep(grp, d, quad_segs, join_style, mitre_limit)
                )
                grp = []
                verts = 0
            grp.append(r)
            verts += len(r)
        if grp:
            out.extend(
                _offset_rings_sweep(grp, d, quad_segs, join_style, mitre_limit)
            )
        return out
    return _offset_rings_sweep(rings_open, d, quad_segs, join_style, mitre_limit)


def _offset_rings_sweep(
    rings_open: list, d: float, quad_segs: int, join_style: str,
    mitre_limit: float = 5.0,
) -> list:
    P = len(rings_open)
    if P == 0:
        return []
    n = np.fromiter((len(r) for r in rings_open), dtype=np.int64, count=P)
    bad = n < 3
    PP = np.concatenate(rings_open).astype(np.float64, copy=False)
    offs = np.concatenate([[0], np.cumsum(n)])
    starts = offs[:-1]
    N = len(PP)
    ring_of = np.repeat(np.arange(P), n)

    # circular next/prev per ring
    nxt = np.arange(1, N + 1)
    nxt[offs[1:] - 1] = starts
    prv = np.arange(-1, N - 1)
    prv[starts] = offs[1:] - 1

    u = PP[nxt] - PP
    L = np.hypot(u[:, 0], u[:, 1])
    degen_edge = L < EPS
    if degen_edge.any():
        bad = bad | np.bincount(ring_of[degen_edge], minlength=P).astype(bool)
    L = np.where(degen_edge, 1.0, L)
    u = u / L[:, None]
    nrm = np.stack([u[:, 1], -u[:, 0]], axis=1) * d
    up = u[prv]
    a = PP + nrm[prv]
    b = PP + nrm
    c = up[:, 0] * u[:, 1] - up[:, 1] * u[:, 0]
    dotdir = (up * u).sum(axis=1)

    straight = (np.abs(c) < 1e-12) & (dotdir > 0)
    arc = (~straight) & (c * d > 0) & (join_style != "mitre")
    trim = ~straight & ~arc
    parallel = trim & (np.abs(c) < 1e-12)
    trim = trim & ~parallel

    ex = b[:, 0] - a[:, 0]
    ey = b[:, 1] - a[:, 1]
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (ex * u[:, 1] - ey * u[:, 0]) / np.where(np.abs(c) < 1e-12, 1.0, c)
    m = a + t[:, None] * up

    if join_style == "mitre":
        mdist = np.hypot(m[:, 0] - PP[:, 0], m[:, 1] - PP[:, 1])
        bevel = trim & (c * d > 0) & (mdist > mitre_limit * abs(d))
    else:
        bevel = np.zeros(N, dtype=bool)
    trim = trim & ~bevel

    two_pi = 2.0 * np.pi
    ang_a = np.arctan2(a[:, 1] - PP[:, 1], a[:, 0] - PP[:, 0])
    ang_b = np.arctan2(b[:, 1] - PP[:, 1], b[:, 0] - PP[:, 0])
    if d > 0:
        ang_b = np.where(arc & (ang_b < ang_a), ang_b + two_pi, ang_b)
    else:
        ang_b = np.where(arc & (ang_b > ang_a), ang_b - two_pi, ang_b)
    span = np.abs(ang_b - ang_a)
    steps = np.where(
        arc, np.maximum(1, np.ceil(quad_segs * span / (np.pi / 2)).astype(np.int64)), 0
    )

    counts = np.where(
        straight,
        1,
        np.where(arc, steps + 1, np.where(parallel | bevel, 2, 1)),
    )
    out_offs = np.concatenate([[0], np.cumsum(counts)])
    total = int(out_offs[-1])
    out = np.empty((total, 2), dtype=np.float64)
    onep = straight | trim
    out[out_offs[:-1][onep]] = np.where(straight[onep, None], a[onep], m[onep])
    if parallel.any():
        po = out_offs[:-1][parallel]
        out[po] = a[parallel]
        out[po + 1] = b[parallel]
    if bevel.any():
        bi = np.nonzero(bevel)[0]
        w = (m[bi] - PP[bi]) / mdist[bi, None]
        q = PP[bi] + w * (mitre_limit * abs(d))
        den1 = (up[bi] * w).sum(axis=1)
        den2 = (u[bi] * w).sum(axis=1)
        t1 = ((q - a[bi]) * w).sum(axis=1) / np.where(
            np.abs(den1) < 1e-12, 1.0, den1
        )
        t2 = ((q - b[bi]) * w).sum(axis=1) / np.where(
            np.abs(den2) < 1e-12, 1.0, den2
        )
        bo = out_offs[:-1][bi]
        out[bo] = a[bi] + t1[:, None] * up[bi]
        out[bo + 1] = b[bi] + t2[:, None] * u[bi]
    if arc.any():
        ai = np.nonzero(arc)[0]
        st = steps[ai]
        reps = st + 1
        vid = np.repeat(ai, reps)
        base = np.repeat(out_offs[:-1][ai], reps)
        within = np.arange(len(vid)) - np.repeat(
            np.concatenate([[0], np.cumsum(reps)])[:-1], reps
        )
        frac = within / np.repeat(st, reps)
        angs = ang_a[vid] + frac * (ang_b[vid] - ang_a[vid])
        out[base + within, 0] = PP[vid, 0] + abs(d) * np.cos(angs)
        out[base + within, 1] = PP[vid, 1] + abs(d) * np.sin(angs)

    # per-ring output slice boundaries: counts summed per ring
    ring_counts = np.zeros(P, dtype=np.int64)
    nz = np.nonzero(n > 0)[0]
    if len(nz):
        ring_counts[nz] = np.add.reduceat(counts, starts[nz])
    ring_out = np.concatenate([[0], np.cumsum(ring_counts)])
    results: list = []
    for i in range(P):
        if bad[i] or ring_counts[i] < 3:
            results.append(None)
            continue
        seg = out[ring_out[i]:ring_out[i + 1]]
        results.append(np.vstack([seg, seg[:1]]))
    return results


_EMPTY_I64 = np.empty(0, dtype=np.int64)


def _proper_crossings(closed_ring: np.ndarray):
    """Sparse (ii, jj) index arrays (ii < jj) of proper segment crossings
    of a ring with itself.

    Output-sensitive replacement for the old dense (m, m) matrix (which
    materialized ~12 m*m float64 temporaries and was ~35% of the whole
    buffer kernel on the parcel bench): sort segments by bbox min-x, pair
    each segment only with the later-sorted segments whose x-ranges
    overlap (searchsorted), prune by y-overlap, then run the exact
    crossing test on the few candidates. Semantics identical: adjacent
    segments can never properly cross (shared endpoint => any second
    intersection is collinear => denom ~ 0 => excluded), so no special
    casing is needed.
    """
    s = closed_ring[:-1]
    e = closed_ring[1:]
    m = len(s)
    if m < 3:
        return _EMPTY_I64, _EMPTY_I64
    minx = np.minimum(s[:, 0], e[:, 0])
    maxx = np.maximum(s[:, 0], e[:, 0])
    miny = np.minimum(s[:, 1], e[:, 1])
    maxy = np.maximum(s[:, 1], e[:, 1])
    order = np.argsort(minx, kind="stable")
    ominx = minx[order]
    hi = np.searchsorted(ominx, maxx[order], side="right")
    pos = np.arange(m)
    cnt = hi - pos - 1
    total = int(cnt.sum())
    if total <= 0:
        return _EMPTY_I64, _EMPTY_I64
    if total > 8_000_000:
        # pathological overlap density: bail like the old m^2 > 4M guard
        return None
    pi = np.repeat(pos, cnt)
    csum = np.concatenate([[0], np.cumsum(cnt)])
    pj = np.arange(total) - csum[pi] + pi + 1
    a = order[pi]
    b = order[pj]
    keep = np.minimum(maxy[a], maxy[b]) >= np.maximum(miny[a], miny[b])
    a = a[keep]
    b = b[keep]
    if len(a) == 0:
        return _EMPTY_I64, _EMPTY_I64
    d = e - s
    da = d[a]
    db = d[b]
    denom = da[:, 0] * db[:, 1] - da[:, 1] * db[:, 0]
    ex = s[b, 0] - s[a, 0]
    ey = s[b, 1] - s[a, 1]
    scale = np.maximum(np.abs(da).sum(axis=1), EPS) * np.maximum(
        np.abs(db).sum(axis=1), EPS
    )
    nz = np.abs(denom) > EPS * scale
    safe = np.where(nz, denom, 1.0)
    t = (ex * db[:, 1] - ey * db[:, 0]) / safe
    u = (ex * da[:, 1] - ey * da[:, 0]) / safe
    tol = 1e-9
    hit = nz & (t > tol) & (t < 1 - tol) & (u > tol) & (u < 1 - tol)
    if not hit.any():
        return _EMPTY_I64, _EMPTY_I64
    ah = a[hit]
    bh = b[hit]
    return np.minimum(ah, bh), np.maximum(ah, bh)


def _ring_is_simple(closed_ring: np.ndarray) -> bool:
    res = _proper_crossings(closed_ring)
    if res is None:
        return False  # too dense to check cheaply: let caller fall back
    return len(res[0]) == 0


def _excise_loops(closed_ring: np.ndarray, max_frac: float = 0.2):
    """Remove local self-intersection loops from an offset ring (the
    spike artifacts trimming produces at short-edged reflex corners):
    repeatedly find the tightest proper crossing (i, j), replace the
    sub-path i+1..j with the crossing point. Bails (None) when the
    excised loops amount to more than ``max_frac`` of the ring area —
    that is a genuine topology change (split/collapse), not an artifact.
    """
    ring = closed_ring
    total = abs(ring_signed_area(ring))
    removed = 0.0
    for _ in range(64):
        res = _proper_crossings(ring)
        if res is None:
            return None
        ii, jj = res
        if len(ii) == 0:
            return ring if removed <= max_frac * max(total, 1e-300) else None
        k = int(np.argmin(jj - ii))
        i, j = int(ii[k]), int(jj[k])
        s = ring[:-1]
        e = ring[1:]
        d1 = e[i] - s[i]
        d2 = e[j] - s[j]
        denom = d1[0] * d2[1] - d1[1] * d2[0]
        t = ((s[j][0] - s[i][0]) * d2[1] - (s[j][1] - s[i][1]) * d2[0]) / denom
        x = s[i] + t * d1
        loop = np.vstack([ring[i + 1 : j + 1], x[None, :], ring[i + 1 : i + 2]])
        rest = np.vstack([ring[: i + 1], x[None, :], ring[j + 1 :]])
        a_loop = abs(ring_signed_area(loop))
        a_rest = abs(ring_signed_area(rest))
        # keep whichever side carries the area (a single crossing makes a
        # figure-eight: the artifact is the SMALLER lobe, not always the
        # excised index range)
        if a_loop > a_rest:
            removed += a_rest
            ring = loop
        else:
            removed += a_loop
            ring = rest
        if len(ring) < 4:
            return None
    return None


def _any_vertex_closer(pts, s, e, thresh: float) -> bool:
    """True if any point lies closer than ``thresh`` to any segment.
    Fused squared-distance form of kernels.points_to_segments_dist for
    the buffer distance guard: no sqrt, no per-point min materialized."""
    if thresh <= 0.0 or len(pts) == 0 or len(s) == 0:
        return False
    d = e - s
    len2 = np.maximum((d * d).sum(axis=1), EPS)
    px = pts[:, None, 0] - s[None, :, 0]
    py = pts[:, None, 1] - s[None, :, 1]
    t = (px * d[None, :, 0] + py * d[None, :, 1]) / len2
    np.clip(t, 0.0, 1.0, out=t)
    dx = px - t * d[None, :, 0]
    dy = py - t * d[None, :, 1]
    d2 = dx * dx
    d2 += dy * dy
    return bool((d2 < thresh * thresh).any())


def _buffer_polygon_fast(
    rings: list[np.ndarray], d: float, quad_segs: int, join_style: str,
    mitre_limit: float = 5.0,
):
    """Offset-curve buffer of one polygon (list of closed rings, exterior
    first). Returns list of polygons ([] = vanished), or None to request
    the exact-but-slow piece-union fallback."""

    ext = rings[0]
    if ring_signed_area(ext) < 0:
        ext = ext[::-1].copy()
    a_in = ring_signed_area(ext)
    open_ext = _dedup_ring(ext)
    off = _offset_ring(open_ext, d, quad_segs, join_style, mitre_limit)
    if off is None:
        return None
    if not _ring_is_simple(off):
        if d < 0:
            # Erosion that self-crosses is a genuine topology change
            # (dumbbell/deep-notch polygons split into several lobes);
            # excising would silently delete a real lobe (<= max_frac of
            # the area). Only the exact piece-union path gets this right.
            return None
        off = _excise_loops(off)
        if off is None:
            return None
    a_out = ring_signed_area(off)
    if d < 0 and a_out <= _min_area_tol(a_in):
        return []  # fully eroded
    if a_out <= 0 or (d > 0 and a_out < a_in) or (d < 0 and a_out > a_in):
        return None
    # distance guard: every offset vertex must sit >= |d| from the source
    # boundary (catches "phantom" rings the trim construction can emit
    # when |d| exceeds the local feature size, e.g. erosion past the
    # inradius leaving a small inverted-but-CCW ring)
    seg_s = open_ext
    seg_e = np.roll(open_ext, -1, axis=0)
    if _any_vertex_closer(
        off[:-1], seg_s, seg_e, abs(d) * _arc_tol(quad_segs, join_style) - 1e-9
    ):
        return None
    new_rings = [off]
    for hole in rings[1:]:
        h = hole
        if ring_signed_area(h) > 0:
            h = h[::-1].copy()  # holes CW: region on the left of travel
        ha_in = ring_signed_area(h)  # negative
        open_h = _dedup_ring(h)
        oh = _offset_ring(open_h, d, quad_segs, join_style, mitre_limit)
        if oh is None:
            return None
        ha_out = ring_signed_area(oh)
        if d > 0 and ha_out >= -_MIN_HOLE:
            continue  # hole closed up
        if not _ring_is_simple(oh):
            if d > 0:
                # A shrinking hole that self-crosses may genuinely split
                # into several holes (dumbbell hole + buffer > neck/2);
                # excision would drop a real hole lobe. Exact path only.
                return None
            oh = _excise_loops(oh)
            if oh is None:
                return None
            ha_out = ring_signed_area(oh)
            if d > 0 and ha_out >= -_MIN_HOLE:
                continue
        if (d > 0 and ha_out < ha_in) or (d < 0 and ha_out > ha_in):
            return None
        if _any_vertex_closer(
            oh[:-1],
            open_h,
            np.roll(open_h, -1, axis=0),
            abs(d) * _arc_tol(quad_segs, join_style) - 1e-9,
        ):
            return None
        new_rings.append(oh)
    return [new_rings]


_MIN_HOLE = 1e-12


def _arc_tol(quad_segs: int, join_style: str) -> float:
    """Distance-guard slack: arc CHORDS sit inside the true offset circle
    by the sagitta (and chord-chord excision points up to ~4x that) —
    legitimate discretization, not a phantom (phantoms violate by the
    feature-size overshoot, orders of magnitude more)."""
    if join_style == "mitre":
        return 1.0 - 1e-6
    sagitta = 1.0 - np.cos(np.pi / (4.0 * max(quad_segs, 1)))
    return 1.0 - 4.0 * sagitta - 1e-6


def _min_area_tol(a_in: float) -> float:
    return max(1e-12, 1e-12 * abs(a_in))


def _dedup_ring(closed: np.ndarray) -> np.ndarray:
    """Open the ring and drop consecutive (near-)duplicate vertices."""
    r = closed[:-1] if len(closed) > 1 and np.array_equal(closed[0], closed[-1]) else closed
    if len(r) > 1:
        keep = np.ones(len(r), dtype=bool)
        keep[1:] = np.abs(np.diff(r, axis=0)).sum(axis=1) > 1e-12
        if not keep[0]:
            keep[0] = True
        r = r[keep]
        if len(r) > 1 and np.abs(r[0] - r[-1]).sum() <= 1e-12:
            r = r[:-1]
    return r


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
        # analytic offset fast path (hole-free parts): ~100x cheaper than
        # the sausage-difference construction below
        fast: list | None = []
        for rings in polys:
            if len(rings) > 1:
                fast = None
                break
            r = _buffer_polygon_fast(rings, -d, quad_segs, join_style, mitre_limit)
            if r is None:
                fast = None
                break
            fast.extend(r)
        if fast is not None:
            return _mp_to_geom(fast)
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
    # purely-polygonal input: analytic offset fast path per part, then a
    # (rarely needed) union of grown parts that now overlap
    if geom.dim() == 2:
        base0 = _geom_to_mp(geom)
        fast2: list | None = []
        for rings in base0:
            r = _buffer_polygon_fast(rings, d, quad_segs, join_style, mitre_limit)
            if r is None:
                fast2 = None
                break
            fast2.extend(r)
        if fast2 is not None:
            if len(fast2) > 1:
                fast2 = union_all_polys(fast2)
            return _mp_to_geom(fast2)

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
                _path_sausage(ls, d, quad_segs, cap_style, join_style,
                              closed=False, mitre_limit=mitre_limit)
            )
    # polygons -> original + boundary sausage. _geom_to_mp already
    # returns rings in the interior-left convention (exteriors CCW via
    # _ccw, holes CW via _cw — clip.py), which the mitre-join reflex test
    # in _path_sausage relies on to read turn direction.
    base = _geom_to_mp(geom)
    for rings in base:
        for ring in rings:
            pieces.extend(
                _path_sausage(ring, d, quad_segs, "round", join_style,
                              closed=True, mitre_limit=mitre_limit,
                              skip_reflex_joins=True)
            )
    all_polys = list(base) + [[p if ring_signed_area(p) > 0 else p[::-1].copy()] for p in pieces]
    return _mp_to_geom(union_all_polys(all_polys))


# -------------------------------------------------------------- convex hull


def _batch_vertex_closer(
    pts_list: list, segs_list: list, thresh: float, chunk: int = 60_000
) -> np.ndarray:
    # chunk default measured on 20k parcels/63M combos: 3.4 s at 30-60k
    # vs 4-10 s at 262k and 10-22 s at 1M — same cache-residency cliff
    # as _SWEEP_VERTS/_MAX_COMBOS, and mode-stable at the small sizes
    """Per-pair "any point closer than thresh to any segment" over many
    (points, open-ring) pairs — :func:`_any_vertex_closer` flattened
    across the batch (same squared-distance form), chunked so working
    arrays stay cache-sized."""
    P = len(pts_list)
    out = np.zeros(P, dtype=bool)
    if P == 0 or thresh <= 0.0:
        return out
    kp = np.fromiter((len(p) for p in pts_list), dtype=np.int64, count=P)
    ms = np.fromiter((len(s) for s in segs_list), dtype=np.int64, count=P)
    PTS = np.concatenate(pts_list) if kp.sum() else np.empty((0, 2))
    S = np.concatenate(segs_list) if ms.sum() else np.empty((0, 2))
    # closing segment wraps to the ring start: build E with the wrap
    E = np.empty_like(S)
    soff = np.concatenate([[0], np.cumsum(ms)])
    if len(S):
        E[:-1] = S[1:]
        E[soff[1:] - 1] = S[soff[:-1]]
    D = E - S
    len2 = np.maximum((D * D).sum(axis=1), EPS)
    poff = np.concatenate([[0], np.cumsum(kp)])[:-1]
    counts = kp * ms
    t2 = thresh * thresh
    blk_lo = 0
    while blk_lo < P:
        blk_hi = blk_lo
        combos = 0
        while blk_hi < P and (combos == 0 or combos + counts[blk_hi] <= chunk):
            combos += counts[blk_hi]
            blk_hi += 1
        bcnt = counts[blk_lo:blk_hi]
        nzp = bcnt > 0
        if not nzp.any():
            blk_lo = blk_hi
            continue
        total = int(bcnt.sum())
        start = np.concatenate(([0], np.cumsum(bcnt)[:-1]))
        within = np.arange(total, dtype=np.int64) - np.repeat(start, bcnt)
        m_rep = np.maximum(np.repeat(ms[blk_lo:blk_hi], bcnt), 1)
        pi = np.repeat(poff[blk_lo:blk_hi], bcnt) + within // m_rep
        si = np.repeat(soff[:-1][blk_lo:blk_hi], bcnt) + within % m_rep
        px = PTS[pi, 0] - S[si, 0]
        py = PTS[pi, 1] - S[si, 1]
        t = (px * D[si, 0] + py * D[si, 1]) / len2[si]
        np.clip(t, 0.0, 1.0, out=t)
        dx = px - t * D[si, 0]
        dy = py - t * D[si, 1]
        d2 = dx * dx
        d2 += dy * dy
        close = d2 < t2
        idx = np.nonzero(nzp)[0]
        out[blk_lo + idx] = np.logical_or.reduceat(close, start[idx])
        blk_lo = blk_hi
    return out

def batch_buffer(
    geoms: list,
    distance: float,
    quad_segs: int = 8,
    cap_style: str = "round",
    join_style: str = "round",
    mitre_limit: float = 5.0,
    single_sided: bool = False,
) -> list:
    """Elementwise :func:`buffer_geom` over a list. Hole-free
    single-polygon geometries (the parcel hot case, 99.9% on the bench
    layers) run their offset construction through ONE flattened
    :func:`batch_offset_rings` sweep; every other input — and any ring
    the batch flags as degenerate or failing the simplicity/area/distance
    guards — falls back to ``buffer_geom`` unchanged. ``None`` in maps to
    ``None`` out."""
    n_g = len(geoms)
    out: list = [None] * n_g
    d = float(distance)
    idxs: list[int] = []
    opens: list[np.ndarray] = []
    a_ins: list[float] = []
    batchable = abs(d) >= EPS and not single_sided
    for i, g in enumerate(geoms):
        if g is None:
            continue
        if not batchable or g.is_empty() or g.dim() != 2:
            out[i] = buffer_geom(
                g, distance, quad_segs, cap_style, join_style,
                mitre_limit, single_sided,
            )
            continue
        polys = _geom_to_mp(g)
        if len(polys) != 1 or len(polys[0]) != 1:
            out[i] = buffer_geom(
                g, distance, quad_segs, cap_style, join_style,
                mitre_limit, single_sided,
            )
            continue
        ext = polys[0][0]
        if ring_signed_area(ext) < 0:
            ext = ext[::-1].copy()
        a_ins.append(ring_signed_area(ext))
        opens.append(_dedup_ring(ext))
        idxs.append(i)

    if not idxs:
        return out
    offs = batch_offset_rings(opens, d, quad_segs, join_style, mitre_limit)
    guard = abs(d) * _arc_tol(quad_segs, join_style) - 1e-9

    def _fallback(i):
        return buffer_geom(
            geoms[i], distance, quad_segs, cap_style, join_style,
            mitre_limit, single_sided,
        )

    # pass 1: simplicity / excision / area checks (identical to
    # _buffer_polygon_fast); survivors collect for the batched guard
    surv_k: list[int] = []
    surv_off: list[np.ndarray] = []
    for k, off in enumerate(offs):
        i = idxs[k]
        if off is None:
            out[i] = _fallback(i)
            continue
        if not _ring_is_simple(off):
            if d < 0:
                out[i] = _fallback(i)
                continue
            off = _excise_loops(off)
            if off is None:
                out[i] = _fallback(i)
                continue
        a_in = a_ins[k]
        a_out = ring_signed_area(off)
        if d < 0 and a_out <= _min_area_tol(a_in):
            out[i] = Geometry.empty(MULTIPOLYGON)
            continue
        if a_out <= 0 or (d > 0 and a_out < a_in) or (d < 0 and a_out > a_in):
            out[i] = _fallback(i)
            continue
        surv_k.append(k)
        surv_off.append(off)
    # pass 2: one flattened distance guard over every surviving ring
    # (every offset vertex must sit >= |d|*arc_tol from its source ring)
    close = _batch_vertex_closer(
        [o[:-1] for o in surv_off], [opens[k] for k in surv_k], guard
    )
    for j, k in enumerate(surv_k):
        i = idxs[k]
        out[i] = _fallback(i) if close[j] else _mp_to_geom([[surv_off[j]]])
    return out

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
def _lang_mask(path: np.ndarray, tol: float, lookahead: int = 8) -> np.ndarray:
    """LANG simplification keep-mask (fixed search window): from the
    current key point, try the point ``lookahead`` ahead as the chord
    end; while any intermediate point is farther than ``tol`` from the
    chord, pull the end one step closer; the accepted end becomes the
    next key (reference exposes this via pygeoops,
    ``util/_geometry_util.py:32-38``)."""
    n = len(path)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    key = 0
    while key < n - 1:
        cand = min(key + lookahead, n - 1)
        while cand > key + 1:
            seg = path[cand] - path[key]
            L = np.hypot(seg[0], seg[1])
            pts = path[key + 1 : cand]
            if L < EPS:
                dist = np.hypot(pts[:, 0] - path[key][0], pts[:, 1] - path[key][1])
            else:
                dist = (
                    np.abs(
                        seg[0] * (path[key][1] - pts[:, 1])
                        - seg[1] * (path[key][0] - pts[:, 0])
                    )
                    / L
                )
            if len(dist) and dist.max() > tol:
                cand -= 1
            else:
                break
        keep[cand] = True
        key = cand
    return keep


def _lang_plus_mask(path: np.ndarray, tol: float, lookahead: int = 8) -> np.ndarray:
    """LANG+ — LANG iterated to a fixpoint, so straight stretches longer
    than one window keep shedding points (pygeoops' 'lang+': LANG without
    the per-window elimination cap)."""
    idx = np.arange(len(path))
    while True:
        m = _lang_mask(path[idx], tol, lookahead)
        if m.all():
            break
        idx = idx[m]
    keep = np.zeros(len(path), dtype=bool)
    keep[idx] = True
    return keep


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
        elif algorithm == "lang":
            out = path[_lang_mask(path, tolerance)]
        elif algorithm in ("lang+", "langp"):
            out = path[_lang_plus_mask(path, tolerance)]
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
def _cut_crossings(g: Geometry, axis: int, cut: float) -> np.ndarray:
    """Sorted along-cut coordinates where the parent's boundary strictly
    crosses the cut line — ONE canonical interpolation both halves snap
    to, so the seams match bit-for-bit."""
    vals = []
    for rings in g.polygons():
        for ring in rings:
            a, b = ring[:-1], ring[1:]
            ca = a[:, axis] - cut
            cb = b[:, axis] - cut
            m = (ca * cb) < 0.0
            if m.any():
                t = ca[m] / (ca[m] - cb[m])
                o = 1 - axis
                vals.append(a[m, o] + t * (b[m, o] - a[m, o]))
    if not vals:
        return np.empty(0)
    return np.sort(np.concatenate(vals))


def _snap_axis(
    g: Geometry, axis: int, value: float, tol: float, crossings: np.ndarray
) -> None:
    """Pull vertices within ``tol`` of an axis-aligned cut line exactly
    onto it, and snap their along-cut coordinate to the nearest parent
    crossing (in place). The two halves of a cut interpolate the same
    crossing with opposite operand order, so they disagree by ~1e-10 at
    the seam — without both snaps, re-unioning the halves leaves
    hairline slivers (and the union weld's exact edge cancellation sees
    micro-segments and falls back to the perturbing clipper)."""
    o = 1 - axis
    for rings in g.polygons():
        for ring in rings:
            col = ring[:, axis]
            near = np.abs(col - value) <= tol
            if not near.any():
                continue
            col[near] = value
            if crossings.size:
                oc = ring[near, o]
                idx = np.clip(
                    np.searchsorted(crossings, oc), 0, crossings.size - 1
                )
                idx_lo = np.maximum(idx - 1, 0)
                pick = np.where(
                    np.abs(crossings[idx] - oc) <= np.abs(crossings[idx_lo] - oc),
                    idx,
                    idx_lo,
                )
                snapped = crossings[pick]
                ok = np.abs(snapped - oc) <= tol
                oc[ok] = snapped[ok]
                ring[near, o] = oc


def subdivide(geom: Geometry, max_coords: int = 2000) -> list[Geometry]:
    """Split complex geometries into parts of <= max_coords vertices by
    recursive bbox halving (the reference subdivides complex inputs before
    overlays, ``_geoops_sql.py:1358-1444``, defaults per op in
    ``helpers/_options.py:625-765``)."""
    from .clip import intersection as g_intersection
    from .kernels import bounds as g_bounds

    from .batchclip import ring_box_clip
    from .geom import MULTIPOLYGON, POLYGON

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
        if g.typ == MULTIPOLYGON and len(g.data) > 1:
            # split parts first: each is a separate subdivide output
            # anyway, and the single-ring cut fast path needs one ring
            stack.extend(Geometry(POLYGON, poly) for poly in g.data)
            continue
        minx, miny, maxx, maxy = g_bounds(g)
        cut_axis = 0 if maxx - minx >= maxy - miny else 1
        cut = (minx + maxx) / 2.0 if cut_axis == 0 else (miny + maxy) / 2.0
        # seam snap tolerance: relative to coordinate magnitude and span
        # (GEOS-style); covers the clipper's ~1e-8 crossing interpolation
        # error without disturbing genuine vertices
        snap_tol = 1e-9 * max(1.0, abs(cut), maxx - minx, maxy - miny) * 100
        # never cut exactly through (or within tol of) a vertex: the
        # clipper resolves on-boundary vertices by PERTURBING the
        # subject, and the two halves perturb differently — their seams
        # then disagree by ~1e-8 and the re-union leaves slivers. A
        # shifted cut keeps every crossing strict and canonical.
        axis_coords = np.concatenate(
            [ring[:, cut_axis] for rings in g.polygons() for ring in rings]
            or [np.empty(0)]
        )
        if axis_coords.size:
            for _ in range(16):
                if np.min(np.abs(axis_coords - cut)) > snap_tol:
                    break
                cut += 2.7 * snap_tol
        if cut_axis == 0:
            boxes = (
                (minx - 1, miny - 1, cut, maxy + 1),
                (cut, miny - 1, maxx + 1, maxy + 1),
            )
        else:
            boxes = (
                (minx - 1, miny - 1, maxx + 1, cut),
                (minx - 1, cut, maxx + 1, maxy + 1),
            )
        crossings = _cut_crossings(g, cut_axis, cut)
        halves = []
        for bx in boxes:
            # batched ring x box cut for big simple rings (the per-pair
            # clipper's Python node lists cost ~seconds per 300k-coord
            # cut); None -> exact per-pair fallback
            piece = ring_box_clip(g, *bx)
            if piece is None:
                piece = g_intersection(g, Geometry.box(*bx))
            if piece is not None and not piece.is_empty():
                _snap_axis(piece, cut_axis, cut, snap_tol, crossings)
                halves.append(piece)
        if len(halves) <= 1 or all(
            h.num_coords() >= g.num_coords() for h in halves
        ):
            # cannot split further / no progress (max_coords below the
            # minimum representable ring: halving a 5-coord box yields
            # two 5-coord boxes forever)
            out.append(g)
        else:
            stack.extend(halves)
    out.extend(stack)
    return out
