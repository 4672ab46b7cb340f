"""Property-based tests (hypothesis) for the from-scratch geometry
kernels, against closed-form rectangle/point arithmetic — no Spark."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geofileops_spark.geometry import clip as C
from geofileops_spark.geometry import kernels as K
from geofileops_spark.geometry import wkb as W
from geofileops_spark.geometry.geom import Geometry

coord = st.integers(min_value=-500, max_value=500)


@st.composite
def boxes(draw):
    x0 = draw(coord)
    y0 = draw(coord)
    w = draw(st.integers(min_value=1, max_value=300))
    h = draw(st.integers(min_value=1, max_value=300))
    return (x0, y0, x0 + w, y0 + h)


def rect_overlap(a, b):
    w = min(a[2], b[2]) - max(a[0], b[0])
    h = min(a[3], b[3]) - max(a[1], b[1])
    return max(w, 0) * max(h, 0)


def gbox(b):
    return Geometry.box(*[float(v) for v in b])


@settings(max_examples=200, deadline=None)
@given(boxes(), boxes())
def test_box_intersection_area(a, b):
    inter = C.intersection(gbox(a), gbox(b))
    assert abs(K.area(inter) - rect_overlap(a, b)) < 1e-6


@settings(max_examples=200, deadline=None)
@given(boxes(), boxes())
def test_box_difference_area(a, b):
    diff = C.difference(gbox(a), gbox(b))
    expect = (a[2] - a[0]) * (a[3] - a[1]) - rect_overlap(a, b)
    assert abs(K.area(diff) - expect) < 1e-6


@settings(max_examples=100, deadline=None)
@given(boxes(), boxes())
def test_box_union_area(a, b):
    u = C.union_geoms([gbox(a), gbox(b)])
    expect = (
        (a[2] - a[0]) * (a[3] - a[1])
        + (b[2] - b[0]) * (b[3] - b[1])
        - rect_overlap(a, b)
    )
    assert abs(K.area(u) - expect) < 1e-4 * max(1, expect)


@settings(max_examples=100, deadline=None)
@given(boxes(), st.lists(st.tuples(coord, coord), min_size=1, max_size=50))
def test_points_in_box(b, pts):
    arr = np.asarray(pts, dtype=np.float64) + 0.5  # off integer boundaries
    cls = K.points_in_multipolygon(arr, gbox(b))
    inside = (
        (arr[:, 0] > b[0]) & (arr[:, 0] < b[2]) & (arr[:, 1] > b[1]) & (arr[:, 1] < b[3])
    )
    assert ((cls == 2) == inside).all()


@settings(max_examples=100, deadline=None)
@given(boxes())
def test_wkb_roundtrip_box(b):
    g = gbox(b)
    g2 = W.loads(W.dumps(g))
    assert g2.type_name() == g.type_name()
    assert np.allclose(g2.coords(), g.coords())
    # WKT round-trip too
    g3 = W.from_wkt(W.to_wkt(g))
    assert abs(K.area(g3) - K.area(g)) < 1e-9


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(coord, coord), min_size=3, max_size=12), st.integers(0, 3))
def test_relate_symmetry_boxes(pts, k):
    # intersects/disjoint symmetry on hull-able point sets vs a box
    from geofileops_spark.geometry import predicates as P
    from geofileops_spark.geometry.transform import convex_hull

    mp = Geometry(4, np.asarray(pts, dtype=np.float64))
    hull = convex_hull(mp)
    if hull.dim() != 2:
        return
    b = gbox((-100 + 50 * k, -100, 100, 100))
    assert P.intersects(hull, b) == P.intersects(b, hull)
    assert P.disjoint(hull, b) == (not P.intersects(hull, b))


@st.composite
def guillotine_tiling(draw):
    """Random rectilinear tiling of [0,32]^2 by recursive guillotine cuts,
    each tile's edges then subdivided at DIFFERENT interior points — so
    adjacent tiles share partial axis-parallel seams with mismatched
    vertex sets (the weld's hardest certification case: no exact
    duplicate edges across the seam, only collinear overlaps)."""
    rects = [(0, 0, 32, 32)]
    for _ in range(draw(st.integers(min_value=2, max_value=5))):
        i = draw(st.integers(min_value=0, max_value=len(rects) - 1))
        x0, y0, x1, y1 = rects[i]
        if draw(st.booleans()) and x1 - x0 >= 2:
            c = draw(st.integers(min_value=x0 + 1, max_value=x1 - 1))
            rects[i] = (x0, y0, c, y1)
            rects.append((c, y0, x1, y1))
        elif y1 - y0 >= 2:
            c = draw(st.integers(min_value=y0 + 1, max_value=y1 - 1))
            rects[i] = (x0, y0, x1, c)
            rects.append((x0, c, x1, y1))
    polys = []
    for x0, y0, x1, y1 in rects:
        corners = [(x0, y0), (x1, y0), (x1, y1), (x0, y1)]
        pts = []
        for (ax, ay), (bx, by) in zip(corners, corners[1:] + corners[:1]):
            pts.append((float(ax), float(ay)))
            # mismatched per-tile subdivision of the shared edge
            if draw(st.booleans()):
                t = draw(st.integers(min_value=1, max_value=7)) / 8.0
                pts.append((ax + (bx - ax) * t, ay + (by - ay) * t))
        pts.append(pts[0])
        polys.append([np.array(pts, dtype=np.float64)])
    return polys


@settings(max_examples=100, deadline=None)
@given(guillotine_tiling())
def test_weld_all_guillotine_partial_seams(polys):
    # a weld that ACCEPTS must be the exact union: one polygon (the tiles
    # tile a square), exact area 1024, no holes; None (fall back to the
    # exact GH union) is sound but must not be the common case
    out = C.weld_all(polys)
    if out is None:
        return
    assert len(out) == 1
    assert len(out[0]) == 1
    assert abs(C.ring_signed_area(out[0][0])) == 1024.0
