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
