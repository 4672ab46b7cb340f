"""Batched intersection kernel must agree EXACTLY with the per-pair
clipper — it is the same algorithm with amortized numpy dispatch, and
every degeneracy routes back to the per-pair path."""

import numpy as np
import pytest

from geofileops_spark.geometry import clip as C
from geofileops_spark.geometry import geom as G
from geofileops_spark.geometry.batchclip import batch_intersection
from geofileops_spark.geometry.kernels import area


def poly(*pts):
    r = np.array(list(pts) + [pts[0]], float)
    return G.Geometry(G.POLYGON, [r])


def star(cx, cy, n, seed):
    rng = np.random.default_rng(seed)
    th = 2 * np.pi * np.arange(n) / n
    rad = 30 * (0.55 + 0.4 * rng.random(n))
    ring = np.empty((n + 1, 2))
    ring[:n, 0] = cx + rad * np.cos(th)
    ring[:n, 1] = cy + rad * np.sin(th)
    ring[n] = ring[0]
    return G.Geometry(G.POLYGON, [ring])


def _check(gs1, gs2):
    got = batch_intersection(gs1, gs2)
    for i, (g1, g2, g) in enumerate(zip(gs1, gs2, got)):
        ref = C.intersection(g1, g2)
        assert area(ref) == area(g), f"pair {i}: {area(ref)} != {area(g)}"


def test_batch_matches_perpair_stars():
    gs1 = [star(0, 0, 8 + i % 20, i) for i in range(200)]
    gs2 = [star(25, 20, 8 + (i * 7) % 20, 1000 + i) for i in range(200)]
    _check(gs1, gs2)


def test_batch_matches_perpair_integer_grid():
    rng = np.random.default_rng(7)
    gs1, gs2 = [], []
    for _ in range(400):
        def mk():
            pts = rng.integers(0, 6, size=(int(rng.integers(3, 7)), 2))
            c = pts.mean(axis=0)
            o = np.argsort(np.arctan2(pts[:, 1] - c[1], pts[:, 0] - c[0]))
            p = pts[o].astype(float)
            keep = [0]
            for i in range(1, len(p)):
                if not np.allclose(p[i], p[keep[-1]]):
                    keep.append(i)
            p = p[keep]
            return p if len(p) >= 3 else None
        p1, p2 = mk(), mk()
        if p1 is None or p2 is None:
            continue
        gs1.append(poly(*p1))
        gs2.append(poly(*p2))
    _check(gs1, gs2)


def test_batch_special_configs():
    sq = poly((0, 0), (10, 0), (10, 10), (0, 10))
    tri_in = poly((2, 2), (4, 2), (3, 4))
    far = poly((50, 50), (51, 50), (51, 51))
    touch = poly((10, 10), (12, 10), (12, 12), (10, 12))
    shared = poly((10, 0), (14, 0), (14, 10), (10, 10))
    gs1 = [sq, tri_in, sq, sq, sq, None]
    gs2 = [tri_in, sq, far, touch, shared, sq]
    got = batch_intersection(gs1, gs2)
    assert area(got[0]) == pytest.approx(2.0)  # containment a contains b
    assert area(got[1]) == pytest.approx(2.0)  # containment b contains a
    assert got[2].is_empty()
    assert area(got[3]) == 0.0 or got[3].is_empty()  # vertex touch
    assert area(got[4]) == 0.0 or got[4].is_empty()  # shared edge
    assert got[5].is_empty()  # null input


def test_batch_holes_and_multis_route_to_perpair():
    outer = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
    hole = np.array([[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]], float)
    donut = G.Geometry(G.POLYGON, [outer, hole])
    blade = poly((3, 3), (7, 3), (7, 7), (3, 7))
    got = batch_intersection([donut], [blade])[0]
    ref = C.intersection(donut, blade)
    assert area(got) == area(ref) == pytest.approx(16.0 - 4.0)


def test_ring_box_clip_matches_exact():
    from geofileops_spark.geometry.batchclip import ring_box_clip

    # dense smooth ring (the subdivide hot case)
    th = np.linspace(0, 2 * np.pi, 501)
    r = 10 * (0.8 + 0.1 * np.sin(5 * th))
    ring = np.column_stack([20 + r * np.cos(th), 20 + r * np.sin(th)])
    ring[-1] = ring[0]
    g = G.Geometry(G.POLYGON, [ring])
    got = ring_box_clip(g, 9.1, 9.1, 20.137, 31.3)
    ref = C.intersection(g, G.Geometry.box(9.1, 9.1, 20.137, 31.3))
    assert got is not None
    assert area(got) == pytest.approx(area(ref), rel=1e-9)
    # a cut line exactly through ring vertices (x=20 at cos=0) is
    # degenerate -> None, the caller falls back to the exact clipper
    assert ring_box_clip(g, 9, 9, 20, 31) is None
    # multis / holes route back to the caller's exact path
    hole = np.array([[18, 18], [22, 18], [22, 22], [18, 22], [18, 18]], float)
    assert (
        ring_box_clip(G.Geometry(G.POLYGON, [ring, hole]), 9.1, 9.1, 20.137, 31.3)
        is None
    )
    # disjoint box -> empty
    assert ring_box_clip(g, 100, 100, 110, 110).is_empty()


def test_window_segments_prunes_consistently():
    from geofileops_spark.geometry.kernels import (
        any_segment_intersection,
        window_segments,
    )

    th = np.linspace(0, 2 * np.pi, 5001)
    ring = np.column_stack([50 + 40 * np.cos(th), 50 + 40 * np.sin(th)])
    ring[-1] = ring[0]
    big = G.Geometry(G.POLYGON, [ring])
    # small polygon crossing the big boundary near (90, 50)
    small_cross = poly((88, 48), (93, 48), (93, 52), (88, 52))
    # small polygon wholly inside
    small_in = poly((50, 50), (52, 50), (52, 52), (50, 52))
    s, e = window_segments(big, 88, 48, 93, 52, min_edges=1)
    assert 0 < len(s) < 5000
    p1, t1 = any_segment_intersection(big, small_cross)
    assert p1 or t1
    p2, t2 = any_segment_intersection(big, small_in)
    assert not p2 and not t2
