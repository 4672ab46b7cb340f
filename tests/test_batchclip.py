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


# --------------------------------------------------- batched difference


def _rand_ring(rng, cx, cy, r, n):
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    rad = rng.uniform(0.4 * r, r, n)
    ring = np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], axis=1)
    return np.vstack([ring, ring[:1]])


def _mp_area(mp):
    t = 0.0
    for p in mp:
        for i, r in enumerate(p):
            a = abs(C.ring_signed_area(r))
            t += a if i == 0 else -a
    return t


def test_batch_ring_differences_matches_ring_op():
    """Vertex-exact parity with the per-pair clipper on crossing pairs;
    containment cases produce the documented markers."""
    from geofileops_spark.geometry.batchclip import (
        UNCHANGED,
        Holed,
        batch_ring_differences,
    )

    rng = np.random.default_rng(7)
    for t in range(150):
        na, nb = int(rng.integers(6, 30)), int(rng.integers(6, 30))
        a = _rand_ring(rng, 0, 0, 1.0, na)[:-1]
        b = _rand_ring(rng, 0.7, 0, rng.uniform(0.3, 0.9), nb)[:-1]
        bb_a, bb_b = C._ring_bbox(a), C._ring_bbox(b)
        w = np.asarray(
            [
                (
                    max(bb_a[0], bb_b[0]),
                    max(bb_a[1], bb_b[1]),
                    min(bb_a[2], bb_b[2]),
                    min(bb_a[3], bb_b[3]),
                )
            ]
        )
        if w[0, 0] >= w[0, 2] or w[0, 1] >= w[0, 3]:
            continue
        res = batch_ring_differences([(a, b)], w)[0]
        if res is None:
            continue  # degeneracy: per-pair fallback, exercised elsewhere
        ref = C._ring_op(
            np.vstack([a, a[:1]]), np.vstack([b, b[:1]]), "difference"
        )
        if res is UNCHANGED:
            assert len(ref) == 1 and len(ref[0]) == len(a) + 1
            continue
        if isinstance(res, Holed):
            assert len(ref) == 2  # subject + hole
            assert np.allclose(res.hole, ref[1])
            continue
        assert len(res) == len(ref)
        for rg, rr in zip(
            sorted(res, key=lambda r: (len(r), r[0, 0])),
            sorted(ref, key=lambda r: (len(r), r[0, 0])),
        ):
            assert rg.shape == rr.shape
            assert np.allclose(rg, rr, atol=1e-12)


def test_tiled_difference_matches_sequential_disjoint_blades():
    """The batched blade-rounds tiled difference must equal the plain
    sequential subtraction exactly when blades are disjoint (the
    documented precondition) — including swallowed blades (deferred
    holes), splits after a hole is pending, and big (>=64 vertex)
    subject rings taking the no-sweep containment fast path."""
    rng = np.random.default_rng(11)
    compared = 0
    for trial in range(12):
        n_subj = int(rng.integers(30, 400))
        ma = [[_rand_ring(rng, 0, 0, 10.0, n_subj)]]
        mb = []
        pitch = 1.9
        for gx in range(-5, 6):
            for gy in range(-5, 6):
                if rng.random() < 0.4:
                    cx = gx * pitch + rng.uniform(-0.2, 0.2)
                    cy = gy * pitch + rng.uniform(-0.2, 0.2)
                    mb.append(
                        [
                            _rand_ring(
                                rng, cx, cy,
                                rng.uniform(0.3, 0.8),
                                int(rng.integers(5, 30)),
                            )
                        ]
                    )
        if len(mb) < 16:
            continue
        tiled = C._mp_difference_tiled(ma, mb)
        seq = list(ma)
        for pb in mb:
            nxt = []
            for pa in seq:
                nxt.extend(C.poly_difference(pa, pb))
            seq = nxt
            if not nxt:
                break
        if tiled is None:
            continue  # weld could not certify: callers fall back
        compared += 1
        # 1e-6: the tiled path's seam weld reconstructs boundaries in a
        # different FP order than plain sequential subtraction — ~2e-7
        # absolute deviations pre-date the batched kernel (verified
        # value-identical old vs new on this very seed)
        assert _mp_area(tiled) == pytest.approx(_mp_area(seq), rel=1e-6)
    assert compared >= 8


def test_tiled_difference_defers_swallowed_blade_holes():
    """A blade strictly inside the subject becomes a hole; a later blade
    crossing the subject splits it, and the pending hole must land in
    the correct split piece."""
    # subject: big box as a 100-vertex ring (stays off the rect fast path)
    th = np.linspace(0, 2 * np.pi, 101)
    subj = np.column_stack(
        [50 + 49 * np.cos(th), 50 + 49 * np.sin(th)]
    )
    subj[-1] = subj[0]
    ma = [[subj]]
    mb = []
    # 16 tiny swallowed blades on the left half (become pending holes)
    for i in range(16):
        cx, cy = 25 + (i % 4) * 8, 25 + (i // 4) * 8
        sq = np.array(
            [
                [cx, cy], [cx + 2.3, cy + 0.1], [cx + 2.2, cy + 2.4],
                [cx - 0.1, cy + 2.2], [cx, cy],
            ]
        )
        mb.append([sq])
    # one blade slicing vertically right of every square (x >= 60)
    blade = np.array(
        [[60.3, -10], [63.7, -10], [63.9, 110], [60.1, 110], [60.3, -10]]
    )
    mb.append([blade])
    tiled = C._mp_difference_tiled(ma, mb)
    seq = list(ma)
    for pb in mb:
        nxt = []
        for pa in seq:
            nxt.extend(C.poly_difference(pa, pb))
        seq = nxt
    if tiled is None:
        pytest.skip("weld not certified on this fixture")
    # 1e-6 rel: weld-seam FP order differs from plain sequential (same
    # deviation on the pre-batch kernel, value-identical old vs new)
    assert _mp_area(tiled) == pytest.approx(_mp_area(seq), rel=1e-6)
    # the 16 swallowed squares all survived as holes in the result
    n_holes = sum(len(p) - 1 for p in tiled)
    assert n_holes == 16


def test_tiled_difference_uses_batch_sweep(monkeypatch):
    """Regression guard: the tiled difference must actually route pairs
    through the batched sweep (a silent change in the batchable
    condition would fall everything back to per-pair and only show up
    as a 3x slowdown, not a failure)."""
    from geofileops_spark.geometry import batchclip as BC

    calls = {"pairs": 0}
    orig = BC._batch_ring_ops

    def probe(pairs, windows=None, op="intersection"):
        if op == "difference":
            calls["pairs"] += len(pairs)
        return orig(pairs, windows, op)

    monkeypatch.setattr(BC, "_batch_ring_ops", probe)
    rng = np.random.default_rng(2)
    th = np.linspace(0, 2 * np.pi, 201)
    subj = np.column_stack([50 + 49 * np.cos(th), 50 + 49 * np.sin(th)])
    subj[-1] = subj[0]
    mb = []
    for gx in range(6):
        for gy in range(6):
            cx, cy = 15 + gx * 12, 15 + gy * 12
            r = _rand_ring(rng, cx, cy, 4.0, 12)
            mb.append([r])
    out = C._mp_difference_tiled([[subj]], mb)
    assert out is not None
    assert calls["pairs"] > 0
