"""Tests: buffer / convex hull / simplify / subdivide / makevalid / cells."""

import numpy as np
import pytest

from geofileops_spark.geometry import kernels as K
from geofileops_spark.geometry import transform as T
from geofileops_spark.geometry import valid as V
from geofileops_spark.geometry import wkb
from geofileops_spark.index import cells as X


def g(wkt):
    return wkb.from_wkt(wkt)


SQ = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"


def test_buffer_point_area():
    r = T.buffer_geom(g("POINT (0 0)"), 2.0, quad_segs=16)
    # 64-gon ≈ circle area
    assert K.area(r) == pytest.approx(np.pi * 4, rel=0.01)


def test_buffer_square_cap_point():
    r = T.buffer_geom(g("POINT (0 0)"), 2.0, cap_style="square")
    assert K.area(r) == pytest.approx(16.0, rel=1e-6)


def test_buffer_line():
    r = T.buffer_geom(g("LINESTRING (0 0, 10 0)"), 1.0, quad_segs=16)
    # rect 10x2 + two half-circles ≈ 20 + pi
    assert K.area(r) == pytest.approx(20 + np.pi, rel=0.02)


def test_buffer_line_flat_cap():
    r = T.buffer_geom(g("LINESTRING (0 0, 10 0)"), 1.0, cap_style="flat")
    assert K.area(r) == pytest.approx(20.0, rel=1e-6)


def test_buffer_polygon_positive():
    r = T.buffer_geom(g(SQ), 1.0, quad_segs=16)
    # 100 + 4*10*1 + pi*1² corners
    assert K.area(r) == pytest.approx(100 + 40 + np.pi, rel=0.02)


def test_buffer_polygon_negative():
    r = T.buffer_geom(g(SQ), -2.0)
    assert K.area(r) == pytest.approx(36.0, rel=0.05)


def test_buffer_negative_collapses():
    r = T.buffer_geom(g(SQ), -6.0)
    assert r.is_empty() or K.area(r) < 1e-6


def test_buffer_negative_dumbbell_splits():
    # Two 10x10 squares joined by a 4-wide, 1-tall neck; eroding by 1.2
    # dissolves the neck. The analytic offset ring self-crosses here —
    # the fast path must fall back so BOTH lobes survive (regression:
    # _excise_loops used to silently delete one lobe up to 20% of area).
    dumbbell = (
        "POLYGON ((0 0, 10 0, 10 4.5, 14 4.5, 14 0, 24 0, 24 10, 14 10, "
        "14 5.5, 10 5.5, 10 10, 0 10, 0 0))"
    )
    r = T.buffer_geom(g(dumbbell), -1.2)
    from geofileops_spark.geometry import geom as G

    assert r.typ == G.MULTIPOLYGON
    assert len(r.data) == 2
    # each lobe erodes to ~7.6 x 7.6 (plus a tiny neck-entrance stub)
    for poly in r.data:
        assert abs(K.ring_signed_area(poly[0])) == pytest.approx(57.76, rel=0.02)


def test_convex_hull():
    mp = g("MULTIPOINT (0 0, 10 0, 10 10, 0 10, 5 5, 2 3)")
    h = T.convex_hull(mp)
    assert K.area(h) == pytest.approx(100.0)
    # collinear degenerate
    line = T.convex_hull(g("MULTIPOINT (0 0, 1 1, 2 2)"))
    assert line.dim() == 1


def test_simplify_rdp():
    ls = g("LINESTRING (0 0, 1 0.01, 2 0, 3 0.01, 4 0)")
    s = T.simplify_geom(ls, 0.1)
    assert len(s.data) == 2
    # polygon ring keeps closure
    noisy = g("POLYGON ((0 0, 5 0.01, 10 0, 10 10, 0 10, 0 0))")
    sp = T.simplify_geom(noisy, 0.1)
    assert K.area(sp) == pytest.approx(100.0, rel=0.01)


def test_simplify_vw():
    ls = g("LINESTRING (0 0, 1 0.01, 2 0, 3 0.01, 4 0)")
    s = T.simplify_geom(ls, 0.5, algorithm="vw")
    assert len(s.data) < 5


def test_subdivide():
    # big zigzag polygon with many coords
    n = 200
    xs = np.linspace(0, 100, n)
    ys = 5 + np.sin(xs) * 2
    ring = np.vstack(
        [np.stack([xs, ys], axis=1), [[100, 0], [0, 0]], [[xs[0], ys[0]]]]
    )
    from geofileops_spark.geometry.geom import Geometry

    poly = Geometry(3, [ring])
    parts = T.subdivide(poly, max_coords=60)
    assert len(parts) >= 3
    assert sum(K.area(p) for p in parts) == pytest.approx(K.area(poly), rel=1e-3)
    assert all(p.num_coords() <= 120 for p in parts)


def test_isvalid_bowtie():
    bow = g("POLYGON ((0 0, 10 10, 10 0, 0 10, 0 0))")
    ok, reason = V.is_valid_reason(bow)
    assert not ok and "Self-intersection" in reason
    assert V.is_valid(g(SQ))


def test_makevalid_bowtie():
    bow = g("POLYGON ((0 0, 10 10, 10 0, 0 10, 0 0))")
    fixed = V.make_valid(bow)
    assert V.is_valid(fixed)
    # two triangles of area 25 each
    assert K.area(fixed) == pytest.approx(50.0, rel=1e-6)
    assert len(fixed.polygons()) == 2


def test_makevalid_passthrough():
    sq = g(SQ)
    out = V.make_valid(sq)
    assert K.area(out) == pytest.approx(100.0)


# ----------------------------------------------------------------- cells
def test_cell_roundtrip():
    xs = np.array([0.0, 100.0, -3000.5])
    ys = np.array([0.0, -100.0, 4000.25])
    cells = X.cell_of_points(xs, ys, 20)
    res, ix, iy = X.decode(cells)
    assert (res == 20).all()
    for i, c in enumerate(cells):
        b = X.cell_bounds(int(c))
        assert b[0] <= xs[i] <= b[2] and b[1] <= ys[i] <= b[3]


def test_cell_parent():
    c = X.cell_of_points(np.array([123.4]), np.array([567.8]), 20)
    p = X.parent(c, 15)
    res, _, _ = X.decode(p)
    assert res[0] == 15
    bc = X.cell_bounds(int(c[0]))
    bp = X.cell_bounds(int(p[0]))
    assert bp[0] <= bc[0] and bp[2] >= bc[2]


def test_cover_bbox_and_kring():
    cells = X.cover_bbox(0, 0, 100, 100, 20)
    size = X.cell_size(20)
    expect = (int(100 // size) + 1) ** 2
    assert len(cells) == expect
    ring = X.kring(int(cells[0]), 1)
    assert 4 <= len(ring) <= 9


def test_kring_many():
    cells = X.cell_of_points(np.array([0.0, 500.0]), np.array([0.0, 500.0]), 20)
    idx, ring = X.kring_many(cells, 1)
    assert len(idx) == len(ring)
    assert set(idx.tolist()) == {0, 1}


def test_cover_geometry_refines():
    tri = g("POLYGON ((0 0, 1000 0, 0 1000, 0 0))")
    res = X.res_for_extent(1000.0, 4)
    cov = X.cover_geometry(tri, res)
    bbox_cov = X.cover_bbox(0, 0, 1000, 1000, res)
    assert 0 < len(cov) < len(bbox_cov)


# ------------------------------------------------------- split / LANG
def test_split_polygon_by_blade():
    from geofileops_spark.geometry import kernels as K
    from geofileops_spark.geometry import wkb as W
    from geofileops_spark.geometry.split import split_geom

    sq = W.from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    parts = split_geom(sq, W.from_wkt("LINESTRING (3 -5, 3 15)")).parts()
    assert sorted(round(K.area(p), 9) for p in parts) == [30.0, 70.0]
    # zigzag blade
    parts = split_geom(
        sq, W.from_wkt("LINESTRING (3 -5, 3 5, 7 5, 7 15)")
    ).parts()
    assert sorted(round(K.area(p), 9) for p in parts) == [50.0, 50.0]
    # dangling / missing blades leave the input unchanged
    assert K.area(split_geom(sq, W.from_wkt("LINESTRING (3 -5, 3 5)"))) == 100.0
    assert K.area(split_geom(sq, W.from_wkt("LINESTRING (20 0, 20 5)"))) == 100.0
    # hole crossed by the blade
    holed = W.from_wkt(
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"
    )
    parts = split_geom(holed, W.from_wkt("LINESTRING (5 -5, 5 15)")).parts()
    assert sorted(round(K.area(p), 9) for p in parts) == [48.0, 48.0]


def test_split_line_by_line():
    from geofileops_spark.geometry import kernels as K
    from geofileops_spark.geometry import wkb as W
    from geofileops_spark.geometry.split import split_geom

    ln = W.from_wkt("LINESTRING (0 0, 10 0)")
    parts = split_geom(ln, W.from_wkt("LINESTRING (4 -1, 4 1)")).parts()
    assert sorted(round(K.length(p), 9) for p in parts) == [4.0, 6.0]


def test_simplify_lang_golden():
    from geofileops_spark.geometry import kernels as K
    from geofileops_spark.geometry import wkb as W
    from geofileops_spark.geometry.transform import simplify_geom

    zig = [
        (k * 5, 0 if k in (0, 20) else (0.125 if k % 2 else -0.125))
        for k in range(21)
    ]
    lz = W.from_wkt(
        "LINESTRING (" + ", ".join(f"{x} {y}" for x, y in zig) + ")"
    )
    lang = simplify_geom(lz, 0.5, "lang")
    # lookahead 8: keys at indices 0, 8, 16, 20
    assert lang.num_coords() == 4
    # lang+ iterates to a fixpoint: fully straightened
    langp = simplify_geom(lz, 0.5, "lang+")
    assert langp.num_coords() == 2
    assert K.length(langp) == 100.0


def test_gcp_warp_polynomial_and_tps():
    import numpy as np

    from geofileops_spark.geometry.extra import fit_gcp_polynomial, fit_gcp_tps

    # GCPs following an exact quadratic: the order-2 fit must recover it
    gcps = [
        (sx, sy, sx * sx - 3 * sy, sy * sy + 2 * sx)
        for sx in (0.0, 10.0, 20.0) for sy in (0.0, 10.0, 20.0)
    ]
    m = fit_gcp_polynomial(gcps, order=2)
    pts = np.array([[5.0, 7.0], [13.0, 2.0]])
    got = m(pts)
    exp = np.array([[5 * 5 - 3 * 7, 7 * 7 + 2 * 5], [13 * 13 - 3 * 2, 2 * 2 + 2 * 13]])
    assert np.allclose(got, exp, atol=1e-6)
    # TPS interpolates the GCPs exactly and reproduces an affine map
    gcps_aff = [(sx, sy, 2 * sx + 1, sy - 4)
                for sx, sy in [(0, 0), (10, 0), (0, 10), (10, 10), (5, 3)]]
    t = fit_gcp_tps(gcps_aff)
    src = np.array([[g[0], g[1]] for g in gcps_aff], dtype=float)
    dst = np.array([[g[2], g[3]] for g in gcps_aff], dtype=float)
    assert np.allclose(t(src), dst, atol=1e-8)
    assert np.allclose(t(np.array([[3.0, 8.0]])), [[7.0, 4.0]], atol=1e-6)


def test_buffer_mitre_limit_bevels_spike():
    """GEOS mitre_limit semantics: a sharp corner whose miter point would
    sit ~20*d from the vertex is beveled at limit*d; raising the limit
    restores the full miter."""
    import math

    from geofileops_spark.geometry.kernels import bounds
    from geofileops_spark.geometry.transform import buffer_geom
    from geofileops_spark.geometry.wkb import from_wkt

    g = from_wkt("POLYGON ((0 0, 100 0, 0 10, 0 0))")
    ext_expected = 1.0 / math.sin(math.atan2(10, 100) / 2)  # ~20.08
    x_lim5 = bounds(buffer_geom(g, 1.0, join_style="mitre", mitre_limit=5.0))[2]
    x_lim50 = bounds(buffer_geom(g, 1.0, join_style="mitre", mitre_limit=50.0))[2]
    assert 100 + 4.9 < x_lim5 < 100 + 5.5  # beveled at ~5*d
    assert abs(x_lim50 - (100 + ext_expected)) < 0.1  # full miter


def test_buffer_mitre_sausage_path_holes():
    """Piece-union (sausage) path closed forms: the mitre join patches
    land on the growth side only (reflex corners skipped), holes in
    either orientation shrink exactly."""
    from geofileops_spark.geometry.kernels import area as g_area
    from geofileops_spark.geometry.transform import buffer_geom
    from geofileops_spark.geometry.wkb import from_wkt

    sq_hole = from_wkt(
        "POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0),"
        " (5 5, 15 5, 15 15, 5 15, 5 5))"
    )
    assert abs(g_area(buffer_geom(sq_hole, 1.0, join_style="mitre")) - 420.0) < 1e-6
    # hole ring in CW order: orientation normalization must cope
    sq_hole_cw = from_wkt(
        "POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0),"
        " (5 5, 5 15, 15 15, 15 5, 5 5))"
    )
    assert abs(g_area(buffer_geom(sq_hole_cw, 1.0, join_style="mitre")) - 420.0) < 1e-6
    # concave exterior corner + hole: L-shape mitre 119 minus hole shrink 1
    l_hole = from_wkt(
        "POLYGON ((0 0, 10 0, 10 5, 5 5, 5 10, 0 10, 0 0),"
        " (1 1, 4 1, 4 4, 1 4, 1 1))"
    )
    assert abs(g_area(buffer_geom(l_hole, 1.0, join_style="mitre")) - 118.0) < 1e-6
