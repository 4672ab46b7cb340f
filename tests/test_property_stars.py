"""Adversarial overlay/buffer properties on random VALID star polygons.

Two independent oracles, no Spark session needed:

- exact inclusion-exclusion identities between independently-computed
  shoelace areas: area(A∩B) + area(A∪B) = area(A) + area(B),
  area(A−B) = area(A) − area(A∩B), union = A−B ⊎ B−A ⊎ A∩B;
- an INDEPENDENT crossing-number point-in-polygon (written here, not the
  library's) for containment: erosion ⊆ A ⊆ dilation.

Stars are radial polygons with anchor angles in every quadrant, so every
angular gap is < π and the ring is guaranteed simple (the mitre-join
fuzz found that an unconstrained radial fan self-intersects and grades
garbage).
"""

from __future__ import annotations

import numpy as np
import pytest

from geofileops_spark.geometry import clip as C
from geofileops_spark.geometry import wkb as W
from geofileops_spark.geometry.kernels import area as g_area


def _star(rng, cx, cy, rmax, n):
    th = np.sort(
        np.concatenate(
            [
                rng.uniform(0, 2 * np.pi, n - 4),
                [0.3, 0.3 + np.pi / 2, 0.3 + np.pi, 0.3 + 3 * np.pi / 2],
            ]
        )
    )
    r = rng.uniform(0.15 * rmax, rmax, len(th))
    ring = np.column_stack([cx + r * np.cos(th), cy + r * np.sin(th)])
    wkt = (
        "POLYGON (("
        + ", ".join(f"{x:.9f} {y:.9f}" for x, y in ring)
        + f", {ring[0, 0]:.9f} {ring[0, 1]:.9f}))"
    )
    return W.from_wkt(wkt)


def _pip_independent(px, py, geom) -> bool:
    """Crossing-number even-odd test written independently of the
    library's predicates (exterior ring minus holes per part)."""

    def in_ring(ring):
        x, y = ring[:, 0], ring[:, 1]
        x2, y2 = np.roll(x, -1), np.roll(y, -1)
        cond = (y > py) != (y2 > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xi = x + (py - y) * (x2 - x) / np.where(y2 == y, np.inf, y2 - y)
        return bool(np.count_nonzero(cond & (px < xi)) % 2)

    for rings in geom.polygons():
        if in_ring(rings[0]) and not any(in_ring(h) for h in rings[1:]):
            return True
    return False


@pytest.mark.parametrize("seed", range(12))
def test_overlay_inclusion_exclusion(seed):
    rng = np.random.default_rng(seed)
    a = _star(rng, 0, 0, 20, int(rng.integers(6, 14)))
    b = _star(rng, rng.uniform(-12, 12), rng.uniform(-12, 12), 20,
              int(rng.integers(6, 14)))
    aa, ab = g_area(a), g_area(b)
    inter = g_area(C.intersection(a, b))
    union = g_area(C.union_geoms([a, b]))
    dab = g_area(C.difference(a, b))
    dba = g_area(C.difference(b, a))
    tol = 1e-6 * max(aa, ab, 1.0)
    assert abs(inter + union - aa - ab) < tol, (seed, inter, union, aa, ab)
    assert abs(dab - (aa - inter)) < tol, (seed, dab, aa, inter)
    assert abs(dba - (ab - inter)) < tol, (seed, dba, ab, inter)
    assert abs(union - (dab + dba + inter)) < tol


@pytest.mark.parametrize("seed", range(8))
def test_buffer_containment(seed):
    from geofileops_spark.geometry.transform import buffer_geom

    rng = np.random.default_rng(100 + seed)
    g = _star(rng, 0, 0, 20, int(rng.integers(6, 14)))
    grown = buffer_geom(g, 1.5, join_style="mitre")
    shrunk = buffer_geom(g, -1.5)
    # sample points: every point of A is in dilate(A); every point of
    # erode(A) is in A (independent PIP both ways)
    pts = np.column_stack([rng.uniform(-25, 25, 4000), rng.uniform(-25, 25, 4000)])
    for px, py in pts:
        in_a = _pip_independent(px, py, g)
        if in_a:
            assert _pip_independent(px, py, grown), (seed, px, py)
        if not shrunk.is_empty() and _pip_independent(px, py, shrunk):
            assert in_a, (seed, px, py)
    # area monotonicity
    assert g_area(grown) > g_area(g)
    if not shrunk.is_empty():
        assert g_area(shrunk) < g_area(g)
