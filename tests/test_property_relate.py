"""DE-9IM relate + simplify properties on random valid stars (no Spark).

Predicate oracle = internal consistency laws that hold for ANY correct
DE-9IM implementation, checked against the matrix itself:

- relate(A, B) is the transpose of relate(B, A);
- intersects ⟺ not disjoint, and intersects(A, B) is symmetric;
- equals(A, A), contains(A, A), within(A, A);
- contains(A, B) ⟺ within(B, A);
- if the interiors overlap (II = '2'), intersects must hold.

Simplify oracle = the definitional guarantee of RDP: every ORIGINAL
vertex lies within `tolerance` of the simplified path.
"""

from __future__ import annotations

import numpy as np
import pytest

from geofileops_spark.geometry import wkb as W
from geofileops_spark.geometry.predicates import relate_matrix

from .test_property_stars import _star


def _dim(ch: str) -> int:
    return -1 if ch == "F" else int(ch)


@pytest.mark.parametrize("seed", range(15))
def test_relate_consistency_laws(seed):
    rng = np.random.default_rng(200 + seed)
    a = _star(rng, 0, 0, 20, int(rng.integers(6, 12)))
    # mix of heavy-overlap / touch-ish / disjoint configurations
    off = [0.0, 10.0, 45.0][seed % 3]
    b = _star(rng, off + rng.uniform(-5, 5), rng.uniform(-5, 5), 20,
              int(rng.integers(6, 12)))

    m_ab = relate_matrix(a, b)
    m_ba = relate_matrix(b, a)
    # transpose law
    t = [m_ab[0], m_ab[3], m_ab[6], m_ab[1], m_ab[4], m_ab[7],
         m_ab[2], m_ab[5], m_ab[8]]
    assert "".join(t) == m_ba, (seed, m_ab, m_ba)

    inter_ab = any(m_ab[i] != "F" for i in (0, 1, 3, 4))
    inter_ba = any(m_ba[i] != "F" for i in (0, 1, 3, 4))
    assert inter_ab == inter_ba
    # II = '2' (interiors overlap in area) implies intersects
    if m_ab[0] == "2":
        assert inter_ab

    # reflexive laws on the SAME geometry
    m_aa = relate_matrix(a, a)
    assert m_aa[0] != "F" and m_aa[1] == "F" and m_aa[3] == "F"  # equals-shape
    # contains(A,B) <-> within(B,A)
    contains_ab = m_ab[0] != "F" and m_ab[6] == "F" and m_ab[7] == "F"
    within_ba = m_ba[0] != "F" and m_ba[2] == "F" and m_ba[5] == "F"
    assert contains_ab == within_ba, (seed, m_ab, m_ba)


def _max_dev(orig: np.ndarray, simp: np.ndarray) -> float:
    """Max distance from any original vertex to the simplified polyline."""
    worst = 0.0
    segs = list(zip(simp[:-1], simp[1:]))
    for p in orig:
        best = np.inf
        for s0, s1 in segs:
            v = s1 - s0
            L2 = float(v @ v)
            t = 0.0 if L2 == 0 else float(np.clip((p - s0) @ v / L2, 0, 1))
            best = min(best, float(np.linalg.norm(p - (s0 + t * v))))
        worst = max(worst, best)
    return worst


@pytest.mark.parametrize("seed", range(8))
def test_rdp_deviation_bound(seed):
    from geofileops_spark.geometry.transform import simplify_geom

    rng = np.random.default_rng(300 + seed)
    g = _star(rng, 0, 0, 20, int(rng.integers(16, 30)))
    tol = 0.8
    s = simplify_geom(g, tol, "rdp")
    assert s is not None and not s.is_empty()
    for rings_o, rings_s in zip(g.polygons(), s.polygons()):
        dev = _max_dev(rings_o[0], rings_s[0])
        assert dev <= tol + 1e-9, (seed, dev)
