"""Spatial cell index: a quadtree-style integer grid (H3/S2 analogue).

The reference accelerates every spatial join with a per-file R-tree
(geofileops ``_geoops_sql.py:2268-2280`` rtree prefilter SQL). A Spark
engine has no index object — the equivalent is a **cell-id column**: each
geometry is exploded to the grid cells its bbox covers, spatial joins
become salted hash joins on cell id, and an exact predicate refines the
candidate pairs (SURVEY.md §4 "spatial index join").

Scheme ("gq" cells): the world square ``[-W, W]²`` is divided into
``2^res × 2^res`` tiles; a cell id packs ``(res, ix, iy)`` into one
int64 (5+29+29 bits, res ≤ 29). Parent/child relations are bit shifts,
so multi-resolution logic (dissolve's on-border iteration, adaptive
splitting of dense cells) stays cheap and vectorizable.

W defaults to 2^25 ≈ 3.3e7: large enough for lon/lat degrees *and*
projected-meter CRSs; finest cell (res 29) is ~0.125 units.
"""

from __future__ import annotations

import numpy as np

WORLD = float(2**25)  # half-extent of the world square
MAX_RES = 29
_COORD_BITS = 29


def cell_size(res: int) -> float:
    return 2.0 * WORLD / (1 << res)


def encode(res: int, ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    return (
        (np.int64(res) << np.int64(58))
        | (ix.astype(np.int64) << np.int64(_COORD_BITS))
        | iy.astype(np.int64)
    )


def decode(cells: np.ndarray):
    cells = np.asarray(cells, dtype=np.int64)
    res = (cells >> np.int64(58)).astype(np.int32)
    ix = (cells >> np.int64(_COORD_BITS)) & np.int64((1 << _COORD_BITS) - 1)
    iy = cells & np.int64((1 << _COORD_BITS) - 1)
    return res, ix, iy


def cell_of_points(xs: np.ndarray, ys: np.ndarray, res: int) -> np.ndarray:
    """Vectorized point -> cell id."""
    size = cell_size(res)
    n = 1 << res
    ix = np.clip(((np.asarray(xs) + WORLD) / size).astype(np.int64), 0, n - 1)
    iy = np.clip(((np.asarray(ys) + WORLD) / size).astype(np.int64), 0, n - 1)
    return encode(res, ix, iy)


def cell_bounds(cell: int):
    res, ix, iy = decode(np.asarray([cell]))
    size = cell_size(int(res[0]))
    minx = float(ix[0]) * size - WORLD
    miny = float(iy[0]) * size - WORLD
    return (minx, miny, minx + size, miny + size)


def parent(cells: np.ndarray, parent_res: int) -> np.ndarray:
    res, ix, iy = decode(cells)
    shift = (res - parent_res).astype(np.int64)
    if (shift < 0).any():
        raise ValueError("parent_res must be coarser (smaller) than cell res")
    return encode(parent_res, ix >> shift, iy >> shift)


def cover_bbox(minx, miny, maxx, maxy, res: int, cap: int = 4096) -> np.ndarray:
    """All cells at ``res`` whose tile intersects the bbox. If the cover
    would exceed ``cap`` cells, coarser resolutions are tried (the caller
    then stores mixed resolutions — joins must expand to a common res, or
    use the compact+expand helpers below)."""
    size = cell_size(res)
    n = 1 << res
    ix0 = int(np.clip((minx + WORLD) // size, 0, n - 1))
    ix1 = int(np.clip((maxx + WORLD) // size, 0, n - 1))
    iy0 = int(np.clip((miny + WORLD) // size, 0, n - 1))
    iy1 = int(np.clip((maxy + WORLD) // size, 0, n - 1))
    while (ix1 - ix0 + 1) * (iy1 - iy0 + 1) > cap and res > 0:
        res -= 1
        size = cell_size(res)
        n = 1 << res
        ix0 = int(np.clip((minx + WORLD) // size, 0, n - 1))
        ix1 = int(np.clip((maxx + WORLD) // size, 0, n - 1))
        iy0 = int(np.clip((miny + WORLD) // size, 0, n - 1))
        iy1 = int(np.clip((maxy + WORLD) // size, 0, n - 1))
    gx, gy = np.meshgrid(
        np.arange(ix0, ix1 + 1, dtype=np.int64),
        np.arange(iy0, iy1 + 1, dtype=np.int64),
    )
    return encode(res, gx.ravel(), gy.ravel())


def kring(cell: int, k: int = 1) -> np.ndarray:
    """Cells within Chebyshev distance k of the given cell (same res)."""
    res, ix, iy = decode(np.asarray([cell]))
    res = int(res[0])
    n = 1 << res
    xs = np.arange(max(0, int(ix[0]) - k), min(n - 1, int(ix[0]) + k) + 1)
    ys = np.arange(max(0, int(iy[0]) - k), min(n - 1, int(iy[0]) + k) + 1)
    gx, gy = np.meshgrid(xs, ys)
    return encode(res, gx.ravel(), gy.ravel())


def kring_many(cells: np.ndarray, k: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized k-ring for many same-res cells.

    Returns (repeated_input_index, ring_cells) suitable for building an
    exploded DataFrame column."""
    cells = np.asarray(cells, dtype=np.int64)
    res, ix, iy = decode(cells)
    if len(cells) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    r = int(res[0])
    n = 1 << r
    side = 2 * k + 1
    offs = np.arange(-k, k + 1, dtype=np.int64)
    ox, oy = np.meshgrid(offs, offs)
    ox, oy = ox.ravel(), oy.ravel()  # (side²,)
    gx = ix[:, None] + ox[None, :]
    gy = iy[:, None] + oy[None, :]
    valid = (gx >= 0) & (gx < n) & (gy >= 0) & (gy < n)
    idx = np.repeat(np.arange(len(cells)), side * side)
    out = encode(r, gx.ravel(), gy.ravel())
    return idx[valid.ravel()], out[valid.ravel()]


def res_for_extent(extent: float, target_cells_per_geom: float = 2.0) -> int:
    """Pick a resolution where a typical geometry of the given extent spans
    about ``target_cells_per_geom`` cells per axis."""
    if extent <= 0 or not np.isfinite(extent):
        return MAX_RES
    want = extent / max(target_cells_per_geom, 1e-9)
    res = int(np.floor(np.log2(2.0 * WORLD / want)))
    return int(np.clip(res, 0, MAX_RES))


def cover_geometry(geom, res: int, cap: int = 4096) -> np.ndarray:
    """Cells intersecting the geometry: bbox cover refined by an exact
    cell-box × geometry intersects test (two-phase filter, same pattern as
    the reference's bbox→ST_Intersects, ``_geoops_sql.py:1249-1255``)."""
    from ..geometry.geom import Geometry
    from ..geometry.kernels import bounds as g_bounds
    from ..geometry.predicates import intersects

    minx, miny, maxx, maxy = g_bounds(geom)
    if not np.isfinite(minx):
        return np.empty(0, dtype=np.int64)
    cells = cover_bbox(minx, miny, maxx, maxy, res, cap=cap)
    if len(cells) <= 4:
        return cells
    keep = []
    for c in cells:
        bx = cell_bounds(int(c))
        boxg = Geometry.box(*bx)
        if intersects(boxg, geom):
            keep.append(c)
    return np.asarray(keep, dtype=np.int64) if keep else cells[:0]
