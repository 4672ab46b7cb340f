"""Core geometry data model (2-D, planar).

A from-scratch, numpy-backed geometry representation used inside
Arrow-batched pandas UDFs. Mirrors the reference's data model of typed
geometries carried as WKB blobs (geofileops ``fileops.py:226-229``:
geometry column is a WKB blob typed POINT..MULTIPOLYGON/COLLECTION).

Representation (all coordinates are float64 numpy arrays):

- POINT              -> ndarray shape (2,)            (NaN,NaN = EMPTY)
- MULTIPOINT         -> ndarray shape (n, 2)
- LINESTRING         -> ndarray shape (n, 2)
- MULTILINESTRING    -> list[ndarray (n_i, 2)]
- POLYGON            -> list[ndarray (n_i, 2)]  rings; ring[0] == ring[-1];
                        first ring = exterior, rest = holes
- MULTIPOLYGON       -> list[list[ndarray]]     list of polygons
- GEOMETRYCOLLECTION -> list[Geometry]

Empty collections are represented by empty lists / zero-row arrays.
"""

from __future__ import annotations

import numpy as np

# WKB geometry type codes (OGC)
POINT = 1
LINESTRING = 2
POLYGON = 3
MULTIPOINT = 4
MULTILINESTRING = 5
MULTIPOLYGON = 6
GEOMETRYCOLLECTION = 7

TYPE_NAMES = {
    POINT: "POINT",
    LINESTRING: "LINESTRING",
    POLYGON: "POLYGON",
    MULTIPOINT: "MULTIPOINT",
    MULTILINESTRING: "MULTILINESTRING",
    MULTIPOLYGON: "MULTIPOLYGON",
    GEOMETRYCOLLECTION: "GEOMETRYCOLLECTION",
}
NAME_TO_TYPE = {v: k for k, v in TYPE_NAMES.items()}

# dimension of each primitive type (0=point,1=line,2=area)
TYPE_DIM = {
    POINT: 0,
    MULTIPOINT: 0,
    LINESTRING: 1,
    MULTILINESTRING: 1,
    POLYGON: 2,
    MULTIPOLYGON: 2,
}


class Geometry:
    """Tagged geometry value: ``typ`` is a WKB type code, ``data`` the
    representation documented in the module docstring."""

    # _segs_cache/_bounds_cache: per-instance memo slots for the hot
    # kernels (segment arrays / bbox) — decoded geometries are reused
    # across many candidate pairs by the refine UDF's cache
    __slots__ = ("typ", "data", "_segs_cache", "_bounds_cache")

    def __init__(self, typ: int, data):
        self.typ = typ
        self.data = data
        self._segs_cache = None
        self._bounds_cache = None

    # ---------------------------------------------------------------- basics
    def is_empty(self) -> bool:
        t, d = self.typ, self.data
        if t == POINT:
            return d is None or bool(np.isnan(d[0]))
        if t in (MULTIPOINT, LINESTRING):
            return d is None or len(d) == 0
        return d is None or len(d) == 0

    def dim(self) -> int:
        """Topological dimension (max over parts for collections)."""
        if self.typ == GEOMETRYCOLLECTION:
            dims = [g.dim() for g in self.data if not g.is_empty()]
            return max(dims) if dims else -1
        if self.is_empty():
            return -1
        return TYPE_DIM[self.typ]

    def type_name(self) -> str:
        return TYPE_NAMES[self.typ]

    # ------------------------------------------------------------- iteration
    def parts(self) -> list["Geometry"]:
        """Single-geometry parts (explodecollections semantics: multi ->
        singles, collection -> recursive parts; geofileops
        ``_geoops_gpd.py:1077-1078``)."""
        t, d = self.typ, self.data
        if t == POINT or t == LINESTRING or t == POLYGON:
            return [self]
        if t == MULTIPOINT:
            return [Geometry(POINT, d[i]) for i in range(len(d))]
        if t == MULTILINESTRING:
            return [Geometry(LINESTRING, ls) for ls in d]
        if t == MULTIPOLYGON:
            return [Geometry(POLYGON, rings) for rings in d]
        # collection: recurse
        out: list[Geometry] = []
        for g in d:
            out.extend(g.parts())
        return out

    def polygons(self) -> list[list[np.ndarray]]:
        """All polygon parts as ring-lists (empty for non-areal)."""
        t, d = self.typ, self.data
        if t == POLYGON:
            return [d] if len(d) else []
        if t == MULTIPOLYGON:
            return [p for p in d if len(p)]
        if t == GEOMETRYCOLLECTION:
            out = []
            for g in d:
                out.extend(g.polygons())
            return out
        return []

    def lines(self) -> list[np.ndarray]:
        """All linestring parts as coord arrays (non-areal lines only)."""
        t, d = self.typ, self.data
        if t == LINESTRING:
            return [d] if len(d) else []
        if t == MULTILINESTRING:
            return [ls for ls in d if len(ls)]
        if t == GEOMETRYCOLLECTION:
            out = []
            for g in d:
                out.extend(g.lines())
            return out
        return []

    def points(self) -> np.ndarray:
        """All point parts as an (n,2) array (point-typed parts only)."""
        t, d = self.typ, self.data
        if t == POINT:
            if self.is_empty():
                return np.empty((0, 2))
            return d.reshape(1, 2)
        if t == MULTIPOINT:
            return d if len(d) else np.empty((0, 2))
        if t == GEOMETRYCOLLECTION:
            arrs = [g.points() for g in d]
            arrs = [a for a in arrs if len(a)]
            return np.vstack(arrs) if arrs else np.empty((0, 2))
        return np.empty((0, 2))

    def coords(self) -> np.ndarray:
        """Every vertex of the geometry as an (n,2) array."""
        t, d = self.typ, self.data
        if t == POINT:
            return self.points()
        if t in (MULTIPOINT, LINESTRING):
            return np.asarray(d).reshape(-1, 2) if d is not None else np.empty((0, 2))
        if t == MULTILINESTRING:
            return np.vstack(d) if d else np.empty((0, 2))
        if t == POLYGON:
            return np.vstack(d) if d else np.empty((0, 2))
        if t == MULTIPOLYGON:
            arrs = [r for p in d for r in p]
            return np.vstack(arrs) if arrs else np.empty((0, 2))
        arrs = [g.coords() for g in d]
        arrs = [a for a in arrs if len(a)]
        return np.vstack(arrs) if arrs else np.empty((0, 2))

    def num_coords(self) -> int:
        return len(self.coords())

    # --------------------------------------------------------------- factory
    @staticmethod
    def point(x: float, y: float) -> "Geometry":
        return Geometry(POINT, np.array([x, y], dtype=np.float64))

    @staticmethod
    def empty(typ: int = GEOMETRYCOLLECTION) -> "Geometry":
        if typ == POINT:
            return Geometry(POINT, np.array([np.nan, np.nan]))
        if typ in (MULTIPOINT, LINESTRING):
            return Geometry(typ, np.empty((0, 2)))
        return Geometry(typ, [])

    @staticmethod
    def multipolygon(polys: list[list[np.ndarray]]) -> "Geometry":
        return Geometry(MULTIPOLYGON, polys)

    @staticmethod
    def box(minx, miny, maxx, maxy) -> "Geometry":
        ring = np.array(
            [[minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy], [minx, miny]],
            dtype=np.float64,
        )
        return Geometry(POLYGON, [ring])

    @staticmethod
    def collect(geoms: list["Geometry"]) -> "Geometry":
        """ST_Collect: combine into the narrowest multi type."""
        geoms = [g for g in geoms if g is not None and not g.is_empty()]
        if not geoms:
            return Geometry.empty(GEOMETRYCOLLECTION)
        typs = {g.typ for g in geoms}
        if typs <= {POINT, MULTIPOINT}:
            return Geometry(MULTIPOINT, np.vstack([g.points() for g in geoms]))
        if typs <= {LINESTRING, MULTILINESTRING}:
            out = []
            for g in geoms:
                out.extend(g.lines())
            return Geometry(MULTILINESTRING, out)
        if typs <= {POLYGON, MULTIPOLYGON}:
            out = []
            for g in geoms:
                out.extend(g.polygons())
            return Geometry(MULTIPOLYGON, out)
        return Geometry(GEOMETRYCOLLECTION, list(geoms))

    # ------------------------------------------------------------ conversion
    def force_multi(self) -> "Geometry":
        """Promote single types to the MULTI variant (geofileops forces
        MULTI output unless explodecollections; ``_geoops_sql.py:1131-1139``)."""
        t, d = self.typ, self.data
        if t == POINT:
            return Geometry(MULTIPOINT, self.points())
        if t == LINESTRING:
            return Geometry(MULTILINESTRING, [d] if len(d) else [])
        if t == POLYGON:
            return Geometry(MULTIPOLYGON, [d] if len(d) else [])
        return self

    def collection_extract(self, primitive: int) -> "Geometry":
        """ST_CollectionExtract: keep parts of the given primitive dim
        (1=point, 2=line, 3=polygon); geofileops ``_geoops_sql.py:74``."""
        want_dim = primitive - 1
        kept = [p for p in self.parts() if not p.is_empty() and p.dim() == want_dim]
        if not kept:
            return Geometry.empty(
                {0: MULTIPOINT, 1: MULTILINESTRING, 2: MULTIPOLYGON}[want_dim]
            )
        return Geometry.collect(kept)

    def normalize(self) -> "Geometry":
        """Canonical form for equality hashing (delete_duplicate_geometries
        uses ST_Equals on candidates, geofileops ``_geoops_sql.py:164-249``;
        we hash the normalized WKB instead): exterior rings CCW / holes CW,
        rings rotated to their lexicographically smallest vertex, parts
        sorted, line direction normalized."""

        def norm_ring(ring: np.ndarray, ccw: bool) -> np.ndarray:
            r = ring[:-1]
            # rotate to lexicographic min
            idx = np.lexsort((r[:, 1], r[:, 0]))[0]
            r = np.roll(r, -idx, axis=0)
            area2 = float(
                np.dot(r[:, 0], np.roll(r[:, 1], -1))
                - np.dot(np.roll(r[:, 0], -1), r[:, 1])
            )
            if (area2 > 0) != ccw:
                r = np.vstack([r[:1], r[1:][::-1]])
            return np.vstack([r, r[:1]])

        def norm_line(ls: np.ndarray) -> np.ndarray:
            a, b = tuple(ls[0]), tuple(ls[-1])
            return ls if a <= b else ls[::-1].copy()

        t, d = self.typ, self.data
        if t == POINT:
            return self
        if t == MULTIPOINT:
            if len(d) == 0:
                return self
            order = np.lexsort((d[:, 1], d[:, 0]))
            return Geometry(MULTIPOINT, d[order])
        if t == LINESTRING:
            return Geometry(LINESTRING, norm_line(d))
        if t == MULTILINESTRING:
            lines = sorted(
                (norm_line(ls) for ls in d), key=lambda a: a[0].tolist()
            )
            return Geometry(MULTILINESTRING, lines)
        if t == POLYGON:
            rings = [norm_ring(d[0], True)] + sorted(
                (norm_ring(h, False) for h in d[1:]), key=lambda a: a[0].tolist()
            )
            return Geometry(POLYGON, rings)
        if t == MULTIPOLYGON:
            polys = []
            for p in d:
                rings = [norm_ring(p[0], True)] + sorted(
                    (norm_ring(h, False) for h in p[1:]),
                    key=lambda a: a[0].tolist(),
                )
                polys.append(rings)
            polys.sort(key=lambda rs: rs[0][0].tolist())
            return Geometry(MULTIPOLYGON, polys)
        return Geometry(GEOMETRYCOLLECTION, [g.normalize() for g in d])

    def remove_collinear(self) -> "Geometry":
        """Drop vertices that lie EXACTLY (cross == 0, strictly between
        its neighbours) on the segment joining them: the vertex-level
        differences ST_Equals ignores (an inserted edge midpoint, a split
        edge). ``remove_collinear().normalize()`` is therefore a
        point-set-canonical form for the realistic equal-but-vertex-
        different cases the reference's ST_Equals candidate verify
        handles (``_geoops_sql.py:164-249``). Exact-zero cross keeps it
        conservative: it can never merge genuinely different geometries.
        Spikes (cross == 0 but the vertex NOT between its neighbours)
        are preserved — they change the point set."""

        def clean_ring(ring: np.ndarray) -> np.ndarray:
            r = ring[:-1]
            while len(r) > 3:
                prev = np.roll(r, 1, axis=0)
                nxt = np.roll(r, -1, axis=0)
                v1 = r - prev
                v2 = nxt - r
                cross = v1[:, 0] * v2[:, 1] - v1[:, 1] * v2[:, 0]
                dot = v1[:, 0] * v2[:, 0] + v1[:, 1] * v2[:, 1]
                col = (cross == 0.0) & (dot > 0.0)
                if not col.any() or (~col).sum() < 3:
                    break
                r = r[~col]
            return np.vstack([r, r[:1]])

        def clean_line(ls: np.ndarray) -> np.ndarray:
            if len(ls) <= 2:
                return ls
            v1 = ls[1:-1] - ls[:-2]
            v2 = ls[2:] - ls[1:-1]
            cross = v1[:, 0] * v2[:, 1] - v1[:, 1] * v2[:, 0]
            dot = v1[:, 0] * v2[:, 0] + v1[:, 1] * v2[:, 1]
            keep = np.ones(len(ls), dtype=bool)
            keep[1:-1] = ~((cross == 0.0) & (dot > 0.0))
            return ls[keep]

        t, d = self.typ, self.data
        if t == POLYGON:
            return Geometry(POLYGON, [clean_ring(r) for r in d])
        if t == MULTIPOLYGON:
            return Geometry(
                MULTIPOLYGON, [[clean_ring(r) for r in p] for p in d]
            )
        if t == LINESTRING:
            return Geometry(LINESTRING, clean_line(d))
        if t == MULTILINESTRING:
            return Geometry(MULTILINESTRING, [clean_line(ls) for ls in d])
        if t == GEOMETRYCOLLECTION:
            return Geometry(
                GEOMETRYCOLLECTION, [g.remove_collinear() for g in d]
            )
        return self

    # ----------------------------------------------------------------- debug
    def __repr__(self):  # pragma: no cover
        return f"<Geometry {self.type_name()} ncoords={self.num_coords()}>"
