"""Column-level spatial functions (the ``ST_*`` surface) as Arrow-batched
pandas UDFs over WKB binary columns.

Covers the scalar-function surface the reference's SQL templates call
(SURVEY.md §2.8: ST_Area/Perimeter/Length/Distance, ST_Buffer,
ST_ConvexHull, ST_Intersection/Difference/Union, ST_CollectionExtract,
ST_MakeValid/IsValid, ST_ReducePrecision, ST_Centroid, ST_NPoints,
ST_GeometryType, bbox accessors, spatial predicates, DE-9IM relate).

Everything is vectorized at the Arrow-batch level: WKB decode + numpy
kernels per batch, **no per-row Python UDFs** (input_hint requirement).
Parameterized functions (buffer distance, styles, …) are closure
factories returning a ready Column expression.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..geometry import clip as C
from ..geometry import kernels as K
from ..geometry import predicates as P
from ..geometry import transform as T
from ..geometry import valid as V
from ..geometry import wkb as W
from ..geometry.geom import Geometry
from ..index import cells as X


# ------------------------------------------------------------ scalar helpers
def _try_loads(b: bytes):
    """Decode WKB, treating corrupt/unsupported blobs as NULL geometry —
    at 100 TB a handful of bad blobs must not kill a job (same tolerance
    as the cell-cover/dissolve planning paths)."""
    try:
        return W.loads(b)
    except (ValueError, struct.error, IndexError):
        return None


def _map_scalar(ser: pd.Series, fn, default=None):
    out = []
    for b in ser:
        g = _try_loads(bytes(b)) if b is not None else None
        out.append(default if g is None else fn(g))
    return out


def _map_geom(ser: pd.Series, fn):
    """WKB series -> WKB series through a Geometry->Geometry fn."""
    out = []
    for b in ser:
        g0 = _try_loads(bytes(b)) if b is not None else None
        if g0 is None:
            out.append(None)
            continue
        g = fn(g0)
        out.append(W.dumps(g) if g is not None else None)
    return out


# ----------------------------------------------------------------- measures
@pandas_udf(DoubleType())
def st_area(wkb: pd.Series) -> pd.Series:
    return pd.Series(_map_scalar(wkb, K.area), dtype="float64")


@pandas_udf(DoubleType())
def st_length(wkb: pd.Series) -> pd.Series:
    return pd.Series(_map_scalar(wkb, K.length), dtype="float64")


st_perimeter = st_length


@pandas_udf(IntegerType())
def st_npoints(wkb: pd.Series) -> pd.Series:
    return pd.Series(_map_scalar(wkb, lambda g: g.num_coords()), dtype="Int32")


@pandas_udf(BooleanType())
def st_isempty(wkb: pd.Series) -> pd.Series:
    return pd.Series(_map_scalar(wkb, lambda g: g.is_empty()), dtype="boolean")


@pandas_udf(BooleanType())
def st_isvalid(wkb: pd.Series) -> pd.Series:
    return pd.Series(_map_scalar(wkb, V.is_valid), dtype="boolean")


@pandas_udf(StringType())
def st_isvalidreason(wkb: pd.Series) -> pd.Series:
    return pd.Series(_map_scalar(wkb, lambda g: V.is_valid_reason(g)[1]))


_VALID_DETAIL_SCHEMA = StructType(
    [
        StructField("valid", BooleanType()),
        StructField("reason", StringType()),
        StructField("location", BinaryType()),
    ]
)


@pandas_udf(_VALID_DETAIL_SCHEMA)
def st_isvaliddetail(wkb: pd.Series) -> pd.DataFrame:
    """ST_IsValidDetail twin: (valid, reason, location POINT wkb)."""
    valid, reason, loc = [], [], []
    for b in wkb:
        if b is None:
            valid.append(None)
            reason.append(None)
            loc.append(None)
            continue
        v, r, p = V.is_valid_detail(W.loads(bytes(b)))
        valid.append(bool(v))
        reason.append(r)
        loc.append(
            None if p is None else W.dumps(Geometry.point(float(p[0]), float(p[1])))
        )
    return pd.DataFrame({"valid": valid, "reason": reason, "location": loc})


@pandas_udf(StringType())
def st_geometrytype(wkb: pd.Series) -> pd.Series:
    return pd.Series(_map_scalar(wkb, lambda g: g.type_name()))


_BBOX_SCHEMA = StructType(
    [
        StructField("minx", DoubleType()),
        StructField("miny", DoubleType()),
        StructField("maxx", DoubleType()),
        StructField("maxy", DoubleType()),
    ]
)


@pandas_udf(_BBOX_SCHEMA)
def st_bbox(wkb: pd.Series) -> pd.DataFrame:
    """All four bounds in ONE decode (the separate st_minx/... accessors
    each decode the same blob — callers needing several bounds should
    take the struct)."""
    cols = {"minx": [], "miny": [], "maxx": [], "maxy": []}
    for b in wkb:
        g = _try_loads(bytes(b)) if b is not None else None
        if g is None:
            for k in cols:
                cols[k].append(None)
            continue
        b0, b1, b2, b3 = K.bounds(g)
        import math

        ok = math.isfinite(b0)
        cols["minx"].append(b0 if ok else None)
        cols["miny"].append(b1 if ok else None)
        cols["maxx"].append(b2 if ok else None)
        cols["maxy"].append(b3 if ok else None)
    return pd.DataFrame(cols)


@pandas_udf(DoubleType())
def st_minx(wkb: pd.Series) -> pd.Series:
    return pd.Series(_map_scalar(wkb, lambda g: K.bounds(g)[0]), dtype="float64")


@pandas_udf(DoubleType())
def st_miny(wkb: pd.Series) -> pd.Series:
    return pd.Series(_map_scalar(wkb, lambda g: K.bounds(g)[1]), dtype="float64")


@pandas_udf(DoubleType())
def st_maxx(wkb: pd.Series) -> pd.Series:
    return pd.Series(_map_scalar(wkb, lambda g: K.bounds(g)[2]), dtype="float64")


@pandas_udf(DoubleType())
def st_maxy(wkb: pd.Series) -> pd.Series:
    return pd.Series(_map_scalar(wkb, lambda g: K.bounds(g)[3]), dtype="float64")


@pandas_udf(DoubleType())
def st_x(wkb: pd.Series) -> pd.Series:
    def fx(g):
        p = g.points()
        return float(p[0, 0]) if len(p) else None

    return pd.Series(_map_scalar(wkb, fx), dtype="float64")


@pandas_udf(DoubleType())
def st_y(wkb: pd.Series) -> pd.Series:
    def fy(g):
        p = g.points()
        return float(p[0, 1]) if len(p) else None

    return pd.Series(_map_scalar(wkb, fy), dtype="float64")


# ------------------------------------------------------------- constructors
@pandas_udf(BinaryType())
def st_point(x: pd.Series, y: pd.Series) -> pd.Series:
    out = []
    xs = x.to_numpy(dtype=np.float64, na_value=np.nan)
    ys = y.to_numpy(dtype=np.float64, na_value=np.nan)
    for i in range(len(xs)):
        if np.isnan(xs[i]) or np.isnan(ys[i]):
            out.append(None)
        else:
            out.append(W.dumps(Geometry.point(xs[i], ys[i])))
    return pd.Series(out)


@pandas_udf(BinaryType())
def st_geomfromtext(wkt: pd.Series) -> pd.Series:
    return pd.Series(
        [W.dumps(W.from_wkt(s)) if s is not None else None for s in wkt]
    )


@pandas_udf(StringType())
def st_astext(wkb: pd.Series) -> pd.Series:
    return pd.Series(_map_scalar(wkb, W.to_wkt))


@pandas_udf(BinaryType())
def st_centroid(wkb: pd.Series) -> pd.Series:
    return pd.Series(_map_geom(wkb, K.centroid))


# --------------------------------------------------------------- transforms
def st_buffer(
    col,
    distance: float,
    quad_segs: int = 8,
    cap_style: str = "round",
    join_style: str = "round",
    mitre_limit: float = 5.0,
    single_sided: bool = False,
) -> Column:
    @pandas_udf(BinaryType())
    def _buf(wkb: pd.Series) -> pd.Series:
        # whole-batch decode -> ONE batched offset sweep (hole-free
        # single-polygon rows; the rest falls back per geometry inside)
        geoms = [None if b is None else _try_loads(bytes(b)) for b in wkb]
        res = T.batch_buffer(
            geoms, distance, quad_segs, cap_style, join_style,
            mitre_limit, single_sided,
        )
        return pd.Series(
            [None if g is None else W.dumps(g) for g in res]
        )

    return _buf(col)


@pandas_udf(BinaryType())
def st_convexhull(wkb: pd.Series) -> pd.Series:
    return pd.Series(_map_geom(wkb, T.convex_hull))


def st_simplify(col, tolerance: float, algorithm: str = "rdp") -> Column:
    @pandas_udf(BinaryType())
    def _simp(wkb: pd.Series) -> pd.Series:
        return pd.Series(
            _map_geom(wkb, lambda g: T.simplify_geom(g, tolerance, algorithm))
        )

    return _simp(col)


@pandas_udf(BinaryType())
def st_split(wkb: pd.Series, blade: pd.Series) -> pd.Series:
    """gfo_split twin (reference _sqlite_userdefined.py:158-214): split by
    a blade geometry; NULL when the split removes everything, passthrough
    on NULL/empty blade."""
    from ..geometry.split import split_geom

    out = []
    for b1, b2 in zip(wkb, blade):
        if b1 is None:
            out.append(None)
            continue
        g = W.loads(bytes(b1))
        bl = W.loads(bytes(b2)) if b2 is not None else None
        r = split_geom(g, bl)
        if r is None or r.is_empty():
            out.append(None)
        else:
            out.append(W.dumps(r.force_multi()))
    return pd.Series(out)


@pandas_udf(BinaryType())
def st_makevalid(wkb: pd.Series) -> pd.Series:
    return pd.Series(_map_geom(wkb, V.make_valid))


def st_reduceprecision(col, gridsize: float) -> Column:
    """GFO_ReducePrecision twin (geofileops _sqlite_userdefined.py:97-155):
    snap to grid, makevalid-then-snap on failure, NULL on collapse."""

    @pandas_udf(BinaryType())
    def _red(wkb: pd.Series) -> pd.Series:
        def fix(g):
            r = K.set_precision(g, gridsize)
            if r is None:
                g2 = V.make_valid(g, only_if_invalid=False)
                if g2 is not None:
                    r = K.set_precision(g2, gridsize)
            return r

        return pd.Series(_map_geom(wkb, fix))

    return _red(col)


def st_collectionextract(col, primitive: int) -> Column:
    @pandas_udf(BinaryType())
    def _ce(wkb: pd.Series) -> pd.Series:
        return pd.Series(
            _map_geom(wkb, lambda g: g.collection_extract(primitive))
        )

    return _ce(col)


@pandas_udf(BinaryType())
def st_forcemulti(wkb: pd.Series) -> pd.Series:
    return pd.Series(_map_geom(wkb, lambda g: g.force_multi()))


def st_subdivide_array(col, max_coords: int = 2000) -> Column:
    """Array of WKB parts (explode afterwards) — gfo_subdivide twin."""

    # WKB stores >= 16 bytes per coordinate, so a blob this short cannot
    # exceed max_coords vertices — skip the decode/re-encode entirely
    # (at the reference's 7500-10000 defaults virtually every simple row
    # short-circuits; only genuinely complex geometries pay the kernel)
    byte_bound = 16 * max_coords

    @pandas_udf(ArrayType(BinaryType()))
    def _sub(wkb: pd.Series) -> pd.Series:
        out = []
        for b in wkb:
            if b is None:
                out.append(None)
                continue
            if len(b) <= byte_bound:
                out.append([bytes(b)])
                continue
            parts = T.subdivide(W.loads(bytes(b)), max_coords)
            out.append([W.dumps(p) for p in parts if p is not None])
        return pd.Series(out)

    return _sub(col)


@pandas_udf(ArrayType(BinaryType()))
def st_parts(wkb: pd.Series) -> pd.Series:
    """Explodecollections support: array of single-geometry parts."""
    out = []
    for b in wkb:
        if b is None:
            out.append(None)
            continue
        g = W.loads(bytes(b))
        out.append([W.dumps(p) for p in g.parts()])
    return pd.Series(out)


# ------------------------------------------------------------- binary geoms
def _map_pair_geom(wkb1: pd.Series, wkb2: pd.Series, fn):
    out = []
    for b1, b2 in zip(wkb1, wkb2):
        if b1 is None or b2 is None:
            out.append(None)
            continue
        g = fn(W.loads(bytes(b1)), W.loads(bytes(b2)))
        out.append(W.dumps(g) if g is not None else None)
    return pd.Series(out)


@pandas_udf(BinaryType())
def st_intersection(wkb1: pd.Series, wkb2: pd.Series) -> pd.Series:
    return _map_pair_geom(wkb1, wkb2, C.intersection)


@pandas_udf(BinaryType())
def st_difference(wkb1: pd.Series, wkb2: pd.Series) -> pd.Series:
    return _map_pair_geom(wkb1, wkb2, C.difference)


@pandas_udf(BinaryType())
def st_union_pair(wkb1: pd.Series, wkb2: pd.Series) -> pd.Series:
    return _map_pair_geom(wkb1, wkb2, lambda a, b: C.union_geoms([a, b]))


@pandas_udf(DoubleType())
def st_distance(wkb1: pd.Series, wkb2: pd.Series) -> pd.Series:
    out = []
    for b1, b2 in zip(wkb1, wkb2):
        if b1 is None or b2 is None:
            out.append(None)
        else:
            out.append(K.distance(W.loads(bytes(b1)), W.loads(bytes(b2))))
    return pd.Series(out, dtype="float64")


_EARTH_RADIUS_M = 6_371_008.8  # IUGG mean radius


def st_distance_sphere(lon1, lat1, lon2, lat2) -> Column:
    """Great-circle (haversine) distance in meters between two lon/lat
    points — the reference returns geodesic meters for geographic-CRS
    layers (``geoops.py:3216-3224``, spatialite ST_Distance geodesic
    mode). Pure JVM column expression (whole-stage codegen, no Python):
    use for lon/lat point layers where the engine's planar kernels would
    return degrees."""
    rlat1 = F.radians(lat1)
    rlat2 = F.radians(lat2)
    dlat = (rlat2 - rlat1) / 2.0
    dlon = (F.radians(lon2) - F.radians(lon1)) / 2.0
    h = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon) * F.sin(dlon)
    )
    # asin(sqrt(h)) form; clamp for rounding at antipodes
    return (
        2.0
        * F.lit(_EARTH_RADIUS_M)
        * F.asin(F.sqrt(F.least(h, F.lit(1.0))))
    )


# ---------------------------------------------------------------- predicates
def _pair_pred(wkb1: pd.Series, wkb2: pd.Series, fn) -> pd.Series:
    out = []
    cache: dict[bytes, object] = {}

    def load(b):
        g = cache.get(b)
        if g is None:
            g = W.loads(b)
            if len(cache) > 256:
                cache.clear()
            cache[b] = g
        return g

    for b1, b2 in zip(wkb1, wkb2):
        if b1 is None or b2 is None:
            out.append(None)
        else:
            out.append(bool(fn(load(bytes(b1)), load(bytes(b2)))))
    return pd.Series(out, dtype="boolean")


def _make_pred_udf(name):
    fn = P.PREDICATE_FNS[name]

    @pandas_udf(BooleanType())
    def _pred(wkb1: pd.Series, wkb2: pd.Series) -> pd.Series:
        return _pair_pred(wkb1, wkb2, fn)

    _pred.__name__ = f"st_{name}"
    return _pred


st_intersects = _make_pred_udf("intersects")
st_within = _make_pred_udf("within")
st_contains = _make_pred_udf("contains")
st_touches = _make_pred_udf("touches")
st_overlaps = _make_pred_udf("overlaps")
st_crosses = _make_pred_udf("crosses")
st_covers = _make_pred_udf("covers")
st_coveredby = _make_pred_udf("coveredby")
st_equals = _make_pred_udf("equals")
st_disjoint = _make_pred_udf("disjoint")


@pandas_udf(StringType())
def st_relate(wkb1: pd.Series, wkb2: pd.Series) -> pd.Series:
    out = []
    for b1, b2 in zip(wkb1, wkb2):
        if b1 is None or b2 is None:
            out.append(None)
        else:
            out.append(P.relate_matrix(W.loads(bytes(b1)), W.loads(bytes(b2))))
    return pd.Series(out)


def st_dwithin(col1, col2, dist: float) -> Column:
    @pandas_udf(BooleanType())
    def _dw(wkb1: pd.Series, wkb2: pd.Series) -> pd.Series:
        return _pair_pred(
            wkb1, wkb2, lambda a, b: K.distance(a, b) <= dist
        )

    return _dw(col1, col2)


# --------------------------------------------------------------- cell index
def gq_cell(col_x, col_y, res: int) -> Column:
    """Point cell id from x/y columns — pure JVM arithmetic (whole-stage
    codegen; delegates to operators.celljoin.cell_expr, which is the
    single source of truth for the id layout). NULL-in -> NULL-out."""
    from ..operators.celljoin import cell_expr
    from pyspark.sql import functions as F

    return F.when(
        col_x.isNotNull() & col_y.isNotNull(), cell_expr(col_x, col_y, res)
    )


def gq_cover(col, res: int, cap: int = 4096) -> Column:
    """Array of cell ids covering the geometry (explode for the join key).
    Point geometries get exactly one cell — the fast path."""

    @pandas_udf(ArrayType(LongType()))
    def _cover(wkb: pd.Series) -> pd.Series:
        out = []
        for b in wkb:
            if b is None:
                out.append(None)
                continue
            g = W.loads(bytes(b))
            pts = g.points()
            if g.typ == 1 and len(pts) == 1:
                out.append(
                    X.cell_of_points(pts[:, 0], pts[:, 1], res).tolist()
                )
            else:
                out.append(X.cover_geometry(g, res, cap=cap).tolist())
        return pd.Series(out)

    return _cover(col)


def gq_parent(col, parent_res: int) -> Column:
    @pandas_udf(LongType())
    def _par(cells: pd.Series) -> pd.Series:
        arr = cells.to_numpy(dtype=np.int64, na_value=0)
        return pd.Series(X.parent(arr, parent_res), dtype="int64")

    return _par(col)


def register_sql_functions(spark) -> None:
    """Expose the surface to SQL-string users (optional nicety,
    SURVEY.md §4 'Optional')."""
    spark.udf.register("st_area", st_area)
    spark.udf.register("st_length", st_length)
    spark.udf.register("st_astext", st_astext)
    spark.udf.register("st_geomfromtext", st_geomfromtext)
    spark.udf.register("st_isvalid", st_isvalid)
    spark.udf.register("st_intersects", st_intersects)
    spark.udf.register("st_distance", st_distance)
    spark.udf.register("st_intersection", st_intersection)
    spark.udf.register("st_centroid", st_centroid)
    spark.udf.register("st_npoints", st_npoints)


def st_warp_gcps(col, gcps: list, algorithm: str = "polynomial",
                 order: int | None = None) -> Column:
    """GCP warp twin of the reference's ogr-based warp
    (``_geoops_ogr.py:80-110``): polynomial order 1-3 or thin-plate
    spline, fitted once on the driver, applied vectorized per batch."""
    from ..geometry.extra import coords_transform, fit_gcp_polynomial, fit_gcp_tps

    if algorithm == "tps":
        mapping = fit_gcp_tps(gcps)
    else:
        mapping = fit_gcp_polynomial(gcps, order)

    @pandas_udf(BinaryType())
    def _warp(wkb: pd.Series) -> pd.Series:
        return pd.Series(_map_geom(wkb, lambda g: coords_transform(g, mapping)))

    return _warp(col)


def st_affine(col, matrix) -> Column:
    """Affine warp (a,b,c,d,e,f): x' = a*x+b*y+c, y' = d*x+e*y+f
    (geofileops warp, geoops.py:1561; affine order-1 case)."""
    from ..geometry.extra import affine_transform

    m = tuple(float(v) for v in matrix)

    @pandas_udf(BinaryType())
    def _aff(wkb: pd.Series) -> pd.Series:
        return pd.Series(_map_geom(wkb, lambda g: affine_transform(g, m)))

    return _aff(col)


def st_issliver(col, tolerance: float) -> Column:
    """Sliver predicate (geofileops _geoops_sql.py:4059-4130)."""
    from pyspark.sql.types import BooleanType

    from ..geometry.extra import is_sliver

    @pandas_udf(BooleanType())
    def _sliv(wkb: pd.Series) -> pd.Series:
        out = []
        for b in wkb:
            out.append(None if b is None else bool(is_sliver(W.loads(bytes(b)), tolerance)))
        return pd.Series(out, dtype="boolean")

    return _sliv(col)


@pandas_udf(BinaryType())
def st_linemerge(wkb: pd.Series) -> pd.Series:
    """ST_LineMerge (geofileops _geoops_sql.py:4765-4771)."""
    from ..geometry.extra import line_merge

    return pd.Series(_map_geom(wkb, line_merge))
