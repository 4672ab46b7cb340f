"""Dissolve family (geofileops ``geoops.py:1074-1259`` ->
``_geoops_gpd.py:1115-1716`` polygon multi-pass path and
``_geoops_sql.py:4600-4881`` single-pass path).

Spark-first shape — the reference's "tile, dissolve per tile, recurse on
tile-border pieces" loop becomes a **hierarchical two-phase union**:

1. partial: assign every geometry the grid cell of its bbox centre at a
   chosen resolution, ``groupBy(group_cols + cell).applyInPandas`` with a
   vectorized union-all kernel (map-side combine of the geometric union);
2. merge rounds: re-cell each partial result at the parent resolution
   (coarser by 2 levels) and union again — pieces that can no longer
   touch anything (their bbox lies strictly inside their cell and they
   met no partner) could exit early, but the rounds are logarithmic and
   each round shrinks the row count, so the simple full cascade is used;
3. final: one union per group (cheap: by then each group holds at most a
   handful of pre-unioned pieces).

Attribute aggregation (``agg_columns`` spec: count/sum/mean/min/max/
median/concat, distinct, sep — ``_geoops_sql.py:4685-4759``) is computed
directly from the ORIGINAL rows with a plain ``groupBy(...).agg(...)``
and joined back on the group keys: Spark's two-phase hash aggregation
replaces the reference's JSON-pack carry across tiling passes
(``__DISSOLVE_TOJSON``, ``_geoops_gpd.py:1141-1180``).

At scale: phase 1 is one shuffle on (group, cell) with map-side
pre-union; merge rounds touch only still-mergeable pieces; the group
count bounds final-task fan-in. Dense-cell skew is bounded by choosing
``res`` from the data extent so a cell holds ~rows/partitions rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StructField, StructType

from ..geometry import clip as C
from ..geometry import geom as G
from ..geometry import wkb as W
from ..index import cells as X


def _union_all_wkb(blobs) -> bytes | None:
    geoms = [W.loads(bytes(b)) for b in blobs if b is not None]
    geoms = [g for g in geoms if not g.is_empty()]
    if not geoms:
        return None
    merged = C.union_geoms(geoms)
    if merged.is_empty():
        return None
    # line layers: ST_LineMerge(ST_Union(...)) (geofileops
    # _geoops_sql.py:4765-4771); point layers: distinct points
    if merged.dim() == 1:
        from ..geometry.extra import line_merge

        merged = line_merge(merged)
    elif merged.dim() == 0:
        pts = np.unique(merged.points(), axis=0)
        merged = G.Geometry(G.MULTIPOINT, pts)
    return W.dumps(merged.force_multi())


def _cell_of_bbox_center(wkb_series: pd.Series, res: int) -> pd.Series:
    from ..geometry.kernels import bounds as g_bounds

    cx = np.empty(len(wkb_series))
    cy = np.empty(len(wkb_series))
    for i, b in enumerate(wkb_series):
        if b is None:
            cx[i] = np.nan
            cy[i] = np.nan
            continue
        b0, b1, b2, b3 = g_bounds(W.loads(bytes(b)))
        cx[i] = (b0 + b2) / 2.0
        cy[i] = (b1 + b3) / 2.0
    ok = np.isfinite(cx)
    out = np.zeros(len(cx), dtype=np.int64)
    if ok.any():
        out[ok] = X.cell_of_points(cx[ok], cy[ok], res)
    return pd.Series(out).where(pd.Series(ok), other=None)


def _partial_union(df: DataFrame, keys: list[str], geom_col: str) -> DataFrame:
    """groupBy(keys).applyInPandas union — one geometry per key tuple."""
    out_schema = StructType(
        [df.schema[k] for k in keys] + [StructField(geom_col, BinaryType())]
    )

    def _merge(pdf: pd.DataFrame) -> pd.DataFrame:
        row = {k: [pdf[k].iloc[0]] for k in keys}
        row[geom_col] = [_union_all_wkb(pdf[geom_col])]
        return pd.DataFrame(row)

    return df.groupBy(*keys).applyInPandas(_merge, schema=out_schema)


def _pick_res(df: DataFrame, geom_col: str, sample: int = 2000) -> int:
    """Resolution where a typical cell holds a bounded number of rows:
    derived from the sampled data extent and the session parallelism
    (the reference's nb_batches heuristic, ``_geoops_gpd.py:1377-1384``)."""
    rows = df.select(geom_col).limit(sample).collect()
    xs, ys = [], []
    from ..geometry.kernels import bounds as g_bounds

    for r in rows:
        if r[0] is None:
            continue
        b0, b1, b2, b3 = g_bounds(W.loads(bytes(r[0])))
        if np.isfinite(b0):
            xs += [b0, b2]
            ys += [b1, b3]
    if not xs:
        return 8
    extent = max(max(xs) - min(xs), max(ys) - min(ys))
    if extent <= 0:
        return 8
    # ~16x16 cells over the data extent as the starting grid
    res = int(np.clip(np.ceil(np.log2(2.0 * X.WORLD / (extent / 16.0))), 2, X.MAX_RES))
    return res


_AGG_FNS = {
    "count": lambda c: F.count(c),
    "sum": lambda c: F.sum(c),
    "mean": lambda c: F.avg(c),
    "avg": lambda c: F.avg(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
    "median": lambda c: F.expr(f"percentile({c}, 0.5)"),
}


def _build_aggs(agg_columns: dict | None) -> list:
    """agg_columns spec -> Spark agg expressions (geofileops agg SQL
    builder, ``_geoops_sql.py:4685-4759``; json spec
    ``_geoops_gpd.py:1529``)."""
    if not agg_columns:
        return []
    aggs = []
    if "json" in agg_columns:
        cols = agg_columns["json"]
        aggs.append(
            F.to_json(F.collect_list(F.struct(*[F.col(c) for c in cols]))).alias("json")
        )
        return aggs
    for spec in agg_columns.get("columns", []):
        col, how = spec["column"], spec["agg"].lower()
        alias = spec.get("as") or f"{col}_{how}"
        distinct = spec.get("distinct", False)
        if how == "concat":
            sep = spec.get("sep", ",")
            inner = F.collect_set(F.col(col).cast("string")) if distinct else \
                F.collect_list(F.col(col).cast("string"))
            aggs.append(F.array_join(F.array_sort(inner), sep).alias(alias))
        elif how == "count" and distinct:
            aggs.append(F.countDistinct(col).alias(alias))
        elif how in _AGG_FNS:
            target = F.col(col)
            if distinct and how == "sum":
                aggs.append(F.sum_distinct(target).alias(alias))
            else:
                aggs.append(_AGG_FNS[how](col).alias(alias))
        else:
            raise ValueError(f"unsupported agg: {how}")
    return aggs


def dissolve(
    df: DataFrame,
    groupby_columns: list[str] | None = None,
    agg_columns: dict | None = None,
    explodecollections: bool = False,
    res: int | None = None,
    merge_rounds: int | None = None,
    geom_col: str = "geom_wkb",
    gridsize: float = 0.0,
) -> DataFrame:
    """Group rows and geometrically union the geometries per group.

    ``groupby_columns=None`` dissolves everything into one geometry
    (exploded to touching clusters when ``explodecollections``), matching
    geofileops dissolve goldens (no-groupby -> 1 row, SURVEY.md §5).

    ``merge_rounds=None`` sizes the hierarchical-merge cascade from the
    DATA, not from a count of the input (a full extra scan at 100 TB):
    after the per-cell partial union, the (small) per-cell result is
    measured — while any group still holds more than ``max_final_fanin``
    pre-unioned pieces, another 2-level-coarser merge round runs. Each
    round's per-task fan-in is bounded (a parent cell gathers <= ~16
    child pieces), so no single task — including the final per-group
    union — ever receives unbounded input.
    """
    groups = list(groupby_columns or [])
    gdf = df.where(F.col(geom_col).isNotNull())
    if res is None:
        res = _pick_res(gdf, geom_col)
    max_final_fanin = 64

    def _cell_udf_at(r: int):
        @F.pandas_udf("long")
        def _cell_udf(wkb: pd.Series) -> pd.Series:
            return _cell_of_bbox_center(wkb, r)

        return _cell_udf.asNondeterministic()

    def _max_pieces_per_group(mdf: DataFrame) -> int:
        # measures the per-cell PARTIAL RESULT (one row per (group,
        # cell) — orders of magnitude smaller than the input), never the
        # raw input
        if groups:
            row = mdf.groupBy(*groups).count().agg(F.max("count")).first()
            return int(row[0] or 0)
        return mdf.count()

    # phase 1: union per (groups, cell)
    work = gdf.select(*groups, geom_col).withColumn(
        "_cell", _cell_udf_at(res)(F.col(geom_col))
    )
    merged = _partial_union(work, groups + ["_cell"], geom_col)

    # merge rounds at coarser cells, then final union per group
    cur_res = res
    if merge_rounds is not None:
        for _ in range(merge_rounds):
            cur_res = max(0, cur_res - 2)
            merged = merged.withColumn("_cell", _cell_udf_at(cur_res)(F.col(geom_col)))
            merged = _partial_union(merged, groups + ["_cell"], geom_col)
            if cur_res == 0:
                break
    else:
        while cur_res > 0:
            merged = merged.persist()
            if _max_pieces_per_group(merged) <= max_final_fanin:
                break
            cur_res = max(0, cur_res - 2)
            merged = merged.withColumn(
                "_cell", _cell_udf_at(cur_res)(F.col(geom_col))
            )
            merged = _partial_union(merged, groups + ["_cell"], geom_col)
    merged = merged.drop("_cell")
    if groups:
        final = _partial_union(merged, groups, geom_col)
    else:
        final = _partial_union(merged.withColumn("_one", F.lit(1)), ["_one"], geom_col).drop(
            "_one"
        )

    # attribute aggregation straight from the original rows
    aggs = _build_aggs(agg_columns)
    if aggs:
        if groups:
            attr = df.groupBy(*groups).agg(*aggs)
            final = final.join(attr, on=groups, how="left")
        else:
            attr = df.agg(*aggs)
            final = final.crossJoin(F.broadcast(attr))

    if gridsize and gridsize > 0.0:
        from ..functions.st import st_reduceprecision

        final = final.withColumn(geom_col, st_reduceprecision(F.col(geom_col), gridsize))
    final = final.where(F.col(geom_col).isNotNull())
    if explodecollections:
        from ..functions.st import st_parts

        final = (
            final.withColumn("_parts", st_parts(F.col(geom_col)))
            .withColumn(geom_col, F.explode("_parts"))
            .drop("_parts")
        )
    return final


def dissolve_within_distance(
    df: DataFrame,
    distance: float,
    groupby_columns: list[str] | None = None,
    geom_col: str = "geom_wkb",
    gridsize: float = 0.0,
) -> DataFrame:
    """Union geometries closer than ``distance`` (geofileops
    ``geoops.py:37-396``): +buffer(d/2) -> dissolve -> -buffer(d/2),
    composed from our buffer/dissolve transforms. The reference's
    gap-piece repair heuristic (neighbour stats) is approximated by the
    positive-then-negative buffer, which already closes sub-``distance``
    gaps; sliver artifacts are snapped away via ``gridsize``."""
    from ..functions.st import st_buffer

    half = distance / 2.0
    buffered = df.withColumn(
        geom_col,
        st_buffer(F.col(geom_col), half, quad_segs=5, cap_style="square", join_style="mitre"),
    )
    dissolved = dissolve(buffered, groupby_columns, geom_col=geom_col)
    out = dissolved.withColumn(
        geom_col,
        st_buffer(F.col(geom_col), -half, quad_segs=5, cap_style="square", join_style="mitre"),
    )
    out = out.where(F.col(geom_col).isNotNull())
    if gridsize and gridsize > 0.0:
        from ..functions.st import st_reduceprecision

        out = out.withColumn(geom_col, st_reduceprecision(F.col(geom_col), gridsize))
    return out
