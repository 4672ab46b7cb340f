"""Raster <-> vector per-tile operators (north rule: "raster<->vector via
per-tile rasterize/sample UDFs"; no reference counterpart — geofileops is
vector-only, so this mirrors its *tiling pattern* (`_geoops_gpd.py:
1902-2187` per-tile workers) applied to rasterization).

Raster model: a raster is a DataFrame of pixels ``(px bigint, py bigint,
value double)`` on a world-aligned square grid of ``pixel_size`` units
(px = floor(x / pixel_size)). A "tile" is a grid cell id (index/cells.py)
grouping pixels for locality; rasterize fans out per (geometry x tile)
and runs one vectorized numpy point-in-polygon per tile — the same
two-phase tile-then-combine shape as dissolve.

- ``rasterize``: polygons -> pixel rows (burn value = polygon count per
  pixel by default, or any attribute aggregated with SUM).
- ``sample_raster``: points -> the pixel value under each point (pure
  JVM arithmetic join on pixel coordinates — no Python at all).
- ``zonal_stats``: polygons x raster -> per-polygon count/sum/mean of
  covered pixels (rasterize the zone ids, equi-join on pixel).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from ..geometry import kernels as K
from ..geometry import wkb as W

_PIXEL_SCHEMA = StructType(
    [
        StructField("px", LongType()),
        StructField("py", LongType()),
        StructField("value", DoubleType()),
    ]
)

# burn tile edge in pixels: one (geometry, tile) row emits at most
# _TILE_PX^2 pixel structs (~16k), so a huge zone at tiny pixel_size
# fans out across tasks instead of materializing millions of dicts in
# one UDF row (task OOM / oversized Arrow batch)
_TILE_PX = 128


def _pixel_bbox_udf(pixel_size: float):
    """wkb -> pixel-index bbox struct (vectorized planning pass)."""

    @pandas_udf("struct<ix0: long, iy0: long, ix1: long, iy1: long>")
    def _bb(wkb: pd.Series) -> pd.DataFrame:
        cols = {"ix0": [], "iy0": [], "ix1": [], "iy1": []}
        for b in wkb:
            ok = False
            if b is not None:
                g = W.loads(bytes(b))
                x0, y0, x1, y1 = K.bounds(g)
                if np.isfinite(x0):
                    cols["ix0"].append(int(np.floor(x0 / pixel_size)))
                    cols["iy0"].append(int(np.floor(y0 / pixel_size)))
                    cols["ix1"].append(int(np.floor(x1 / pixel_size)))
                    cols["iy1"].append(int(np.floor(y1 / pixel_size)))
                    ok = True
            if not ok:
                for k in cols:
                    cols[k].append(None)
        return pd.DataFrame(cols)

    return _bb


def _burn_tile_udf(pixel_size: float, all_touched: bool):
    """(wkb, tx, ty, ix0..iy1) -> covered pixel structs WITHIN the tile.

    The same geometry arrives in consecutive rows (one per tile), so the
    per-batch decode cache makes the WKB decode amortized ~once."""
    from .join import _geom_cache_loader

    @pandas_udf("array<struct<px: long, py: long>>")
    def _burn(
        wkb: pd.Series, tx: pd.Series, ty: pd.Series,
        ix0: pd.Series, iy0: pd.Series, ix1: pd.Series, iy1: pd.Series,
    ) -> pd.Series:
        load = _geom_cache_loader()
        out = []
        for b, a_tx, a_ty, a0, b0, a1, b1 in zip(
            wkb, tx, ty, ix0, iy0, ix1, iy1
        ):
            if b is None:
                out.append(None)
                continue
            xs = np.arange(max(int(a_tx) * _TILE_PX, int(a0)),
                           min((int(a_tx) + 1) * _TILE_PX - 1, int(a1)) + 1)
            ys = np.arange(max(int(a_ty) * _TILE_PX, int(b0)),
                           min((int(a_ty) + 1) * _TILE_PX - 1, int(b1)) + 1)
            if len(xs) == 0 or len(ys) == 0:
                out.append([])
                continue
            gx, gy = np.meshgrid(xs, ys)
            if all_touched:
                pxs, pys = gx.ravel(), gy.ravel()
            else:
                g = load(bytes(b))
                centers = np.column_stack(
                    [
                        (gx.ravel() + 0.5) * pixel_size,
                        (gy.ravel() + 0.5) * pixel_size,
                    ]
                )
                mask = K.points_in_multipolygon(centers, g) >= 1
                pxs, pys = gx.ravel()[mask], gy.ravel()[mask]
            out.append(
                [{"px": int(a), "py": int(c)} for a, c in zip(pxs, pys)]
            )
        return pd.Series(out)

    return _burn


def _burst_pixels(
    work: DataFrame,
    pixel_size: float,
    all_touched: bool,
    carry: list[str],
) -> DataFrame:
    """Shared burn plan: bbox planning pass -> JVM-side (geometry x tile)
    explode -> bounded per-tile burn -> exploded (carry..., px, py) rows."""
    bb = _pixel_bbox_udf(pixel_size)
    t = F.lit(_TILE_PX)
    tiled = (
        work.withColumn("_bb", bb(F.col("_g")))
        .where(F.col("_bb.ix0").isNotNull())
        .withColumn(
            "_tx",
            F.explode(
                F.sequence(
                    F.floor(F.col("_bb.ix0") / t), F.floor(F.col("_bb.ix1") / t)
                )
            ),
        )
        .withColumn(
            "_ty",
            F.explode(
                F.sequence(
                    F.floor(F.col("_bb.iy0") / t), F.floor(F.col("_bb.iy1") / t)
                )
            ),
        )
    )
    burn = _burn_tile_udf(pixel_size, all_touched).asNondeterministic()
    return (
        tiled.withColumn(
            "_pix",
            burn(
                F.col("_g"), F.col("_tx"), F.col("_ty"),
                F.col("_bb.ix0"), F.col("_bb.iy0"),
                F.col("_bb.ix1"), F.col("_bb.iy1"),
            ),
        )
        .where(F.col("_pix").isNotNull())
        .withColumn("_p", F.explode("_pix"))
        .select(
            *carry, F.col("_p.px").alias("px"), F.col("_p.py").alias("py")
        )
    )


def rasterize(
    df: DataFrame,
    pixel_size: float,
    value_col: str | None = None,
    geom_col: str = "geom_wkb",
    all_touched: bool = False,
) -> DataFrame:
    """Burn polygons onto the world-aligned pixel grid.

    A pixel is burned when its CENTER is covered (GDAL default), or when
    it intersects the bbox of the geometry with ``all_touched`` (cheap
    variant). Output: (px, py, value) with per-pixel SUM over input rows
    (value = 1 per geometry when ``value_col`` is None).

    Plan shape: a vectorized bbox planning pass, a JVM-side
    (geometry x 128px-tile) explode, then one bounded per-tile burn UDF;
    a groupBy(px, py) sums overlaps — partial aggregation keeps the
    shuffle at one row per touched pixel, and no single UDF row ever
    holds more than ~16k pixel structs regardless of zone size.
    """
    val = F.col(value_col).cast("double") if value_col else F.lit(1.0)
    work = df.select(F.col(geom_col).alias("_g"), val.alias("_v")).where(
        F.col("_g").isNotNull()
    )
    burst = _burst_pixels(work, pixel_size, all_touched, carry=["_v"])
    return burst.groupBy("px", "py").agg(F.sum("_v").alias("value"))


def sample_raster(
    points: DataFrame,
    raster: DataFrame,
    pixel_size: float,
    x_col: str = "lon",
    y_col: str = "lat",
    how: str = "left",
) -> DataFrame:
    """Point sampling: value of the pixel under each point. Pure JVM
    arithmetic + equi-join on (px, py) — broadcastable when the raster is
    dim-sized, shuffle-join otherwise."""
    keyed = points.withColumn(
        "px", F.floor(F.col(x_col) / pixel_size).cast("long")
    ).withColumn("py", F.floor(F.col(y_col) / pixel_size).cast("long"))
    return keyed.join(raster, on=["px", "py"], how=how)


def zonal_stats(
    zones: DataFrame,
    raster: DataFrame,
    pixel_size: float,
    zone_id_col: str = "fid",
    geom_col: str = "geom_wkb",
) -> DataFrame:
    """Per-zone stats of covered pixels: rasterize each zone to its pixel
    set (value = zone id marker), equi-join with the raster on (px, py),
    aggregate count/sum/mean/min/max."""
    # rasterize() sums per pixel; zone mapping needs (zone, px, py), so
    # the same tiled burn runs with the id carried through, no pre-agg
    val = F.col(zone_id_col)
    work = zones.select(val.alias("_zid"), F.col(geom_col).alias("_g"))
    zone_pixels = _burst_pixels(work, pixel_size, False, carry=["_zid"])
    joined = zone_pixels.join(raster, on=["px", "py"], how="inner")
    return joined.groupBy(F.col("_zid").alias(zone_id_col)).agg(
        F.count("*").alias("n_pixels"),
        F.sum("value").alias("sum_value"),
        F.avg("value").alias("mean_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
