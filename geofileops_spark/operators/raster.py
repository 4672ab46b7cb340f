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

    Plan shape: one pandas UDF emits each geometry's pixel array (bounded
    by its bbox), then a groupBy(px, py) sums overlaps — partial
    aggregation keeps the shuffle at one row per touched pixel.
    """
    val = F.col(value_col).cast("double") if value_col else F.lit(1.0)
    work = df.select(F.col(geom_col).alias("_g"), val.alias("_v")).where(
        F.col("_g").isNotNull()
    )

    @pandas_udf("array<struct<px: long, py: long>>")
    def _pixels(wkb: pd.Series) -> pd.Series:
        out = []
        for b in wkb:
            if b is None:
                out.append(None)
                continue
            g = W.loads(bytes(b))
            x0, y0, x1, y1 = K.bounds(g)
            if not np.isfinite(x0):
                out.append([])
                continue
            ix0 = int(np.floor(x0 / pixel_size))
            ix1 = int(np.floor(x1 / pixel_size))
            iy0 = int(np.floor(y0 / pixel_size))
            iy1 = int(np.floor(y1 / pixel_size))
            xs = np.arange(ix0, ix1 + 1)
            ys = np.arange(iy0, iy1 + 1)
            gx, gy = np.meshgrid(xs, ys)
            if all_touched:
                mask = np.ones(gx.size, dtype=bool)
            else:
                centers = np.column_stack(
                    [
                        (gx.ravel() + 0.5) * pixel_size,
                        (gy.ravel() + 0.5) * pixel_size,
                    ]
                )
                mask = K.points_in_multipolygon(centers, g) >= 1
            pxs = gx.ravel()[mask]
            pys = gy.ravel()[mask]
            out.append(
                [{"px": int(a), "py": int(b2)} for a, b2 in zip(pxs, pys)]
            )
        return pd.Series(out)

    burst = (
        work.withColumn("_pix", _pixels(F.col("_g")))
        .where(F.col("_pix").isNotNull())
        .withColumn("_p", F.explode("_pix"))
        .select(
            F.col("_p.px").alias("px"), F.col("_p.py").alias("py"), F.col("_v")
        )
    )
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
    # the same UDF shape runs with the id carried through, no pre-agg
    val = F.col(zone_id_col)
    work = zones.select(val.alias("_zid"), F.col(geom_col).alias("_g"))

    @pandas_udf("array<struct<px: long, py: long>>")
    def _pixels(wkb: pd.Series) -> pd.Series:
        out = []
        for b in wkb:
            if b is None:
                out.append(None)
                continue
            g = W.loads(bytes(b))
            x0, y0, x1, y1 = K.bounds(g)
            if not np.isfinite(x0):
                out.append([])
                continue
            ix0 = int(np.floor(x0 / pixel_size))
            ix1 = int(np.floor(x1 / pixel_size))
            iy0 = int(np.floor(y0 / pixel_size))
            iy1 = int(np.floor(y1 / pixel_size))
            xs = np.arange(ix0, ix1 + 1)
            ys = np.arange(iy0, iy1 + 1)
            gx, gy = np.meshgrid(xs, ys)
            centers = np.column_stack(
                [(gx.ravel() + 0.5) * pixel_size, (gy.ravel() + 0.5) * pixel_size]
            )
            mask = K.points_in_multipolygon(centers, g) >= 1
            out.append(
                [
                    {"px": int(a), "py": int(b2)}
                    for a, b2 in zip(gx.ravel()[mask], gy.ravel()[mask])
                ]
            )
        return pd.Series(out)

    zone_pixels = (
        work.withColumn("_pix", _pixels(F.col("_g")))
        .where(F.col("_pix").isNotNull())
        .withColumn("_p", F.explode("_pix"))
        .select(F.col("_zid"), F.col("_p.px").alias("px"), F.col("_p.py").alias("py"))
    )
    joined = zone_pixels.join(raster, on=["px", "py"], how="inner")
    return joined.groupBy(F.col("_zid").alias(zone_id_col)).agg(
        F.count("*").alias("n_pixels"),
        F.sum("value").alias("sum_value"),
        F.avg("value").alias("mean_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
