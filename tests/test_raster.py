"""Raster <-> vector operators: exact pixel-count expectations on
integer-aligned boxes."""

from __future__ import annotations

from pyspark.sql import functions as F

from geofileops_spark.functions.st import st_geomfromtext
from geofileops_spark.operators import raster as R


def layer(spark, rows):
    df = spark.createDataFrame(rows, "fid long, wkt string")
    return df.withColumn("geom_wkb", st_geomfromtext(F.col("wkt"))).drop("wkt")


def box(x0, y0, x1, y1):
    return f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, {x0} {y1}, {x0} {y0}))"


def test_rasterize_counts(spark):
    # box [0,10)x[0,10) at pixel_size 1 -> exactly 100 pixels of value 1
    df = layer(spark, [(1, box(0, 0, 10, 10))])
    r = R.rasterize(df, pixel_size=1.0)
    assert r.count() == 100
    assert r.agg(F.sum("value")).collect()[0][0] == 100.0
    # two overlapping boxes: overlap pixels get value 2
    df2 = layer(spark, [(1, box(0, 0, 10, 10)), (2, box(5, 0, 15, 10))])
    r2 = R.rasterize(df2, pixel_size=1.0)
    assert r2.count() == 150  # union of pixels
    assert r2.where("value = 2").count() == 50  # overlap strip 5x10


def test_rasterize_value_col(spark):
    df = layer(spark, [(1, box(0, 0, 4, 4))]).withColumn("w", F.lit(2.5))
    r = R.rasterize(df, pixel_size=2.0, value_col="w")
    assert r.count() == 4
    assert r.agg(F.sum("value")).collect()[0][0] == 10.0


def test_sample_raster(spark):
    ras = R.rasterize(layer(spark, [(1, box(0, 0, 10, 10))]), pixel_size=1.0)
    pts = spark.createDataFrame(
        [(1, 2.5, 3.5), (2, 50.0, 50.0)], "fid long, lon double, lat double"
    )
    out = R.sample_raster(pts, ras, pixel_size=1.0)
    vals = {r["fid"]: r["value"] for r in out.collect()}
    assert vals[1] == 1.0 and vals[2] is None  # outside -> NULL (left join)


def test_zonal_stats(spark):
    ras = R.rasterize(layer(spark, [(1, box(0, 0, 20, 20))]), pixel_size=1.0)
    zones = layer(spark, [(10, box(0, 0, 10, 10)), (20, box(10, 0, 20, 20))])
    out = R.zonal_stats(zones, ras, pixel_size=1.0)
    rows = {r["fid"]: r for r in out.collect()}
    assert rows[10]["n_pixels"] == 100 and rows[10]["sum_value"] == 100.0
    assert rows[20]["n_pixels"] == 200 and rows[20]["mean_value"] == 1.0


def test_rasterize_huge_zone_bounded_rows(spark):
    """A single ~1.1M-pixel zone must fan out across (geometry x tile)
    rows — no UDF row may emit more than _TILE_PX^2 pixel structs, so the
    task result stays far under the old one-list-per-geometry blowup."""
    from pyspark.sql import functions as F

    from geofileops_spark.functions.st import st_geomfromtext
    from geofileops_spark.operators.raster import _TILE_PX, rasterize

    # 1050 x 1050 units at pixel_size=1 -> 1,102,500 pixels, 9x9 tiles
    df = spark.createDataFrame(
        [(1, "POLYGON ((0 0, 1050 0, 1050 1050, 0 1050, 0 0))")],
        "fid long, wkt string",
    ).withColumn("geom_wkb", st_geomfromtext(F.col("wkt"))).drop("wkt")
    out = rasterize(df, pixel_size=1.0)
    agg = out.agg(
        F.count("*").alias("n"), F.sum("value").alias("s")
    ).collect()[0]
    # every pixel exactly once (fan-out is ceil(1050/128)^2 = 81 tile
    # rows of <= _TILE_PX^2 pixels each, instead of one 1.1M-dict list)
    assert agg["n"] == 1050 * 1050 and agg["s"] == float(1050 * 1050)
    assert _TILE_PX == 128
