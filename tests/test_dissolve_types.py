"""Dissolve on line/point layers + dissolve_within_distance + spatial
index facade (reference dissolve_singlethread semantics,
_geoops_sql.py:4600-4881)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geofileops_spark import geoops as gfo
from geofileops_spark.functions.st import (
    st_area,
    st_geometrytype,
    st_geomfromtext,
    st_length,
    st_npoints,
)
from geofileops_spark.operators.dissolve import dissolve, dissolve_within_distance


def layer(spark, rows, schema="fid long, wkt string"):
    df = spark.createDataFrame(rows, schema)
    return df.withColumn("geom_wkb", st_geomfromtext(F.col("wkt"))).drop("wkt")


def test_dissolve_lines_linemerge(spark):
    # chained segments along one row of trees -> merged to one path
    rows = [(i, f"LINESTRING ({i*10} 0, {i*10+10} 0)") for i in range(5)]
    df = layer(spark, rows).withColumn("g", F.lit("row1"))
    out = dissolve(df, ["g"])
    r = out.withColumn("len", st_length("geom_wkb")).withColumn(
        "np", st_npoints("geom_wkb")
    ).collect()[0]
    assert round(r["len"], 6) == 50.0
    assert r["np"] == 6  # merged into a single 6-point path
    assert out.select(st_geometrytype("geom_wkb")).collect()[0][0] == "MULTILINESTRING"


def test_dissolve_points_distinct(spark):
    rows = [(1, "POINT (1 1)"), (2, "POINT (1 1)"), (3, "POINT (2 2)")]
    df = layer(spark, rows).withColumn("g", F.lit(1))
    out = dissolve(df, ["g"])
    assert out.select(st_npoints("geom_wkb")).collect()[0][0] == 2


def test_dissolve_within_distance_merges_gaps(spark):
    # boxes with 30-unit gaps; d=50 closes them into one strip
    rows = [(i, f"POLYGON (({i*150} 0, {i*150+120} 0, {i*150+120} 100, {i*150} 100, {i*150} 0))")
            for i in range(4)]
    df = layer(spark, rows).withColumn("g", F.lit(1))
    out = dissolve_within_distance(df, distance=50.0, groupby_columns=["g"], gridsize=0.001)
    rows_out = out.withColumn("a", st_area("geom_wkb")).collect()
    assert len(rows_out) == 1
    # merged strip ~ [0, 570] x [0, 100] = 57000 (allow buffer artifacts)
    assert abs(rows_out[0]["a"] - 57000) < 600


def test_create_spatial_index(spark):
    rows = [(i, f"POINT ({i*7 % 100} {i*13 % 100})") for i in range(50)]
    df = layer(spark, rows)
    idx = gfo.create_spatial_index(df, res=20)
    assert gfo.has_spatial_index(idx)
    assert idx.count() == 50
    assert not gfo.has_spatial_index(gfo.remove_spatial_index(idx))
    assert gfo.get_layer_geometrytypes(df) == ["POINT"]


def test_dissolve_within_distance_gap_repair(spark):
    """Reference 9-step semantics: the gap BETWEEN two features is filled
    (piece touches 2 neighbours) while isolated features and original
    boundaries stay untouched; internal notches are only filled with
    close_internal_gaps=True."""
    from geofileops_spark.functions.st import st_area, st_geomfromtext

    rows = [
        (1, "POLYGON ((0 0, 100 0, 100 100, 0 100, 0 0))"),
        (2, "POLYGON ((140 0, 240 0, 240 100, 140 100, 140 0))"),
        (3, "POLYGON ((1000 0, 1100 0, 1100 100, 1000 100, 1000 0))"),
    ]
    df = spark.createDataFrame(rows, "fid long, wkt string").withColumn(
        "geom_wkb", st_geomfromtext(F.col("wkt"))
    ).drop("wkt")
    out = dissolve_within_distance(df, distance=50.0)
    areas = sorted(
        r[0] for r in out.select(st_area("geom_wkb")).collect()
    )
    assert len(areas) == 2
    assert areas[0] == pytest.approx(10000.0, abs=1.0)   # isolated: untouched
    assert areas[1] == pytest.approx(24000.0, abs=1.0)   # gap filled exactly
