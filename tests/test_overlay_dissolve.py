"""Overlay + dissolve operators against exact-arithmetic box layouts.

All coordinates are integers, so every expected area is exact (rectangle
algebra) — the same oracle style the driver's DuckDB gate uses.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geofileops_spark.functions.st import st_area, st_geomfromtext, st_parts
from geofileops_spark.operators import dissolve as D
from geofileops_spark.operators import overlay as O


def box_wkt(x0, y0, x1, y1):
    return f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, {x0} {y1}, {x0} {y0}))"


def layer(spark, rows):
    df = spark.createDataFrame(rows, "fid long, wkt string")
    return df.withColumn("geom_wkb", st_geomfromtext(F.col("wkt"))).drop("wkt")


@pytest.fixture(scope="module")
def paired(spark):
    """Left boxes disjoint on a 200-stride; right partner for even fids,
    offset (+60,+50) -> overlap 60x100=6000. Left area 120*150=18000."""
    left = layer(
        spark,
        [(i, box_wkt(i * 200, (i % 5) * 200, i * 200 + 120, (i % 5) * 200 + 150)) for i in range(10)],
    )
    right = layer(
        spark,
        [
            (i, box_wkt(i * 200 + 60, (i % 5) * 200 + 50, i * 200 + 180, (i % 5) * 200 + 200))
            for i in range(0, 10, 2)
        ],
    )
    return left, right


def areas_by_fid(df, id_col="fid"):
    rows = (
        df.withColumn("_a", st_area(F.col("geom_wkb")))
        .select(id_col, "_a")
        .collect()
    )
    return {r[0]: round(r[1], 6) for r in rows}


def test_intersection_pairs(spark, paired):
    left, right = paired
    out = O.intersection(left, right, res=8)
    rows = out.withColumn("_a", st_area("geom_wkb")).select("l1_fid", "l2_fid", "_a").collect()
    got = {(r[0], r[1]): round(r[2], 6) for r in rows}
    assert got == {(i, i): 6000.0 for i in range(0, 10, 2)}


def test_difference_passthrough_and_subtract(spark, paired):
    left, right = paired
    out = O.difference(left, right, res=8)
    got = areas_by_fid(out)
    expect = {i: (12000.0 if i % 2 == 0 else 18000.0) for i in range(10)}
    assert got == expect


def test_difference_empty_drops_row(spark):
    # l2 fully covers l1 fid 0 -> dropped; fid 1 untouched -> pass-through
    l1 = layer(spark, [(0, box_wkt(0, 0, 10, 10)), (1, box_wkt(100, 100, 110, 110))])
    l2 = layer(spark, [(7, box_wkt(-5, -5, 15, 15))])
    out = O.difference(l1, l2, res=8)
    assert areas_by_fid(out) == {1: 100.0}


def test_clip(spark, paired):
    left, _ = paired
    blade = layer(spark, [(99, box_wkt(150, 0, 900, 1000))])
    out = O.clip(left, blade, res=8)
    # fid i box spans x [200i, 200i+120]: clipped to [150,900]
    expect = {}
    for i in range(10):
        x0, x1 = i * 200, i * 200 + 120
        w = max(0, min(x1, 900) - max(x0, 150))
        if w > 0:
            expect[i] = float(w * 150)
    assert areas_by_fid(out) == expect


def test_symmetric_difference_and_union(spark, paired):
    left, right = paired
    sym = O.symmetric_difference(left, right, res=8)
    # per even i: two pieces of 12000 each; odd i: left 18000
    total = sym.agg(F.sum(st_area("geom_wkb"))).collect()[0][0]
    assert round(total, 6) == 5 * (12000 + 12000) + 5 * 18000

    uni = O.union(left, right, res=8)
    total_u = uni.agg(F.sum(st_area("geom_wkb"))).collect()[0][0]
    assert round(total_u, 6) == 5 * (6000 + 12000 + 12000) + 5 * 18000
    # intersection rows carry both fids
    n_pairs = uni.where(F.col("l1_fid").isNotNull() & F.col("l2_fid").isNotNull()).count()
    assert n_pairs == 5


def test_identity(spark, paired):
    left, right = paired
    out = O.identity(left, right, res=8)
    total = out.agg(F.sum(st_area("geom_wkb"))).collect()[0][0]
    # even: 6000 + 12000; odd: 18000 -> total = 10 * 18000
    assert round(total, 6) == 10 * 18000


def test_dissolve_disjoint_groups(spark, paired):
    left, _ = paired
    grouped = left.withColumn("grp", (F.col("fid") % 2).cast("int"))
    out = D.dissolve(grouped, ["grp"], agg_columns={"columns": [
        {"column": "fid", "agg": "count", "as": "n"},
        {"column": "fid", "agg": "sum", "as": "fid_sum"},
    ]})
    rows = {r["grp"]: r for r in out.collect()}
    assert set(rows) == {0, 1}
    for g, r in rows.items():
        assert r["n"] == 5
    # 5 disjoint parts each, area 5*18000
    exploded = out.withColumn("part", F.explode(st_parts("geom_wkb")))
    parts = exploded.groupBy("grp").count().collect()
    assert {r["grp"]: r["count"] for r in parts} == {0: 5, 1: 5}
    areas = out.withColumn("_a", st_area("geom_wkb")).select("grp", "_a").collect()
    assert {r["grp"]: round(r["_a"], 6) for r in areas} == {0: 90000.0, 1: 90000.0}


def test_dissolve_merges_overlapping(spark, paired):
    left, right = paired
    both = left.select("geom_wkb").unionByName(right.select("geom_wkb")).withColumn(
        "g", F.lit(1)
    )
    out = D.dissolve(both, ["g"])
    areas = out.withColumn("_a", st_area("geom_wkb")).collect()
    assert len(areas) == 1
    # even fids merge with partner: 18000*2-6000=30000; odd stay 18000
    assert round(areas[0]["_a"], 6) == 5 * 30000 + 5 * 18000
    nparts = out.withColumn("p", F.explode(st_parts("geom_wkb"))).count()
    assert nparts == 10


def test_dissolve_no_groupby_single_row(spark, paired):
    left, _ = paired
    out = D.dissolve(left, None, agg_columns={"columns": [
        {"column": "fid", "agg": "count", "as": "n"}]})
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["n"] == 10


def test_dissolve_concat_median(spark):
    df = layer(spark, [(i, box_wkt(i * 10, 0, i * 10 + 5, 5)) for i in range(1, 6)])
    df = df.withColumn("g", F.lit("a")).withColumn("name", F.concat(F.lit("n"), F.col("fid")))
    out = D.dissolve(df, ["g"], agg_columns={"columns": [
        {"column": "name", "agg": "concat", "as": "names", "sep": "|"},
        {"column": "fid", "agg": "median", "as": "med"},
    ]})
    r = out.collect()[0]
    assert r["names"] == "n1|n2|n3|n4|n5"
    assert r["med"] == 3.0


def test_dissolve_parcels_gewasgroep_golden(spark):
    """Reference golden shape: dissolve parcels by GEWASGROEP -> 6 groups
    (test_geoops_dissolve.py:278-296); area conservation within overlap."""
    from tests import fixtures as FX
    from geofileops_spark.operators.dissolve import dissolve

    rows = [
        (r["fid"], r["GEWASGROEP"], r["wkt"])
        for r in FX.parcels_rows()
        if "EMPTY" not in r["wkt"]
    ]
    df = spark.createDataFrame(rows, "fid long, GEWASGROEP string, wkt string")
    df = df.withColumn("geom_wkb", st_geomfromtext(F.col("wkt"))).drop("wkt")
    from geofileops_spark.functions.st import st_makevalid

    df = df.withColumn("geom_wkb", st_makevalid(F.col("geom_wkb")))
    out = dissolve(df, ["GEWASGROEP"], agg_columns={"columns": [
        {"column": "fid", "agg": "count", "as": "n"}]})
    rows_out = out.collect()
    assert len(rows_out) == 6  # 6 distinct crop groups (reference golden)
    assert sum(r["n"] for r in rows_out) == 47
    # union area <= sum of parts, > half (overlaps exist but are modest)
    tot = out.agg(F.sum(st_area("geom_wkb"))).collect()[0][0]
    per_row = df.agg(F.sum(st_area("geom_wkb"))).collect()[0][0]
    assert 0.5 * per_row < tot <= per_row + 1e-6


def test_difference_keep_empty_geoms(spark):
    from geofileops_spark.functions.st import st_geomfromtext
    from geofileops_spark.operators.overlay import difference

    left = spark.createDataFrame(
        [(1, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")], "fid long, wkt string"
    ).withColumn("geom_wkb", st_geomfromtext(F.col("wkt"))).drop("wkt")
    blade = spark.createDataFrame(
        [(1, "POLYGON ((-5 -5, 15 -5, 15 15, -5 15, -5 -5))")], "fid long, wkt string"
    ).withColumn("geom_wkb", st_geomfromtext(F.col("wkt"))).drop("wkt")
    # full cover: DIFF_EMPTY drops the row by default...
    assert difference(left, blade).count() == 0
    # ...but keep_empty_geoms retains it with NULL geometry
    kept = difference(left, blade, keep_empty_geoms=True)
    rows = kept.collect()
    assert len(rows) == 1 and rows[0]["geom_wkb"] is None


def test_intersection_keep_empty_geoms(spark):
    from geofileops_spark.functions.st import st_geomfromtext
    from geofileops_spark.operators.overlay import intersection

    mk = lambda rows: (
        spark.createDataFrame(rows, "fid long, wkt string")
        .withColumn("geom_wkb", st_geomfromtext(F.col("wkt")))
        .drop("wkt")
    )
    # l1 row 1 TOUCHES l2 row 1 along an edge (intersection = line ->
    # extracted to empty for polygon output); l1 row 2's bbox overlaps
    # l2 row 2's bbox but the triangles are disjoint.
    l1 = mk([
        (1, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"),
        (2, "POLYGON ((100 100, 109 100, 100 109, 100 100))"),
    ])
    l2 = mk([
        (1, "POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0))"),
        (2, "POLYGON ((110 101, 110 110, 101 110, 110 101))"),
    ])
    # default: both pairs produce no polygon -> dropped
    assert intersection(l1, l2).count() == 0
    # keep_empty_geoms: the touching pair survives with NULL geometry;
    # the disjoint bbox-candidate pair is still refined away
    rows = intersection(l1, l2, keep_empty_geoms=True).collect()
    assert len(rows) == 1
    assert rows[0]["l1_fid"] == 1 and rows[0]["geom_wkb"] is None


def test_dissolve_where_post_and_squarish_tiles(spark):
    from geofileops_spark.functions.st import st_area, st_geomfromtext
    from geofileops_spark.operators.dissolve import _squarish_grid, dissolve

    # two disjoint rects: a wide 30x20 and a small 4x4 at x=100
    df = spark.createDataFrame(
        [(1, "POLYGON ((0 0, 30 0, 30 20, 0 20, 0 0))"),
         (2, "POLYGON ((100 0, 104 0, 104 4, 100 4, 100 0))")],
        "fid long, wkt string",
    ).withColumn("geom_wkb", st_geomfromtext(F.col("wkt"))).drop("wkt")
    # where_post evaluates AFTER explode: only the big part survives
    out = dissolve(
        df, None, explodecollections=True,
        where_post="st_area(geom_wkb) > 100",
    )
    rows = out.collect()
    assert len(rows) == 1
    # nb_squarish_tiles grid clips and never crosses tile borders:
    # bounds 104x20 -> 5 tiles of width 20.8; the wide rect (0..30)
    # straddles the border at 20.8 and is cut there
    tiled = dissolve(df, None, explodecollections=True, nb_squarish_tiles=4)
    areas = sorted(
        r.a for r in tiled.select(st_area("geom_wkb").alias("a")).collect()
    )
    assert abs(sum(areas) - 616.0) < 1e-6  # total preserved
    assert "tile_id" in tiled.columns and len(areas) >= 3
    assert abs(areas[-1] - 20.8 * 20) < 1e-6  # cut exactly at the border
    # grid helper covers the bounds with ~n squarish tiles
    g = _squarish_grid((0.0, 0.0, 100.0, 50.0), 8)
    assert len(g) >= 8 and abs(max(t[2] for t in g) - 100.0) < 1e-9
