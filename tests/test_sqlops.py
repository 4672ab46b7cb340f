"""select / select_two_layers SQL facade (reference geoops.py:1620,3302)."""

from pyspark.sql import functions as F

from geofileops_spark import geoops
from geofileops_spark.functions.st import st_area, st_geomfromtext


def _boxes(spark, specs):
    return (
        spark.createDataFrame(specs, "fid long, tag string, wkt string")
        .withColumn("geom_wkb", st_geomfromtext(F.col("wkt")))
        .drop("wkt")
    )


def test_select_placeholders(spark):
    df = _boxes(
        spark,
        [(i, "odd" if i % 2 else "even",
          f"POLYGON (({i*10} 0, {i*10+4} 0, {i*10+4} {2+i}, {i*10} {2+i}, {i*10} 0))")
         for i in range(6)],
    )
    out = geoops.select(
        df,
        """SELECT {geometrycolumn} {columns_to_select_str}
             FROM "{input_layer}"
            WHERE 1=1 {batch_filter} AND tag = 'even'""",
    )
    rows = out.collect()
    assert len(rows) == 3 and {r.fid for r in rows} == {0, 2, 4}
    assert set(out.columns) == {"geom_wkb", "fid", "tag"}
    # columns subset honoured by {columns_to_select_str}
    out2 = geoops.select(
        df,
        "SELECT {geometrycolumn} {columns_to_select_str} FROM {input_layer}",
        columns=["fid"],
    )
    assert set(out2.columns) == {"geom_wkb", "fid"}
    # spatial function + where_post
    out3 = geoops.select(
        df,
        """SELECT {geometrycolumn} {columns_to_select_str} FROM {input_layer}
            WHERE st_area({geometrycolumn}) > 16""",
    )
    # area = 4*(2+i) > 16 -> i >= 3 (i=3: 20)
    assert {r.fid for r in out3.collect()} == {3, 4, 5}


def test_select_two_layers_placeholders(spark):
    l1 = _boxes(
        spark,
        [(i, "a", f"POLYGON (({i*10} 0, {i*10+6} 0, {i*10+6} 6, {i*10} 6, {i*10} 0))")
         for i in range(4)],
    )
    l2 = _boxes(
        spark,
        [(i, "b", f"POLYGON (({i*10+3} 3, {i*10+9} 3, {i*10+9} 9, {i*10+3} 9, {i*10+3} 3))")
         for i in range(3)],
    )
    out = geoops.select_two_layers(
        l1,
        l2,
        """SELECT st_intersection(layer1.{input1_geometrycolumn},
                                  layer2.{input2_geometrycolumn}) AS geom_wkb
                  {layer1_columns_prefix_alias_str}
                  {layer2_columns_prefix_alias_str}
             FROM {input1_databasename}."{input1_layer}" layer1
             JOIN {input2_databasename}."{input2_layer}" layer2
               ON layer1.fid = layer2.fid
            WHERE 1=1 {batch_filter}""",
    )
    rows = out.collect()
    assert len(rows) == 3
    assert set(out.columns) == {"geom_wkb", "l1_fid", "l1_tag", "l2_fid", "l2_tag"}
    areas = out.select(st_area("geom_wkb").alias("a")).collect()
    assert all(abs(r.a - 9.0) < 1e-9 for r in areas)  # 3x3 overlap squares

    # NULL-alias placeholder (reference LEFT JOIN convention) + prefix override
    out2 = geoops.select_two_layers(
        l1,
        l2,
        """SELECT layer1.{input1_geometrycolumn} AS geom_wkb
                  {layer1_columns_prefix_alias_str}
                  {layer2_columns_prefix_alias_null_str}
             FROM "{input1_layer}" layer1""",
        input1_columns=["fid"],
        input2_columns=["tag"],
        input2_columns_prefix="right_",
    )
    assert set(out2.columns) == {"geom_wkb", "l1_fid", "right_tag"}
    assert out2.count() == 4
    assert all(r.right_tag is None for r in out2.collect())
