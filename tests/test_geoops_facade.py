"""Public façade (geoops.py) + union_full_self + new kernels."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geofileops_spark import geoops as gfo
from geofileops_spark.functions.st import st_area, st_geomfromtext, st_npoints


def box_wkt(x0, y0, x1, y1):
    return f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, {x0} {y1}, {x0} {y0}))"


def layer(spark, rows):
    df = spark.createDataFrame(rows, "fid long, wkt string")
    return df.withColumn("geom_wkb", st_geomfromtext(F.col("wkt"))).drop("wkt")


@pytest.fixture(scope="module")
def boxes(spark):
    return layer(spark, [(i, box_wkt(i * 200, 0, i * 200 + 120, 150)) for i in range(6)])


def test_warp_affine(spark, boxes):
    # scale x by 2, translate y by +10: area doubles
    out = gfo.warp(boxes, (2, 0, 0, 0, 1, 10))
    areas = {r["fid"]: round(r["a"], 6) for r in out.withColumn("a", st_area("geom_wkb")).collect()}
    assert areas == {i: 36000.0 for i in range(6)}


def test_remove_slivers(spark):
    df = layer(spark, [
        (1, box_wkt(0, 0, 100, 100)),          # real polygon
        (2, box_wkt(200, 0, 300, 0.001)),       # sliver: avg width ~0.002
    ])
    out = gfo.remove_slivers(df, tolerance=0.1)
    assert [r["fid"] for r in out.collect()] == [1]


def test_isvalid_attribute_scan(spark):
    # bowtie is invalid; validate_attribute_data forces a full decode
    # scan of every column first (must not change the report)
    df = layer(spark, [
        (1, box_wkt(0, 0, 10, 10)),
        (2, "POLYGON ((0 0, 10 10, 10 0, 0 10, 0 0))"),
    ]).withColumn("tag", F.concat(F.lit("t"), F.col("fid")))
    out = gfo.isvalid(df, validate_attribute_data=True)
    rows = out.collect()
    assert [r["fid"] for r in rows] == [2]
    assert not rows[0]["isvalid"] and rows[0]["isvalidreason"]


def test_linemerge(spark):
    from geofileops_spark.functions.st import st_linemerge

    df = spark.createDataFrame(
        [(1, "MULTILINESTRING ((0 0, 1 0), (1 0, 2 0), (5 5, 6 6))")],
        "fid long, wkt string",
    ).withColumn("geom_wkb", st_geomfromtext(F.col("wkt")))
    out = df.withColumn("m", st_linemerge(F.col("geom_wkb")))
    n = out.select(st_npoints(F.col("m"))).collect()[0][0]
    assert n == 5  # 3-point merged path + 2-point lone segment


def test_clip_by_geometry_and_export_by_bounds(spark, boxes):
    clipped = gfo.clip_by_geometry(boxes, box_wkt(100, 0, 500, 150))
    total = clipped.agg(F.sum(st_area("geom_wkb"))).collect()[0][0]
    # fid0: x[100,120]=20w, fid1: full 120w, fid2: x[400,500]=100w
    assert round(total, 6) == (20 + 120 + 100) * 150
    kept = gfo.export_by_bounds(boxes, (100, 0, 500, 150))
    assert sorted(r["fid"] for r in kept.collect()) == [0, 1, 2]


def test_layer_utilities(spark, boxes):
    info = gfo.get_layerinfo(boxes)
    assert info["featurecount"] == 6
    assert info["total_bounds"] == (0.0, 0.0, 1120.0, 150.0)
    assert info["geometrytypes"] == ["POLYGON"]

    df2 = gfo.add_column(boxes, "double_fid", "fid * 2")
    assert df2.where("double_fid = fid * 2").count() == 6
    df3 = gfo.update_column(df2, "double_fid", "0", where="fid > 3")
    # fids 4,5 zeroed by the update; fid 0 is zero already
    assert df3.where("double_fid = 0").count() == 3
    df4 = gfo.rename_column(gfo.drop_column(df3, "double_fid"), "fid", "id")
    assert "id" in df4.columns and "double_fid" not in df4.columns

    cat = gfo.concat_layers([boxes, boxes.withColumn("extra", F.lit(1))])
    assert cat.count() == 12 and "extra" in cat.columns


def test_apply_vectorized(spark, boxes):
    from geofileops_spark.geometry.extra import affine_transform

    out = gfo.apply_vectorized(boxes, lambda g: affine_transform(g, (1, 0, 5, 0, 1, 5)))
    info = gfo.get_layerinfo(out)
    assert info["total_bounds"] == (5.0, 5.0, 1125.0, 155.0)


def test_union_full_self_paired(spark):
    # even i: left + right overlap (faces 12000/12000/6000); odd: single 18000
    rows = [(i, box_wkt(i * 200, 0, i * 200 + 120, 150)) for i in range(4)]
    rows += [(100 + i, box_wkt(i * 200 + 60, 50, i * 200 + 180, 200)) for i in (0, 2)]
    df = layer(spark, rows)
    from geofileops_spark.operators.union_full import union_full_self

    out = union_full_self(df, agg_shape="LISTS", res=18).persist()
    rows_out = out.withColumn("a", F.round(st_area("geom_wkb"), 6)).collect()
    # faces: 2 overlapping pairs -> 3 faces each; 2 lone -> 1 face each
    assert len(rows_out) == 8
    by_nfids = {}
    for r in rows_out:
        by_nfids.setdefault(len(r["fids"]), []).append(r["a"])
    assert sorted(by_nfids[2]) == [6000.0, 6000.0]
    # single-contributor faces: 2x18000 (lone) + 4x12000 (trimmed)
    assert sorted(by_nfids[1]) == [12000.0] * 4 + [18000.0] * 2
    # area partition: total == union area
    assert round(sum(r["a"] for r in rows_out), 4) == 2 * (18000 + 18000 - 6000) + 2 * 18000

    cols = union_full_self(df, agg_shape="COLUMNS", res=18)
    assert "fid_1" in cols.columns and "fid_2" in cols.columns
    rows_mode = union_full_self(df, agg_shape="ROWS", res=18)
    assert rows_mode.count() == 6 + 4  # 6 single-contrib + 2 faces x 2 contribs


def test_crs_and_rename_layer(spark, boxes):
    tagged = gfo.set_crs(boxes, "EPSG:31370")
    assert gfo.get_crs(tagged) == "EPSG:31370"
    assert gfo.get_crs(boxes) is None
    # metadata survives lineage
    derived = tagged.where(F.col("fid") >= 0).select("fid", "geom_wkb")
    assert gfo.get_crs(derived) == "EPSG:31370"
    # rename a registered layer view
    boxes.createOrReplaceTempView("layer_old")
    gfo.rename_layer(spark, "layer_old", "layer_new")
    assert spark.table("layer_new").count() == boxes.count()
    import pytest
    from pyspark.sql.utils import AnalysisException

    with pytest.raises(AnalysisException):
        spark.table("layer_old")


def test_listlayers(spark, boxes, tmp_path):
    boxes.createOrReplaceTempView("lay_spatial")
    spark.createDataFrame([(1, "a")], "id long, s string").createOrReplaceTempView(
        "lay_attr"
    )
    try:
        spatial = gfo.listlayers(spark)
        assert "lay_spatial" in spatial and "lay_attr" not in spatial
        everything = gfo.listlayers(spark, only_spatial_layers=False)
        assert {"lay_spatial", "lay_attr"} <= set(everything)
    finally:
        spark.catalog.dropTempView("lay_spatial")
        spark.catalog.dropTempView("lay_attr")


def test_add_columns_batch(spark, boxes):
    out = gfo.add_columns(
        boxes,
        [
            ("area", "double", "0.0"),
            ("tag", "string", "'x'"),
            ("empty_col", "int"),
        ],
    )
    r = out.limit(1).collect()[0]
    assert r["area"] == 0.0 and r["tag"] == "x" and r["empty_col"] is None
    assert dict(out.dtypes)["empty_col"] == "int"


def test_read_file_nogeom_and_sql(spark, boxes, tmp_path):
    p = str(tmp_path / "boxes.parquet")
    boxes.write.parquet(p)
    ng = gfo.read_file_nogeom(spark, p)
    assert "geom_wkb" not in ng.columns and ng.count() == 6
    ng2 = gfo.read_file_nogeom(spark, p, columns=["fid"], where="fid < 3")
    assert ng2.columns == ["fid"] and ng2.count() == 3
    out = gfo.read_file_sql(
        spark, p, 'SELECT fid, {geometrycolumn} FROM "{input_layer}" WHERE fid >= 4'
    )
    assert sorted(r["fid"] for r in out.collect()) == [4, 5]
    out2 = gfo.read_file_sql(
        spark, p, "SELECT fid, geom_wkb FROM boxes WHERE fid = 0",
        layer="boxes", ignore_geometry=True,
    )
    assert out2.columns == ["fid"] and out2.collect()[0]["fid"] == 0


def test_named_file_api_twins(spark, tmp_path):
    """The reference's remaining named entry points (concat / convert /
    append_to / to_file / execute_sql / get_default_layer /
    get_only_layer) delegate to the table primitives."""
    from geofileops_spark import geoops as gfo

    a = spark.createDataFrame([(1, "x")], "fid long, v string")
    b = spark.createDataFrame([(2,)], "fid long")
    both = gfo.concat([a, b])
    assert both.count() == 2 and set(both.columns) == {"fid", "v"}

    dst = str(tmp_path / "layer.parquet")
    gfo.convert(a, dst)
    assert spark.read.parquet(dst).count() == 1
    gfo.append_to(a, dst)
    assert spark.read.parquet(dst).count() == 2
    gfo.to_file(a, dst)  # overwrite by default
    assert spark.read.parquet(dst).count() == 1
    gfo.to_file(a, dst, append=True)
    assert spark.read.parquet(dst).count() == 2

    out = gfo.execute_sql(
        spark, "SELECT st_area(st_geomfromtext('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))')) AS a"
    )
    assert out.collect()[0]["a"] == 4.0

    view = "only_layer_probe"
    spark.createDataFrame([(1, bytearray(b"\x00"))], "fid long, geom_wkb binary") \
        .createOrReplaceTempView(view)
    try:
        names = gfo.listlayers(spark)
        assert view in names
        # default layer = first catalog layer by name (other suite
        # views may coexist in the shared session)
        assert gfo.get_default_layer(spark) == names[0]
        # get_only_layer: exactly-one contract
        if len(names) == 1:
            assert gfo.get_only_layer(spark) == view
        else:
            import pytest

            with pytest.raises(ValueError):
                gfo.get_only_layer(spark)
    finally:
        spark.catalog.dropTempView(view)


def test_interior_points_batch_matches_per_row():
    """The vectorized interior-point scanline must be byte-identical to
    the per-row predicates.interior_point loop it replaces — including
    the multipolygon first-poly path, holes (fallback), sub-EPS slivers
    (fallback) and NULLs."""
    import numpy as np

    from geofileops_spark.geometry import predicates as P
    from geofileops_spark.geometry import wkb as W
    from geofileops_spark.geometry.geom import POLYGON, Geometry
    from geofileops_spark.operators.union_full import _interior_points_batch

    rng = np.random.default_rng(11)

    def _boxring(cx, cy, s, rev=False):
        b = np.array(
            [[cx - s, cy - s], [cx + s, cy - s], [cx + s, cy + s],
             [cx - s, cy + s], [cx - s, cy - s]], dtype=np.float64
        )
        return b[::-1].copy() if rev else b

    blobs = []
    for i in range(4000):
        kind = i % 10
        if kind < 5:
            k = int(rng.integers(4, 12))
            ang = np.sort(rng.uniform(0, 2 * np.pi, k))
            r = rng.uniform(1, 3, k)
            cx, cy = rng.uniform(-100, 100, 2)
            ring = np.column_stack(
                [cx + r * np.cos(ang), cy + r * np.sin(ang)]
            )
            g = Geometry(POLYGON, [np.vstack([ring, ring[:1]])])
        elif kind < 7:
            g = Geometry.multipolygon(
                [[_boxring(0, 0, 1)], [_boxring(10, 0, 2)]]
            )
        elif kind < 8:
            g = Geometry(
                POLYGON, [_boxring(0, 0, 4), _boxring(0, 0, 1, rev=True)]
            )
        elif kind < 9:
            ring = np.array(
                [[0, 0], [5, 1e-13], [10, 0], [5, -1e-13], [0, 0]], float
            )
            g = Geometry(POLYGON, [ring])
        else:
            g = None
        blobs.append(None if g is None else W.dumps(g))

    expected = []
    for b in blobs:
        if b is None:
            expected.append(None)
            continue
        pts = P.geom_interior_points(W.loads(bytes(b)))
        expected.append(
            None if len(pts) == 0
            else W.dumps(Geometry.point(float(pts[0, 0]), float(pts[0, 1])))
        )
    got = _interior_points_batch(blobs)
    assert got == expected


def test_union_full_attach_fast_matches_cell_join(spark, monkeypatch):
    """The inverted (point-broadcast) attach must produce exactly the
    contributor sets of the cell-join attach on an overlapping layer."""
    import numpy as np

    from geofileops_spark.geometry import wkb as W
    from geofileops_spark.geometry.geom import Geometry
    from geofileops_spark.operators import union_full as UF

    rng = np.random.default_rng(23)
    rows = []
    for i in range(120):
        cx, cy = rng.uniform(0, 40, 2)
        s = rng.uniform(0.8, 2.5)
        rows.append(
            (i + 1, f"t{i % 7}",
             bytearray(W.dumps(Geometry.box(cx - s, cy - s, cx + s, cy + s))))
        )
    df = spark.createDataFrame(rows, "fid long, tag string, geom_wkb binary")

    def norm(out):
        return sorted(
            (bytes(r["geom_wkb"]), r["nb_intersecting"], tuple(r["fids"]),
             tuple(r["tag"]))
            for r in out.collect()
        )

    fast = norm(UF.union_full_self(df, agg_shape="LISTS"))
    monkeypatch.setattr(UF, "_attach_hits_fast", lambda *a, **k: None)
    slow = norm(UF.union_full_self(df, agg_shape="LISTS"))
    assert fast == slow
    assert len(fast) > 120  # overlaps actually decomposed
