"""Adaptive hot-cell splitting: identical join results, finer cells only
where the data is dense (north-rule skew handling)."""

from __future__ import annotations

from pyspark.sql import functions as F

from geofileops_spark.operators.celljoin import candidate_pairs
from geofileops_spark.sources.pages import extract_points, synth_pages, synth_zones


def _pair_set(pairs):
    return {(r["l1_fid"], r["l2_fid"]) for r in pairs.select("l1_fid", "l2_fid").collect()}


def test_adaptive_same_pairs_as_plain(spark):
    pages = synth_pages(spark, 8000, partitions=8)
    pts = extract_points(pages, res=12).select("fid", "geom_wkb")
    zones = synth_zones(spark)
    plain, res = candidate_pairs(pts, zones, res=22)
    adaptive, _ = candidate_pairs(
        pts, zones, res=22, adaptive=True, hot_threshold=200, split_levels=2
    )
    assert _pair_set(adaptive) == _pair_set(plain)


def test_adaptive_splits_dense_cells(spark):
    # clustered points: at a coarse res the clusters land in few cells;
    # adaptive splitting must spread candidates over many more cells
    pages = synth_pages(spark, 8000, partitions=8)
    pts = extract_points(pages, res=12).select("fid", "geom_wkb")
    zones = synth_zones(spark)
    plain, _ = candidate_pairs(pts, zones, res=20)
    adaptive, _ = candidate_pairs(
        pts, zones, res=20, adaptive=True, hot_threshold=200, split_levels=2
    )
    n_plain = plain.select("l1__cell").distinct().count()
    n_adaptive = adaptive.select("l1__cell").distinct().count()
    assert n_adaptive > n_plain
    # and the hottest cell's share shrinks
    top_plain = plain.groupBy("l1__cell").count().agg(F.max("count")).collect()[0][0]
    top_adaptive = adaptive.groupBy("l1__cell").count().agg(F.max("count")).collect()[0][0]
    assert top_adaptive < top_plain


def test_synth_zones_wkb_matches_wkt_corners(spark):
    """The round-5 driver-side zones WKB (no pandas-UDF job on collect)
    must decode to exactly the rectangles zones_wkt() spells out."""
    import re

    from geofileops_spark.geometry import wkb as W
    from geofileops_spark.sources.pages import zones_wkt

    rows = {r["fid"]: r for r in synth_zones(spark).collect()}
    assert len(rows) == 5
    for fid, name, wkt in zones_wkt():
        nums = [
            float(v)
            for pair in re.findall(r"(-?[\d.]+) (-?[\d.]+)", wkt)
            for v in pair
        ]
        xs, ys = nums[0::2], nums[1::2]
        g = W.loads(bytes(rows[fid]["geom_wkb"]))
        polys = g.polygons()
        assert len(polys) == 1 and len(polys[0]) == 1
        ring = polys[0][0]
        assert rows[fid]["naam"] == name
        assert ring[:, 0].min() == min(xs) and ring[:, 0].max() == max(xs)
        assert ring[:, 1].min() == min(ys) and ring[:, 1].max() == max(ys)
    # zones must NOT run a pandas-UDF stage: no ArrowEvalPython /
    # BatchEvalPython node anywhere in the plan (it is a plain
    # createDataFrame scan)
    plan = synth_zones(spark)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
