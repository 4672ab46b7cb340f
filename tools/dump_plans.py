"""Dump .explain("formatted") for the bench ops into plans/<tag>/.

Usage: python tools/dump_plans.py <tag> [suffix]   (suffix: before|after)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "r06"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "after"
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    spark = B.make_spark(B.CPUS)

    frames = {}

    # flagship
    pages_path = B.materialize_pages(spark, B.N_PAGES)
    from geofileops_spark.operators.join import join_points_in_polygons
    from geofileops_spark.sources.pages import extract_points, synth_zones

    pages = spark.read.parquet(pages_path)
    pts = extract_points(pages, res=12, with_geom=False)
    zones = synth_zones(spark).withColumnRenamed("fid", "zone_fid")
    joined = join_points_in_polygons(
        pts, zones, x_col="lon", y_col="lat", poly_id_col="zone_fid")
    frames["flagship"] = joined.groupBy("zone_fid").agg(
        F.count("*").alias("n_pages"),
        F.min("lon").alias("minx"), F.max("lon").alias("maxx"),
        F.min("lat").alias("miny"), F.max("lat").alias("maxy"))

    # parcel ops
    pa, pb = B.materialize_parcel_layers(spark)
    from geofileops_spark.functions.st import st_buffer, st_makevalid
    from geofileops_spark.operators.dissolve import dissolve
    from geofileops_spark.operators.join import export_by_location, join_by_location
    from geofileops_spark.operators.overlay import (
        clip as ov_clip,
        intersection as ov_intersection,
        union as ov_union,
    )
    from geofileops_spark.operators.union_full import union_full_self

    p0 = spark.read.parquet(pa)
    p1 = spark.read.parquet(pb)
    frames["parcels_buffer"] = p0.select(
        st_buffer(F.col("geom_wkb"), 5.0).alias("b")
    ).where(F.col("b").isNotNull())
    frames["parcels_dissolve"] = dissolve(p0, ["grp"])
    frames["parcels_intersection"] = ov_intersection(p0, p1)
    frames["parcels_join"] = join_by_location(p0, p1, "intersects is True")
    frames["parcels_union"] = ov_union(p0, p1)
    frames["parcels_clip"] = ov_clip(p0, p1)
    frames["parcels_export"] = export_by_location(p0, p1, "intersects is True")
    frames["parcels_makevalid"] = p0.select(
        st_makevalid(F.col("geom_wkb")).alias("g")
    ).where(F.col("g").isNotNull())
    frames["parcels_union_full"] = union_full_self(p0, agg_shape="COLUMNS")

    # headline ops
    from geofileops_spark.sources import tpch_geo as T
    frames["spatial_join"] = join_by_location(
        T.cust_points(spark, B.SF_DIR), T.supp_boxes(spark, B.SF_DIR),
        "intersects is True", res=18)
    frames["q_intersection"] = ov_intersection(
        T.supp_boxes(spark, B.SF_DIR), T.nation_boxes(spark, B.SF_DIR), res=18)
    layer = T.supp_boxes(spark, B.SF_DIR).withColumn("grp", F.col("fid") % 50)
    frames["q_dissolve"] = dissolve(layer, ["grp"], agg_columns={"columns": [
        {"column": "fid", "agg": "count", "as": "n"}]})

    from geofileops_spark.sources.tpch_geo import load
    from geofileops_spark.text.analysis import lang_id, quality_stats, token_stats
    docs = load(spark, B.SF_DIR, "documents")
    frames["text_stats"] = lang_id(quality_stats(token_stats(docs))).groupBy(
        "lang_pred").agg(F.count("*"), F.avg("n_tokens"), F.avg("punct_ratio"))

    for name, df in frames.items():
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
