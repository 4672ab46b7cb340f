"""Extra (non-frozen) benchmarks for optimization work — per-op isolated
timings and phase decompositions. bench.py stays the official frozen
harness; numbers from here are cited in OPTIMIZATION_r06.md.

Usage:
  python bench_extra.py <op> [<op> ...] [--reps N] [--cold]

Ops: any parcels_* / headline name from bench.py, plus decomposition
targets like union_phases, flagship_phases.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import bench as B  # noqa: E402 — reuse the frozen harness's query defs

SF_DIR = B.SF_DIR


def _mk(cpus=None):
    return B.make_spark(cpus or B.CPUS)


def timed(fn, reps=3, cold=False, warm_release=True):
    from geofileops_spark import release_caches

    best, samples = None, []
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        samples.append(round(dt, 3))
        best = dt if best is None else min(best, dt)
        if cold:
            release_caches()
    if warm_release and not cold:
        release_caches()
    return round(best, 3), samples, out


def phase_union(spark, pa, pb):
    """Decompose parcels_union: cover+join / pair kernel / diff sides."""
    from geofileops_spark import release_caches
    from geofileops_spark.operators.celljoin import candidate_pairs
    from geofileops_spark.operators.overlay import (
        _pair_intersection_udf,
        _shared_overlay_parts,
        union as ov_union,
    )

    p0 = spark.read.parquet(pa)
    p1 = spark.read.parquet(pb)
    res = {}

    def t(name, fn):
        t0 = time.time()
        out = fn()
        res[name] = round(time.time() - t0, 3)
        print(f"  {name}: {res[name]} s -> {out}", flush=True)
        return out

    # phase A: candidate join only (cover UDFs + cell shuffle + dedup)
    t("cand_pairs_count", lambda: candidate_pairs(
        p0, p1, geom_col1="geom_wkb", geom_col2="geom_wkb",
        light_ids=("fid", "fid"))[0].count())
    release_caches()
    # phase B: candidate join + pair-intersection kernel
    def _matched():
        pairs, _ = candidate_pairs(
            p0, p1, geom_col1="geom_wkb", geom_col2="geom_wkb",
            light_ids=("fid", "fid"))
        m = pairs.withColumn(
            "_piece",
            _pair_intersection_udf(F.col("l1_geom_wkb"), F.col("l2_geom_wkb")),
        ).where(F.col("_piece").isNotNull())
        return m.count()
    t("matched_count", _matched)
    release_caches()
    # phase C: full union
    t("union_full_op", lambda: ov_union(p0, p1).count())
    release_caches()
    # phase D: shared parts with only d12 (isolate one diff side)
    def _d12_only():
        _, d12, _ = _shared_overlay_parts(
            p0, p1, None, "geom_wkb", "fid", (False, True, False))
        return d12.count()
    t("d12_only", _d12_only)
    release_caches()
    return res


def phase_flagship(spark, pages_path):
    """Decompose flagship: scan / extract / join / full."""
    from geofileops_spark.operators.join import join_points_in_polygons
    from geofileops_spark.sources.pages import extract_points, synth_zones

    res = {}

    def t(name, fn):
        t0 = time.time()
        out = fn()
        res[name] = round(time.time() - t0, 3)
        print(f"  {name}: {res[name]} s -> {out}", flush=True)
        return out

    pages = spark.read.parquet(pages_path)
    t("scan_text_only", lambda: pages.select("text").write.format("noop")
      .mode("overwrite").save())
    t("scan_url_text", lambda: pages.select("url", "text").write.format("noop")
      .mode("overwrite").save())
    t("extract_noop", lambda: extract_points(pages, res=12, with_geom=False)
      .write.format("noop").mode("overwrite").save())
    def _full():
        pts = extract_points(pages, res=12, with_geom=False)
        zones = synth_zones(spark).withColumnRenamed("fid", "zone_fid")
        joined = join_points_in_polygons(
            pts, zones, x_col="lon", y_col="lat", poly_id_col="zone_fid")
        out = joined.groupBy("zone_fid").agg(
            F.count("*").alias("n_pages"),
            F.min("lon").alias("minx"), F.max("lon").alias("maxx"),
            F.min("lat").alias("miny"), F.max("lat").alias("maxy"))
        return out.count()
    t("flagship_full", _full)
    return res


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    cold = "--cold" in sys.argv
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=")[1])
    cpus = B.CPUS
    for a in sys.argv[1:]:
        if a.startswith("--cpus"):
            cpus = int(a.split("=")[1])

    spark = _mk(cpus)
    out = {}
    parcel_qs = None
    for op in args:
        if op == "union_phases":
            pa, pb = B.materialize_parcel_layers(spark)
            out[op] = phase_union(spark, pa, pb)
            continue
        if op == "flagship_phases":
            pages_path = B.materialize_pages(spark, B.N_PAGES)
            out[op] = phase_flagship(spark, pages_path)
            continue
        if op == "flagship":
            pages_path = B.materialize_pages(spark, B.N_PAGES)
            best, samples, _ = timed(
                lambda: B.flagship(spark, pages_path), reps=reps, cold=cold)
            out[op] = {"best": best, "samples": samples}
            print(f"{op}: {out[op]}", flush=True)
            continue
        if op in B.QUERIES:
            best, samples, rows = timed(
                lambda: B.QUERIES[op](spark), reps=reps, cold=cold)
            out[op] = {"best": best, "samples": samples, "rows": rows}
            print(f"{op}: {out[op]}", flush=True)
            continue
        if op.startswith("parcels_"):
            if parcel_qs is None:
                pa, pb = B.materialize_parcel_layers(spark)
                parcel_qs = B.parcel_queries(spark, pa, pb)
            best, samples, rows = timed(parcel_qs[op], reps=reps, cold=cold)
            out[op] = {"best": best, "samples": samples, "rows": rows}
            print(f"{op}: {out[op]}", flush=True)
            continue
        print(f"unknown op {op}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
