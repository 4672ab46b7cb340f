"""Fixture twins of the reference test corpus (FIXTURES.md §2-§5).

Deterministic synthetic layers mirroring tests/data of the reference:
- parcels: 48 rows, MULTIPOLYGON-ish, 1 EMPTY (fid 47), 1 invalid bow-tie
  (fid 48), GEWASGROEP with 6 distinct values
- zones: 5 overlapping polygons
- points: 50 points
- lines: 22 linestrings

Counts are validated against a local brute-force oracle (numpy predicates,
no Spark, no cells) — an independent code path from the distributed plan.
"""

from __future__ import annotations

import numpy as np

GEWASGROEPEN = ["Grasland", "Maïs", "Granen", "Aardappelen", "Suikerbieten", "Fruit"]


def parcels_rows() -> list[dict]:
    """48 parcels in a ~5000x5000 extent laid out on a jittered grid."""
    rows = []
    rng = np.random.RandomState(42)
    for i in range(1, 49):
        gx = (i - 1) % 8
        gy = (i - 1) // 8
        x0 = 100 + gx * 550 + float(rng.uniform(-40, 40))
        y0 = 100 + gy * 700 + float(rng.uniform(-40, 40))
        w = float(rng.uniform(280, 520))
        h = float(rng.uniform(280, 620))
        if i == 47:
            wkt = "MULTIPOLYGON EMPTY"
        elif i == 48:
            # invalid bow-tie
            wkt = (
                f"POLYGON (({x0} {y0}, {x0 + w} {y0 + h}, {x0 + w} {y0}, "
                f"{x0} {y0 + h}, {x0} {y0}))"
            )
        else:
            wkt = (
                f"POLYGON (({x0} {y0}, {x0 + w} {y0}, {x0 + w} {y0 + h}, "
                f"{x0} {y0 + h}, {x0} {y0}))"
            )
        rows.append(
            {
                "fid": i,
                "wkt": wkt,
                "OIDN": 1000 + i,
                "UIDN": 2000 + i,
                "GEWASGROEP": GEWASGROEPEN[i % 6],
                "LENGTE": 2 * (w + h),
                "OPPERVL": w * h,
            }
        )
    return rows


def zones_rows() -> list[dict]:
    """5 zones overlapping different parcel subsets."""
    zones = [
        (1, "zone_n", 0, 2800, 2400, 5200),      # north-west block
        (2, "zone_e", 2500, 0, 4800, 2600),      # south-east block
        (3, "zone_c", 1500, 1500, 3200, 3400),   # centre (overlaps 1 & 2)
        (4, "zone_tiny", 120, 140, 430, 420),    # inside parcel 1 area
        (5, "zone_far", 9000, 9000, 9500, 9500), # disjoint from all
    ]
    rows = []
    for fid, naam, x0, y0, x1, y1 in zones:
        wkt = (
            f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, {x0} {y1}, {x0} {y0}))"
        )
        rows.append({"fid": fid, "naam": naam, "wkt": wkt, "OIDN": 100 + fid})
    return rows


def points_rows() -> list[dict]:
    rows = []
    rng = np.random.RandomState(7)
    for i in range(1, 51):
        x = float(rng.uniform(0, 5000))
        y = float(rng.uniform(0, 5200))
        rows.append(
            {"fid": i, "wkt": f"POINT ({x:.3f} {y:.3f})", "type": f"t{i % 3}"}
        )
    return rows


def lines_rows() -> list[dict]:
    rows = []
    rng = np.random.RandomState(13)
    for i in range(1, 23):
        x = float(rng.uniform(0, 4500))
        y = float(rng.uniform(0, 4800))
        ang = float(rng.uniform(0, np.pi))
        L = float(rng.uniform(200, 900))
        x2, y2 = x + L * np.cos(ang), y + L * np.sin(ang)
        rows.append(
            {
                "fid": i,
                "wkt": f"LINESTRING ({x:.3f} {y:.3f}, {(x + x2) / 2:.3f} {(y + y2) / 2 + 30:.3f}, {x2:.3f} {y2:.3f})",
                "rowtype": f"r{i % 4}",
            }
        )
    return rows


# ------------------------------------------------------- brute-force oracle
def brute_force_pairs(rows1, rows2, predicate_name_or_fn):
    """All matching (fid1, fid2) pairs via direct predicate evaluation."""
    from geofileops_spark.geometry import predicates as P
    from geofileops_spark.geometry import wkb as W

    if callable(predicate_name_or_fn):
        fn = predicate_name_or_fn
    else:
        fn = P.PREDICATE_FNS[predicate_name_or_fn]
    out = []
    g2s = [(r["fid"], W.from_wkt(r["wkt"])) for r in rows2]
    for r1 in rows1:
        g1 = W.from_wkt(r1["wkt"])
        if g1.is_empty():
            continue
        for fid2, g2 in g2s:
            if g2.is_empty():
                continue
            if fn(g1, g2):
                out.append((r1["fid"], fid2))
    return sorted(out)


def to_spark_layer(spark, rows, extra_schema: str):
    """rows(list of dicts with wkt) -> DataFrame with geom_wkb."""
    from pyspark.sql import functions as F

    from geofileops_spark.functions.st import st_geomfromtext

    cols = list(rows[0].keys())
    data = [tuple(r[c] for c in cols) for r in rows]
    df = spark.createDataFrame(data, schema=", ".join(extra_schema.split(";")))
    return df.withColumn("geom_wkb", st_geomfromtext(F.col("wkt"))).drop("wkt")
