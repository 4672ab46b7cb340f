"""Subdivide-and-reunion overlay path: identical results to the plain
path on complex (many-vertex) inputs."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from geofileops_spark.functions.st import st_area, st_geomfromtext, st_npoints
from geofileops_spark.operators import overlay as O


def blob_wkt(cx, cy, r, n=800):
    """Near-circular polygon with n vertices (complex geometry stand-in)."""
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    rr = r * (1 + 0.05 * np.sin(7 * ang))
    pts = ", ".join(f"{cx + rr[i]*np.cos(a):.6f} {cy + rr[i]*np.sin(a):.6f}"
                    for i, a in enumerate(ang))
    first = f"{cx + rr[0]:.6f} {cy:.6f}"
    return f"POLYGON (({pts}, {first}))"


def box_wkt(x0, y0, x1, y1):
    return f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, {x0} {y1}, {x0} {y0}))"


@pytest.fixture(scope="module")
def blobs(spark):
    rows = [(i, blob_wkt(i * 300, 0, 100)) for i in range(4)]
    df = spark.createDataFrame(rows, "fid long, wkt string")
    return df.withColumn("geom_wkb", st_geomfromtext(F.col("wkt"))).drop("wkt")


@pytest.fixture(scope="module")
def boxes(spark):
    rows = [(i, box_wkt(i * 300 - 50, -50, i * 300 + 50, 50)) for i in range(4)]
    df = spark.createDataFrame(rows, "fid long, wkt string")
    return df.withColumn("geom_wkb", st_geomfromtext(F.col("wkt"))).drop("wkt")


def areas(df, keys):
    rows = df.withColumn("_a", st_area("geom_wkb")).select(*keys, "_a").collect()
    return {tuple(r[k] for k in keys): r["_a"] for r in rows}


def test_subdivide_layer_bounds_vertices(spark, blobs):
    sub = O.subdivide_layer(blobs, 200)
    assert sub.count() > blobs.count()
    mx = sub.agg(F.max(st_npoints("geom_wkb"))).collect()[0][0]
    assert mx <= 210  # closing points may add a few


def test_intersection_subdivided_matches_plain(spark, blobs, boxes):
    plain = areas(O.intersection(blobs, boxes, res=18), ["l1_fid", "l2_fid"])
    sub = areas(
        O.intersection(blobs, boxes, res=18, subdivide_coords=200),
        ["l1_fid", "l2_fid"],
    )
    assert set(plain) == set(sub)
    for k in plain:
        assert abs(plain[k] - sub[k]) < 1e-3 * max(1.0, plain[k])


def test_difference_subdivided_matches_plain(spark, blobs, boxes):
    plain = areas(O.difference(blobs, boxes, res=18), ["fid"])
    sub = areas(O.difference(blobs, boxes, res=18, subdivide_coords=200), ["fid"])
    assert set(plain) == set(sub)
    for k in plain:
        assert abs(plain[k] - sub[k]) < 1e-3 * max(1.0, plain[k])


def test_clip_subdivided_matches_plain(spark, blobs, boxes):
    plain = areas(O.clip(blobs, boxes, res=18), ["fid"])
    sub = areas(O.clip(blobs, boxes, res=18, subdivide_coords=200), ["fid"])
    assert set(plain) == set(sub)
    for k in plain:
        assert abs(plain[k] - sub[k]) < 1e-3 * max(1.0, plain[k])


def _sym_keys(df):
    """(l1_fid, l2_fid) -> area for composite overlays (either may be NULL)."""
    return areas(df, ["l1_fid", "l2_fid"])


def test_symmetric_difference_subdivided_matches_plain(spark, blobs, boxes):
    plain = _sym_keys(O.symmetric_difference(blobs, boxes, res=18))
    sub = _sym_keys(
        O.symmetric_difference(blobs, boxes, res=18, subdivide_coords=200)
    )
    assert set(plain) == set(sub)
    for k in plain:
        assert abs(plain[k] - sub[k]) < 1e-3 * max(1.0, plain[k])


def test_union_subdivided_matches_plain(spark, blobs, boxes):
    plain = _sym_keys(O.union(blobs, boxes, res=18))
    sub = _sym_keys(O.union(blobs, boxes, res=18, subdivide_coords=200))
    assert set(plain) == set(sub)
    for k in plain:
        assert abs(plain[k] - sub[k]) < 1e-3 * max(1.0, plain[k])


def test_identity_subdivided_matches_plain(spark, blobs, boxes):
    plain = _sym_keys(O.identity(blobs, boxes, res=18))
    sub = _sym_keys(O.identity(blobs, boxes, res=18, subdivide_coords=200))
    assert set(plain) == set(sub)
    for k in plain:
        assert abs(plain[k] - sub[k]) < 1e-3 * max(1.0, plain[k])


def test_difference_subdivides_erase_layer(spark, boxes, blobs):
    """Layer 2 (the erase side) is subdivided too: result identical when
    the BLADE is the complex layer."""
    plain = areas(O.difference(boxes, blobs, res=18), ["fid"])
    sub = areas(O.difference(boxes, blobs, res=18, subdivide_coords=200), ["fid"])
    assert set(plain) == set(sub)
    for k in plain:
        assert abs(plain[k] - sub[k]) < 1e-3 * max(1.0, plain[k])
