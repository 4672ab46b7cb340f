"""Profile the symdiff-complex bench case branch by branch.

Runs difference(cx30, parcels) [d12] and difference(parcels, cx30) [d21]
separately at the bench's 500k scale so the 1.32x gap vs the reference's
36.4 s can be attributed. Usage: python tools/profile_symdiff.py [n].
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000

from pyspark.sql import SparkSession  # noqa: E402

from bench import make_spark, materialize_parcel_layers  # noqa: E402
from geofileops_spark.operators.overlay import difference  # noqa: E402
from geofileops_spark.sources.parcels import materialize_complex_polys  # noqa: E402

import bench  # noqa: E402

bench.N_PARCELS = N

spark = make_spark(32)
pa, pb = materialize_parcel_layers(spark)
p1 = spark.read.parquet(pb)
cx30 = spark.read.parquet(
    materialize_complex_polys(
        spark, N, f"/tmp/gfo_cxpoly30k_v2_{N}.parquet", coords_per_ring=30_000
    )
)
p1.count()
cx30.count()

for name, fn in [
    ("d12 cx30-minus-parcels", lambda: difference(
        cx30, p1, subdivide_coords=2000).count()),
    ("d21 parcels-minus-cx30", lambda: difference(
        p1, cx30, subdivide_coords=2000).count()),
]:
    t0 = time.time()
    n = fn()
    print(f"{name}: {time.time() - t0:.2f}s rows={n}", flush=True)
