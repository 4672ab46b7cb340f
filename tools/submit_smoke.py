"""spark-submit --py-files smoke job (the north-rule deployment shape).

Run as:

    /opt/spark/bin/spark-submit --master local[4] \
        --py-files /tmp/gfo_pkg.zip tools/submit_smoke.py

The job imports geofileops_spark FROM THE SHIPPED ZIP (the driver cwd
is deliberately not the repo), runs a pandas-UDF geometry op (buffer +
area) so EXECUTORS must also resolve the package from the zip, and a
join_by_location with an exact arithmetic expectation. Prints
SUBMIT_SMOKE_OK on success — tests/test_submit.py asserts it.
"""

from __future__ import annotations

import struct

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _box(x0, y0, x1, y1) -> bytes:
    pts = [(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]
    b = struct.pack("<BII", 1, 3, 1) + struct.pack("<I", len(pts))
    for x, y in pts:
        b += struct.pack("<dd", float(x), float(y))
    return b


def main() -> None:
    from geofileops_spark.functions.st import st_area, st_buffer
    from geofileops_spark.operators.join import join_by_location

    spark = SparkSession.builder.getOrCreate()
    boxes = spark.createDataFrame(
        [(i, _box(10 * i, 0, 10 * i + 4, 4)) for i in range(50)],
        "fid long, geom_wkb binary",
    )
    # pandas-UDF path: mitre-join buffer of a 4x4 box by 1 -> exact 6x6
    buffered = boxes.select(
        st_area(st_buffer(F.col("geom_wkb"), 1.0, join_style="mitre")).alias("a")
    )
    areas = [r["a"] for r in buffered.collect()]
    assert len(areas) == 50 and all(abs(a - 36.0) < 1e-9 for a in areas), areas[:3]

    # spatial join: 3x3 probe boxes at even fids overlap, odd fids don't
    probes = spark.createDataFrame(
        [(i, _box(20 * i + 1, 1, 20 * i + 3, 3)) for i in range(25)],
        "fid long, geom_wkb binary",
    )
    joined = join_by_location(probes, boxes, "intersects is True")
    n = joined.count()
    assert n == 25, n  # probe i sits inside box 2i exactly

    print("SUBMIT_SMOKE_OK")
    spark.stop()


if __name__ == "__main__":
    main()
