"""Decompose the flagship at widths 2 and 8 (guide §1.4 noop isolation).

Phases, each min-of-2 warm, interleaved across widths in ONE process so
both widths sample the same VM window:

  trivial : spark.range(1e6).count()  — job fixed cost
  scan    : pages.select(text).where(contains) -> noop
  extract : extract_points(with_geom=False) -> noop
  full    : flagship() (BNLJ + rollup + count)

Usage: python tools/profile_flagship.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from bench import N_PAGES, flagship, make_spark, materialize_pages  # noqa: E402


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def phases(spark, pages_path):
    from geofileops_spark.sources.pages import extract_points

    pages = spark.read.parquet(pages_path)
    out = {}

    def t(name, fn, reps=2):
        best = None
        for _ in range(reps):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = best

    t("trivial", lambda: spark.range(1_000_000).count())
    t("scan", lambda: _noop(
        pages.select("text").where(F.col("text").contains("geo:"))
    ))
    t("extract", lambda: _noop(
        extract_points(pages, res=12, with_geom=False)
    ))
    t("full", lambda: flagship(spark, pages_path))
    return out


def main():
    pre = make_spark(32)
    pages_path = materialize_pages(pre, N_PAGES)
    pre.stop()
    results = {}
    for cpus in (2, 8, 8, 2):
        spark = make_spark(cpus)
        flagship(spark, pages_path)  # warm
        r = phases(spark, pages_path)
        prev = results.get(cpus)
        results[cpus] = (
            r if prev is None else {k: min(prev[k], r[k]) for k in r}
        )
        spark.stop()
    for cpus, r in sorted(results.items()):
        line = "  ".join(f"{k}={v:.2f}s" for k, v in r.items())
        print(f"c{cpus}: {line}", flush=True)
    t2, t8 = results[2]["full"], results[8]["full"]
    print(f"efficiency 2->8: {t2 / t8 / 4.0:.3f}")


if __name__ == "__main__":
    main()
