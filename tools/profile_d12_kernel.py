"""cProfile the d12 combine kernel (difference_union) outside Spark.

Reproduces what one executor does in the symdiff-complex d12 stage:
subdivide the complex rings into ~512-coord parts, gather each part's
bbox-candidate parcels, union the blades, subtract. Prints the top
cumulative hotspots so kernel work can be attributed.

Usage: python tools/profile_d12_kernel.py [n_parts]
"""

from __future__ import annotations

import cProfile
import io
import pstats
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from geofileops_spark.geometry import clip as C  # noqa: E402
from geofileops_spark.geometry import wkb as W  # noqa: E402
from geofileops_spark.geometry.kernels import bounds  # noqa: E402
from geofileops_spark.geometry.transform import subdivide  # noqa: E402

N_PARTS = int(sys.argv[1]) if len(sys.argv) > 1 else 24

cx = pq.read_table("/tmp/gfo_cxpoly30k_v2_500000.parquet").to_pydict()
pc = pq.read_table("/tmp/gfo_parcels1_500000.parquet").to_pydict()

t0 = time.time()
parts = []
for b in cx["geom_wkb"]:
    g = W.loads(bytes(b))
    parts.extend(subdivide(g, 512))
print(f"subdivide: {len(parts)} parts in {time.time()-t0:.2f}s", flush=True)

t0 = time.time()
pgeoms = [W.loads(bytes(b)) for b in pc["geom_wkb"]]
pb = np.array([bounds(g) for g in pgeoms])
print(f"decode {len(pgeoms)} parcels in {time.time()-t0:.2f}s", flush=True)

# pick the N busiest parts (max candidates) to profile the heavy tail
cand_sets = []
for p in parts:
    x0, y0, x1, y1 = bounds(p)
    m = (pb[:, 0] <= x1) & (pb[:, 2] >= x0) & (pb[:, 1] <= y1) & (pb[:, 3] >= y0)
    cand_sets.append((int(m.sum()), p, np.where(m)[0]))
cand_sets.sort(key=lambda t: -t[0])
sel = cand_sets[:N_PARTS]
print("candidates per selected part:", [c for c, _, _ in sel], flush=True)


def run():
    for _, p, idx in sel:
        blades = [pgeoms[i] for i in idx]
        blade = C.union_geoms(blades)
        C.difference(p, blade)


t0 = time.time()
pr = cProfile.Profile()
pr.enable()
run()
pr.disable()
print(f"kernel: {N_PARTS} parts in {time.time()-t0:.2f}s", flush=True)
s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
print(s.getvalue())
