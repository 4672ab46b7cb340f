"""Deterministic geometry layers derived from the driver's TPC-H-ish
parquet tables, with 1:1 ANSI-SQL mirrors for the DuckDB oracle.

Every layer uses integer modular arithmetic on the table keys, so all
coordinates are exact doubles and every expected join/overlay/dissolve
result is expressible in pure SQL (rectangle algebra + BETWEEN), while
the Spark path runs the full engine: WKB encode -> cell cover -> cell
join -> exact geometry kernels. The SQL text of each layer lives next to
its builder (``*_SQL``) and is prepended to oracle queries as CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.st import st_geomfromtext, st_point


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _box_wkt_cols(x0, y0, x1, y1):
    return F.concat(
        F.lit("POLYGON (("),
        x0.cast("string"), F.lit(" "), y0.cast("string"), F.lit(", "),
        x1.cast("string"), F.lit(" "), y0.cast("string"), F.lit(", "),
        x1.cast("string"), F.lit(" "), y1.cast("string"), F.lit(", "),
        x0.cast("string"), F.lit(" "), y1.cast("string"), F.lit(", "),
        x0.cast("string"), F.lit(" "), y0.cast("string"), F.lit("))"),
    )


# ------------------------------------------------------------- point layers
def cust_points(spark, sf_dir) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    df = c.select(
        F.col("c_custkey").cast("long").alias("fid"),
        ((F.col("c_custkey") * 7919) % 1000).cast("double").alias("px"),
        ((F.col("c_custkey") * 104729) % 1000).cast("double").alias("py"),
    )
    return df.withColumn("geom_wkb", st_point(F.col("px"), F.col("py")))


CUST_POINTS_SQL = """cust_points AS (
  SELECT CAST(c_custkey AS BIGINT) AS fid,
         CAST((c_custkey * 7919) % 1000 AS DOUBLE) AS px,
         CAST((c_custkey * 104729) % 1000 AS DOUBLE) AS py
  FROM customer)"""


def supp_points(spark, sf_dir) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    df = s.select(
        F.col("s_suppkey").cast("long").alias("fid"),
        ((F.col("s_suppkey") * 211) % 1000).cast("double").alias("px"),
        ((F.col("s_suppkey") * 499) % 1000).cast("double").alias("py"),
    )
    return df.withColumn("geom_wkb", st_point(F.col("px"), F.col("py")))


SUPP_POINTS_SQL = """supp_points AS (
  SELECT CAST(s_suppkey AS BIGINT) AS fid,
         CAST((s_suppkey * 211) % 1000 AS DOUBLE) AS px,
         CAST((s_suppkey * 499) % 1000 AS DOUBLE) AS py
  FROM supplier)"""


# --------------------------------------------------------------- box layers
def nation_boxes(spark, sf_dir) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    x0 = ((F.col("n_nationkey") * 37) % 880).cast("double")
    y0 = ((F.col("n_nationkey") * 61) % 860).cast("double")
    df = n.select(
        F.col("n_nationkey").cast("long").alias("fid"),
        x0.alias("xmin"), y0.alias("ymin"),
        (x0 + 120).alias("xmax"), (y0 + 150).alias("ymax"),
    )
    return df.withColumn(
        "geom_wkb",
        st_geomfromtext(
            _box_wkt_cols(F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"))
        ),
    )


NATION_BOXES_SQL = """nation_boxes AS (
  SELECT CAST(n_nationkey AS BIGINT) AS fid,
         CAST((n_nationkey * 37) % 880 AS DOUBLE) AS xmin,
         CAST((n_nationkey * 61) % 860 AS DOUBLE) AS ymin,
         CAST((n_nationkey * 37) % 880 + 120 AS DOUBLE) AS xmax,
         CAST((n_nationkey * 61) % 860 + 150 AS DOUBLE) AS ymax
  FROM nation)"""


def supp_boxes(spark, sf_dir) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    x0 = ((F.col("s_suppkey") * 83) % 900).cast("double")
    y0 = ((F.col("s_suppkey") * 101) % 880).cast("double")
    df = s.select(
        F.col("s_suppkey").cast("long").alias("fid"),
        x0.alias("xmin"), y0.alias("ymin"),
        (x0 + 100).alias("xmax"), (y0 + 90).alias("ymax"),
    )
    return df.withColumn(
        "geom_wkb",
        st_geomfromtext(
            _box_wkt_cols(F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"))
        ),
    )


SUPP_BOXES_SQL = """supp_boxes AS (
  SELECT CAST(s_suppkey AS BIGINT) AS fid,
         CAST((s_suppkey * 83) % 900 AS DOUBLE) AS xmin,
         CAST((s_suppkey * 101) % 880 AS DOUBLE) AS ymin,
         CAST((s_suppkey * 83) % 900 + 100 AS DOUBLE) AS xmax,
         CAST((s_suppkey * 101) % 880 + 90 AS DOUBLE) AS ymax
  FROM supplier)"""


# ------------------------------------------------- paired overlay boxes
# left box i: disjoint 200-stride grid, 120x150 (area 18000)
# right box for even i only: offset (+60,+50) -> overlap 60x100 = 6000
def paired_left(spark, sf_dir) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    i = F.col("n_nationkey").cast("long")
    x0 = (i * 200).cast("double")
    y0 = ((i % 5) * 200).cast("double")
    df = n.select(
        i.alias("fid"),
        x0.alias("xmin"), y0.alias("ymin"),
        (x0 + 120).alias("xmax"), (y0 + 150).alias("ymax"),
    )
    return df.withColumn(
        "geom_wkb",
        st_geomfromtext(
            _box_wkt_cols(F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"))
        ),
    )


PAIRED_LEFT_SQL = """paired_left AS (
  SELECT CAST(n_nationkey AS BIGINT) AS fid,
         CAST(n_nationkey * 200 AS DOUBLE) AS xmin,
         CAST((n_nationkey % 5) * 200 AS DOUBLE) AS ymin,
         CAST(n_nationkey * 200 + 120 AS DOUBLE) AS xmax,
         CAST((n_nationkey % 5) * 200 + 150 AS DOUBLE) AS ymax
  FROM nation)"""


def paired_right(spark, sf_dir) -> DataFrame:
    n = load(spark, sf_dir, "nation").where(F.col("n_nationkey") % 2 == 0)
    i = F.col("n_nationkey").cast("long")
    x0 = (i * 200 + 60).cast("double")
    y0 = ((i % 5) * 200 + 50).cast("double")
    df = n.select(
        i.alias("fid"),
        x0.alias("xmin"), y0.alias("ymin"),
        (x0 + 120).alias("xmax"), (y0 + 150).alias("ymax"),
    )
    return df.withColumn(
        "geom_wkb",
        st_geomfromtext(
            _box_wkt_cols(F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"))
        ),
    )


PAIRED_RIGHT_SQL = """paired_right AS (
  SELECT CAST(n_nationkey AS BIGINT) AS fid,
         CAST(n_nationkey * 200 + 60 AS DOUBLE) AS xmin,
         CAST((n_nationkey % 5) * 200 + 50 AS DOUBLE) AS ymin,
         CAST(n_nationkey * 200 + 180 AS DOUBLE) AS xmax,
         CAST((n_nationkey % 5) * 200 + 200 AS DOUBLE) AS ymax
  FROM nation WHERE n_nationkey % 2 = 0)"""


# -------------------------------------------------- shaped single layers
def star_polys(spark, sf_dir) -> DataFrame:
    """Concave 8-gon whose convex hull is the side-s square at
    (i*300, 0): corners + edge-midpoint dents pulled inward by s/4.
    Hull area == s*s exactly."""
    n = load(spark, sf_dir, "nation")
    i = F.col("n_nationkey").cast("long")
    s = ((i % 7 + 2) * 10).cast("double")
    x = (i * 300).cast("double")
    q = s / 4
    h = s / 2
    wkt = F.concat(
        F.lit("POLYGON (("),
        x.cast("string"), F.lit(" 0, "),
        (x + h).cast("string"), F.lit(" "), q.cast("string"), F.lit(", "),
        (x + s).cast("string"), F.lit(" 0, "),
        (x + s - q).cast("string"), F.lit(" "), h.cast("string"), F.lit(", "),
        (x + s).cast("string"), F.lit(" "), s.cast("string"), F.lit(", "),
        (x + h).cast("string"), F.lit(" "), (s - q).cast("string"), F.lit(", "),
        x.cast("string"), F.lit(" "), s.cast("string"), F.lit(", "),
        (x + q).cast("string"), F.lit(" "), h.cast("string"), F.lit(", "),
        x.cast("string"), F.lit(" 0))"),
    )
    return n.select(
        i.alias("fid"), ((i % 7 + 2) * 10).alias("side"), wkt.alias("_wkt")
    ).withColumn("geom_wkb", st_geomfromtext(F.col("_wkt"))).drop("_wkt")


STAR_POLYS_SQL = """star_polys AS (
  SELECT CAST(n_nationkey AS BIGINT) AS fid,
         CAST((n_nationkey % 7 + 2) * 10 AS BIGINT) AS side
  FROM nation)"""


def zigzag_lines(spark, sf_dir) -> DataFrame:
    """21-point zigzag along y=i*10 with ±0.125 wiggle; RDP tolerance
    0.5 collapses it to the straight 2-point segment of length 100."""
    n = load(spark, sf_dir, "nation")
    i = F.col("n_nationkey").cast("long")
    y = (i * 10).cast("double")
    pts = F.transform(
        F.sequence(F.lit(0), F.lit(20)),
        lambda k: F.concat(
            (k * 5).cast("string"),
            F.lit(" "),
            F.when((k == 0) | (k == 20), y)
            .when(k % 2 == 1, y + 0.125)
            .otherwise(y - 0.125)
            .cast("string"),
        ),
    )
    wkt = F.concat(F.lit("LINESTRING ("), F.array_join(pts, ", "), F.lit(")"))
    return n.select(i.alias("fid"), wkt.alias("_wkt")).withColumn(
        "geom_wkb", st_geomfromtext(F.col("_wkt"))
    ).drop("_wkt")


ZIGZAG_SQL = """zigzag AS (
  SELECT CAST(n_nationkey AS BIGINT) AS fid FROM nation)"""


def bowties(spark, sf_dir) -> DataFrame:
    """Classic invalid bow-tie at (i*50, 0); makevalid splits it into two
    triangles of total area 50 exactly."""
    n = load(spark, sf_dir, "nation")
    i = F.col("n_nationkey").cast("long")
    x = (i * 50).cast("double")
    wkt = F.concat(
        F.lit("POLYGON (("),
        x.cast("string"), F.lit(" 0, "),
        (x + 10).cast("string"), F.lit(" 10, "),
        (x + 10).cast("string"), F.lit(" 0, "),
        x.cast("string"), F.lit(" 10, "),
        x.cast("string"), F.lit(" 0))"),
    )
    return n.select(i.alias("fid"), wkt.alias("_wkt")).withColumn(
        "geom_wkb", st_geomfromtext(F.col("_wkt"))
    ).drop("_wkt")


BOWTIES_SQL = """bowties AS (
  SELECT CAST(n_nationkey AS BIGINT) AS fid FROM nation)"""


# ------------------------------------------- non-rectangular layers
# Integer-coordinate triangles / convex polygons whose joins, overlays
# and dissolves have CLOSED-FORM exact answers (half-plane sign tests,
# constant areas by construction) — so the hand-rolled clipper's
# non-axis-aligned paths (diagonal edges, concave results) are graded by
# the DuckDB oracle, not only by property tests.


def _tri_wkt(ax, ay, bx, by, cx, cy):
    return F.concat(
        F.lit("POLYGON (("),
        ax.cast("string"), F.lit(" "), ay.cast("string"), F.lit(", "),
        bx.cast("string"), F.lit(" "), by.cast("string"), F.lit(", "),
        cx.cast("string"), F.lit(" "), cy.cast("string"), F.lit(", "),
        ax.cast("string"), F.lit(" "), ay.cast("string"), F.lit("))"),
    )


def supp_triangles(spark, sf_dir) -> DataFrame:
    """One CCW triangle per supplier: A=(x0,y0), B=(x0+30,y0+10),
    C=(x0+10,y0+40). Point-in-triangle is three integer cross-product
    sign tests — exactly expressible in SQL."""
    s = load(spark, sf_dir, "supplier")
    x0 = ((F.col("s_suppkey") * 131) % 900).cast("double")
    y0 = ((F.col("s_suppkey") * 173) % 880).cast("double")
    df = s.select(
        F.col("s_suppkey").cast("long").alias("fid"),
        x0.alias("ax"), y0.alias("ay"),
    )
    return df.withColumn(
        "geom_wkb",
        st_geomfromtext(
            _tri_wkt(
                F.col("ax"), F.col("ay"),
                F.col("ax") + 30, F.col("ay") + 10,
                F.col("ax") + 10, F.col("ay") + 40,
            )
        ),
    )


SUPP_TRIANGLES_SQL = """supp_triangles AS (
  SELECT CAST(s_suppkey AS BIGINT) AS fid,
         CAST((s_suppkey * 131) % 900 AS DOUBLE) AS ax,
         CAST((s_suppkey * 173) % 880 AS DOUBLE) AS ay
  FROM supplier)"""


# tri/square overlay pair: left = right triangle (0,0),(8,0),(0,8) at
# offset (i*40, (i%5)*40); right = square [2,5]^2 at the same offset for
# even i (intersection = pentagon of area exactly 7, difference = concave
# hexagon of area 25), shifted +20 in x for odd i (disjoint).
def tri_blades(spark, sf_dir) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    i = F.col("n_nationkey").cast("long")
    ox = (i * 40).cast("double")
    oy = ((i % 5) * 40).cast("double")
    df = n.select(i.alias("fid"), ox.alias("ox"), oy.alias("oy"))
    return df.withColumn(
        "geom_wkb",
        st_geomfromtext(
            _tri_wkt(
                F.col("ox"), F.col("oy"),
                F.col("ox") + 8, F.col("oy"),
                F.col("ox"), F.col("oy") + 8,
            )
        ),
    )


TRI_BLADES_SQL = """tri_blades AS (
  SELECT CAST(n_nationkey AS BIGINT) AS fid,
         CAST(n_nationkey * 40 AS DOUBLE) AS ox,
         CAST((n_nationkey % 5) * 40 AS DOUBLE) AS oy
  FROM nation)"""


def tri_squares(spark, sf_dir) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    i = F.col("n_nationkey").cast("long")
    shift = F.when(i % 2 == 0, F.lit(0)).otherwise(F.lit(20))
    x0 = (i * 40 + 2 + shift).cast("double")
    y0 = ((i % 5) * 40 + 2).cast("double")
    df = n.select(i.alias("fid"), x0.alias("xmin"), y0.alias("ymin"),
                  (x0 + 3).alias("xmax"), (y0 + 3).alias("ymax"))
    return df.withColumn(
        "geom_wkb",
        st_geomfromtext(
            _box_wkt_cols(F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"))
        ),
    )


TRI_SQUARES_SQL = """tri_squares AS (
  SELECT CAST(n_nationkey AS BIGINT) AS fid,
         CAST(n_nationkey * 40 + 2 + CASE WHEN n_nationkey % 2 = 0 THEN 0 ELSE 20 END
              AS DOUBLE) AS xmin,
         CAST((n_nationkey % 5) * 40 + 2 AS DOUBLE) AS ymin,
         CAST(n_nationkey * 40 + 5 + CASE WHEN n_nationkey % 2 = 0 THEN 0 ELSE 20 END
              AS DOUBLE) AS xmax,
         CAST((n_nationkey % 5) * 40 + 5 AS DOUBLE) AS ymax
  FROM nation)"""


# square x diamond pair: axis square [0,8]^2 and the diamond
# |x-4|+|y-4| <= 6, both at offset (i*40, (i%5)*40). Their intersection
# is an octagon of area exactly 64 - 4*2 = 56 (four corner triangles
# with legs 2 cut off) — a convex/convex clip with diagonal edges.
def diag_squares(spark, sf_dir) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    i = F.col("n_nationkey").cast("long")
    x0 = (i * 40).cast("double")
    y0 = ((i % 5) * 40).cast("double")
    df = n.select(i.alias("fid"), x0.alias("xmin"), y0.alias("ymin"),
                  (x0 + 8).alias("xmax"), (y0 + 8).alias("ymax"))
    return df.withColumn(
        "geom_wkb",
        st_geomfromtext(
            _box_wkt_cols(F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"))
        ),
    )


DIAG_SQUARES_SQL = """diag_squares AS (
  SELECT CAST(n_nationkey AS BIGINT) AS fid,
         CAST(n_nationkey * 40 AS DOUBLE) AS xmin,
         CAST((n_nationkey % 5) * 40 AS DOUBLE) AS ymin,
         CAST(n_nationkey * 40 + 8 AS DOUBLE) AS xmax,
         CAST((n_nationkey % 5) * 40 + 8 AS DOUBLE) AS ymax
  FROM nation)"""


def diag_diamonds(spark, sf_dir) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    i = F.col("n_nationkey").cast("long")
    ox = (i * 40).cast("double")
    oy = ((i % 5) * 40).cast("double")
    wkt = F.concat(
        F.lit("POLYGON (("),
        (ox + 4).cast("string"), F.lit(" "), (oy - 2).cast("string"), F.lit(", "),
        (ox + 10).cast("string"), F.lit(" "), (oy + 4).cast("string"), F.lit(", "),
        (ox + 4).cast("string"), F.lit(" "), (oy + 10).cast("string"), F.lit(", "),
        (ox - 2).cast("string"), F.lit(" "), (oy + 4).cast("string"), F.lit(", "),
        (ox + 4).cast("string"), F.lit(" "), (oy - 2).cast("string"), F.lit("))"),
    )
    return n.select(i.alias("fid"), wkt.alias("_w")).withColumn(
        "geom_wkb", st_geomfromtext(F.col("_w"))
    ).drop("_w")


DIAG_DIAMONDS_SQL = """diag_diamonds AS (
  SELECT CAST(n_nationkey AS BIGINT) AS fid FROM nation)"""


# two triangles forming the square [0,s]^2 along its diagonal (union must
# weld the shared diagonal edge: area s^2, ONE part), s = (i%5+1)*6
def tri_halves(spark, sf_dir) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    i = F.col("n_nationkey").cast("long")
    s = ((i % 5 + 1) * 6).cast("double")
    ox = (i * 40).cast("double")
    lower = _tri_wkt(ox, F.lit(0), ox + s, F.lit(0), ox + s, s)
    upper = _tri_wkt(ox, F.lit(0), ox + s, s, ox, s)
    df = n.select(
        i.alias("fid"), ((i % 5 + 1) * 6).alias("side"),
        F.explode(F.array(lower, upper)).alias("_w"),
    )
    return df.withColumn("geom_wkb", st_geomfromtext(F.col("_w"))).drop("_w")


TRI_HALVES_SQL = """tri_halves AS (
  SELECT CAST(n_nationkey AS BIGINT) AS fid,
         CAST((n_nationkey % 5 + 1) * 6 AS BIGINT) AS side
  FROM nation)"""


# L-shape as 6 triangles (3 unit squares of side s, each split along its
# diagonal): dissolve area = 3*s^2 in ONE part; hull of the L is a
# pentagon of area 3.5*s^2 (s multiple of 4 keeps 3.5*s^2 integral)
def lshape_tris(spark, sf_dir) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    i = F.col("n_nationkey").cast("long")
    s = ((i % 4 + 1) * 4).cast("double")
    ox = (i * 50).cast("double")
    zero = F.lit(0).cast("double")
    tris = []
    for qx, qy in ((zero, zero), (s, zero), (zero, s)):  # 3 squares of the L
        x0, y0 = ox + qx, qy
        tris.append(_tri_wkt(x0, y0, x0 + s, y0, x0 + s, y0 + s))
        tris.append(_tri_wkt(x0, y0, x0 + s, y0 + s, x0, y0 + s))
    df = n.select(
        i.alias("fid"), ((i % 4 + 1) * 4).alias("side"),
        F.explode(F.array(*tris)).alias("_w"),
    )
    return df.withColumn("geom_wkb", st_geomfromtext(F.col("_w"))).drop("_w")


LSHAPE_TRIS_SQL = """lshape_tris AS (
  SELECT CAST(n_nationkey AS BIGINT) AS fid,
         CAST((n_nationkey % 4 + 1) * 4 AS BIGINT) AS side
  FROM nation)"""


# ------------------------------------------------------- pages / zones
# Common-Crawl-shaped pages derived from documents: a geo:<lat>,<lon>
# token is appended for 90% of docs; lat = (doc_id*37)%160 + 0.5,
# lon = (doc_id*73)%340 + 0.25 (offsets keep points off integer zone
# boundaries). `text` is NEVER rewritten downstream: byte-identical
# text per url is the pipeline invariant (BASELINE.json input_hint).
def pages_from_documents(spark, sf_dir) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    lat_i = (F.col("doc_id") * 37) % 160
    lon_i = (F.col("doc_id") * 73) % 340
    geo = F.concat(
        F.lit(" geo:"), lat_i.cast("string"), F.lit(".5,"),
        lon_i.cast("string"), F.lit(".25"),
    )
    text2 = F.when(F.col("doc_id") % 10 != 0, F.concat(F.col("text"), geo)).otherwise(
        F.col("text")
    )
    return d.select(
        F.concat(F.lit("https://example.com/doc/"), F.col("doc_id")).alias("url"),
        F.to_timestamp(F.lit("2020-01-01 00:00:00")).alias("warc_ts"),
        F.encode(F.col("text"), "utf-8").alias("html"),
        text2.alias("text"),
        F.col("lang"),
    )


PAGES_SQL = """pages AS (
  SELECT 'https://example.com/doc/' || doc_id AS url,
         CASE WHEN doc_id % 10 <> 0
              THEN text || ' geo:' || CAST((doc_id*37)%160 AS VARCHAR) || '.5,'
                        || CAST((doc_id*73)%340 AS VARCHAR) || '.25'
              ELSE text END AS text,
         lang, doc_id
  FROM documents)"""


def geo_zones(spark, sf_dir) -> DataFrame:
    """5 rectangular zones over the pages plane (x=lon in [0,340),
    y=lat in [0,160)): zone j covers lon [j*60, j*60+50], lat
    [j*25, j*25+20]."""
    rows = [
        (
            j,
            f"zone_{j}",
            f"POLYGON (({j*60} {j*25}, {j*60+50} {j*25}, {j*60+50} {j*25+20}, "
            f"{j*60} {j*25+20}, {j*60} {j*25}))",
        )
        for j in range(1, 6)
    ]
    df = spark.createDataFrame(rows, "fid long, naam string, wkt string")
    return df.withColumn("geom_wkb", st_geomfromtext(F.col("wkt"))).drop("wkt")


GEO_ZONES_SQL = """geo_zones AS (
  SELECT CAST(j AS BIGINT) AS fid, 'zone_' || j AS naam,
         CAST(j*60 AS DOUBLE) AS xmin, CAST(j*25 AS DOUBLE) AS ymin,
         CAST(j*60+50 AS DOUBLE) AS xmax, CAST(j*25+20 AS DOUBLE) AS ymax
  FROM (SELECT unnest(generate_series(1,5)) AS j))"""


PAGE_POINTS_SQL = """page_points AS (
  SELECT url,
         CAST((doc_id*73)%340 AS DOUBLE) + 0.25 AS lon,
         CAST((doc_id*37)%160 AS DOUBLE) + 0.5  AS lat
  FROM pages WHERE doc_id % 10 <> 0)"""


ALL_CTES = {
    "cust_points": CUST_POINTS_SQL,
    "supp_points": SUPP_POINTS_SQL,
    "nation_boxes": NATION_BOXES_SQL,
    "supp_boxes": SUPP_BOXES_SQL,
    "paired_left": PAIRED_LEFT_SQL,
    "paired_right": PAIRED_RIGHT_SQL,
    "star_polys": STAR_POLYS_SQL,
    "supp_triangles": SUPP_TRIANGLES_SQL,
    "tri_blades": TRI_BLADES_SQL,
    "tri_squares": TRI_SQUARES_SQL,
    "diag_squares": DIAG_SQUARES_SQL,
    "diag_diamonds": DIAG_DIAMONDS_SQL,
    "tri_halves": TRI_HALVES_SQL,
    "lshape_tris": LSHAPE_TRIS_SQL,
    "zigzag": ZIGZAG_SQL,
    "bowties": BOWTIES_SQL,
    "pages": PAGES_SQL,
    "geo_zones": GEO_ZONES_SQL,
    "page_points": PAGE_POINTS_SQL,
}


def with_ctes(sql: str, *names: str) -> str:
    """Prefix a query with the named CTEs (dependency-ordered)."""
    parts = [ALL_CTES[n] for n in names]
    return "WITH " + ",\n".join(parts) + "\n" + sql
