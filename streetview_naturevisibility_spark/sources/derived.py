"""Deterministic derived geo tables over the driver testdata — the
oracle contract.

The driver's correctness gate compares each engine query against ANSI
SQL run by DuckDB on the same parquet tables. Spatial queries therefore
derive page/point coordinates from ``doc_id`` / ``p_partkey`` with pure
integer-hash arithmetic that is expressible IDENTICALLY in Spark Column
algebra and in SQL — every constant below is pinned and appears in both
forms. Planar "meters" are an equirectangular mapping of the derived
lon/lat (pinned scales), so snap distances are plain euclidean doubles
in both engines.

Spark side: the engine's real operators (knn_snap, aggregates, pip) run
over these derived frames. SQL side: textual twins assembled from the
same constants (the ``*_SQL`` builders).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..geo.cells import pack_cell_col, pack_cell_sql
from ..geo.mercator import tile_sql, tile_x_col, tile_y_col
from .tables import load

# pinned constants (mirrored verbatim into SQL)
M32 = 4294967296
LON0, LAT0 = 4.7, 52.25
LON_SPAN, LAT_SPAN = 0.1, 0.1
MX_SCALE, MY_SCALE = 6800.0, 11054.0  # meters across the full span
HX_A, HX_B = 2654435761, 12345
HY_A, HY_B = 2246822519, 54321
PX_A, PX_B = 1779033703, 7
PY_A, PY_B = 3144134277, 11
# all multipliers large odd (> 2^32 / max key) so even tiny keys wrap
# the modulus and the derived fields mix over their full ranges
GV_A, GV_B = 2483648579, 3
GU_A, GU_B = 2654435761, 101
GW_A, GW_B = 2246822519, 202
NV_A, NV_B = 3266489917, 303
ND_A, ND_B = 1442695041, 13  # gap-fill ndvi feature hash
N_ROADS = 211
UNSUIT_MOD = 17
ZOOM = 14
# 250 m (vs the reference's 25 m) because the derived pages table is
# sparse (500 docs over a 75 km^2 box) — the fixture suite tests the
# faithful 25 m radius at realistic density; here the contract needs a
# meaningful hit rate to exercise the reduce/tie-break paths.
SNAP_RADIUS = 250.0
# Cell zoom for the snap join scales with the radius: one 3x3 ring must
# cover the bound but cells should stay as small as possible so the
# candidate set is tight (z16 ~ 376 m at 52°N >= 250 m). z14 (the
# reference's reporting zoom) would make every join candidate list ~40x
# larger — the difference between 6k and 200k+ pages/sec at bench scale.
SNAP_ZOOM = 16
ZONAL_RADIUS = 250.0

HIGHWAYS = ["residential", "primary", "secondary", "tertiary", "cycleway"]

# Convex PIP fixture in the derived meter space: engine side runs the
# generic ray-casting kernel, oracle side the half-plane conjunction.
HEX_CENTER = (3400.0, 5527.0)
HEX_RADIUS = 2500.0
HEX_SIDES = 6
HEX_PHASE = 0.3


def hex_polygon():
    from ..geo.polygon import regular_polygon

    return regular_polygon(HEX_CENTER[0], HEX_CENTER[1], HEX_RADIUS, HEX_SIDES, HEX_PHASE)


def _hash_unit(key: Column, a: int, b: int) -> Column:
    """((key*a + b) % 2^32) / 2^32 in [0,1) — exact int math, then one
    double division, identical in DuckDB."""
    return ((key * F.lit(a) + F.lit(b)) % F.lit(M32)).cast("double") / F.lit(float(M32))


def _hash_unit_sql(key: str, a: int, b: int) -> str:
    return f"(CAST((({key}) * {a} + {b}) % {M32} AS DOUBLE) / {float(M32)!r})"


# ---------------------------------------------------------------- pages
def spark_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    k = F.col("doc_id").cast("long")
    ux = _hash_unit(k, HX_A, HX_B)
    uy = _hash_unit(k, HY_A, HY_B)
    df = docs.select(
        k.alias("doc_id"),
        F.concat(F.lit("https://example.org/p/"), k.cast("string")).alias("url"),
        "lang",
        "text",
        (F.lit(LON0) + ux * F.lit(LON_SPAN)).alias("lon"),
        (F.lit(LAT0) + uy * F.lit(LAT_SPAN)).alias("lat"),
        (ux * F.lit(MX_SCALE)).alias("x"),
        (uy * F.lit(MY_SCALE)).alias("y"),
        (k % 5 == 0).alias("is_panoramic"),
        (k % UNSUIT_MOD == 0).alias("unsuit"),
        # continuous (2^-32 granularity) — never lands on a round()
        # half-boundary, keeping Spark/DuckDB round() twins exact
        _hash_unit(k, GV_A, GV_B).alias("gvi0"),
    )
    return (
        df.withColumn("tile_x", tile_x_col(F.col("lon"), ZOOM))
        .withColumn("tile_y", tile_y_col(F.col("lat"), ZOOM))
        .withColumn("cell_id", pack_cell_col(F.col("tile_x"), F.col("tile_y"), ZOOM))
        .withColumn("stile_x", tile_x_col(F.col("lon"), SNAP_ZOOM))
        .withColumn("stile_y", tile_y_col(F.col("lat"), SNAP_ZOOM))
        .withColumn(
            "scell_id", pack_cell_col(F.col("stile_x"), F.col("stile_y"), SNAP_ZOOM)
        )
    )


def pages_sql() -> str:
    ux = _hash_unit_sql("doc_id", HX_A, HX_B)
    uy = _hash_unit_sql("doc_id", HY_A, HY_B)
    lon = f"({LON0!r} + {ux} * {LON_SPAN!r})"
    lat = f"({LAT0!r} + {uy} * {LAT_SPAN!r})"
    tx, ty = tile_sql("lon", "lat", ZOOM)
    stx, sty = tile_sql("lon", "lat", SNAP_ZOOM)
    return f"""
pages0 AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         'https://example.org/p/' || CAST(doc_id AS VARCHAR) AS url,
         lang,
         text,
         {lon} AS lon,
         {lat} AS lat,
         ({ux} * {MX_SCALE!r}) AS x,
         ({uy} * {MY_SCALE!r}) AS y,
         (doc_id % 5 = 0) AS is_panoramic,
         (doc_id % {UNSUIT_MOD} = 0) AS unsuit,
         {_hash_unit_sql("doc_id", GV_A, GV_B)} AS gvi0
  FROM documents
),
pages AS (
  SELECT *, {tx} AS tile_x, {ty} AS tile_y,
         {pack_cell_sql(tx, ty, ZOOM)} AS cell_id,
         {stx} AS stile_x, {sty} AS stile_y
  FROM pages0
)"""


# --------------------------------------------------------------- points
def spark_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    k = F.col("p_partkey").cast("long")
    ux = _hash_unit(k, PX_A, PX_B)
    uy = _hash_unit(k, PY_A, PY_B)
    road = (k % N_ROADS).alias("road_id")
    hw = F.element_at(F.array(*[F.lit(h) for h in HIGHWAYS]), ((k % N_ROADS) % 5 + 1).cast("int"))
    df = part.select(
        k.alias("point_id"),
        road,
        (F.lit(60.0) + ((k % N_ROADS) * 37 % 841).cast("double")).alias("length"),
        hw.alias("highway"),
        (F.lit(LON0) + ux * F.lit(LON_SPAN)).alias("lon"),
        (F.lit(LAT0) + uy * F.lit(LAT_SPAN)).alias("lat"),
        (ux * F.lit(MX_SCALE)).alias("x"),
        (uy * F.lit(MY_SCALE)).alias("y"),
    )
    # points' tiles exist solely for the snap candidate join -> SNAP_ZOOM
    return df.withColumn("tile_x", tile_x_col(F.col("lon"), SNAP_ZOOM)).withColumn(
        "tile_y", tile_y_col(F.col("lat"), SNAP_ZOOM)
    )


def points_sql() -> str:
    ux = _hash_unit_sql("p_partkey", PX_A, PX_B)
    uy = _hash_unit_sql("p_partkey", PY_A, PY_B)
    lon = f"({LON0!r} + {ux} * {LON_SPAN!r})"
    lat = f"({LAT0!r} + {uy} * {LAT_SPAN!r})"
    tx, ty = tile_sql("lon", "lat", SNAP_ZOOM)
    hw_case = (
        "CASE (p_partkey % 211) % 5 "
        + " ".join(f"WHEN {i} THEN '{h}'" for i, h in enumerate(HIGHWAYS))
        + " END"
    )
    return f"""
points0 AS (
  SELECT CAST(p_partkey AS BIGINT) AS point_id,
         CAST(p_partkey % {N_ROADS} AS BIGINT) AS road_id,
         60.0 + CAST((p_partkey % {N_ROADS}) * 37 % 841 AS DOUBLE) AS length,
         {hw_case} AS highway,
         {lon} AS lon,
         {lat} AS lat,
         ({ux} * {MX_SCALE!r}) AS x,
         ({uy} * {MY_SCALE!r}) AS y
  FROM part
),
points AS (
  SELECT *, {tx} AS tile_x, {ty} AS tile_y FROM points0
)"""


def spark_roads_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct derived road dimension (road_id, length, highway)."""
    return (
        spark_points(spark, sf_dir)
        .select("road_id", "length", "highway")
        .distinct()
    )


# ----------------------------------------------------------------- grid
def spark_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-form raster grid derived from events (zonal-stats input)."""
    ev = load(spark, sf_dir, "events")
    k = F.col("event_id").cast("long")
    gu = _hash_unit(k, GU_A, GU_B)
    gw = _hash_unit(k, GW_A, GW_B)
    return ev.select(
        k.alias("grid_id"),
        (gu * F.lit(MX_SCALE)).alias("cx"),
        (gw * F.lit(MY_SCALE)).alias("cy"),
        (_hash_unit(k, NV_A, NV_B) * F.lit(2.0) - F.lit(0.5)).alias("value"),
    )


def grid_sql() -> str:
    gu = _hash_unit_sql("event_id", GU_A, GU_B)
    gw = _hash_unit_sql("event_id", GW_A, GW_B)
    return f"""
grid AS (
  SELECT CAST(event_id AS BIGINT) AS grid_id,
         ({gu} * {MX_SCALE!r}) AS cx,
         ({gw} * {MY_SCALE!r}) AS cy,
         ({_hash_unit_sql("event_id", NV_A, NV_B)} * 2.0 - 0.5) AS value
  FROM events
)"""


# ----------------------------------------------------------- embeddings
# planted near-duplicates: every EMB_DUP_MOD-th vector re-appears at
# vec_id+EMB_DUP_OFFSET scaled by 2.0 — a power of two, so the float32
# scale and all downstream float64 sums are EXACT and the pair's cosine
# is exactly 1.0 in both engines. Natural sf0.01 pairs top out at
# cosine 0.513, so a 0.95 threshold selects precisely the planted
# pairs, whose identical hyperplane signs give the LSH recall 1.
EMB_DUP_MOD = 25
EMB_DUP_OFFSET = 1_000_000


def spark_embeddings_aug(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    clones = emb.where(F.col("vec_id") % EMB_DUP_MOD == 0).select(
        (F.col("vec_id") + F.lit(EMB_DUP_OFFSET)).alias("vec_id"),
        F.transform(
            F.col("embedding"), lambda v: (v * F.lit(2.0)).cast("float")
        ).alias("embedding"),
        "label",
    )
    return emb.unionByName(clones)


def embeddings_aug_sql() -> str:
    return f"""
emb_aug AS (
  SELECT vec_id, embedding, label FROM embeddings
  UNION ALL
  SELECT vec_id + {EMB_DUP_OFFSET} AS vec_id,
         list_transform(embedding, v -> CAST(v * 2.0 AS FLOAT)) AS embedding,
         label
  FROM embeddings WHERE vec_id % {EMB_DUP_MOD} = 0
)"""


# ------------------------------------------------------------------ snap
def snap_sql() -> str:
    """kNN snap as SQL: 3x3 tile-neighborhood candidate join + (dist,
    url) window reduce + left-preserving miss semantics — the textual
    twin of operators/knn.knn_snap."""
    return f"""
cand AS (
  SELECT q.point_id,
         p.url, p.is_panoramic AS pano, p.unsuit, p.gvi0,
         sqrt((q.x - p.x) * (q.x - p.x) + (q.y - p.y) * (q.y - p.y)) AS dist
  FROM points q
  JOIN pages p
    ON p.stile_x BETWEEN q.tile_x - 1 AND q.tile_x + 1
   AND p.stile_y BETWEEN q.tile_y - 1 AND q.tile_y + 1
  WHERE sqrt((q.x - p.x) * (q.x - p.x) + (q.y - p.y) * (q.y - p.y)) < {SNAP_RADIUS!r}
),
best AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY point_id ORDER BY dist, url) AS rn
    FROM cand
  ) WHERE rn = 1
),
gvi AS (
  SELECT q.point_id, q.road_id, q.length, q.highway,
         coalesce(b.url, '') AS page_url,
         CASE WHEN b.url IS NULL THEN NULL ELSE round(b.dist, 6) END AS snap_distance,
         CASE WHEN b.url IS NULL OR b.unsuit THEN NULL ELSE b.gvi0 END AS gvi,
         coalesce(b.pano, FALSE) AS is_panoramic,
         (b.url IS NULL OR b.unsuit) AS missing,
         FALSE AS error
  FROM points q LEFT JOIN best b ON q.point_id = b.point_id
)"""


def with_clause(*parts: str) -> str:
    return "WITH " + ",".join(p.strip().rstrip() for p in parts)


GEO_CTES = (pages_sql(), points_sql(), snap_sql())


def spark_gvi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine twin of the ``gvi`` CTE: real knn_snap + metadata re-join
    (reference J9) + flag expressions."""
    from ..operators.knn import knn_snap

    pages = spark_pages(spark, sf_dir)
    points = spark_points(spark, sf_dir)
    pages_snap = pages.drop("cell_id").withColumnRenamed("scell_id", "cell_id")
    snapped = knn_snap(
        points,
        pages_snap,
        max_distance=2 * SNAP_RADIUS,
        zoom=SNAP_ZOOM,
        # sort_exact here, deliberately: at contract/bench scale the
        # distance filter leaves a sparse candidate set, so the
        # min(struct) SortAggregate is cheap while two_phase pays a
        # constant ~2-3 s for its persist job boundary (measured r2:
        # 2.9 s vs 6.2 s at sf0.1; 1.7 s vs 3.4 s at 8M pages). The
        # flagship pipeline keeps the two_phase default for dense-cell
        # scale safety (hash partial agg bounds hot-cell memory).
        reduce="sort_exact",
    )
    meta = pages.select(F.col("url").alias("page_url"), "unsuit", "gvi0")
    out = snapped.join(F.broadcast(meta), "page_url", "left")
    unsuit = F.coalesce(F.col("unsuit"), F.lit(False))
    return out.select(
        "point_id",
        "road_id",
        "length",
        "highway",
        "page_url",
        F.when(F.col("page_url") == "", F.lit(None).cast("double"))
        .otherwise(F.round(F.col("snap_distance"), 6))
        .alias("snap_distance"),
        F.when((F.col("page_url") == "") | unsuit, F.lit(None).cast("double"))
        .otherwise(F.col("gvi0"))
        .alias("gvi"),
        "is_panoramic",
        ((F.col("page_url") == "") | unsuit).alias("missing"),
        F.lit(False).alias("error"),
    )
