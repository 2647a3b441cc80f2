"""Fixed StructType schemas for every engine table.

The reference has no schema system (implicit pandas dtypes coerced ad
hoc with .astype, main_script.py:38-40); the engine declares schemas
once and enforces them at every source/sink (SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# BASELINE.json input_hint shape + fixture geo columns (FIXTURES.md §1)
WEB_PAGES = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), False),
        StructField("text", StringType(), False),
        StructField("lang", StringType(), False),
        StructField("lon", DoubleType(), False),
        StructField("lat", DoubleType(), False),
        StructField("is_panoramic", BooleanType(), False),
    ]
)

# Reference roads output schema (main_script.py:37-41), FIXTURES.md §2
ROADS = StructType(
    [
        StructField("road_id", StringType(), False),
        StructField("geometry_wkt", StringType(), False),
        StructField("length", DoubleType(), False),
        StructField("highway", StringType(), False),
    ]
)

# FIXTURES.md §3. Road buffers are stored as the road polyline WKT plus
# an explicit radius — buffer membership is the exact predicate
# dist(point, polyline) <= radius (no polygon-approximation error; the
# pinned buffer semantics per SURVEY.md §2.8 F4).
POLYGONS = StructType(
    [
        StructField("polygon_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("geometry_wkt", StringType(), False),
        StructField("radius", DoubleType(), True),
    ]
)

# FIXTURES.md §4 (reference: modules/osmnx_road_network.py:51-78, 144-162)
SAMPLE_POINTS = StructType(
    [
        StructField("point_id", LongType(), False),
        StructField("road_id", StringType(), False),
        StructField("offset_m", IntegerType(), False),
        StructField("x", DoubleType(), False),
        StructField("y", DoubleType(), False),
        StructField("lon", DoubleType(), False),
        StructField("lat", DoubleType(), False),
        StructField("tile_x", IntegerType(), False),
        StructField("tile_y", IntegerType(), False),
        StructField("tile_z", IntegerType(), False),
        StructField("cell_id", LongType(), False),
    ]
)

# Reference CSV schema [id,x,y,GVI,is_panoramic,missing,error]
# (modules/process_data.py:366) + snap assignment columns (FIXTURES.md §5)
GVI_POINTS = StructType(
    [
        StructField("point_id", LongType(), False),
        StructField("x", DoubleType(), False),
        StructField("y", DoubleType(), False),
        StructField("gvi", DoubleType(), True),
        StructField("is_panoramic", BooleanType(), False),
        StructField("missing", BooleanType(), False),
        StructField("error", BooleanType(), False),
        StructField("page_url", StringType(), False),  # "" on miss, never null
        StructField("snap_distance", DoubleType(), True),  # null on miss
    ]
)

# FIXTURES.md §6 (reference: scripts/mean_gvi_street.py:40-44)
GVI_PER_ROAD = StructType(
    [
        StructField("road_id", StringType(), False),
        StructField("avg_gvi", DoubleType(), True),
        StructField("null_points_count", LongType(), False),
        StructField("total_points", LongType(), False),
    ]
)

# FIXTURES.md §7 — raster as a long-form grid table
NDVI_GRID = StructType(
    [
        StructField("cell_x", IntegerType(), False),
        StructField("cell_y", IntegerType(), False),
        StructField("cx", DoubleType(), False),
        StructField("cy", DoubleType(), False),
        StructField("value", DoubleType(), False),
    ]
)

# Per-page deterministic token-label array (payload analog of the
# Mask2Former per-pixel label grid, SURVEY.md §1.1 "Image/segmentation")
PAGE_LABELS = StructType(
    [
        StructField("url", StringType(), False),
        StructField("labels", ArrayType(IntegerType(), False), False),
    ]
)
