"""Sample-point generation along road linestrings.

Reference semantics (modules/osmnx_road_network.py:51-78):
  - one point every ``spacing`` meters at arc-length offsets
    ``range(0, int(length), spacing)`` — includes 0, excludes the
    endpoint; roads shorter than 1 m yield nothing;
  - exact-coordinate dedup, FIRST occurrence wins in generation order
    (roads order, then ascending offset);
  - positional ids assigned after dedup (osmnx_road_network.py:161).

Engine plan (Spark-first):
  - one pandas UDF call per Arrow batch of ROADS (not per point):
    ``geometry_wkt -> array<struct<offset_m,x,y>>`` then ``explode`` —
    the UDTF-style 1->N expansion of SURVEY.md §2.9;
  - first-wins dedup as ``row_number() over (partition by x,y order by
    road_id, offset_m) = 1`` (generation order is (road_id, offset_m)
    because fixtures store roads in road_id order);
  - deterministic content-derived ids: ``row_number() over (order by
    road_id, offset_m) - 1`` — never monotonically_increasing_id
    (partition-dependent). The single-partition window is intentional
    and safe: the points side is bounded (millions) even when the pages
    side is 100 TB.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

from ..geo.cells import pack_cell_col
from ..geo.mercator import tile_x_col, tile_y_col
from ..geo.polygon import interpolate_along, parse_wkt_coords
from ..functions.project import make_to_lonlat

_POINT = StructType(
    [
        StructField("offset_m", IntegerType()),
        StructField("x", DoubleType()),
        StructField("y", DoubleType()),
    ]
)


def make_sample_udf(spacing: int):
    @F.pandas_udf(ArrayType(_POINT))
    def sample_road(geometry_wkt: pd.Series) -> pd.Series:
        def _one(wkt: str):
            coords = parse_wkt_coords(wkt)
            d = np.diff(coords, axis=0)
            length = float(np.sqrt((d**2).sum(axis=1)).sum())
            stop = int(length)  # endpoint-exclusive: range(0, int(len), N)
            if stop < 1:
                return []
            offsets = np.arange(0, stop, spacing)
            pts = interpolate_along(coords, offsets.astype(np.float64))
            return [
                {"offset_m": int(o), "x": float(px), "y": float(py)}
                for o, (px, py) in zip(offsets, pts)
            ]

        return geometry_wkt.map(_one)

    return sample_road


def sample_points(roads: DataFrame, spacing: int = 50, zoom: int = 14, utm_zone: int = 31) -> DataFrame:
    """roads(road_id, geometry_wkt, length, highway) -> SAMPLE_POINTS."""
    sample_udf = make_sample_udf(spacing)
    pts = (
        roads.select("road_id", F.explode(sample_udf("geometry_wkt")).alias("p"))
        .select("road_id", "p.offset_m", "p.x", "p.y")
    )

    # First-wins dedup on exact coordinates (reference O3 semantics).
    dedup_w = Window.partitionBy("x", "y").orderBy("road_id", "offset_m")
    pts = (
        pts.withColumn("_rn", F.row_number().over(dedup_w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )

    # Deterministic positional ids in generation order (reference O7).
    id_w = Window.orderBy("road_id", "offset_m")
    pts = pts.withColumn("point_id", (F.row_number().over(id_w) - 1).cast("long"))

    to_lonlat = make_to_lonlat(utm_zone)
    pts = pts.withColumn("_ll", to_lonlat(F.col("x"), F.col("y")))
    pts = pts.select(
        "point_id",
        "road_id",
        F.col("offset_m").cast("int").alias("offset_m"),
        "x",
        "y",
        F.col("_ll.lon").alias("lon"),
        F.col("_ll.lat").alias("lat"),
    )
    pts = (
        pts.withColumn("tile_x", tile_x_col(F.col("lon"), zoom))
        .withColumn("tile_y", tile_y_col(F.col("lat"), zoom))
        .withColumn("tile_z", F.lit(zoom).cast("int"))
        .withColumn("cell_id", pack_cell_col(F.col("tile_x"), F.col("tile_y"), zoom))
    )
    return pts
