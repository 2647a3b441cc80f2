"""S9 — STAC catalog source (reference modules/availability.py:139-164,
388-408: pystac-client search of Planetary Computer sentinel-2-l2a by
bbox + datetime + ``eo:cloud_cover lt 20``, lowest-cloud item selected,
red/nir bands loaded, NDVI computed via xrspatial).

Spark-first restatement over a LOCAL static STAC catalog. STAC is a
plain-JSON spec (Items are GeoJSON Features with ``bbox``,
``properties.datetime``, ``properties."eo:cloud_cover"`` and an
``assets`` href map) — the part of S9 with QUERY semantics is the
catalog parse, the search predicate set, the lowest-cloud selection
and the band math, all of which run here as DataFrame ops over
``spark.read.json``. The reference's HTTPS fetch + auth signing is an
environment capability this container does not have (same adjudication
as rounds 1-3), so assets point at local band rasters (long-form
parquet grids, the engine's raster representation throughout).

Scale shape: item metadata is catalog-sized (thousands of rows —
driver-trivial), band rasters are the big side and load as ordinary
partitioned parquet scans; the red/nir join keys on (cell_x, cell_y)
and NDVI is pure Column arithmetic (whole-stage codegen).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

_ITEM_SCHEMA = StructType(
    [
        StructField("id", StringType(), False),
        StructField("collection", StringType(), True),
        StructField("bbox", ArrayType(DoubleType(), False), True),
        StructField(
            "properties",
            StructType(
                [
                    StructField("datetime", StringType(), True),
                    StructField("eo:cloud_cover", DoubleType(), True),
                    StructField(
                        "classification:classes",
                        ArrayType(
                            StructType(
                                [
                                    StructField("value", DoubleType(), True),
                                    StructField("description", StringType(), True),
                                ]
                            )
                        ),
                        True,
                    ),
                ]
            ),
            True,
        ),
        StructField(
            "assets",
            StructType(
                [
                    StructField(
                        "red",
                        StructType([StructField("href", StringType(), True)]),
                        True,
                    ),
                    StructField(
                        "nir",
                        StructType([StructField("href", StringType(), True)]),
                        True,
                    ),
                    StructField(
                        "map",
                        StructType([StructField("href", StringType(), True)]),
                        True,
                    ),
                ]
            ),
            True,
        ),
    ]
)


def read_stac_items(spark: SparkSession, catalog_dir: str) -> DataFrame:
    """Items of a static STAC catalog -> one row per item: (item_id,
    collection, datetime TIMESTAMP, cloud_cover, bbox x/y min/max,
    red_href, nir_href). Item files are one pretty-printed JSON object
    each -> multiLine scan with an explicit schema (no inference
    pass)."""
    raw = spark.read.schema(_ITEM_SCHEMA).option("multiLine", "true").json(
        os.path.join(catalog_dir, "items")
    )
    return raw.select(
        F.col("id").alias("item_id"),
        "collection",
        F.to_timestamp(F.col("properties.datetime")).alias("datetime"),
        F.col("properties.`eo:cloud_cover`").alias("cloud_cover"),
        F.element_at("bbox", 1).alias("xmin"),
        F.element_at("bbox", 2).alias("ymin"),
        F.element_at("bbox", 3).alias("xmax"),
        F.element_at("bbox", 4).alias("ymax"),
        F.col("assets.red.href").alias("red_href"),
        F.col("assets.nir.href").alias("nir_href"),
        F.col("assets.map.href").alias("map_href"),
        F.col("properties.`classification:classes`").alias("classes"),
    )


def search_items(
    items: DataFrame,
    collection: str,
    bbox: tuple[float, float, float, float],
    date_range: tuple[str, str],
    max_cloud: float = 20.0,
) -> DataFrame:
    """The reference's search predicates as one declarative filter set:
    collection match, ``eo:cloud_cover < max_cloud``, datetime within
    [start, end], and item-footprint CONTAINS the AOI box (the
    ``items_df.geometry.contains(sg.box(*bbox))`` refinement —
    axis-aligned boxes, so containment is 4 comparisons)."""
    x0, y0, x1, y1 = bbox
    t0, t1 = date_range
    return items.where(
        (F.col("collection") == collection)
        & (F.col("cloud_cover") < F.lit(float(max_cloud)))
        & (F.col("datetime") >= F.to_timestamp(F.lit(t0)))
        & (F.col("datetime") <= F.to_timestamp(F.lit(t1)))
        & (F.col("xmin") <= F.lit(x0))
        & (F.col("ymin") <= F.lit(y0))
        & (F.col("xmax") >= F.lit(x1))
        & (F.col("ymax") >= F.lit(y1))
    )


def select_lowest_cloud(items: DataFrame) -> DataFrame:
    """Lowest-cloud item (reference picks ``iloc[0]`` of the min-cloud
    subset; item_id tie-break makes the choice a total order)."""
    return items.orderBy(F.asc("cloud_cover"), F.asc("item_id")).limit(1)


def ndvi_col(nir, red):
    """NDVI = (nir - red) / (nir + red); NULL where the denominator is
    0 (xrspatial emits NaN there — NULL is the engine's NaN carrier in
    contract outputs)."""
    s = nir + red
    return F.when(s != 0, (nir - red) / s)


def load_ndvi(spark: SparkSession, item_row) -> DataFrame:
    """Band rasters of one selected item -> (cell_x, cell_y, cx, cy,
    red, nir, ndvi). Bands join on the cell key — co-partitioned
    parquet at scale; NDVI is codegen arithmetic."""
    red = spark.read.parquet(item_row.red_href).select(
        "cell_x", "cell_y", "cx", "cy", F.col("value").alias("red")
    )
    nir = spark.read.parquet(item_row.nir_href).select(
        "cell_x", "cell_y", F.col("value").alias("nir")
    )
    out = red.join(nir, ["cell_x", "cell_y"])
    return out.withColumn("ndvi", ndvi_col(F.col("nir"), F.col("red")))


def ndvi_for_aoi(
    spark: SparkSession,
    catalog_dir: str,
    bbox: tuple[float, float, float, float],
    date_range: tuple[str, str],
    collection: str = "sentinel-2-l2a",
    max_cloud: float = 20.0,
):
    """End-to-end S9 -> (ndvi DataFrame, selected item Row): catalog
    scan -> search -> lowest-cloud selection (ONE driver Row — bounded
    by construction) -> band load -> NDVI. Raises like the reference's
    ``next(...)`` when nothing matches."""
    found = select_lowest_cloud(
        search_items(read_stac_items(spark, catalog_dir), collection, bbox,
                     date_range, max_cloud)
    ).collect()
    if not found:
        raise ValueError(
            f"no STAC item matches collection={collection} bbox={bbox} "
            f"datetime={date_range} cloud<{max_cloud}"
        )
    item = found[0]
    return load_ndvi(spark, item), item


def landcover_percentages(
    spark: SparkSession,
    catalog_dir: str,
    points: DataFrame,
    radius: float = 50.0,
    collection: str = "esa-worldcover",
):
    """The reference's landcover flow (availability.py:292-534,
    get_landcover_percentages) Spark-first: search the catalog for the
    worldcover collection, take the MOST RECENT item (the reference
    takes items[0], "the first, most recent one" — here an explicit
    datetime-desc order with item_id tie-break), load its class-map
    raster, and compute per-point per-class cell percentages inside
    the euclidean buffer via the meter-bin zonal-histogram kernel
    (operators/zonal.zonal_histogram — grid side never shuffled), then
    name classes from the item's ``classification:classes`` table
    (reference availability.py:397-402 classmap). Returns
    (per-point DataFrame with class descriptions, item Row)."""
    from ..operators.zonal import zonal_histogram

    items = read_stac_items(spark, catalog_dir).where(
        F.col("collection") == collection
    )
    found = items.orderBy(F.desc("datetime"), F.asc("item_id")).limit(1).collect()
    if not found:
        raise ValueError(f"no STAC item in collection {collection}")
    item = found[0]
    grid = spark.read.parquet(item.map_href).withColumnRenamed("value", "class")
    hist = zonal_histogram(points, grid, class_col="class", radius=radius)
    classmap = spark.createDataFrame(
        [(float(c.value), c.description) for c in (item.classes or [])],
        "class: double, class_description: string",
    )
    out = hist.join(F.broadcast(classmap), "class", "left")
    return out, item


# ------------------------------------------------------------ fixture
def write_stac_fixture(
    out_dir: str, n_items: int = 6, nx: int = 20, ny: int = 15
) -> str:
    """Deterministic local STAC catalog: ``catalog.json`` + one Item
    JSON per k under ``items/`` + red/nir band rasters (long-form
    parquet) under ``rasters/``. Planted variation: item k has cloud
    cover (k*17+3)%60, datetime 2021-<k%12+1>-15, every third item's
    footprint is shifted so it does NOT contain the canonical AOI, and
    one item belongs to another collection — each search predicate has
    rows to reject. Band values are analytic functions of (k, band,
    cell) so NDVI has a closed-form oracle."""
    items_dir = os.path.join(out_dir, "items")
    rasters_dir = os.path.join(out_dir, "rasters")
    os.makedirs(items_dir, exist_ok=True)
    os.makedirs(rasters_dir, exist_ok=True)

    base = (620000.0, 5180000.0, 622000.0, 5181500.0)
    links = []
    for k in range(n_items):
        shift = 5000.0 if k % 3 == 2 else -100.0 * k  # 2 mod 3 -> misses AOI
        x0, y0 = base[0] + shift - 500.0, base[1] - 500.0
        x1, y1 = base[2] + shift + 500.0, base[3] + 500.0
        cx_idx, cy_idx = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
        cx_idx, cy_idx = cx_idx.ravel(), cy_idx.ravel()
        cx = x0 + 50.0 + 100.0 * cx_idx
        cy = y0 + 50.0 + 100.0 * cy_idx
        hrefs = {}
        for band, val in (
            ("red", 0.2 + 0.1 * np.sin(cx / 400.0 + k)),
            ("nir", 0.5 + 0.2 * np.cos(cy / 300.0 - k)),
        ):
            p = os.path.join(rasters_dir, f"item-{k}-{band}.parquet")
            pd.DataFrame(
                {
                    "cell_x": cx_idx.astype(np.int32),
                    "cell_y": cy_idx.astype(np.int32),
                    "cx": cx,
                    "cy": cy,
                    "value": val,
                }
            ).to_parquet(p, index=False)
            hrefs[band] = p
        item = {
            "type": "Feature",
            "stac_version": "1.0.0",
            "id": f"item-{k}",
            "collection": "landsat-c2-l2" if k == 1 else "sentinel-2-l2a",
            "bbox": [x0, y0, x1, y1],
            "geometry": {
                "type": "Polygon",
                "coordinates": [
                    [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]
                ],
            },
            "properties": {
                "datetime": f"2021-{k % 12 + 1:02d}-15T10:30:00Z",
                "eo:cloud_cover": float((k * 17 + 3) % 60),
            },
            "assets": {b: {"href": h} for b, h in hrefs.items()},
        }
        fname = f"item-{k}.json"
        with open(os.path.join(items_dir, fname), "w") as f:
            json.dump(item, f, indent=2)
        links.append({"rel": "item", "href": f"items/{fname}"})
    # two worldcover items (different vintages — the MOST RECENT must
    # win selection): class value = 10 ("tree cover") left of the bbox
    # midline, 30 ("grassland") right of it — analytic per-point
    # fractions for the oracle
    x0, y0 = base[0] - 500.0, base[1] - 500.0
    x1, y1 = base[2] + 500.0, base[3] + 500.0
    for k, year in enumerate((2020, 2021)):
        cx_idx, cy_idx = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
        cx_idx, cy_idx = cx_idx.ravel(), cy_idx.ravel()
        cx = x0 + 50.0 + 100.0 * cx_idx
        cy = y0 + 50.0 + 100.0 * cy_idx
        mid = (x0 + x1) / 2.0
        # the 2020 vintage plants the INVERTED layout so selecting the
        # wrong (older) item is caught by value checks
        left_cls, right_cls = (30.0, 10.0) if year == 2020 else (10.0, 30.0)
        cls = np.where(cx < mid, left_cls, right_cls)
        p = os.path.join(rasters_dir, f"worldcover-{year}.parquet")
        pd.DataFrame(
            {
                "cell_x": cx_idx.astype(np.int32),
                "cell_y": cy_idx.astype(np.int32),
                "cx": cx,
                "cy": cy,
                "value": cls,
            }
        ).to_parquet(p, index=False)
        item = {
            "type": "Feature",
            "stac_version": "1.0.0",
            "id": f"worldcover-{year}",
            "collection": "esa-worldcover",
            "bbox": [x0, y0, x1, y1],
            "geometry": {
                "type": "Polygon",
                "coordinates": [
                    [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]
                ],
            },
            "properties": {
                "datetime": f"{year}-06-30T00:00:00Z",
                "classification:classes": [
                    {"value": 10, "description": "Tree cover"},
                    {"value": 30, "description": "Grassland"},
                ],
            },
            "assets": {"map": {"href": p}},
        }
        fname = f"worldcover-{year}.json"
        with open(os.path.join(items_dir, fname), "w") as f:
            json.dump(item, f, indent=2)
        links.append({"rel": "item", "href": f"items/{fname}"})

    with open(os.path.join(out_dir, "catalog.json"), "w") as f:
        json.dump(
            {
                "type": "Catalog",
                "stac_version": "1.0.0",
                "id": "svnv-fixture-catalog",
                "description": "deterministic local STAC fixture",
                "links": links,
            },
            f,
            indent=2,
        )
    return out_dir
