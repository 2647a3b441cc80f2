"""Aggregation & reporting chain — scripts/mean_gvi_street.py +
scripts/results_metrics.py as one declarative DAG.

All aggregations are Spark built-ins (partial+final automatic); the
three-way join results ⋈ points ⋈ roads is computed once and cached by
the caller when several metric branches are requested (SURVEY.md §3.2).
Roads and points are bounded dimensions — broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_intersection(
    gvi_points: DataFrame, sample_points: DataFrame, roads: DataFrame
) -> DataFrame:
    """results ⋈ points on id ⋈ roads on road_index — the ``intersection``
    frame of scripts/results_metrics.py:95-100 (both joins inner)."""
    pts = sample_points.select("point_id", "road_id")
    rds = roads.select("road_id", "length", "highway")
    return (
        gvi_points.join(F.broadcast(pts), "point_id")
        .join(F.broadcast(rds), "road_id")
        .select(
            "point_id",
            "road_id",
            "page_url",
            "snap_distance",
            "gvi",
            "is_panoramic",
            "missing",
            "error",
            "length",
            "highway",
        )
    )


def gvi_per_road(intersection: DataFrame) -> DataFrame:
    """groupby(road_index).agg(GVI: mean / null-count / size)
    (scripts/mean_gvi_street.py:40-44)."""
    return intersection.groupBy("road_id").agg(
        F.avg("gvi").alias("avg_gvi"),
        F.sum(F.col("gvi").isNull().cast("long")).alias("null_points_count"),
        F.count(F.lit(1)).alias("total_points"),
    )


def roads_with_avg_gvi(roads: DataFrame, per_road: DataFrame) -> DataFrame:
    """Left-join aggregates back onto roads (mean_gvi_street.py:47)."""
    return roads.join(per_road, "road_id", "left")


def unavailable_images_per_highway(intersection: DataFrame) -> DataFrame:
    """Two-level rollup (results_metrics.py:60-74). NB the reference's
    ``total_null`` actually counts points with NON-null image ids
    (the naming bug documented in SURVEY.md A2) — the computation, not
    the name, is reproduced: count(page_url IS NOT NULL)."""
    # the grand total joins in as a lazy broadcast 1-row aggregate so
    # the whole metric stays one DAG (no eager .count() driver action)
    total = intersection.agg(F.count(F.lit(1)).cast("double").alias("_total"))
    grouped = intersection.groupBy("road_id", "highway").agg(
        F.sum(F.col("page_url").isNotNull().cast("long")).alias("total_null")
    )
    return (
        grouped.groupBy("highway")
        .agg(F.sum("total_null").alias("total_null"))
        .crossJoin(F.broadcast(total))
        .withColumn("proportion_null", F.col("total_null") / F.col("_total"))
        .drop("_total")
        .orderBy(F.desc("total_null"))
    )


def top5_highways(per_highway: DataFrame) -> DataFrame:
    """nlargest(5, total_null) (results_metrics.py:21) —
    TakeOrderedAndProject, no full sort. Ties broken by highway name
    for determinism."""
    return per_highway.orderBy(F.desc("total_null"), F.asc("highway")).limit(5)


def missing_images_metrics(intersection: DataFrame) -> DataFrame:
    """Global conditional aggregates (results_metrics.py:107-115)."""
    return intersection.agg(
        F.sum((F.col("page_url") == "").cast("long")).alias("unavailable"),
        F.sum((F.col("gvi").isNull() & (F.col("page_url") != "")).cast("long")).alias(
            "unsuitable"
        ),
        F.sum(F.col("gvi").isNull().cast("long")).alias("total_null"),
        (
            F.sum(F.col("gvi").isNull().cast("long")) / F.count(F.lit(1))
        ).alias("proportion_null"),
        F.count(F.lit(1)).alias("total_points"),
    )


def panoramic_images_metrics(intersection: DataFrame) -> DataFrame:
    """results_metrics.py:119-124."""
    return intersection.agg(
        F.sum(F.col("is_panoramic").cast("long")).alias("panoramic_count"),
        F.sum((F.col("page_url") != "").cast("long")).alias("total_images"),
        (
            F.sum(F.col("is_panoramic").cast("long"))
            / F.sum((F.col("page_url") != "").cast("long"))
        ).alias("proportion_panoramic"),
    )


def availability_score(intersection: DataFrame) -> DataFrame:
    """IAS / AIAS (results_metrics.py:127-133). road_length sums the
    per-point joined ``length`` column (faithful to the reference, which
    sums over the intersection rows, repeating each road's length)."""
    return intersection.agg(
        F.sum((F.col("page_url") != "").cast("long")).alias("gvi_points"),
        (F.sum("length") / F.lit(1000.0)).alias("road_length_km"),
        F.count(F.lit(1)).alias("total_points"),
        (
            F.sum((F.col("page_url") != "").cast("long")) / F.count(F.lit(1))
        ).alias("availability_score"),
        (
            F.sum((F.col("page_url") != "").cast("long"))
            * F.log(F.sum("length") / F.lit(1000.0))
            / F.count(F.lit(1))
        ).alias("adjusted_availability_score"),
    )


def usability_score(intersection: DataFrame) -> DataFrame:
    """IUS / AIUS (results_metrics.py:136-143)."""
    usable = (F.col("gvi").isNotNull() & (F.col("page_url") != "")).cast("long")
    with_img = (F.col("page_url") != "").cast("long")
    return intersection.agg(
        F.sum(usable).alias("gvi_points"),
        (F.sum("length") / F.lit(1000.0)).alias("road_length_km"),
        F.sum(with_img).alias("total_images"),
        (F.sum(usable) / F.sum(with_img)).alias("usability_score"),
        (
            F.sum(usable) * F.log(F.sum("length") / F.lit(1000.0)) / F.sum(with_img)
        ).alias("adjusted_usability_score"),
    )
