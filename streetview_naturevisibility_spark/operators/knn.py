"""Cell-pruned kNN snap join — THE core operator.

Reference semantics (modules/osmnx_road_network.py:131-154): for every
sample point, the nearest page/feature point with k=1 and
``distance_upper_bound = max_distance/2`` (default 25 m) over a global
cKDTree; misses keep the point with ``image_id == ""`` (empty string,
NOT null), ``distance = None``, and ``is_panoramic`` None -> False
(astype(bool) coercion, line 154).

Engine plan (Spark-first, 100 TB-ready):

1. Points (bounded side, ~1e6 rows max) are exploded to their 3x3
   neighbor cells — cell edge at z14 (~2.4 km at 52°N) >> 2x the 25 m
   radius, so one ring provably contains every candidate within bound.
2. ``pages JOIN broadcast(points_exploded) ON cell_id`` — the 100 TB
   pages table is **never shuffled**: broadcast hash join streams it
   once, and Catalyst pushes the cell-id computation into the scan
   stage (whole-stage codegen, no UDF).
3. Planar distance filter ``dist < bound`` prunes immediately (strict,
   matching cKDTree's open ``distance_upper_bound``).
4. k=1 reduce as ``groupBy(point_id).agg(min(struct(dist, url, ...)))``
   — struct ordering gives (distance, url) total-order tie-breaking and,
   crucially, **partial (map-side) aggregation**: a hot urban cell with
   millions of pages is reduced inside each input partition before the
   single bounded shuffle by point_id. This is the explicit skew
   strategy (SURVEY.md §4.2.2); ``salt`` adds a second pre-reduce keyed
   by (point_id, pmod(hash(url), salt)) for adversarial demonstration —
   results are identical (tested), partial agg already provides the
   same effect.
5. Left join back onto points restores miss rows with the reference's
   exact sentinel semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

import numpy as np
import pandas as pd
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..geo.cells import neighbor_cells_col


def knn_snap(
    points: DataFrame,
    pages: DataFrame,
    max_distance: float = 50.0,
    zoom: int = 14,
    salt: int | None = None,
    broadcast_points: bool = True,
    key_col: str = "url",
    reduce: str = "two_phase",
    materialize: bool = True,
) -> DataFrame:
    """Snap each point to its nearest page within ``max_distance/2``
    (strictly: cKDTree's ``distance_upper_bound`` accepts only
    distances < bound, osmnx_road_network.py:137 — mirrored here).

    ``points`` needs (point_id, x, y, tile_x, tile_y); ``pages`` needs
    (key_col, x, y, is_panoramic, cell_id). x/y must be planar meters in
    the same system on both sides (UTM or equirectangular).

    ``key_col`` is the page key carried through the k=1 reduce and the
    tie-breaker after distance. At 100 TB scale pass a NUMERIC key
    (e.g. a 64-bit doc id): a string key allocates one heap string per
    candidate pair inside the partial-aggregation buffers, and the GC
    pressure turns the reduce superlinear (measured: 2.4M pages/s with a
    long key vs 0.9M with url strings at 64M pages). Resolve the url by
    one bounded join on the snapped output instead.

    Returns points + (page_url, snap_distance, is_panoramic) with
    reference miss semantics: ('' / null-key, null, false).
    """
    bound = max_distance / 2.0
    key_is_string = dict(pages.dtypes)[key_col] == "string"

    cand_points = points.select(
        "point_id",
        F.col("x").alias("_px"),
        F.col("y").alias("_py"),
        F.explode(neighbor_cells_col(F.col("tile_x"), F.col("tile_y"), zoom)).alias("cell_id"),
    )
    if broadcast_points:
        cand_points = F.broadcast(cand_points)

    pages_side = pages.select(
        "cell_id",
        F.col(key_col).alias("_url"),
        F.col("x").alias("_qx"),
        F.col("y").alias("_qy"),
        F.col("is_panoramic").alias("_pano"),
    )

    dist = F.sqrt(
        (F.col("_px") - F.col("_qx")) * (F.col("_px") - F.col("_qx"))
        + (F.col("_py") - F.col("_qy")) * (F.col("_py") - F.col("_qy"))
    )
    cand = (
        pages_side.join(cand_points, "cell_id")
        .withColumn("_dist", dist)
        # strict <: cKDTree's distance_upper_bound is an open bound
        .where(F.col("_dist") < F.lit(bound))
        .select("point_id", "_dist", "_url", "_pano")
    )

    return _snap_reduce_join(points, cand, key_is_string, key_col, reduce, salt, materialize)


def _snap_reduce_join(
    points: DataFrame,
    cand: DataFrame,
    key_is_string: bool,
    key_col: str,
    reduce: str,
    salt: int | None,
    materialize: bool = True,
) -> DataFrame:
    """Shared k=1 reduce + miss-preserving join-back (used by the
    square-cell and hex-cell snap joins — the candidate generation is
    the only part that differs)."""
    best_struct = F.struct(
        F.col("_dist").alias("dist"),
        F.col("_url").alias("url"),
        F.col("_pano").alias("pano"),
    )
    if reduce == "two_phase":
        # The DEFAULT reduce, in two phases:
        # (1) min(dist) per point — pure primitive, hash partial+final;
        # (2) min(struct) tie-break only over rows matching the winning
        #     distance (>=1 per point, ~1 in practice).
        # Rationale: the single-phase min(struct) (the "sort_exact"
        # branch below) has no mutable primitive buffer, so Spark runs
        # it as SortAggregate — a per-partition sort of ALL candidates.
        # Measured (r2, local[32]): on an adversarial hot cell (4M
        # pages + 50 points in ONE z14 cell, 250 m bound -> ~200M
        # candidate pairs) two_phase runs 32.6 s vs sort_exact 83.8 s
        # (2.6x); on SPARSE candidates the ranking flips (1.7 s vs
        # 3.4 s at 8M uniformly-spread pages) because materializing the
        # candidate set adds a constant job boundary — callers with
        # provably sparse candidates may pass reduce="sort_exact".
        #
        # Lifecycle: the candidate set is persisted so the pages scan
        # runs exactly once across the two phases, the (small, winners-
        # only) ``best`` frame is eagerly localCheckpoint-ed to cut the
        # lineage back to cand, and cand is unpersisted BEFORE this
        # function returns — repeated snaps in one long-lived session
        # leave the CacheManager empty (pytest-asserted in
        # tests/test_knn.py), no call-site clearCache() convention
        # needed. The checkpointed winners (<= one row per point) are
        # reclaimed by Spark's ContextCleaner when the returned
        # DataFrame is dropped. Note this makes the snap compute at
        # CALL time rather than first-action time.
        # materialize=False returns the fully LAZY two-phase plan (no
        # persist, no checkpoint) — for plan inspection (EXPLAIN audit)
        # or callers managing their own lifecycle; an action on it
        # computes the candidate set twice (md + tie-break branches).
        if materialize:
            # r7: eager localCheckpoint instead of persist — raw row
            # blocks, no columnar cache build (measured ~4x the block
            # write elsewhere), nothing registered in the CacheManager,
            # blocks reclaimed by the ContextCleaner when `best` (and
            # with it this lineage) is dropped. Same one-scan
            # guarantee: both reduce phases read the blocks. DISK_ONLY:
            # the blocks are written once and read twice back-to-back
            # (page-cache-speed locally) and never squat on executor
            # storage memory that the reduce itself needs.
            from pyspark import StorageLevel

            cand = cand.localCheckpoint(
                eager=True, storageLevel=StorageLevel.DISK_ONLY
            )
        md = cand.groupBy("point_id").agg(F.min("_dist").alias("_md"))
        best = (
            cand.join(F.broadcast(md), "point_id")
            .where(F.col("_dist") == F.col("_md"))
            .groupBy("point_id")
            .agg(F.min(best_struct).alias("best"))
        )
        if materialize:
            best = best.localCheckpoint(eager=True)
    elif salt:
        # Explicit two-stage salted reduce for adversarially hot cells:
        # pre-reduce per (point_id, salt bucket), then final reduce.
        pre = (
            cand.withColumn("_salt", F.pmod(F.hash("_url"), F.lit(int(salt))))
            .groupBy("point_id", "_salt")
            .agg(F.min(best_struct).alias("best"))
        )
        best = pre.groupBy("point_id").agg(F.min("best").alias("best"))
    else:
        best = cand.groupBy("point_id").agg(F.min(best_struct).alias("best"))

    out = points.join(F.broadcast(best), "point_id", "left")
    # reference miss semantics: image_id == "" (empty string, NOT null,
    # osmnx_road_network.py:150) for string keys; null for numeric keys
    miss_key = F.lit("") if key_is_string else F.lit(None)
    out_key = "page_url" if key_is_string else f"page_{key_col}"
    return (
        out.withColumn(out_key, F.coalesce(F.col("best.url"), miss_key))
        .withColumn("snap_distance", F.col("best.dist"))
        # reference: is_panoramic astype(bool) maps None -> False
        .withColumn("is_panoramic", F.coalesce(F.col("best.pano"), F.lit(False)))
        .drop("best")
    )


def knn_snap_hex(
    points: DataFrame,
    pages: DataFrame,
    max_distance: float = 50.0,
    hex_size: float | None = None,
    salt: int | None = None,
    key_col: str = "url",
    reduce: str = "two_phase",
    materialize: bool = True,
) -> DataFrame:
    """The hex-index variant of ``knn_snap`` (SURVEY J2 H3 variant):
    identical semantics and output, candidate pruning via the 7-cell
    hex ring instead of the 3x3 square ring.

    Both sides get a packed hex cell from (x, y) — pages via the
    vectorized pandas UDF once per row (the shape an h3.latlng_to_cell
    wrapper takes), points exploded to cell + 6 neighbors by PURE
    Column adds (packing is linear in the axial coords). One-ring
    containment holds when ``hex_size >= max_distance/2`` (see
    geo/hexgrid docstring); the default pins hex_size to the bound.
    """
    from ..geo.hexgrid import hex_neighbors_col, make_hex_cell_udf

    bound = max_distance / 2.0
    size = hex_size if hex_size is not None else bound
    if size < bound:
        raise ValueError("hex_size must cover the snap bound (one-ring guarantee)")
    key_is_string = dict(pages.dtypes)[key_col] == "string"
    hex_udf = make_hex_cell_udf(size)

    cand_points = F.broadcast(
        points.withColumn("_hc", hex_udf(F.col("x"), F.col("y"))).select(
            "point_id",
            F.col("x").alias("_px"),
            F.col("y").alias("_py"),
            F.explode(hex_neighbors_col(F.col("_hc"))).alias("cell_id"),
        )
    )
    pages_side = pages.select(
        hex_udf(F.col("x"), F.col("y")).alias("cell_id"),
        F.col(key_col).alias("_url"),
        F.col("x").alias("_qx"),
        F.col("y").alias("_qy"),
        F.col("is_panoramic").alias("_pano"),
    )
    dist = F.sqrt(
        (F.col("_px") - F.col("_qx")) * (F.col("_px") - F.col("_qx"))
        + (F.col("_py") - F.col("_qy")) * (F.col("_py") - F.col("_qy"))
    )
    cand = (
        pages_side.join(cand_points, "cell_id")
        .withColumn("_dist", dist)
        .where(F.col("_dist") < F.lit(bound))
        .select("point_id", "_dist", "_url", "_pano")
    )
    return _snap_reduce_join(points, cand, key_is_string, key_col, reduce, salt, materialize)


_GROUPED_BEST = StructType(
    [
        StructField("point_id", LongType()),
        StructField("_dist", DoubleType()),
        StructField("_url", StringType()),
        StructField("_pano", BooleanType()),
    ]
)


def knn_snap_grouped(
    points: DataFrame,
    pages: DataFrame,
    max_distance: float = 50.0,
    zoom: int = 14,
) -> DataFrame:
    """The grouped-map form of the snap join (SURVEY.md J1 option (b)):
    shuffle candidate pairs by cell, run a vectorized NumPy reduce per
    cell inside ``applyInPandas`` (the engine twin of the reference's
    per-tile cKDTree batching, osmnx_road_network.py:98-137), then a
    global min re-reduce across the 3x3 cells each point probed.

    Numerically identical to ``knn_snap`` (tested); exists because some
    per-group kernels genuinely need imperative NumPy (e.g. a true
    KD-tree for k>1, per-cell models) — this is the pattern to copy.
    """
    bound = max_distance / 2.0

    cand_points = F.broadcast(
        points.select(
            "point_id",
            F.col("x").alias("_px"),
            F.col("y").alias("_py"),
            F.explode(
                neighbor_cells_col(F.col("tile_x"), F.col("tile_y"), zoom)
            ).alias("cell_id"),
        )
    )
    pairs = pages.select(
        "cell_id",
        F.col("url").alias("_url"),
        F.col("x").alias("_qx"),
        F.col("y").alias("_qy"),
        F.col("is_panoramic").alias("_pano"),
    ).join(cand_points, "cell_id")

    def _cell_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        d = np.hypot(
            pdf["_px"].to_numpy() - pdf["_qx"].to_numpy(),
            pdf["_py"].to_numpy() - pdf["_qy"].to_numpy(),
        )
        pdf = pdf.assign(_dist=d)
        pdf = pdf[pdf["_dist"] < bound]
        if pdf.empty:
            return pd.DataFrame(columns=["point_id", "_dist", "_url", "_pano"])
        best = (
            pdf.sort_values(["point_id", "_dist", "_url"], kind="mergesort")
            .groupby("point_id", as_index=False)
            .first()
        )
        return best[["point_id", "_dist", "_url", "_pano"]]

    per_cell = pairs.groupBy("cell_id").applyInPandas(_cell_kernel, _GROUPED_BEST)
    best = per_cell.groupBy("point_id").agg(
        F.min(
            F.struct(
                F.col("_dist").alias("dist"),
                F.col("_url").alias("url"),
                F.col("_pano").alias("pano"),
            )
        ).alias("best")
    )
    out = points.join(F.broadcast(best), "point_id", "left")
    return (
        out.withColumn("page_url", F.coalesce(F.col("best.url"), F.lit("")))
        .withColumn("snap_distance", F.col("best.dist"))
        .withColumn("is_panoramic", F.coalesce(F.col("best.pano"), F.lit(False)))
        .drop("best")
    )
