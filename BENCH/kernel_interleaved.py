"""Interleaved snap-kernel A/B: two_phase vs sort_exact at the bench
shape, best-of-N in ONE session with alternating order — the protocol
for attributing BENCH deltas to host-throttle waves vs real plan cost
(BENCH_r02 showed snap_kernel -26% vs r1 while everything else
improved; this measures both variants inside the same host window).

Usage: python BENCH/kernel_interleaved.py [n_pages] [rounds]
Writes BENCH/KERNEL_LAST.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F

from bench import SNAP_BENCH_RADIUS, synthetic_pages
from streetview_naturevisibility_spark.geo.cells import zoom_for_radius
from streetview_naturevisibility_spark.geo.mercator import tile_x_col, tile_y_col
from streetview_naturevisibility_spark.operators.knn import knn_snap
from streetview_naturevisibility_spark.session import get_spark
from streetview_naturevisibility_spark.sources import derived as D


def run_once(spark, sf_dir: str, n_pages: int, reduce: str) -> float:
    zoom = zoom_for_radius(SNAP_BENCH_RADIUS, D.LAT0)
    points = (
        D.spark_points(spark, sf_dir)
        .drop("tile_x", "tile_y")
        .withColumn("tile_x", tile_x_col(F.col("lon"), zoom))
        .withColumn("tile_y", tile_y_col(F.col("lat"), zoom))
    )
    pages = synthetic_pages(spark, n_pages, zoom)
    t0 = time.time()
    snapped = knn_snap(
        points,
        pages,
        max_distance=2 * SNAP_BENCH_RADIUS,
        zoom=zoom,
        key_col="doc_id",
        reduce=reduce,
    )
    snapped.groupBy("road_id").agg(
        F.count(F.lit(1)).alias("n"), F.avg("snap_distance").alias("d")
    ).collect()
    dt = time.time() - t0
    spark.catalog.clearCache()
    return dt


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(
        app_name="svnv-kernel-ab", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm both variants once (JIT + shuffle service), untimed
    run_once(spark, sf_dir, n_pages, "two_phase")
    run_once(spark, sf_dir, n_pages, "sort_exact")

    results: dict[str, list[float]] = {"two_phase": [], "sort_exact": []}
    for r in range(rounds):
        # alternate order so a host wave penalizes both variants evenly
        order = ["two_phase", "sort_exact"] if r % 2 == 0 else ["sort_exact", "two_phase"]
        for variant in order:
            results[variant].append(run_once(spark, sf_dir, n_pages, variant))

    best = {k: min(v) for k, v in results.items()}
    out = {
        "metric": "snap_kernel_ab_best_sec",
        "n_pages": n_pages,
        "rounds": rounds,
        "two_phase_all": [round(x, 3) for x in results["two_phase"]],
        "sort_exact_all": [round(x, 3) for x in results["sort_exact"]],
        "two_phase_best": round(best["two_phase"], 3),
        "sort_exact_best": round(best["sort_exact"], 3),
        "two_phase_pps": round(n_pages / best["two_phase"]),
        "sort_exact_pps": round(n_pages / best["sort_exact"]),
        "cpus": int(cpus),
    }
    with open(os.path.join(_REPO, "BENCH", "KERNEL_LAST.md"), "w") as f:
        f.write(
            "# Snap-kernel interleaved A/B (latest run)\n\n"
            f"n_pages={n_pages}, rounds={rounds}, local[{cpus}], sf_dir={sf_dir}\n\n"
            f"| variant | runs (s) | best (s) | pages/s |\n|---|---|---|---|\n"
            f"| two_phase | {out['two_phase_all']} | {out['two_phase_best']} | {out['two_phase_pps']:,} |\n"
            f"| sort_exact | {out['sort_exact_all']} | {out['sort_exact_best']} | {out['sort_exact_pps']:,} |\n"
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
