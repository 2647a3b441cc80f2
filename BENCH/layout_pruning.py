"""File-pruning evidence at bench scale (SURVEY §4.2, the Iceberg-style
min-max-skipping story the 100 TB design leans on): write the derived
pages table twice — Z-ordered (sources/layout.write_spatial_sorted:
repartitionByRange on the morton code + sortWithinPartitions) and
unsorted baseline — then run the same bbox query over both and record

  * files whose parquet-footer morton range intersects the bbox
    interval (the files a range-aware catalog actually schedules — the
    same footer math the pytest asserts disjointness with), and
  * measured wall time for the full query (Spark still lists every
    file, but row-group min/max stats on `_morton` skip the cold data).

Usage: python BENCH/layout_pruning.py [n_pages] [num_files] [rounds]
Writes BENCH/PRUNING_LAST.md and prints one JSON line.
Do not run other Spark work concurrently.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from bench import synthetic_pages
from streetview_naturevisibility_spark.geo.cells import zoom_for_radius
from streetview_naturevisibility_spark.session import get_spark
from streetview_naturevisibility_spark.sources import derived as D
from streetview_naturevisibility_spark.sources.layout import (
    bbox_morton_interval,
    write_spatial_sorted,
)


def _morton_file_ranges(path: str) -> list[tuple[int, int]]:
    ranges = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.read_metadata(f)
        los, his = [], []
        for i in range(md.num_row_groups):
            rg = md.row_group(i)
            j = next(
                j
                for j in range(rg.num_columns)
                if rg.column(j).path_in_schema == "_morton"
            )
            s = rg.column(j).statistics
            los.append(s.min)
            his.append(s.max)
        ranges.append((min(los), max(his)))
    return ranges


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    num_files = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark(
        app_name="svnv-pruning", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")

    zoom = zoom_for_radius(25.0, D.LAT0)
    pages = synthetic_pages(spark, n_pages, zoom).select(
        "doc_id", "tile_x", "tile_y", "x", "y"
    )

    base = tempfile.mkdtemp(prefix="layout_pruning_")
    zpath = os.path.join(base, "zorder")
    upath = os.path.join(base, "unsorted")
    write_spatial_sorted(pages, zpath, num_files=num_files)
    # unsorted baseline: same data, same file count, random layout —
    # still carries _morton so both sides run the IDENTICAL query
    from streetview_naturevisibility_spark.sources.layout import morton_col

    (
        pages.withColumn("_morton", morton_col(F.col("tile_x"), F.col("tile_y")))
        .repartition(num_files)
        .write.mode("overwrite")
        .parquet(upath)
    )

    # bbox: a small tile window around the data's min corner
    mins = pages.agg(
        F.min("tile_x").alias("tx"), F.min("tile_y").alias("ty")
    ).collect()[0]
    tx0, ty0 = int(mins.tx), int(mins.ty)
    tx1, ty1 = tx0 + 2, ty0 + 2
    lo, hi = bbox_morton_interval(tx0, tx1, ty0, ty1)

    def run(path: str) -> float:
        df = spark.read.parquet(path)
        t0 = time.time()
        (
            df.where(F.col("_morton").between(lo, hi))
            .where(F.col("tile_x").between(tx0, tx1))
            .where(F.col("tile_y").between(ty0, ty1))
            .agg(F.count(F.lit(1)).alias("n"), F.avg("x").alias("ax"))
            .collect()
        )
        return time.time() - t0

    # warm both paths (footer cache, codegen), then interleave
    run(zpath)
    run(upath)
    tz: list[float] = []
    tu: list[float] = []
    for r in range(rounds):
        if r % 2 == 0:
            tz.append(run(zpath))
            tu.append(run(upath))
        else:
            tu.append(run(upath))
            tz.append(run(zpath))

    zr = _morton_file_ranges(zpath)
    ur = _morton_file_ranges(upath)
    z_hit = sum(1 for (l, h) in zr if not (h < lo or l > hi))
    u_hit = sum(1 for (l, h) in ur if not (h < lo or l > hi))

    # row counts must agree (layout never changes results)
    nz = (
        spark.read.parquet(zpath)
        .where(F.col("tile_x").between(tx0, tx1) & F.col("tile_y").between(ty0, ty1))
        .count()
    )
    nu = (
        spark.read.parquet(upath)
        .where(F.col("tile_x").between(tx0, tx1) & F.col("tile_y").between(ty0, ty1))
        .count()
    )
    assert nz == nu, (nz, nu)

    out = {
        "metric": "zorder_pruning",
        "n_pages": n_pages,
        "num_files": num_files,
        "bbox_rows": nz,
        "zorder_files_hit": z_hit,
        "zorder_files_total": len(zr),
        "unsorted_files_hit": u_hit,
        "unsorted_files_total": len(ur),
        "zorder_best_sec": round(min(tz), 3),
        "unsorted_best_sec": round(min(tu), 3),
        "zorder_all": [round(x, 3) for x in tz],
        "unsorted_all": [round(x, 3) for x in tu],
        "speedup": round(min(tu) / min(tz), 2),
        "cpus": int(cpus),
    }
    with open(os.path.join(_REPO, "BENCH", "PRUNING_LAST.md"), "w") as f:
        f.write(
            "# Z-order file pruning at bench scale (latest run)\n\n"
            f"n_pages={n_pages}, num_files={num_files}, local[{cpus}], "
            f"bbox=({tx0}..{tx1})x({ty0}..{ty1}) -> {nz} rows\n\n"
            "| layout | files hit / total | runs (s) | best (s) |\n|---|---|---|---|\n"
            f"| z-ordered | {z_hit} / {len(zr)} | {out['zorder_all']} | {out['zorder_best_sec']} |\n"
            f"| unsorted | {u_hit} / {len(ur)} | {out['unsorted_all']} | {out['unsorted_best_sec']} |\n\n"
            f"speedup (best/best): {out['speedup']}x\n"
        )
    import shutil

    shutil.rmtree(base, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
