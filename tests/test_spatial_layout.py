"""Z-order layout: morton algebra vs scalar twin, interval covering
property, and real file-skipping evidence from parquet footers."""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from streetview_naturevisibility_spark.sources.layout import (
    bbox_morton_interval,
    morton_col,
    morton_scalar,
    write_spatial_sorted,
)


def test_morton_col_matches_scalar(spark):
    rng = np.random.RandomState(5)
    rows = [(int(x), int(y)) for x, y in rng.randint(0, 1 << 16, size=(300, 2))]
    df = spark.createDataFrame(rows, "x: long, y: long")
    got = df.select(morton_col(F.col("x"), F.col("y")).alias("m")).collect()
    for (x, y), r in zip(rows, got):
        assert r.m == morton_scalar(x, y)


def test_morton_interval_covers_bbox():
    rng = np.random.RandomState(9)
    for _ in range(50):
        x0, y0 = rng.randint(0, 1000, size=2)
        x1, y1 = x0 + rng.randint(0, 50), y0 + rng.randint(0, 50)
        lo, hi = bbox_morton_interval(int(x0), int(x1), int(y0), int(y1))
        xs = rng.randint(x0, x1 + 1, size=20)
        ys = rng.randint(y0, y1 + 1, size=20)
        for x, y in zip(xs, ys):
            assert lo <= morton_scalar(int(x), int(y)) <= hi


def test_zorder_write_skips_files(spark, tmp_path):
    """Files written by write_spatial_sorted must carry DISJOINT morton
    ranges (range partitioning) and tight per-file tile stats, and a
    small-bbox morton interval must prune most files."""
    from streetview_naturevisibility_spark.sources import derived as D

    pages = D.spark_pages(spark, "/root/testdata/sf0.001").select(
        "doc_id", "tile_x", "tile_y", "x", "y"
    )
    path = str(tmp_path / "zorder")
    write_spatial_sorted(pages, path, num_files=8)

    def col_stats(md, name):
        out = []
        for i in range(md.num_row_groups):
            rg = md.row_group(i)
            j = next(
                j for j in range(rg.num_columns)
                if rg.column(j).path_in_schema == name
            )
            out.append(rg.column(j).statistics)
        return out

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    assert len(files) >= 4
    ranges = []
    tx_spans = []
    for f in files:
        md = pq.read_metadata(f)
        ms = col_stats(md, "_morton")
        ranges.append((min(s.min for s in ms), max(s.max for s in ms)))
        txs = col_stats(md, "tile_x")
        tx_spans.append(max(s.max for s in txs) - min(s.min for s in txs))
    ranges.sort()
    # disjoint morton ranges across files
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2
    # tight per-file tile_x spans vs the global span
    full = pages.agg(
        (F.max("tile_x") - F.min("tile_x")).alias("span")
    ).collect()[0].span
    assert np.mean(tx_spans) < 0.8 * full

    # a small bbox prunes most files via the morton interval
    tx0 = pages.agg(F.min("tile_x")).collect()[0][0]
    ty0 = pages.agg(F.min("tile_y")).collect()[0][0]
    lo, hi = bbox_morton_interval(tx0, tx0 + 1, ty0, ty0 + 1)
    touched = sum(1 for (l, h) in ranges if not (h < lo or l > hi))
    assert touched <= len(ranges) // 2

    # correctness: bbox query over the z-ordered copy == over the source
    zdf = spark.read.parquet(path)
    bbox = (
        (F.col("tile_x").between(tx0, tx0 + 1))
        & (F.col("tile_y").between(ty0, ty0 + 1))
    )
    a = sorted(r.doc_id for r in zdf.where(bbox).select("doc_id").collect())
    b = sorted(r.doc_id for r in pages.where(bbox).select("doc_id").collect())
    assert a == b and len(a) > 0
