"""Incremental snap maintenance: streaming folds equal the batch snap."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from streetview_naturevisibility_spark.operators.knn import knn_snap
from streetview_naturevisibility_spark.operators.sampling import sample_points
from streetview_naturevisibility_spark.operators.tiling import prepare_pages
from streetview_naturevisibility_spark.streaming.pages import stream_snap_pages


class TestStreamSnap:
    def test_incremental_equals_batch(self, spark, fixture_dir, tmp_path):
        roads = spark.read.parquet(os.path.join(fixture_dir, "roads.parquet"))
        points = sample_points(roads, spacing=50)
        raw = spark.read.parquet(os.path.join(fixture_dir, "web_pages.parquet")).drop(
            "lon", "lat"
        )
        pages = prepare_pages(raw, keep_text=False).cache()

        # ship pages in two increments (files land over time)
        src = str(tmp_path / "pages_stream")
        first = pages.where(F.col("url").substr(-1, 1).isin("0", "1", "2", "3", "4"))
        second = pages.subtract(first)
        first.write.mode("overwrite").parquet(src)

        state = str(tmp_path / "snap_state")
        ckpt = str(tmp_path / "ckpt")
        stream_snap_pages(spark, src, points, state, ckpt)
        # partial state covers every point (misses included)
        assert spark.read.parquet(state).count() == points.count()

        second.write.mode("append").parquet(src)
        stream_snap_pages(spark, src, points, state, ckpt)

        got = (
            spark.read.parquet(state)
            .orderBy("point_id")
            .toPandas()
        )
        exp = (
            knn_snap(points, pages, max_distance=50.0)
            .orderBy("point_id")
            .select("point_id", "page_url", "snap_distance", "is_panoramic")
            .toPandas()
        )
        assert (got["point_id"].to_numpy() == exp["point_id"].to_numpy()).all()
        assert (got["page_url"].to_numpy() == exp["page_url"].to_numpy()).all()
        a = got["snap_distance"].to_numpy(dtype=float)
        b = exp["snap_distance"].to_numpy(dtype=float)
        assert (np.isnan(a) == np.isnan(b)).all()
        assert np.allclose(a[~np.isnan(a)], b[~np.isnan(b)])
        assert (got["is_panoramic"].to_numpy() == exp["is_panoramic"].to_numpy()).all()
