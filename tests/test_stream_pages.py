"""Incremental snap maintenance: streaming folds equal the batch snap."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from streetview_naturevisibility_spark.operators.knn import knn_snap
from streetview_naturevisibility_spark.operators.sampling import sample_points
from streetview_naturevisibility_spark.operators.tiling import prepare_pages
from streetview_naturevisibility_spark.streaming.pages import (
    _fold_best,
    read_snap_state,
    stream_snap_pages,
)


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
        assert read_snap_state(spark, state).count() == points.count()

        second.write.mode("append").parquet(src)
        stream_snap_pages(spark, src, points, state, ckpt)

        got = (
            read_snap_state(spark, state)
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


class TestStateCrashSafety:
    def test_torn_write_never_drops_committed_state(self, spark, tmp_path):
        """A crash between deleting old state and committing new state
        must not reset the stream to empty: readers take the highest
        COMMITTED version, and an uncommitted (torn) newer dir is
        ignored, then overwritten by the replay."""
        state = str(tmp_path / "state")
        b1 = spark.createDataFrame(
            [(1, "u1", 5.0, False), (2, "", None, False)],
            "point_id: long, page_url: string, snap_distance: double, is_panoramic: boolean",
        )
        _fold_best(spark, b1, state)
        assert read_snap_state(spark, state).count() == 2

        # simulate a torn write of the NEXT version: dir exists, no _SUCCESS
        torn = os.path.join(state, "v=1")
        os.makedirs(torn, exist_ok=True)
        with open(os.path.join(torn, "part-garbage.parquet"), "w") as f:
            f.write("not parquet")
        got = read_snap_state(spark, state).orderBy("point_id").collect()
        assert [r.point_id for r in got] == [1, 2]  # still the v=0 commit

        # replay of the batch overwrites the torn dir and commits v=1
        b2 = spark.createDataFrame(
            [(2, "u2", 3.0, True)],
            "point_id: long, page_url: string, snap_distance: double, is_panoramic: boolean",
        )
        _fold_best(spark, b2, state)
        got = {r.point_id: r for r in read_snap_state(spark, state).collect()}
        assert got[1].page_url == "u1"
        assert got[2].page_url == "u2" and got[2].snap_distance == 3.0
        # old version retired after the durable commit
        assert not os.path.exists(os.path.join(state, "v=0"))

    def test_fresh_state_raises_not_silently_empty(self, spark, tmp_path):
        with pytest.raises(FileNotFoundError):
            read_snap_state(spark, str(tmp_path / "nope"))
