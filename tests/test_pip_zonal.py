"""PIP join + zonal stats vs NumPy oracles (plumbing: the cell/bin
prefilter must not lose any candidate the exact kernel accepts)."""

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from streetview_naturevisibility_spark.fixtures.generate import (
    boundary_polygon,
    gen_roads,
    gen_web_pages,
    gen_ndvi_grid,
)
from streetview_naturevisibility_spark.geo.polygon import (
    dist_point_to_segments,
    parse_wkt_coords,
    points_in_polygon,
)
from streetview_naturevisibility_spark.geo.utm import lonlat_to_utm
from streetview_naturevisibility_spark.operators.pip import pip_join
from streetview_naturevisibility_spark.operators.sampling import sample_points
from streetview_naturevisibility_spark.operators.tiling import prepare_pages
from streetview_naturevisibility_spark.operators.zonal import zonal_histogram, zonal_mean
from tests.oracle import oracle_sample_points


@pytest.fixture(scope="module")
def pages_prepared(spark, fixture_dir):
    raw = spark.read.parquet(os.path.join(fixture_dir, "web_pages.parquet"))
    return prepare_pages(raw.drop("lon", "lat"), keep_text=False)


class TestPipJoin:
    def test_boundary_membership_matches_kernel(self, spark, fixture_dir, pages_prepared):
        polygons = spark.read.parquet(os.path.join(fixture_dir, "polygons.parquet"))
        boundary_only = polygons.where(F.col("polygon_id") == "boundary")
        got = (
            pip_join(pages_prepared, boundary_only)
            .select("url")
            .toPandas()["url"]
            .sort_values()
            .tolist()
        )
        pages = gen_web_pages(500)
        x, y = lonlat_to_utm(pages["lon"].to_numpy(), pages["lat"].to_numpy(), 31)
        inside = points_in_polygon(x, y, boundary_polygon())
        expected = sorted(pages["url"][inside].tolist())
        assert got == expected
        # the notch must actually reject some bbox-passing pages
        x0, y0, x1, y1 = 628000.0, 5802000.0, 632000.0, 5806000.0
        in_bbox = (x >= x0) & (x <= x1) & (y >= y0) & (y <= y1)
        assert in_bbox.sum() > inside.sum()

    def test_road_buffer_membership_matches_kernel(self, spark, fixture_dir, pages_prepared):
        polygons = spark.read.parquet(os.path.join(fixture_dir, "polygons.parquet"))
        buffers = polygons.where(F.col("kind") == "road_buffer")
        got = (
            pip_join(pages_prepared, buffers)
            .groupBy("polygon_id")
            .count()
            .toPandas()
            .set_index("polygon_id")["count"]
            .to_dict()
        )
        pages = gen_web_pages(500)
        x, y = lonlat_to_utm(pages["lon"].to_numpy(), pages["lat"].to_numpy(), 31)
        expected: dict[str, int] = {}
        for _, r in gen_roads(60).iterrows():
            coords = parse_wkt_coords(r.geometry_wkt)
            n = sum(
                1
                for px, py in zip(x, y)
                if dist_point_to_segments(px, py, coords) <= 25.0
            )
            if n:
                expected[f"buf_{r.road_id}"] = n
        assert got == expected


class TestZonal:
    def test_zonal_mean_matches_oracle(self, spark, fixture_dir):
        roads = spark.read.parquet(os.path.join(fixture_dir, "roads.parquet"))
        points = sample_points(roads, spacing=50)
        grid = spark.read.parquet(os.path.join(fixture_dir, "ndvi_grid.parquet"))
        got = (
            zonal_mean(points, grid, radius=25.0)
            .orderBy("point_id")
            .toPandas()
        )

        pts = oracle_sample_points(gen_roads(60), spacing=50)
        g = gen_ndvi_grid()
        gx = g["cx"].to_numpy()
        gy = g["cy"].to_numpy()
        gv = g["value"].to_numpy()
        exp_rows = []
        for _, p in pts.iterrows():
            d2 = (gx - p.x) ** 2 + (gy - p.y) ** 2
            sel = d2 <= 25.0**2
            if sel.any():
                exp_rows.append(
                    {
                        "point_id": int(p.point_id),
                        "mean_ndvi": round(float(np.maximum(gv[sel], 0.0).mean()), 3),
                    }
                )
        exp = pd.DataFrame(exp_rows)
        assert len(got) == len(exp)
        assert (got["point_id"].to_numpy() == exp["point_id"].to_numpy()).all()
        assert np.abs(got["mean_ndvi"].to_numpy() - exp["mean_ndvi"].to_numpy()).max() <= 0.001

    def test_clamp_before_mean(self, spark):
        # one point, two cells in range: values -0.5 and 0.5
        points = spark.createDataFrame(
            pd.DataFrame({"point_id": [0], "x": [0.0], "y": [0.0]})
        )
        grid = spark.createDataFrame(
            pd.DataFrame(
                {"cx": [1.0, 2.0], "cy": [0.0, 0.0], "value": [-0.5, 0.5]}
            )
        )
        got = zonal_mean(points, grid, radius=25.0).collect()[0]
        # clamp FIRST: mean(0, 0.5) = 0.25 (NOT mean(-0.5,0.5)=0.0)
        assert got.mean_ndvi == pytest.approx(0.25)

    def test_zonal_histogram(self, spark):
        points = spark.createDataFrame(
            pd.DataFrame({"point_id": [0], "x": [0.0], "y": [0.0]})
        )
        grid = spark.createDataFrame(
            pd.DataFrame(
                {
                    "cx": [1.0, 2.0, 3.0, 100.0],
                    "cy": [0.0, 0.0, 0.0, 0.0],
                    "value": [0.1, 0.1, 0.9, 0.9],
                }
            )
        ).withColumn("class", (F.col("value") > 0.5).cast("int"))
        got = (
            zonal_histogram(points, grid, "class", radius=25.0)
            .orderBy("class")
            .toPandas()
        )
        assert got["cell_count"].tolist() == [2, 1]
        assert got["pct"].tolist() == ["66.667%", "33.333%"]
