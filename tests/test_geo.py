"""Unit tests for the pure-math geo kernels (no Spark needed)."""

import numpy as np
import pytest

from streetview_naturevisibility_spark.geo import utm
from streetview_naturevisibility_spark.geo.mercator import tile_xy_np
from streetview_naturevisibility_spark.geo.cells import pack_cell_py
from streetview_naturevisibility_spark.geo.polygon import (
    interpolate_along,
    linestring_length,
    parse_wkt_coords,
    points_in_polygon,
    polygon_area,
    regular_polygon,
)


class TestUTM:
    def test_central_meridian_easting_exact(self):
        e, n = utm.lonlat_to_utm(np.array([3.0]), np.array([52.0]), zone=31)
        assert e[0] == pytest.approx(500000.0, abs=1e-6)

    def test_meridian_arc_against_numeric_integration(self):
        # Independent oracle: northing on the central meridian equals
        # k0 * (numerically integrated meridian arc).
        for lat in (10.0, 45.0, 52.0, 70.0):
            _, n = utm.lonlat_to_utm(np.array([3.0]), np.array([lat]), zone=31)
            m = utm.meridian_arc_numeric(lat)
            assert n[0] == pytest.approx(0.9996 * m, abs=1e-4)

    def test_round_trip(self):
        rng = np.random.RandomState(7)
        lon = 3.0 + rng.rand(200) * 3.0  # within zone 31
        lat = 45.0 + rng.rand(200) * 15.0
        e, n = utm.lonlat_to_utm(lon, lat, 31)
        lon2, lat2 = utm.utm_to_lonlat(e, n, 31)
        assert np.abs(lon2 - lon).max() < 1e-9
        assert np.abs(lat2 - lat).max() < 1e-9

    def test_scale_factor_on_central_meridian(self):
        # dN/dphi on the central meridian = k0 * M(phi)
        lat = 52.0
        d = 1e-4
        _, n1 = utm.lonlat_to_utm(np.array([3.0]), np.array([lat - d]), 31)
        _, n2 = utm.lonlat_to_utm(np.array([3.0]), np.array([lat + d]), 31)
        m_radius = 6378137.0 * (1 - 0.00669437999014) / (
            1 - 0.00669437999014 * np.sin(np.radians(lat)) ** 2
        ) ** 1.5
        deriv = (n2[0] - n1[0]) / np.radians(2 * d)
        assert deriv == pytest.approx(0.9996 * m_radius, rel=1e-6)


class TestMercatorTiles:
    def test_known_tiles(self):
        # mercantile.tile(0, 0, 14) == (8192, 8192)
        x, y = tile_xy_np(np.array([0.0]), np.array([0.0]))
        assert (x[0], y[0]) == (8192, 8192)
        # Amsterdam (4.9, 52.37) at z14: x = floor((4.9/360+0.5)*16384) = 8415
        x, y = tile_xy_np(np.array([4.9]), np.array([52.37]))
        assert x[0] == int((4.9 / 360 + 0.5) * 16384)
        lat = np.radians(52.37)
        yref = int((0.5 - np.arcsinh(np.tan(lat)) / (2 * np.pi)) * 16384)
        assert y[0] == yref

    def test_clamping(self):
        x, y = tile_xy_np(np.array([-180.0, 180.0]), np.array([89.9, -89.9]))
        assert x[0] == 0 and x[1] == 16383
        assert y[0] == 0 and y[1] == 16383

    def test_pack_roundtrip(self):
        cid = pack_cell_py(8415, 5384, 14)
        assert cid == (14 << 58) | (8415 << 29) | 5384


class TestPolygon:
    def test_wkt_roundtrip_and_length(self):
        coords = parse_wkt_coords("LINESTRING (0 0, 3 4, 3 10)")
        assert linestring_length(coords) == pytest.approx(11.0)

    def test_interpolate_matches_manual(self):
        coords = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0]])
        pts = interpolate_along(coords, np.array([0.0, 5.0, 10.0, 15.0, 20.0]))
        expected = np.array([[0, 0], [5, 0], [10, 0], [10, 5], [10, 10]], dtype=float)
        assert np.allclose(pts, expected)

    def test_pip_square_with_notch(self):
        poly = np.array([[0, 0], [10, 0], [10, 4], [7, 4], [7, 6], [10, 6], [10, 10], [0, 10]], dtype=float)
        px = np.array([5.0, 8.0, 8.0, 11.0])
        py = np.array([5.0, 5.0, 1.0, 5.0])
        inside = points_in_polygon(px, py, poly)
        assert inside.tolist() == [True, False, True, False]

    def test_area_hexagon(self):
        hexa = regular_polygon(0.0, 0.0, 2.0, 6)
        assert polygon_area(hexa) == pytest.approx(3 * np.sqrt(3) / 2 * 4, rel=1e-9)


class TestCellHierarchy:
    def test_parent_child_roundtrip(self):
        from streetview_naturevisibility_spark.geo.cells import (
            cell_children_py,
            pack_cell_py,
        )

        parent = pack_cell_py(100, 200, 10)
        kids = cell_children_py(parent)
        assert len(kids) == 4
        assert pack_cell_py(200, 400, 11) in kids
        assert pack_cell_py(201, 401, 11) in kids

    def test_parent_col_matches_py(self, spark):
        import pandas as pd
        from pyspark.sql import functions as F
        from streetview_naturevisibility_spark.geo.cells import (
            cell_parent_col,
            pack_cell_py,
        )

        cells = [pack_cell_py(x, y, 14) for x, y in [(0, 0), (8415, 5384), (16383, 16383)]]
        df = spark.createDataFrame(pd.DataFrame({"cell_id": cells}))
        got = [r[0] for r in df.select(cell_parent_col(F.col("cell_id"), 2)).collect()]
        exp = [pack_cell_py(x >> 2, y >> 2, 12) for x, y in [(0, 0), (8415, 5384), (16383, 16383)]]
        assert got == exp


class TestCellUnpackExact:
    def test_unpack_and_parent_exact_at_deep_zoom(self, spark):
        """Integer shift/mask unpack must be exact for every 29-bit tile
        index — double division rounds near 2^53 (zoom >= 24 with large
        tile_x)."""
        from pyspark.sql import functions as F

        from streetview_naturevisibility_spark.geo.cells import (
            cell_parent_col,
            pack_cell_py,
            unpack_cell_col,
        )

        cases = []
        for z in (14, 16, 24, 29):
            lim = (1 << z) - 1
            for x in (0, 1, lim // 2, lim - 1, lim):
                for y in (0, lim // 3, lim):
                    cases.append((pack_cell_py(x, y, z), z, x, y))
        df = spark.createDataFrame(cases, "cell_id: long, z: int, x: int, y: int")
        uz, ux, uy = unpack_cell_col(F.col("cell_id"))
        bad = (
            df.select("z", "x", "y", uz.alias("uz"), ux.alias("ux"), uy.alias("uy"))
            .where(
                (F.col("z") != F.col("uz"))
                | (F.col("x") != F.col("ux"))
                | (F.col("y") != F.col("uy"))
            )
            .count()
        )
        assert bad == 0
        for r in df.select(
            "cell_id", "z", "x", "y", cell_parent_col(F.col("cell_id"), 2).alias("p")
        ).collect():
            assert r.p == pack_cell_py(r.x >> 2, r.y >> 2, r.z - 2)
