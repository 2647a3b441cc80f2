"""Property-based tests (hypothesis) over the pure NumPy kernels —
SURVEY.md §5.5. No Spark in the loop: these run per-example."""

import numpy as np
from hypothesis import given, settings, strategies as st

from streetview_naturevisibility_spark.functions.labels import (
    find_peaks,
    get_gvi,
    process_labels,
)
from streetview_naturevisibility_spark.geo.polygon import (
    interpolate_along,
    linestring_length,
    points_in_polygon,
    regular_polygon,
)
from streetview_naturevisibility_spark.geo.utm import lonlat_to_utm, utm_to_lonlat

settings.register_profile("fast", max_examples=25, deadline=None)
settings.load_profile("fast")


coords_strategy = st.lists(
    st.tuples(
        st.floats(min_value=-1000, max_value=1000),
        st.floats(min_value=-1000, max_value=1000),
    ),
    min_size=2,
    max_size=8,
).map(lambda pts: np.array(pts, dtype=np.float64))


class TestInterpolateProperties:
    @given(coords_strategy)
    def test_vertices_recovered_at_cumulative_lengths(self, coords):
        seg = np.diff(coords, axis=0)
        cum = np.concatenate([[0.0], np.cumsum(np.sqrt((seg**2).sum(axis=1)))])
        pts = interpolate_along(coords, cum)
        assert np.allclose(pts, coords, atol=1e-6)

    @given(coords_strategy, st.floats(min_value=0.0, max_value=1.0))
    def test_interpolated_point_lies_within_bbox(self, coords, frac):
        total = linestring_length(coords)
        p = interpolate_along(coords, np.array([frac * total]))[0]
        assert coords[:, 0].min() - 1e-9 <= p[0] <= coords[:, 0].max() + 1e-9
        assert coords[:, 1].min() - 1e-9 <= p[1] <= coords[:, 1].max() + 1e-9


class TestPipProperties:
    @given(
        st.floats(min_value=-100, max_value=100),
        st.floats(min_value=-100, max_value=100),
        st.floats(min_value=1.0, max_value=50.0),
        st.integers(min_value=3, max_value=9),
        st.integers(min_value=0, max_value=10_000),
    )
    def test_raycast_matches_halfplanes_on_convex(self, cx, cy, r, sides, seed):
        poly = regular_polygon(cx, cy, r, sides, phase=0.17)
        rng = np.random.RandomState(seed)
        px = cx + (rng.rand(200) - 0.5) * 4 * r
        py = cy + (rng.rand(200) - 0.5) * 4 * r
        got = points_in_polygon(px, py, poly)
        # half-plane conjunction for CCW convex polygon
        m = len(poly)
        exp = np.ones(200, dtype=bool)
        margin = np.full(200, np.inf)
        for i in range(m):
            x1, y1 = poly[i]
            x2, y2 = poly[(i + 1) % m]
            cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
            exp &= cross > 0
            margin = np.minimum(margin, np.abs(cross) / np.hypot(x2 - x1, y2 - y1))
        # ignore points within 1e-9 of an edge (tie-break territory)
        clear = margin > 1e-9
        assert (got[clear] == exp[clear]).all()


class TestUTMProperties:
    @given(
        st.floats(min_value=0.5, max_value=5.5),
        st.floats(min_value=-79, max_value=83),
    )
    def test_round_trip(self, dlon, lat):
        lon = 3.0 + dlon - 3.0  # inside zone 31 neighborhood
        e, n = lonlat_to_utm(np.array([lon]), np.array([lat]), 31)
        lon2, lat2 = utm_to_lonlat(e, n, 31)
        assert abs(lon2[0] - lon) < 1e-8
        assert abs(lat2[0] - lat) < 1e-8


class TestPeaksProperties:
    @given(
        st.lists(st.integers(min_value=0, max_value=50), min_size=3, max_size=60),
        st.integers(min_value=1, max_value=10),
    )
    def test_distance_constraint_holds(self, vals, distance):
        x = np.array(vals, dtype=float)
        peaks = find_peaks(x, distance=distance)
        if len(peaks) > 1:
            assert np.diff(peaks).min() >= distance
        # every peak is a genuine local max boundary-exclusive
        for p in peaks:
            assert 0 < p < len(x) - 1


class TestGviProperties:
    @given(
        st.lists(st.integers(min_value=0, max_value=18), min_size=16, max_size=400),
        st.booleans(),
        st.booleans(),
    )
    def test_flags_and_range(self, labels, pano, cut):
        g, p, m, e = process_labels(np.array(labels, dtype=np.int32), pano, cut)
        assert isinstance(m, bool) and isinstance(e, bool)
        if g is not None:
            assert 0.0 <= g <= 1.0
            assert m is False and e is False
        if pano and len(labels) >= 16 and not cut:
            # the 4-way-split panoramic path always produces a score
            # (reference returns GVI unconditionally, process_data.py:281)
            assert g is not None
        if pano and cut and g is None:
            # cut-by-road-centres on a degenerate narrow grid fails in
            # find_peaks (distance<1 ValueError) exactly like scipy in
            # the reference -> caught -> error row (process_data.py:298)
            assert (m, e) == (True, True)

    @given(st.lists(st.integers(min_value=0, max_value=18), min_size=1, max_size=50))
    def test_gvi_is_vegetation_fraction(self, labels):
        seg = np.array(labels, dtype=np.int32).reshape(1, -1)
        assert get_gvi([seg]) == (seg == 8).sum() / seg.size
