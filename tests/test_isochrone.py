"""Isochrone union (F6) vs an independent brute-force oracle."""

from collections import deque

import numpy as np
import pytest
from pyspark.sql import functions as F

from streetview_naturevisibility_spark.operators.isochrone import (
    isochrone_area,
    isochrone_cells,
)


def _oracle_iso(pois, nodes, edges, buffer_dist, edge_buff, grid):
    """Scalar re-implementation: plain-dict Dijkstra, per-cell scalar
    point-segment distance, deque flood fill. Returns {poi_id: set}."""
    xy = {n: (x, y) for n, x, y in nodes}

    def seg_dist(px, py, a, b):
        ax, ay = a
        bx, by = b
        dx, dy = bx - ax, by - ay
        L2 = dx * dx + dy * dy
        t = 0.0 if L2 == 0 else max(0.0, min(1.0, ((px - ax) * dx + (py - ay) * dy) / L2))
        cx, cy = ax + t * dx, ay + t * dy
        return ((px - cx) ** 2 + (py - cy) ** 2) ** 0.5

    out = {}
    for poi_id, px, py in pois:
        center = min(xy, key=lambda n: (xy[n][0] - px) ** 2 + (xy[n][1] - py) ** 2)
        # dijkstra
        dist = {center: 0.0}
        todo = {center}
        while todo:
            u = min(todo, key=lambda n: dist[n])
            todo.remove(u)
            for a, b in edges:
                for s, t in ((a, b), (b, a)):
                    if s != u:
                        continue
                    w = ((xy[s][0] - xy[t][0]) ** 2 + (xy[s][1] - xy[t][1]) ** 2) ** 0.5
                    nd = dist[u] + w
                    if nd <= buffer_dist and nd < dist.get(t, float("inf")):
                        dist[t] = nd
                        todo.add(t)
        segs = [(a, b) for a, b in edges if a in dist and b in dist]
        if not segs:
            out[poi_id] = set()
            continue
        all_x = [xy[n][0] for e in segs for n in e]
        all_y = [xy[n][1] for e in segs for n in e]
        gx0 = int(np.floor((min(all_x) - edge_buff) / grid))
        gy0 = int(np.floor((min(all_y) - edge_buff) / grid))
        gx1 = int(np.ceil((max(all_x) + edge_buff) / grid))
        gy1 = int(np.ceil((max(all_y) + edge_buff) / grid))
        cells = set()
        for gx in range(gx0, gx1 + 1):
            for gy in range(gy0, gy1 + 1):
                cx, cy = (gx + 0.5) * grid, (gy + 0.5) * grid
                if any(seg_dist(cx, cy, xy[a], xy[b]) <= edge_buff for a, b in segs):
                    cells.add((gx, gy))
        # exterior fill via BFS from outside the frame
        outside = set()
        frame = [(gx, gy) for gx in range(gx0 - 1, gx1 + 2) for gy in (gy0 - 1, gy1 + 1)]
        frame += [(gx, gy) for gy in range(gy0 - 1, gy1 + 2) for gx in (gx0 - 1, gx1 + 1)]
        dq = deque(frame)
        outside.update(frame)
        while dq:
            gx, gy = dq.popleft()
            for nx, ny in ((gx + 1, gy), (gx - 1, gy), (gx, gy + 1), (gx, gy - 1)):
                if not (gx0 - 1 <= nx <= gx1 + 1 and gy0 - 1 <= ny <= gy1 + 1):
                    continue
                if (nx, ny) in outside or (nx, ny) in cells:
                    continue
                outside.add((nx, ny))
                dq.append((nx, ny))
        filled = {
            (gx, gy)
            for gx in range(gx0, gx1 + 1)
            for gy in range(gy0, gy1 + 1)
            if (gx, gy) not in outside
        }
        out[poi_id] = filled
    return out


NODES = [
    (0, 0.0, 0.0),
    (1, 200.0, 0.0),
    (2, 200.0, 200.0),
    (3, 0.0, 200.0),
    (4, 400.0, 0.0),
    (5, 1200.0, 0.0),  # far: outside buffer_dist from poi 0's component walk
]
EDGES = [(0, 1), (1, 2), (2, 3), (3, 0), (1, 4), (4, 5)]
POIS = [(10, 10.0, -5.0), (11, 390.0, 20.0)]


class TestIsochrone:
    @pytest.fixture(scope="class")
    def frames(self, spark):
        nodes = spark.createDataFrame(NODES, "node_id: long, x: double, y: double")
        edges = spark.createDataFrame(EDGES, "u: long, v: long")
        pois = spark.createDataFrame(POIS, "poi_id: long, x: double, y: double")
        return pois, nodes, edges

    def test_matches_bruteforce_oracle(self, spark, frames):
        pois, nodes, edges = frames
        got = isochrone_cells(
            pois, nodes, edges, buffer_dist=500.0, edge_buff=25.0, grid=10.0
        ).toPandas()
        truth = _oracle_iso(POIS, NODES, EDGES, 500.0, 25.0, 10.0)
        for pid in (10, 11):
            g = {
                (r.gx, r.gy)
                for r in got[got.poi_id == pid].itertuples()
            }
            assert g == truth[pid], f"poi {pid}: {len(g)} vs {len(truth[pid])}"

    def test_hole_filling(self, spark, frames):
        """The square loop 0-1-2-3 encloses a region farther than
        edge_buff from every edge; Polygon(exterior) semantics fill it."""
        pois, nodes, edges = frames
        got = isochrone_cells(
            pois, nodes, edges, buffer_dist=500.0, edge_buff=25.0, grid=10.0
        ).toPandas()
        cells = {(r.gx, r.gy) for r in got[got.poi_id == 10].itertuples()}
        # center of the loop: (100, 100) -> cell (9..10, 9..10), ~70 m
        # from every edge, present only because the hole is filled
        assert (9, 9) in cells and (10, 10) in cells

    def test_ego_graph_bound(self, spark, frames):
        """Node 5 sits 1000 m beyond node 4 — past buffer_dist for poi
        10 (shortest path 400 + 800? no: 0->1=200, 1->4=200, 4->5=800 >
        500 total), so the 4-5 edge must not contribute cells."""
        pois, nodes, edges = frames
        got = isochrone_cells(
            pois, nodes, edges, buffer_dist=500.0, edge_buff=25.0, grid=10.0
        ).toPandas()
        cells = got[got.poi_id == 10]
        assert cells.gx.max() <= np.ceil((400.0 + 25.0) / 10.0)

    def test_area_rollup(self, spark, frames):
        pois, nodes, edges = frames
        iso = isochrone_cells(
            pois, nodes, edges, buffer_dist=500.0, edge_buff=25.0, grid=10.0
        )
        area = isochrone_area(iso, grid=10.0).toPandas().set_index("poi_id")
        truth = _oracle_iso(POIS, NODES, EDGES, 500.0, 25.0, 10.0)
        for pid in (10, 11):
            assert area.loc[pid, "n_cells"] == len(truth[pid])
            assert area.loc[pid, "area_m2"] == pytest.approx(len(truth[pid]) * 100.0)
