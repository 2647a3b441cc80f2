"""NumPy polygon / linestring kernels used inside Arrow pandas UDFs.

Replaces the reference's shapely calls (Point/LineString/Polygon ops:
modules/osmnx_road_network.py:55-66, modules/availability.py:218, 275)
with vectorized NumPy so the engine needs no native geo library on the
executors. WKT parsing is deliberately minimal (POLYGON / LINESTRING /
POINT, no holes) — fixtures only emit those.
"""

from __future__ import annotations

import numpy as np


def parse_wkt_coords(wkt: str) -> np.ndarray:
    """'LINESTRING (x y, x y, ...)' / 'POLYGON ((x y, ...))' -> (n,2)."""
    inner = wkt[wkt.index("(") :].strip().strip("()")
    pts = [p.strip() for p in inner.split(",") if p.strip()]
    out = np.empty((len(pts), 2), dtype=np.float64)
    for i, p in enumerate(pts):
        xs = p.split()
        out[i, 0] = float(xs[0])
        out[i, 1] = float(xs[1])
    return out


def coords_to_wkt(coords: np.ndarray, kind: str) -> str:
    body = ", ".join(f"{x:.6f} {y:.6f}" for x, y in coords)
    if kind.upper() == "POLYGON":
        return f"POLYGON (({body}))"
    return f"{kind.upper()} ({body})"


def linestring_length(coords: np.ndarray) -> float:
    d = np.diff(coords, axis=0)
    return float(np.sqrt((d**2).sum(axis=1)).sum())


def interpolate_along(coords: np.ndarray, distances: np.ndarray) -> np.ndarray:
    """Points at the given arc-length distances along a linestring.

    Matches shapely ``LineString.interpolate`` for in-range distances
    (reference sampling loop: modules/osmnx_road_network.py:61-63);
    distances beyond the end clamp to the final vertex.
    """
    seg = np.diff(coords, axis=0)
    seg_len = np.sqrt((seg**2).sum(axis=1))
    cum = np.concatenate([[0.0], np.cumsum(seg_len)])
    total = cum[-1]
    d = np.clip(np.asarray(distances, dtype=np.float64), 0.0, total)
    idx = np.clip(np.searchsorted(cum, d, side="right") - 1, 0, len(seg_len) - 1)
    denom = np.where(seg_len[idx] > 0, seg_len[idx], 1.0)
    frac = (d - cum[idx]) / denom
    return coords[idx] + seg[idx] * frac[:, None]


def points_in_polygon(px: np.ndarray, py: np.ndarray, poly: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray casting. ``poly`` is (m,2), closed or open.

    Boundary convention follows the classic crossing-number algorithm
    (points exactly on a horizontal-edge boundary may go either way —
    fixtures avoid degenerate on-edge points, as does real data).
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    if np.allclose(poly[0], poly[-1]):
        poly = poly[:-1]
    x1, y1 = poly[:, 0], poly[:, 1]
    x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
    inside = np.zeros(px.shape, dtype=bool)
    for i in range(len(x1)):
        cond = (y1[i] > py) != (y2[i] > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (x2[i] - x1[i]) * (py - y1[i]) / (y2[i] - y1[i]) + x1[i]
        inside ^= cond & (px < xint)
    return inside


def polygon_area(poly: np.ndarray) -> float:
    """Shoelace area (absolute)."""
    if np.allclose(poly[0], poly[-1]):
        poly = poly[:-1]
    x, y = poly[:, 0], poly[:, 1]
    return float(abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) / 2.0)


def dist_point_to_segments(px: float, py: float, coords: np.ndarray) -> float:
    """Min distance from one point to a polyline (used for buffer refine)."""
    a = coords[:-1]
    b = coords[1:]
    ab = b - a
    ap = np.array([px, py]) - a
    denom = (ab**2).sum(axis=1)
    denom = np.where(denom > 0, denom, 1.0)
    t = np.clip((ap * ab).sum(axis=1) / denom, 0.0, 1.0)
    proj = a + ab * t[:, None]
    d2 = ((np.array([px, py]) - proj) ** 2).sum(axis=1)
    return float(np.sqrt(d2.min()))


def dist_points_to_segments(
    px: np.ndarray, py: np.ndarray, coords: np.ndarray, chunk: int = 4096
) -> np.ndarray:
    """Min distance from MANY points to a polyline in one NumPy
    broadcast (the batch form of ``dist_point_to_segments`` — exact
    same math, no per-point Python loop). Chunked so the (points x
    segments) temporary stays bounded regardless of batch size."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    a = coords[:-1]  # (s, 2)
    ab = coords[1:] - a  # (s, 2)
    denom = (ab**2).sum(axis=1)
    denom = np.where(denom > 0, denom, 1.0)
    out = np.empty(len(px), dtype=np.float64)
    for lo in range(0, len(px), chunk):
        hi = min(lo + chunk, len(px))
        p = np.column_stack([px[lo:hi], py[lo:hi]])  # (m, 2)
        ap = p[:, None, :] - a[None, :, :]  # (m, s, 2)
        t = np.clip((ap * ab[None, :, :]).sum(axis=2) / denom[None, :], 0.0, 1.0)
        proj = a[None, :, :] + ab[None, :, :] * t[:, :, None]
        d2 = ((p[:, None, :] - proj) ** 2).sum(axis=2)
        out[lo:hi] = np.sqrt(d2.min(axis=1))
    return out


def regular_polygon(cx: float, cy: float, radius: float, sides: int, phase: float = 0.0) -> np.ndarray:
    """Convex regular polygon (fixture boundary whose PIP test is also
    expressible as half-plane inequalities in the DuckDB oracle)."""
    ang = phase + 2.0 * np.pi * np.arange(sides) / sides
    return np.column_stack([cx + radius * np.cos(ang), cy + radius * np.sin(ang)])


def halfplane_sql(poly: np.ndarray, x_expr: str, y_expr: str) -> str:
    """SQL predicate 'point strictly inside convex CCW polygon' as a
    conjunction of cross-product half-plane tests — the oracle twin of
    ``points_in_polygon`` for convex fixtures."""
    if np.allclose(poly[0], poly[-1]):
        poly = poly[:-1]
    terms = []
    m = len(poly)
    for i in range(m):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % m]
        terms.append(
            f"(({x2!r} - {x1!r}) * (({y_expr}) - {y1!r}) - "
            f"({y2!r} - {y1!r}) * (({x_expr}) - {x1!r}) > 0)"
        )
    return "(" + " AND ".join(terms) + ")"
