"""Deterministic synthetic spatial fixtures (FIXTURES.md).

Pure functions of (seed, scale): identical bytes across runs and
partitionings. Everything is generated driver-side with NumPy and
written as single parquet files via pandas/pyarrow (fixture scale is
small; the *engine* reads them distributed).

Test area: EPSG:32631, x in [628000, 632000], y in [5802000, 5806000]
(4 km x 4 km Amsterdam-like square).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from ..geo.polygon import coords_to_wkt, linestring_length, regular_polygon
from ..geo.utm import utm_to_lonlat

SEED = 42
BBOX = (628000.0, 5802000.0, 632000.0, 5806000.0)
UTM_ZONE = 31
VOCAB_SIZE = 512

# Three "hot" dense-urban spots (skew test, FIXTURES.md §1) in meters.
HOT_SPOTS = [(629000.0, 5803000.0), (630500.0, 5804500.0), (631200.0, 5802800.0)]


def _vocab() -> list[str]:
    """512 fixed pseudo-words, seed-independent."""
    consonants = "bcdfghjklmnprstvwz"
    vowels = "aeiou"
    words = []
    i = 0
    while len(words) < VOCAB_SIZE:
        c1 = consonants[i % len(consonants)]
        v1 = vowels[(i // len(consonants)) % len(vowels)]
        c2 = consonants[(i // (len(consonants) * len(vowels))) % len(consonants)]
        v2 = vowels[(i * 7 + 3) % len(vowels)]
        words.append(c1 + v1 + c2 + v2 + ("s" if i % 3 == 0 else ""))
        i += 1
    return words


VOCAB = _vocab()


def page_html(i: int, text: str, lon: float, lat: float) -> bytes:
    """The pinned html template (FIXTURES.md §1). ``extract_text`` must
    invert this byte-for-byte — the per-url invariant gate."""
    return (
        b"<html><head><title>t%d</title></head><body><p>" % i
        + text.encode("utf-8")
        + b"</p><span class='geo' data-lat='%.7f' data-lon='%.7f'></span></body></html>"
        % (lat, lon)
    )


def gen_web_pages(n: int = 500, seed: int = SEED) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    x0, y0, x1, y1 = BBOX

    # placement classes: 80% uniform inside, 15% hot spots, 5% outside
    u = rng.rand(n)
    xs = np.empty(n)
    ys = np.empty(n)
    uniform = u < 0.80
    hot = (u >= 0.80) & (u < 0.95)
    outside = u >= 0.95

    k = int(uniform.sum())
    xs[uniform] = x0 + rng.rand(k) * (x1 - x0)
    ys[uniform] = y0 + rng.rand(k) * (y1 - y0)

    k = int(hot.sum())
    spot_idx = rng.randint(0, len(HOT_SPOTS), size=k)
    spots = np.array(HOT_SPOTS)
    xs[hot] = spots[spot_idx, 0] + rng.randn(k) * 40.0
    ys[hot] = spots[spot_idx, 1] + rng.randn(k) * 40.0

    k = int(outside.sum())
    xs[outside] = x1 + 500.0 + rng.rand(k) * 1000.0
    ys[outside] = y0 + rng.rand(k) * (y1 - y0)

    lon, lat = utm_to_lonlat(xs, ys, UTM_ZONE)

    lens = 50 + ((np.arange(n) * 2654435761) % 451)  # 50..500 words
    rows = []
    for i in range(n):
        toks = [VOCAB[(i * 31 + j * 17 + (i * j) % 13) % VOCAB_SIZE] for j in range(int(lens[i]))]
        text = " ".join(toks)
        domain = f"site{i % 20}.example.org"
        url = f"https://{domain}/p/{i}"
        rows.append(
            {
                "url": url,
                "warc_ts": pd.Timestamp("2023-01-01") + pd.Timedelta(seconds=int((i * 137) % 31536000)),
                "html": page_html(i, text, float(lon[i]), float(lat[i])),
                "text": text,
                "lang": ["en", "nl", "de", "fr"][i % 4],
                "lon": float(lon[i]),
                "lat": float(lat[i]),
                "is_panoramic": i % 5 == 0,
            }
        )
    return pd.DataFrame(rows)


def gen_roads(n_roads: int = 60, seed: int = SEED) -> pd.DataFrame:
    """Grid + diagonal LineStrings, 2-6 vertices, 60-900 m (FIXTURES §2)."""
    rng = np.random.RandomState(seed + 1)
    x0, y0, x1, y1 = BBOX
    rows = []
    for k in range(n_roads):
        n_vert = 2 + int(rng.randint(0, 5))
        sx = x0 + 200.0 + rng.rand() * (x1 - x0 - 400.0)
        sy = y0 + 200.0 + rng.rand() * (y1 - y0 - 400.0)
        # heading quantized to grid-ish directions with a few diagonals
        heading = rng.choice([0.0, np.pi / 2.0, np.pi, 3 * np.pi / 2.0, np.pi / 4.0, 3 * np.pi / 4.0])
        target_len = 60.0 + rng.rand() * 840.0
        seg = target_len / (n_vert - 1)
        pts = [(sx, sy)]
        for _ in range(n_vert - 1):
            jitter = (rng.rand() - 0.5) * 0.2
            sx = np.clip(sx + seg * np.cos(heading + jitter), x0 + 50, x1 - 50)
            sy = np.clip(sy + seg * np.sin(heading + jitter), y0 + 50, y1 - 50)
            pts.append((sx, sy))
        coords = np.array(pts)
        rows.append(
            {
                "road_id": f"r{k:04d}",
                "geometry_wkt": coords_to_wkt(coords, "LINESTRING"),
                "length": linestring_length(coords),
                "highway": ["residential", "primary", "secondary", "tertiary", "cycleway"][k % 5],
            }
        )
    return pd.DataFrame(rows)


def boundary_polygon() -> np.ndarray:
    """City boundary: the bbox minus a notch on the east edge, so
    bbox-pass-but-PIP-fail cases exist (FIXTURES §3). CCW, open ring."""
    x0, y0, x1, y1 = BBOX
    return np.array(
        [
            (x0, y0),
            (x1, y0),
            (x1, y0 + 1200.0),
            (x1 - 900.0, y0 + 1200.0),  # notch in
            (x1 - 900.0, y0 + 2400.0),  # notch up
            (x1, y0 + 2400.0),  # notch out
            (x1, y1),
            (x0, y1),
        ]
    )


def convex_boundary() -> np.ndarray:
    """Convex hexagon inside the bbox — PIP fixture whose oracle is a
    half-plane conjunction in plain SQL (geo/polygon.halfplane_sql)."""
    return regular_polygon(630000.0, 5804000.0, 1700.0, 6, phase=0.1)


def gen_polygons() -> pd.DataFrame:
    roads = gen_roads()
    rows = [
        {
            "polygon_id": "boundary",
            "kind": "city_boundary",
            "geometry_wkt": coords_to_wkt(boundary_polygon(), "POLYGON"),
            "radius": None,
        },
        {
            "polygon_id": "hexagon",
            "kind": "city_boundary_convex",
            "geometry_wkt": coords_to_wkt(convex_boundary(), "POLYGON"),
            "radius": None,
        },
    ]
    for _, r in roads.iterrows():
        rows.append(
            {
                "polygon_id": f"buf_{r.road_id}",
                "kind": "road_buffer",
                "geometry_wkt": r.geometry_wkt,
                "radius": 25.0,
            }
        )
    return pd.DataFrame(rows)


def gen_ndvi_grid() -> pd.DataFrame:
    """10 m cells over the bbox; smooth field with deterministic negative
    cells (clamp-at-0-before-mean test, reference availability.py:275)."""
    x0, y0, x1, y1 = BBOX
    nx = int((x1 - x0) / 10)
    ny = int((y1 - y0) / 10)
    cx_idx, cy_idx = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    cx_idx = cx_idx.ravel()
    cy_idx = cy_idx.ravel()
    cx = x0 + 5.0 + 10.0 * cx_idx
    cy = y0 + 5.0 + 10.0 * cy_idx
    value = 0.5 + 0.4 * np.sin(cx / 300.0) * np.cos(cy / 500.0)
    neg = (cx_idx * 31 + cy_idx) % 50 == 0  # deterministic 2%
    value = np.where(neg, value - 1.0, value)
    return pd.DataFrame(
        {
            "cell_x": cx_idx.astype(np.int32),
            "cell_y": cy_idx.astype(np.int32),
            "cx": cx,
            "cy": cy,
            "value": value,
        }
    )


def write_fixtures(out_dir: str, n_pages: int = 500, n_roads: int = 60, seed: int = SEED) -> dict[str, str]:
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for name, df in [
        ("web_pages", gen_web_pages(n_pages, seed)),
        ("roads", gen_roads(n_roads, seed)),
        ("polygons", gen_polygons()),
        ("ndvi_grid", gen_ndvi_grid()),
    ]:
        p = os.path.join(out_dir, f"{name}.parquet")
        # microsecond timestamps: Spark's parquet reader rejects NANOS
        df.to_parquet(p, index=False, coerce_timestamps="us", allow_truncated_timestamps=True)
        paths[name] = p
    return paths
