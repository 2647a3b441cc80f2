"""Pure pandas/NumPy oracle — a faithful re-statement of the reference
repo's semantics (NOT engine code; used only to produce expected values
in tests). Each function cites the reference lines it mirrors."""

from __future__ import annotations

import numpy as np
import pandas as pd

from streetview_naturevisibility_spark.geo.polygon import (
    interpolate_along,
    parse_wkt_coords,
)


def oracle_sample_points(roads: pd.DataFrame, spacing: int = 50) -> pd.DataFrame:
    """modules/osmnx_road_network.py:51-78 — iterate roads in dataframe
    order, point every ``spacing`` m over range(0, int(length), N),
    dedup exact coords keep-first, positional id after reset."""
    rows = []
    for r in roads.itertuples(index=False):
        coords = parse_wkt_coords(r.geometry_wkt)
        d = np.diff(coords, axis=0)
        length = float(np.sqrt((d**2).sum(axis=1)).sum())
        offs = list(range(0, int(length), spacing))
        if not offs:
            continue
        pts = interpolate_along(coords, np.array(offs, dtype=np.float64))
        for o, (px, py) in zip(offs, pts):
            rows.append({"road_id": r.road_id, "offset_m": o, "x": px, "y": py})
    df = pd.DataFrame(rows)
    df = df.drop_duplicates(subset=["x", "y"], keep="first").reset_index(drop=True)
    df["point_id"] = df.index.astype("int64")
    return df


def oracle_knn_snap(
    points: pd.DataFrame, pages: pd.DataFrame, max_distance: float = 50.0
) -> pd.DataFrame:
    """modules/osmnx_road_network.py:131-154 — brute-force k=1 within
    distance_upper_bound=max_distance/2 in projected meters; miss =>
    page_url '' (empty, not null), distance None, is_panoramic
    None->False."""
    bound = max_distance / 2.0
    px = points["x"].to_numpy()
    py = points["y"].to_numpy()
    qx = pages["x"].to_numpy()
    qy = pages["y"].to_numpy()
    urls = pages["url"].to_numpy()
    pano = pages["is_panoramic"].to_numpy()
    out_url = []
    out_dist = []
    out_pano = []
    for i in range(len(px)):
        d2 = (qx - px[i]) ** 2 + (qy - py[i]) ** 2
        if len(d2) == 0:
            out_url.append("")
            out_dist.append(None)
            out_pano.append(False)
            continue
        # ties broken by (distance, url) total order like the engine;
        # cKDTree ties are index-order — fixtures have no exact ties.
        j = int(np.lexsort((urls, np.sqrt(d2)))[0])
        dist = float(np.sqrt(d2[j]))
        # strict <, like cKDTree's open distance_upper_bound
        if dist < bound:
            out_url.append(urls[j])
            out_dist.append(dist)
            out_pano.append(bool(pano[j]))
        else:
            out_url.append("")
            out_dist.append(None)
            out_pano.append(False)  # astype(bool): None -> False
    res = points.copy()
    res["page_url"] = out_url
    res["snap_distance"] = out_dist
    res["is_panoramic"] = out_pano
    return res


def oracle_fingerprint(text: str, window: int = 8) -> int:
    """Independent pure-Python rolling-hash fingerprint oracle for
    operators/textops._fingerprint_kernel: FNV-1a 64 per token, then the
    minimum Rabin-Karp hash (base 1000003, mod 2^64) over all
    ``window``-token runs; documents shorter than the window hash their
    full token run. Result reinterpreted as int64."""
    toks = text.split(" ") if text else []
    M = 1 << 64
    B = 1000003

    def fnv64(s: str) -> int:
        h = 0xCBF29CE484222325
        for byte in s.encode("utf-8"):
            h = ((h ^ byte) * 0x100000001B3) % M
        return h

    hs = [fnv64(t) for t in toks]
    if not hs:
        return 0
    if len(hs) < window:
        acc = 0
        for h in hs:
            acc = (acc * B + h) % M
        v = acc
    else:
        best = None
        for i in range(len(hs) - window + 1):
            acc = 0
            for h in hs[i : i + window]:
                acc = (acc * B + h) % M
            if best is None or acc < best:
                best = acc
        v = best
    return v - M if v >= (1 << 63) else v
