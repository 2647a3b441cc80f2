"""Golden oracle tables for the non-SQL-expressible contract queries.

Three of the engine's contract queries run algorithms plain SQL cannot
restate (the reference GVI scorer's crop/RLE/peak pipeline, Dijkstra +
flood-fill isochrones, binary media decode). Their DRIVER-side value
check therefore uses the golden-table pattern: an INDEPENDENT oracle
implementation (tests/oracle.py scalar ports — separate code from the
engine kernels, same published semantics) is materialized once per sf
directory as parquet, and ``__spark_entry__.oracle_sql`` returns a
``read_parquet`` SELECT over it, so the driver hash-compares engine
values against independently computed ones.

Inputs are derived deterministically (documents.parquet text / the
DuckDB twin of the derived points table), so the goldens are a pure
function of the sf directory. ``ensure_golden`` computes lazily and
caches under dist/golden/<sf-name>/; regeneration is always safe.

Usage: python tools/make_golden.py [sf_dir ...]
"""

from __future__ import annotations

import os
import sys
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import numpy as np
import pandas as pd

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

GOLDEN_ROOT = os.path.join(_REPO, "dist", "golden")


def spark_round6(v) -> float | None:
    """Spark's round(double, 6): BigDecimal.valueOf(double) — i.e. the
    SHORTEST decimal repr, which Python's repr() also produces — then
    HALF_UP. Matching this exactly matters: ratios like k/640 land on
    exact 5e-7 decimal ties where banker's rounding diverges."""
    if v is None:
        return None
    v = float(v)
    if np.isnan(v):
        return None
    return float(Decimal(repr(v)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


# ------------------------------------------------------------ generators
def golden_gvi_score_docs(sf_dir: str) -> pd.DataFrame:
    """Independent scalar GVI scorer (tests/oracle.oracle_gvi_score,
    reference modules/process_data.py:221-300) over documents.text with
    is_panoramic = doc_id % 5 == 0 — the exact contract inputs."""
    from tests.oracle import oracle_gvi_score

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{os.path.join(sf_dir, 'documents.parquet')}' ORDER BY doc_id"
    ).df()
    rows = []
    for did, text in zip(docs["doc_id"], docs["text"]):
        g, p, m, e = oracle_gvi_score(text, bool(did % 5 == 0))
        rows.append((int(did), spark_round6(g), bool(p), bool(m), bool(e)))
    out = pd.DataFrame(rows, columns=["doc_id", "gvi", "is_panoramic", "missing", "error"])
    out["gvi"] = out["gvi"].astype("float64")
    return out


def _synth_pgm_independent(i: int, w: int, h: int) -> bytes:
    """Scalar restatement of the deterministic PGM payload (engine:
    operators/multimodal.synth_pgm, vectorized mgrid) — byte loops."""
    header = ("P5 %d %d 255\n" % (w, h)).encode("ascii")
    raster = bytes(((x * 7 + y * 13 + i * 31) % 256) for y in range(h) for x in range(w))
    return header + raster


def _decode_pgm_independent(payload: bytes) -> list[int]:
    """Minimal independent P5 parse: whitespace-separated header tokens
    (magic, w, h, maxval), then the raw raster."""
    import re

    m = re.match(rb"^P5\s+(\d+)\s+(\d+)\s+(\d+)\s", payload)
    assert m, "not a binary PGM"
    w, h = int(m.group(1)), int(m.group(2))
    # exactly ONE whitespace byte separates maxval from the raster —
    # raster bytes may themselves be whitespace values (e.g. 10)
    raster = payload[m.end() :]
    assert len(raster) >= w * h
    return list(raster[: w * h])


def _synth_png_independent(i: int, w: int, h: int) -> bytes:
    """Scalar restatement of the deterministic PNG payload: the same
    gradient grid, filters cycled per row (r % 5), stdlib zlib deflate
    and crc32 — byte-identical to the engine's encoder by construction
    of the published PNG filter definitions."""
    import struct
    import zlib

    grid = [[(x * 7 + y * 13 + i * 31) % 256 for x in range(w)] for y in range(h)]
    raw = bytearray()
    for r in range(h):
        f = r % 5
        raw.append(f)
        for x in range(w):
            cur = grid[r][x]
            a = grid[r][x - 1] if x else 0
            b = grid[r - 1][x] if r else 0
            c = grid[r - 1][x - 1] if (r and x) else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            raw.append((cur - pred) & 0xFF)

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def golden_media_features(sf_dir: str) -> pd.DataFrame:
    """Independent media pipeline twin: re-synthesize each payload with
    scalar loops (binary PGM for even ids, zlib PNG for odd), sha256
    it, and recompute the first histogram-bin fraction from an
    independent pixel source — a separate PGM parser for PGM rows, the
    ANALYTIC gradient grid for PNG rows (so the engine's inflate +
    unfilter must recover the exact pixels to match)."""
    import hashlib

    ids = duckdb.sql(
        f"SELECT doc_id FROM '{os.path.join(sf_dir, 'documents.parquet')}' ORDER BY doc_id"
    ).df()["doc_id"]
    rows = []
    for did in ids:
        did = int(did)
        if did % 2 == 0:
            payload = _synth_pgm_independent(did, 24, 16)
            pixels = _decode_pgm_independent(payload)
        else:
            payload = _synth_png_independent(did, 24, 16)
            pixels = [(x * 7 + y * 13 + did * 31) % 256 for y in range(16) for x in range(24)]
        bin0 = np.float32(sum(1 for v in pixels if 0 <= v < 16) / len(pixels))
        rows.append(
            (
                did,
                len(payload),
                hashlib.sha256(payload).hexdigest(),
                spark_round6(float(bin0)),
            )
        )
    return pd.DataFrame(rows, columns=["media_id", "n_bytes", "sha256", "bin0_frac"])


def golden_video_frames(sf_dir: str) -> pd.DataFrame:
    """ANALYTIC video-pipeline oracle: the contract query muxes
    uniform-luma JPEG frames (luma(i,k) = (i*37 + k*53) % 256, 6 frames
    at 500 ms, sampled every 1000 ms -> source frames k=0,2,4), and
    uniform grids roundtrip baseline JPEG exactly (DC-only blocks;
    pytest proves all 256 values). So the expected decoded mean IS the
    planted constant and std is 0 — stated here with plain arithmetic,
    no JPEG/MP4 code involved: the engine must mux, walk its own
    container, slice the right sample, and entropy-decode it to match."""
    ids = duckdb.sql(
        f"SELECT doc_id FROM '{os.path.join(sf_dir, 'documents.parquet')}' "
        "WHERE doc_id % 5 = 0 ORDER BY doc_id"
    ).df()["doc_id"]
    rows = []
    for did in ids:
        did = int(did)
        for j in range(3):  # sampled frame j <- source frame k = 2j
            k = 2 * j
            rows.append(
                (
                    did,
                    j,
                    1000.0 * j,
                    "mjpeg",
                    float((did * 37 + k * 53) % 256),
                    0.0,
                )
            )
    return pd.DataFrame(
        rows,
        columns=["media_id", "frame_idx", "t_ms", "codec", "mean_luma", "std_luma"],
    )


def golden_isochrone(sf_dir: str) -> pd.DataFrame:
    """Brute-force isochrone oracle (tests/oracle.oracle_isochrone_cells
    — plain-dict Dijkstra + scalar segment distances + BFS exterior
    fill) over the DuckDB twin of the derived points table, with the
    contract query's exact graph construction (path graph over
    point_id <= 60, POIs at point_id % 20 == 5)."""
    from streetview_naturevisibility_spark.sources import derived as D
    from tests.oracle import oracle_isochrone_cells

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW part AS SELECT * FROM '{os.path.join(sf_dir, 'part.parquet')}'"
    )
    pts = con.execute(
        D.with_clause(D.points_sql())
        + " SELECT point_id, x, y FROM points WHERE point_id <= 60 ORDER BY point_id"
    ).df()
    nodes = [(int(r.point_id), float(r.x), float(r.y)) for r in pts.itertuples()]
    ids = {n for n, _, _ in nodes}
    edges = [(n, n + 1) for n, _, _ in nodes if (n + 1) in ids]
    pois = [(n, x, y) for n, x, y in nodes if n % 20 == 5]
    cells = oracle_isochrone_cells(
        pois, nodes, edges, buffer_dist=15000.0, edge_buff=400.0, grid=200.0
    )
    rows = [
        (int(poi), len(cc), float(len(cc)) * 200.0 * 200.0)
        for poi, cc in sorted(cells.items())
    ]
    return pd.DataFrame(rows, columns=["poi_id", "n_cells", "area_m2"])


GENERATORS = {
    "gvi_score_docs": golden_gvi_score_docs,
    "media_features": golden_media_features,
    "isochrone": golden_isochrone,
    "video_frames": golden_video_frames,
}


def ensure_golden(name: str, sf_dir: str) -> str:
    """Path of the golden parquet for (name, sf_dir), generating and
    caching it on first use."""
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    out_dir = os.path.join(GOLDEN_ROOT, sf_name)
    path = os.path.join(out_dir, f"{name}.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(out_dir, exist_ok=True)
    df = GENERATORS[name](sf_dir)
    tmp = path + ".tmp"
    df.to_parquet(tmp, index=False)
    os.replace(tmp, path)
    return path


def main() -> int:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    for sf in sf_dirs:
        for name in GENERATORS:
            p = ensure_golden(name, sf)
            n = duckdb.sql(f"SELECT count(*) c FROM read_parquet('{p}')").df()["c"][0]
            print(f"{p}: {n} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
