"""Web-mercator XYZ tile assignment.

Reference semantics: ``mercantile.tile(lon, lat, zoom=14)`` per point
(reference: modules/osmnx_road_network.py:90-101). mercantile computes

    x = floor((lon/360 + 0.5) * 2**z)
    y = floor((0.5 - asinh(tan(radians(lat)))/(2*pi)) * 2**z)

with clamping of x to [0, 2**z - 1] and of the y input to the valid
mercator latitude range. Implemented here twice:

- as **native Column expressions** (whole-stage codegen, no Python), the
  engine hot path; and
- as a NumPy function used by the pytest oracle and the fixtures.

No UDF is needed for tiling — this is the part of the reference's
"tile download" stage that survives at 100 TB scale as pure codegen
column math.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_ZOOM = 14
# Max mercator latitude (where y hits the tile edge).
_MERC_LAT_LIMIT = 85.051128779806604


def tile_x_col(lon: Column, zoom: int = DEFAULT_ZOOM) -> Column:
    """Tile x index as a native expression (mercantile-compatible)."""
    n = float(2**zoom)
    raw = F.floor((lon / F.lit(360.0) + F.lit(0.5)) * F.lit(n))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(int(n) - 1)).cast("int")


def tile_y_col(lat: Column, zoom: int = DEFAULT_ZOOM) -> Column:
    """Tile y index as a native expression (mercantile-compatible).

    asinh is spelled ln(t + sqrt(t*t + 1)) so the identical formula is
    runnable in the DuckDB oracle SQL.
    """
    n = float(2**zoom)
    clamped = F.least(F.greatest(lat, F.lit(-_MERC_LAT_LIMIT)), F.lit(_MERC_LAT_LIMIT))
    t = F.tan(F.radians(clamped))
    asinh_t = F.log(t + F.sqrt(t * t + F.lit(1.0)))
    raw = F.floor((F.lit(0.5) - asinh_t / F.lit(2.0 * np.pi)) * F.lit(n))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(int(n) - 1)).cast("int")


def tile_xy_np(
    lon: np.ndarray, lat: np.ndarray, zoom: int = DEFAULT_ZOOM
) -> tuple[np.ndarray, np.ndarray]:
    """NumPy twin of the Column expressions (oracle / fixture path)."""
    n = float(2**zoom)
    lim = int(n) - 1
    x = np.floor((np.asarray(lon, dtype=np.float64) / 360.0 + 0.5) * n)
    x = np.clip(x, 0, lim).astype(np.int32)
    clamped = np.clip(np.asarray(lat, dtype=np.float64), -_MERC_LAT_LIMIT, _MERC_LAT_LIMIT)
    t = np.tan(np.radians(clamped))
    y = np.floor((0.5 - np.arcsinh(t) / (2.0 * np.pi)) * n)
    y = np.clip(y, 0, lim).astype(np.int32)
    return x, y


def tile_sql(lon_expr: str, lat_expr: str, zoom: int = DEFAULT_ZOOM) -> tuple[str, str]:
    """The same tile math as ANSI SQL strings (for DuckDB oracles)."""
    n = float(2**zoom)
    lim = int(n) - 1
    x = (
        f"CAST(least(greatest(floor((({lon_expr})/360.0 + 0.5) * {n}), 0), {lim}) AS INTEGER)"
    )
    t = f"tan(radians(least(greatest({lat_expr}, {-_MERC_LAT_LIMIT}), {_MERC_LAT_LIMIT})))"
    asinh_t = f"ln(({t}) + sqrt(({t})*({t}) + 1.0))"
    y = (
        f"CAST(least(greatest(floor((0.5 - ({asinh_t})/{2.0 * np.pi}) * {n}), 0), {lim}) AS INTEGER)"
    )
    return x, y
