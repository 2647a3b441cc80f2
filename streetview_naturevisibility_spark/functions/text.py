"""Text-payload kernels.

The reference's per-row payload work is image download + Mask2Former
segmentation (modules/process_data.py:235-300). The engine's payload is
the web page: ``extract_text(html)`` must be byte-identical per url to
the pinned extractor (BASELINE.json input_hint), and the segmentation
label grid becomes a deterministic per-page token-label array
(SURVEY.md §1.1) scored by the same pixel-counting semantics.

All functions exist in two forms: a plain pandas/NumPy kernel (unit
tests + oracle) and a pandas UDF wrapper used in DataFrame plans.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

_P_OPEN = b"<body><p>"
_P_CLOSE = b"</p>"
_LAT_KEY = b"data-lat='"
_LON_KEY = b"data-lon='"

N_CLASSES = 19  # Cityscapes label space; 0 = road, 8 = vegetation
ROAD_LABEL = 0
VEGETATION_LABEL = 8


def extract_text_kernel(html: pd.Series) -> pd.Series:
    """html bytes -> text, byte-identical to the pinned template
    (fixtures/generate.page_html): the content of the first <p> element.
    Returns "" when the page has no <p> block (never null)."""

    def _one(b) -> str:
        if b is None:
            return ""
        i = b.find(_P_OPEN)
        if i < 0:
            return ""
        j = b.find(_P_CLOSE, i)
        if j < 0:
            return ""
        return b[i + len(_P_OPEN) : j].decode("utf-8", errors="replace")

    return html.map(_one)


def parse_coords_kernel(html: pd.Series) -> pd.DataFrame:
    """html bytes -> (lon, lat) parsed from the geo span; NaN if absent."""

    def _grab(b, key) -> float:
        if b is None:
            return np.nan
        i = b.find(key)
        if i < 0:
            return np.nan
        j = b.find(b"'", i + len(key))
        try:
            return float(b[i + len(key) : j])
        except ValueError:
            return np.nan

    lat = html.map(lambda b: _grab(b, _LAT_KEY))
    lon = html.map(lambda b: _grab(b, _LON_KEY))
    return pd.DataFrame({"lon": lon, "lat": lat})


def fnv1a32(tokens: np.ndarray) -> np.ndarray:
    """Vectorized FNV-1a 32-bit over an object array of str tokens —
    the engine's stable string hash (never Python's hash())."""
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        h = np.uint64(2166136261)
        for byte in t.encode("utf-8"):
            h = (h ^ np.uint64(byte)) * np.uint64(16777619) & np.uint64(0xFFFFFFFF)
        out[i] = h
    return out


def token_labels_kernel(text: pd.Series) -> pd.Series:
    """text -> int32 label array: label(token_j) = fnv1a32(token) % 19.

    The deterministic analog of the Mask2Former per-pixel class grid
    (reference: modules/segmentation_images.py / process_data.py:53-73):
    vegetation is class 8, road class 0, exactly as Cityscapes."""

    def _one(t) -> list[int]:
        if not t:
            return []
        toks = np.array(t.split(" "), dtype=object)
        return (fnv1a32(toks) % N_CLASSES).astype(np.int32).tolist()

    return text.map(_one)


# ---- pandas UDF wrappers -------------------------------------------------

extract_text = F.pandas_udf(extract_text_kernel, StringType())

parse_coords = F.pandas_udf(
    lambda html: parse_coords_kernel(html),
    StructType([StructField("lon", DoubleType()), StructField("lat", DoubleType())]),
)

token_labels = F.pandas_udf(token_labels_kernel, ArrayType(IntegerType()))
