"""S11 — PNG debug-image sink (reference modules/
segmentation_images.py:27-53: ``visualize_results``/``save_images``
render each sampled segmentation as a palette-colored PNG under
``results/<city>/sample_images/<image_id>-<num>.png``).

Spark-first restatement: the rendering (label grid -> RGB via a
deterministic palette -> real PNG bytes, operators/multimodal.
encode_png_rgb) runs EXECUTOR-side inside one mapInPandas pass —
payload-sized data never moves to the driver; only the bounded
manifest (path, byte count, digest per written image) comes back.
Debug sinks are sample-sized by definition (the reference writes a
handful per city), so the manifest collect is bounded and documented.
matplotlib's figure composition is out of scope — the sink writes the
segmentation plane itself, which is the part with query semantics
(label -> color mapping); the reference's side-by-side axes layout is
presentation only.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

N_LABELS = 19  # the reference's Cityscapes-style label ids 0..18


def palette_rgb(label: int) -> tuple[int, int, int]:
    """Deterministic label color (own palette — NOT the Cityscapes
    table; stable across processes, no RNG)."""
    return ((label * 37 + 11) % 256, (label * 73 + 29) % 256, (label * 101 + 47) % 256)


_PALETTE = np.array([palette_rgb(i) for i in range(N_LABELS)], dtype=np.uint8)


def colorize_labels(labels: np.ndarray, palette: np.ndarray | None = None) -> np.ndarray:
    """(h, w) int labels -> (h, w, 3) uint8 via the palette lookup
    (vectorized take — the loop in the reference's seg_color build)."""
    pal = _PALETTE if palette is None else palette
    lab = np.asarray(labels)
    if (lab < 0).any() or (lab >= len(pal)).any():
        raise ValueError(f"label outside palette range 0..{len(pal) - 1}")
    return pal[lab]


MANIFEST = StructType(
    [
        StructField("image_id", LongType(), False),
        StructField("num", IntegerType(), False),
        StructField("path", StringType(), False),
        StructField("n_bytes", IntegerType(), False),
        StructField("sha256", StringType(), False),
    ]
)


def write_debug_pngs(
    df: DataFrame,
    out_dir: str,
    id_col: str = "image_id",
    num_col: str = "num",
    labels_col: str = "labels",
    width_col: str = "width",
) -> pd.DataFrame:
    """Write one palette-colored PNG per row (``<id>-<num>.png``,
    the reference's naming) from flat label arrays; returns the
    collected manifest and drops a ``_SUCCESS`` marker after all
    executor writes finish (the same commit contract as the parquet
    sinks). Rows render independently — partition-parallel writes, no
    shuffle, payloads never leave the executor."""
    from .multimodal import encode_png_rgb

    os.makedirs(out_dir, exist_ok=True)

    def render(batches):
        # executors run on other hosts in a real deployment: out_dir
        # must exist THERE, not just where the driver ran makedirs
        # (out_dir is expected to be shared storage in that case)
        os.makedirs(out_dir, exist_ok=True)
        for b in batches:
            rows = {k.name: [] for k in MANIFEST.fields}
            for iid, num, labels, width in zip(
                b[id_col], b[num_col], b[labels_col], b[width_col]
            ):
                lab = np.asarray(list(labels), dtype=np.int32)
                w = int(width)
                grid = lab.reshape(-1, w)
                payload = encode_png_rgb(colorize_labels(grid))
                path = os.path.join(out_dir, f"{int(iid)}-{int(num)}.png")
                with open(path, "wb") as f:
                    f.write(payload)
                rows["image_id"].append(int(iid))
                rows["num"].append(int(num))
                rows["path"].append(path)
                rows["n_bytes"].append(len(payload))
                rows["sha256"].append(hashlib.sha256(payload).hexdigest())
            yield pd.DataFrame(rows)

    manifest = (
        df.select(id_col, num_col, labels_col, width_col)
        .mapInPandas(render, MANIFEST)
        .toPandas()
    )
    with open(os.path.join(out_dir, "_SUCCESS"), "w"):
        pass
    return manifest.sort_values(["image_id", "num"]).reset_index(drop=True)
