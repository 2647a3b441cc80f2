"""Pages preparation: extract -> parse coords -> project -> tile assign.

The engine analog of the reference's Stage C front half
(modules/osmnx_road_network.py:90-129): instead of downloading vector
tiles, each web page row computes its own cell id. One narrow pipeline,
no shuffle:

  scan(url, html[, warc_ts]) -> extract_text (pandas UDF)
    -> parse_coords (pandas UDF) -> drop html  (project EARLY: binary
       payloads never cross a shuffle)
    -> to_utm (pandas UDF) -> tile_x/tile_y/cell_id (codegen math)

``.explain`` shows a single WholeStageCodegen span around the tile math
with the three Arrow UDF evals inline — filters on url/warc_ts push
down to the parquet scan below the UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.project import make_to_utm
from ..functions.text import extract_text, parse_coords
from ..geo.cells import with_cell


def prepare_pages(
    pages_raw: DataFrame,
    zoom: int = 14,
    utm_zone: int = 31,
    keep_text: bool = True,
) -> DataFrame:
    """pages(url, warc_ts, html, lang, is_panoramic) ->
    (url, warc_ts, lang, is_panoramic[, text], lon, lat, x, y,
    tile_x, tile_y, cell_id)."""
    to_utm = make_to_utm(utm_zone)

    df = pages_raw.withColumn("text", extract_text(F.col("html")))
    df = df.withColumn("_ll", parse_coords(F.col("html")))
    # project html away as early as possible (SURVEY.md §7 risk list)
    keep = ["url", "warc_ts", "lang", "is_panoramic"]
    keep = [c for c in keep if c in pages_raw.columns]
    if keep_text:
        keep.append("text")
    df = df.select(*keep, F.col("_ll.lon").alias("lon"), F.col("_ll.lat").alias("lat"))
    df = df.withColumn("_xy", to_utm(F.col("lon"), F.col("lat")))
    df = df.select("*", F.col("_xy.x").alias("x"), F.col("_xy.y").alias("y")).drop("_xy")
    return with_cell(df, "lon", "lat", zoom)
