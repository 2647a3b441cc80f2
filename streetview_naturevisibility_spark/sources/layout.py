"""Physical table layout for 100 TB pages tables: cell-partitioned
writes (Iceberg-style partition pruning on plain parquet) and bucketed
tables for co-located joins.

- ``write_cell_partitioned``: pages written under
  ``coarse_cell=<parent cell id>/`` directories. A query filtering on
  coarse_cell prunes partitions at planning time (PartitionFilters in
  the scan node) — the engine's stand-in for Iceberg partition metadata
  + min-max skipping (SURVEY.md §4.2 "free with Iceberg metadata").
- ``write_bucketed`` + ``read_bucketed``: both join sides bucketed by
  the join key land co-partitioned, so repeated large-large joins run
  with ZERO exchanges (SortMergeJoin directly over bucket scans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..geo.cells import cell_parent_col


def write_cell_partitioned(
    df: DataFrame, path: str, cell_col: str = "cell_id", coarse_steps: int = 4
) -> None:
    """Partition by the coarse parent cell (zoom - coarse_steps): ~4^s
    fine cells per directory keeps file counts sane while pruning
    still removes everything outside a query's spatial extent."""
    out = df.withColumn("coarse_cell", cell_parent_col(F.col(cell_col), coarse_steps))
    out.write.mode("overwrite").partitionBy("coarse_cell").parquet(path)


def read_cell_partitioned(
    spark: SparkSession, path: str, coarse_cells: list[int] | None = None
) -> DataFrame:
    df = spark.read.parquet(path)
    if coarse_cells is not None:
        df = df.where(F.col("coarse_cell").isin([int(c) for c in coarse_cells]))
    return df


def write_bucketed(
    df: DataFrame, table: str, key: str, buckets: int = 16, sort: bool = True
) -> None:
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
