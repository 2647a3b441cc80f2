"""Explicit skew handling for hot spatial cells (north rule: "skewed
hot cells salted and repartitioned explicitly").

Dense urban cells concentrate a disproportionate share of pages; a
grouped-map kernel keyed by cell then receives one giant Arrow batch
(memory) on one task (stragglers). The engine's layered defenses:

1. the join+reduce snap path needs no grouping at all — partial
   aggregation drains hot cells map-side (operators/knn.knn_snap);
2. ``salt_hot_cells`` for grouped-map kernels: a cheap count pre-pass
   finds cells above ``threshold``, ONLY those get a salt column
   (pmod(hash(key), salt)), and the group key becomes (cell_id, salt)
   — cold cells keep salt 0 so their groups are unchanged;
3. AQE skew-join splitting stays on as the runtime backstop
   (session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hot_cells(df: DataFrame, cell_col: str = "cell_id", threshold: int = 100_000) -> DataFrame:
    """Cells whose row count exceeds threshold (the pre-pass is a pure
    count agg — partial+final, cheap even at 100 TB)."""
    return (
        df.groupBy(cell_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > threshold)
        .select(cell_col, "n")
    )


def salt_hot_cells(
    df: DataFrame,
    cell_col: str = "cell_id",
    key_col: str = "url",
    threshold: int = 100_000,
    salt: int = 16,
) -> DataFrame:
    """Adds a ``salt`` column: 0 for cold cells, pmod(hash(key), salt)
    for hot ones. Group/repartition by (cell_col, 'salt') afterwards —
    hot cells split into ``salt`` bounded sub-groups, cold cells are
    untouched (no extra groups, no result change for them)."""
    hot = F.broadcast(
        hot_cells(df, cell_col, threshold).select(cell_col).withColumn("_hot", F.lit(True))
    )
    out = df.join(hot, cell_col, "left")
    return out.withColumn(
        "salt",
        F.when(
            F.col("_hot").isNotNull(), F.pmod(F.hash(key_col), F.lit(int(salt)))
        ).otherwise(F.lit(0)),
    ).drop("_hot")
