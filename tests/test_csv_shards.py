"""CSV shard union + validity filter + dedup-by-id (reference
get_gvi_gpkg.py semantics) vs a pandas oracle."""

import os

import numpy as np
import pandas as pd
import pytest

from streetview_naturevisibility_spark.sources.tables import load_gvi_csv_shards

HEADER = ["id", "x", "y", "GVI", "is_panoramic", "missing", "error"]


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("gvi_shards")
    # shard 0: ids 0..9; shard 1: ids 5..14 (resume overlap) + bad rows
    s0 = pd.DataFrame(
        {
            "id": range(10),
            "x": [4.8 + i * 0.001 for i in range(10)],
            "y": [52.3 + i * 0.001 for i in range(10)],
            "GVI": [i / 20 if i % 3 else None for i in range(10)],
            "is_panoramic": [i % 2 == 0 for i in range(10)],
            "missing": [i % 3 == 0 for i in range(10)],
            "error": [False] * 10,
        }
    )
    s1 = pd.DataFrame(
        {
            "id": range(5, 15),
            "x": [9.9] * 10,
            "y": [53.9] * 10,
            "GVI": [0.99] * 10,
            "is_panoramic": [False] * 10,
            "missing": [False] * 10,
            "error": [False] * 10,
        }
    )
    bad = pd.DataFrame(
        {
            "id": [100, 101],
            "x": ["not_a_number", "4.9"],
            "y": ["52.0", "also_bad"],
            "GVI": [0.5, 0.5],
            "is_panoramic": [True, True],
            "missing": [False, False],
            "error": [False, False],
        }
    )
    s0.to_csv(d / "gvi-points-0.csv", index=False)
    pd.concat([s1, bad]).to_csv(d / "gvi-points-1.csv", index=False)
    return str(d)


class TestCsvShards:
    def test_union_validity_dedup_first_wins(self, spark, shard_dir):
        got = (
            load_gvi_csv_shards(spark, os.path.join(shard_dir, "*.csv"))
            .orderBy("point_id")
            .toPandas()
        )
        # oracle: pandas concat in file order, float-validity, dedup first
        f0 = pd.read_csv(os.path.join(shard_dir, "gvi-points-0.csv"))
        f1 = pd.read_csv(os.path.join(shard_dir, "gvi-points-1.csv"))
        merged = pd.concat([f0, f1], ignore_index=True)

        def is_float(v):
            try:
                float(v)
                return True
            except (TypeError, ValueError):
                return False

        merged = merged[merged["x"].map(is_float) & merged["y"].map(is_float)]
        merged = merged.drop_duplicates(subset=["id"], keep="first").sort_values("id")
        assert got["point_id"].tolist() == merged["id"].astype(int).tolist()
        # overlap ids 5..9 keep shard-0 values (first wins)
        row7 = got[got["point_id"] == 7].iloc[0]
        assert row7["x"] == pytest.approx(4.807)
        # the two bad rows are gone
        assert 100 not in got["point_id"].tolist()
        assert 101 not in got["point_id"].tolist()
        # id 14 survived from shard 1
        assert 14 in got["point_id"].tolist()
        # nulls preserved (GVI blank -> null)
        assert np.isnan(got[got["point_id"] == 0]["gvi"].iloc[0])
