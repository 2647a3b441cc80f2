"""Mini-gate for contract rows rotated OUT of the 50-slot driver
registry (round 6): the ten round-1 single-expression queries keep
their exact Spark-vs-DuckDB value check here, so retiring them from
CORRECTNESS reporting never loosens coverage. Runs at sf0.001 (each
row is a 1-2 expression SELECT; the family was hash-green at sf0.01
AND sf0.1 for five straight rounds before rotation)."""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entry
from tools.check_contract import compare

SF_DIR = os.environ.get("SPARK_GRAFT_RETIRED_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def duck():
    from streetview_naturevisibility_spark.sources.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{os.path.join(SF_DIR, t + '.parquet')}'"
        )
    yield con
    con.close()


def test_registry_shapes():
    rq, ro = entry.retired_queries(), entry.retired_oracle_sql()
    assert set(rq) == set(ro)
    assert len(rq) == 10
    # a retired row must not also occupy a live slot
    assert not set(rq) & set(entry.queries())


@pytest.mark.parametrize("name", sorted(entry.retired_queries()))
def test_retired_row_matches_oracle(spark, duck, name):
    sdf = entry.retired_queries()[name](spark, SF_DIR).toPandas()
    ddf = duck.execute(entry.retired_oracle_sql()[name]).df()
    problems = compare(name, sdf, ddf)
    assert not problems, f"{name}: {problems}"
    assert len(sdf) > 0, f"{name}: empty result"
