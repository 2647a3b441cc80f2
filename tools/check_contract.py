"""Driver-contract self-check: run every __spark_entry__.queries() entry
and its oracle_sql() twin on the same sf dir, compare row count, column
names, and exact sorted values (floats bit-compared, with a tolerance
fallback report). Usage: python tools/check_contract.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from streetview_naturevisibility_spark.session import get_spark
from streetview_naturevisibility_spark.sources.tables import TABLES


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        problems.append(f"columns differ: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}")
        return problems
    if len(spark_df) != len(duck_df):
        problems.append(f"row count: spark={len(spark_df)} duck={len(duck_df)}")
        return problems
    a = normalize(spark_df)
    b = normalize(duck_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            avf = av.astype(float).to_numpy()
            bvf = bv.astype(float).to_numpy()
            nan_eq = np.isnan(avf) == np.isnan(bvf)
            both = ~np.isnan(avf) & ~np.isnan(bvf)
            exact = (avf[both] == bvf[both]).all() and nan_eq.all()
            if not exact:
                close = np.allclose(avf[both], bvf[both], rtol=1e-9, atol=1e-12) and nan_eq.all()
                diff = np.abs(avf[both] - bvf[both]).max() if both.any() else 0
                problems.append(
                    f"col {c}: float mismatch exact=False close={close} maxdiff={diff:.3e}"
                )
        else:
            if not (av.to_numpy() == bv.to_numpy()).all():
                k = int((av.to_numpy() != bv.to_numpy()).sum())
                problems.append(f"col {c}: {k} value mismatches (e.g. {av[av != bv].head(3).tolist()} vs {bv[av != bv].head(3).tolist()})")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:]) if len(sys.argv) > 2 else None
    # golden-table oracles resolve their sf from this env var (the
    # grading driver runs at the sf0.01 default)
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t + '.parquet')}'"
        )

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"[FAIL] {name}: spark error: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(sdf)} rows")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: duckdb error: {e}")
            failed.append(name)
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            print(f"[FAIL] {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"[OK]   {name}: {len(sdf)} rows")
    print()
    if failed:
        print(f"FAILED: {failed}")
        return 1
    print("ALL OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
