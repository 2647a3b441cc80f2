"""Deterministically scale a driver testdata dir K-fold by key-offset
replication, for adversarial contract drives above the shipped sf0.1.

Each copy k offsets every primary AND foreign key column by k*1,000,000
(far above any base key, far below int32/int64-hash overflow: the
derived-geo hash multiplies keys by ~2.6e9, so keys must stay < ~3e9
for the exact-int contract math to hold in BOTH Spark and DuckDB).
Referential integrity is preserved within each copy; all ids stay
globally unique, so id-tie-broken operators remain deterministic.
Value columns are copied verbatim — document texts repeat across
copies, which is a FEATURE for the funnel drive (10-clique planted
exact duplicates at 10x scale).

Usage: python tools/make_sf_replica.py <src_sf_dir> <out_dir> [k=10]
Then:  python tools/check_contract.py <out_dir> <query...>
"""

from __future__ import annotations

import os
import sys

import duckdb

OFF = 1_000_000
KEYS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_replica"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t, keys in KEYS.items():
        path = os.path.join(src, f"{t}.parquet")
        cols = con.sql(f"DESCRIBE SELECT * FROM '{path}'").df()
        sel_parts = []
        for name, typ in zip(cols["column_name"], cols["column_type"]):
            if name in keys:
                sel_parts.append(f'CAST("{name}" + c.k * {OFF} AS {typ}) AS "{name}"')
            else:
                sel_parts.append(f'"{name}"')
        q = (
            f"COPY (SELECT {', '.join(sel_parts)} FROM '{path}' "
            f"CROSS JOIN (SELECT unnest(generate_series(0, {k - 1})) AS k) c "
            f'ORDER BY c.k, "{keys[0]}") '
            f"TO '{os.path.join(out, t + '.parquet')}' (FORMAT PARQUET)"
        )
        con.execute(q)
        n = con.sql(
            f"SELECT count(*) FROM '{os.path.join(out, t + '.parquet')}'"
        ).fetchone()[0]
        print(f"{t}: {n:,} rows ({k}x)")
    con.close()


if __name__ == "__main__":
    main()
