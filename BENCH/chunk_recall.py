"""Quantify the chunk_dedup grid-alignment recall boundary (round-6
verdict item #4): plant one shared passage into N docs at N distinct
char phases (start offset mod L all different) plus a small group of
phase-matched repeats, then measure how much of the duplicated passage
each method recovers:

  - grid            chunk_dedup(L)               one aligned pass
  - grid+shifted    chunk_dedup_shifted(L)       + offset-L/2 pass
  - cdc             chunk_dedup_cdc              content-defined chunks
  - minhash (docs)  minhash_lsh_pairs            doc-granularity layer

The phase argument (proved in tests/test_curation_ops.py::
TestChunkAlignment): shifting the grid shifts BOTH instances of a
repeat, so relative phase is invariant — the shifted pass adds nothing
on phase-mismatched plants. CDC derives boundaries from content, so
instance position is irrelevant.

Usage: python BENCH/chunk_recall.py [n_docs=512]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from streetview_naturevisibility_spark.operators.dedup import minhash_lsh_pairs
from streetview_naturevisibility_spark.operators.textops import (
    chunk_dedup,
    chunk_dedup_cdc,
    chunk_dedup_shifted,
)
from streetview_naturevisibility_spark.session import get_spark

L = 32
PASSAGE = " ".join(f"passagetok{w:03d}" for w in range(60))


def corpus(n: int):
    rows = []
    for i in range(n):
        prefix = f"d{i:03d}" + "x" * (i % L)
        suffix = f"tail{i:03d} end{i:03d} close{i:03d}"
        rows.append((i, f"{prefix} {PASSAGE} {suffix}"))
    return rows


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    rows = corpus(n)
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    orig = dict(rows)
    dup_budget = (n - 1) * len(PASSAGE)  # chars beyond the 1st instance

    def recall(fn, label):
        t0 = time.perf_counter()
        out = {r.doc_id: r.text_deduped for r in fn(docs).collect()}
        wall = time.perf_counter() - t0
        removed = sum(len(orig[i]) - len(out[i]) for i in orig)
        return {
            "method": label,
            "removed_chars": removed,
            "recall": round(removed / dup_budget, 4),
            "wall_s": round(wall, 2),
        }

    legs = [
        recall(lambda d: chunk_dedup(d, chunk_chars=L), "grid"),
        recall(lambda d: chunk_dedup_shifted(d, chunk_chars=L), "grid+shifted"),
        recall(lambda d: chunk_dedup_cdc(d), "cdc"),
    ]

    t0 = time.perf_counter()
    pairs = minhash_lsh_pairs(
        docs, k=32, bands=8, jaccard_threshold=0.5, hash_method="tokenmix"
    ).count()
    legs.append(
        {
            "method": "minhash(doc pairs)",
            "pairs_found": int(pairs),
            "pairs_expected": n * (n - 1) // 2,
            "recall": round(pairs / (n * (n - 1) // 2), 4),
            "wall_s": round(time.perf_counter() - t0, 2),
        }
    )
    print(json.dumps({"n_docs": n, "L": L, "legs": legs}))


if __name__ == "__main__":
    main()
