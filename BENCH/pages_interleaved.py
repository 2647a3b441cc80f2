"""Interleaved arrow-vs-jvm full-pipeline A/B: settles the
``prepare_pages`` default-engine question with both variants measured
inside the SAME host window (BENCH_r03 recorded jvm 20.8 s vs arrow
8.7 s in separate windows, contradicting the docstring's parity claim;
this VM throttles in 2-15x waves, so only an interleaved best-of-N in
one session can attribute the delta to host waves vs real plan cost —
same protocol as kernel_interleaved.py).

Usage: python BENCH/pages_interleaved.py [n_pages] [rounds]
Writes BENCH/PAGES_AB_LAST.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F

from bench import bench_pipeline_throughput
from streetview_naturevisibility_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(
        app_name="svnv-pages-ab", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm both engines once (JIT, Arrow workers, parquet reader), untimed
    _warm = F.pandas_udf(lambda s: s, "long")
    spark.range(0, 10_000, 1, 8).select(_warm(F.col("id"))).write.format(
        "noop"
    ).mode("overwrite").save()
    for eng in ("arrow", "jvm"):
        bench_pipeline_throughput(spark, sf_dir, max(n_pages // 8, 100_000), engine=eng)
        spark.catalog.clearCache()

    results: dict[str, list[float]] = {"arrow": [], "jvm": []}
    for r in range(rounds):
        order = ["arrow", "jvm"] if r % 2 == 0 else ["jvm", "arrow"]
        for eng in order:
            dt, _ = bench_pipeline_throughput(spark, sf_dir, n_pages, engine=eng)
            spark.catalog.clearCache()
            results[eng].append(dt)

    best = {k: min(v) for k, v in results.items()}
    out = {
        "metric": "pages_pipeline_ab_best_sec",
        "n_pages": n_pages,
        "rounds": rounds,
        "arrow_all": [round(x, 3) for x in results["arrow"]],
        "jvm_all": [round(x, 3) for x in results["jvm"]],
        "arrow_best": round(best["arrow"], 3),
        "jvm_best": round(best["jvm"], 3),
        "arrow_pps": round(n_pages / best["arrow"]),
        "jvm_pps": round(n_pages / best["jvm"]),
        "jvm_over_arrow": round(best["jvm"] / best["arrow"], 3),
        "cpus": int(cpus),
    }
    with open(os.path.join(_REPO, "BENCH", "PAGES_AB_LAST.md"), "w") as f:
        f.write(
            "# Pages-pipeline interleaved A/B: arrow vs jvm (latest run)\n\n"
            f"n_pages={n_pages}, rounds={rounds}, local[{cpus}], sf_dir={sf_dir}\n\n"
            f"| engine | runs (s) | best (s) | pages/s |\n|---|---|---|---|\n"
            f"| arrow | {out['arrow_all']} | {out['arrow_best']} | {out['arrow_pps']:,} |\n"
            f"| jvm | {out['jvm_all']} | {out['jvm_best']} | {out['jvm_pps']:,} |\n\n"
            f"jvm/arrow best ratio: {out['jvm_over_arrow']}\n"
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
