"""Interleaved best-of-N repeats of the curate-funnel bench leg.

Two questions, one protocol (same as pages_interleaved.py):

1. VARIANCE BAND (round-4 verdict): the driver's BENCH_r04 window
   recorded curate_funnel at 147.6 s while the builder's own clean
   window recorded 59.9 s for the identical leg — 2.5x apart with no
   same-session attribution. Back-to-back repeats of the SAME plan in
   one session separate host-throttle waves from a real regression:
   if the spread across same-session runs covers the gap, it's the
   documented 2-10x VM variance, not a plan change.

2. PRUNED-PERSIST ANOMALY (round-4 open item): caching the FULL
   exact-dedup survivor frame was measured 3-10x slower than no cache
   (cache defeats column pruning — explained). But a 3-column PRUNED
   persist (doc_id, text, lang — exactly what the four consumers
   read) was also slow in one protocol and was never root-caused.
   Interleaving none-vs-pruned here settles whether a pruned cache
   helps, hurts, or is noise at 1M docs.

Usage: python BENCH/funnel_repeats.py [n_docs] [rounds] [--with-full]
Writes BENCH/FUNNEL_REPEATS_LAST.md and prints one JSON line.
``--with-full`` adds the known-pathological full-column persist at
n_docs/5 (it is 3-10x slower; one run is evidence enough).
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from bench import bench_curate_funnel
from streetview_naturevisibility_spark.session import get_spark


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_docs = int(args[0]) if args else 1_000_000
    rounds = int(args[1]) if len(args) > 1 else 3
    with_full = "--with-full" in sys.argv
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(
        app_name="svnv-funnel-repeats",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up (JIT, Python workers, parquet writer), untimed
    bench_curate_funnel(spark, max(n_docs // 20, 20_000), cpus)
    spark.catalog.clearCache()

    variants = ["none", "pruned"]
    results: dict[str, list[float]] = {v: [] for v in variants}
    counts_by_variant: dict[str, dict[str, int]] = {}
    for r in range(rounds):
        order = variants if r % 2 == 0 else list(reversed(variants))
        for v in order:
            dt, counts = bench_curate_funnel(spark, n_docs, cpus, persist=v)
            spark.catalog.clearCache()
            results[v].append(dt)
            counts_by_variant[v] = counts

    full_s = None
    if with_full:
        full_s, _ = bench_curate_funnel(
            spark, max(n_docs // 5, 20_000), cpus, persist="full"
        )
        spark.catalog.clearCache()

    # funnel counts must be identical across variants (persist is a
    # physical-plan lever, never a semantic one)
    assert len({json.dumps(c, sort_keys=True) for c in counts_by_variant.values()}) == 1

    best = {v: min(results[v]) for v in variants}
    spread = {
        v: round(max(results[v]) / min(results[v]), 3) for v in variants
    }
    out = {
        "metric": "curate_funnel_repeats_sec",
        "n_docs": n_docs,
        "rounds": rounds,
        "cpus": cpus,
        "none_all": [round(x, 2) for x in results["none"]],
        "pruned_all": [round(x, 2) for x in results["pruned"]],
        "none_best": round(best["none"], 2),
        "pruned_best": round(best["pruned"], 2),
        "same_session_spread": spread,
        "pruned_over_none": round(best["pruned"] / best["none"], 3),
        "docs_per_sec_best": round(n_docs / best["none"]),
        "full_persist_sec_at_fifth": round(full_s, 2) if full_s else None,
        "funnel_counts": counts_by_variant["none"],
    }
    with open(os.path.join(_REPO, "BENCH", "FUNNEL_REPEATS_LAST.md"), "w") as f:
        f.write(
            "# Curate-funnel interleaved repeats (latest run)\n\n"
            f"n_docs={n_docs}, rounds={rounds}, local[{cpus}]\n\n"
            "| persist | runs (s) | best (s) | max/min |\n|---|---|---|---|\n"
            f"| none (default) | {out['none_all']} | {out['none_best']} | "
            f"{spread['none']} |\n"
            f"| pruned 3-col | {out['pruned_all']} | {out['pruned_best']} | "
            f"{spread['pruned']} |\n\n"
            f"pruned/none best ratio: {out['pruned_over_none']}; "
            f"end-to-end {out['docs_per_sec_best']:,} docs/s (best none run)\n\n"
            f"funnel counts (identical across variants): "
            f"{json.dumps(counts_by_variant['none'])}\n"
            + (
                f"\nfull-column persist at n/5: {out['full_persist_sec_at_fifth']} s "
                "(known-pathological; see BASELINE.md 'Funnel caching negative "
                "result')\n"
                if full_s
                else ""
            )
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
