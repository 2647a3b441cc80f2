"""Per-leg isolation harness (guide §1.4): reproduces individual
bench.py legs so a single operator can be timed without the full
suite. bench.py itself is FROZEN for measurement — numbers printed
here are for optimization work only (cited in OPTIMIZATION_r07.md).

Usage: python bench_extra.py <leg> [<leg> ...]
Legs: dsir, semdedup, pack, bpe, c4, funnel, funnel_stages,
      pipeline, pipeline_jvm, snap
Each leg prints {"leg": name, "sec": s, ...} one JSON line per run.
Repeats: pass e.g. dsir dsir to run twice (2nd run is warm).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from streetview_naturevisibility_spark.session import get_spark
import bench as B


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_funnel = int(os.environ.get("SPARK_GRAFT_FUNNEL_DOCS", "1000000"))
    n_pages = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "8000000"))
    spark = get_spark(app_name="svnv-bench-extra", master=f"local[{cpus}]",
                      shuffle_partitions=max(int(cpus), 8))
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as bench.py
    spark.range(0, 2_000_000, 1, 32).agg(F.avg(F.xxhash64("id").cast("double"))).collect()
    _warm = F.pandas_udf(lambda s: s, "long")
    spark.range(0, 10_000, 1, 8).select(_warm(F.col("id"))).write.format("noop").mode("overwrite").save()

    docs1m = B.synthetic_docs(spark, n_funnel, int(cpus) * 2)

    for leg in sys.argv[1:]:
        spark.sparkContext.setJobDescription(f"bench_extra:{leg}")
        if leg == "dsir":
            from streetview_naturevisibility_spark.operators.textops import dsir_select
            t0 = time.time()
            sel = dsir_select(
                docs1m,
                docs1m.where(F.col("doc_id") % 1000 == 995).select("text"),
                n=10_000, n_buckets=10_000,
            )
            n_junk = sel.where(F.col("doc_id") % 100 >= 95).count()
            print(json.dumps({"leg": leg, "sec": round(time.time() - t0, 3), "n_junk": n_junk}))
        elif leg == "semdedup":
            from streetview_naturevisibility_spark.operators.similarity import semantic_dedup
            base_vec = F.col("id") - (F.col("id") % 100 == 1).cast("long")
            emb1m = spark.range(0, n_funnel, 1, int(cpus) * 2).select(
                F.col("id").alias("vec_id"),
                F.transform(
                    F.sequence(F.lit(1), F.lit(16)),
                    lambda i: ((F.pmod(F.xxhash64(base_vec * F.lit(31) + i), F.lit(2_000_001))
                                - F.lit(1_000_000)) / F.lit(1_000_000.0)),
                ).alias("embedding"),
            )
            t0 = time.time()
            sd = semantic_dedup(emb1m, threshold=0.95, n_lists=4096, dim=16, assign="udf", pairs="local")
            r = sd.agg(F.sum(((~F.col("kept")) & (F.col("vec_id") % 100 == 1)).cast("long")).alias("dp")).collect()[0]
            dt = time.time() - t0
            assert int(r.dp) == n_funnel // 100, f"planted dups {r.dp}"
            print(json.dumps({"leg": leg, "sec": round(dt, 3)}))
        elif leg == "pack":
            from streetview_naturevisibility_spark.operators.corpus import pack_assignments
            t0 = time.time()
            pa = pack_assignments(docs1m, budget_tokens=2048, bucket_span=100_000)
            r = pa.agg(F.countDistinct("bin_id").alias("bins"), F.sum("n_tokens").alias("tok")).collect()[0]
            dt = time.time() - t0
            assert int(r.bins) == -(-int(r.tok) // 2048)
            print(json.dumps({"leg": leg, "sec": round(dt, 3)}))
        elif leg == "bpe":
            from streetview_naturevisibility_spark.operators.tokenize import (
                bpe_token_count, train_bpe_from_corpus)
            t0 = time.time()
            merges = train_bpe_from_corpus(docs1m, n_merges=100, sample_docs=2000)
            t1 = time.time()
            r = bpe_token_count(docs1m, merges).agg(F.sum("n_tokens_bpe").alias("t")).collect()[0]
            dt = time.time() - t0
            print(json.dumps({"leg": leg, "sec": round(dt, 3), "train_sec": round(t1 - t0, 3), "tok": int(r.t)}))
        elif leg == "c4":
            from streetview_naturevisibility_spark.operators.textops import c4_clean
            c4_docs = docs1m.select(
                "doc_id",
                F.concat(
                    F.col("text"),
                    F.lit(". End sentence one. Two more here. Three now. Four follow. Five close."),
                    F.when(F.col("doc_id") % 20 == 3, F.lit(" lorem ipsum")).otherwise(F.lit("")),
                ).alias("text"),
            )
            t0 = time.time()
            r = c4_clean(c4_docs).agg(F.sum(F.col("keep").cast("long")).alias("kept")).collect()[0]
            dt = time.time() - t0
            print(json.dumps({"leg": leg, "sec": round(dt, 3), "kept": int(r.kept)}))
        elif leg == "funnel":
            sec, counts = B.bench_curate_funnel(spark, n_funnel, int(cpus))
            print(json.dumps({"leg": leg, "sec": round(sec, 3), "counts": counts}))
        elif leg == "funnel_stages":
            # stage-attributed twin of bench_curate_funnel: times each
            # count boundary separately (same composition/actions)
            import shutil
            import tempfile
            from streetview_naturevisibility_spark.operators.corpus import (
                dedup_keep_canonical, duplicate_clusters, stratified_sample)
            from streetview_naturevisibility_spark.operators.dedup import minhash_lsh_pairs
            from streetview_naturevisibility_spark.operators.textops import analyze_documents
            stage_root = tempfile.mkdtemp(prefix="bench_funnel_x_")
            stage = os.path.join(stage_root, "docs")
            B.synthetic_docs(spark, n_funnel, 4 * int(cpus)).write.mode("overwrite").parquet(stage)
            docs = spark.read.parquet(stage)
            ts: dict[str, float] = {}
            t = time.time()
            n_in = docs.count(); ts["in_count"] = round(time.time() - t, 3)
            scored = analyze_documents(docs, keep_input_cols=True)
            kept_q = scored.where(F.col("quality_score") >= F.lit(0.3))
            t = time.time(); n_q = kept_q.count(); ts["quality_count"] = round(time.time() - t, 3)
            digests = kept_q.withColumn("_digest", F.md5(F.col("text")))
            keepers = digests.groupBy("_digest").agg(F.min("doc_id").alias("doc_id"))
            exact = digests.join(keepers, ["_digest", "doc_id"], "left_semi").drop("_digest")
            t = time.time(); n_e = exact.count(); ts["exact_count"] = round(time.time() - t, 3)
            t = time.time()
            pairs, metrics = minhash_lsh_pairs(exact, jaccard_threshold=0.5, max_bucket=100_000, return_metrics=True)
            ts["lsh_call"] = round(time.time() - t, 3)
            t = time.time()
            clusters = duplicate_clusters(pairs)
            ts["clusters_call"] = round(time.time() - t, 3)
            near = dedup_keep_canonical(exact, clusters)
            t = time.time(); n_n = near.count(); ts["near_count"] = round(time.time() - t, 3)
            t = time.time(); m = metrics.collect()[0]; ts["metrics"] = round(time.time() - t, 3)
            sampled = stratified_sample(near, "lang", {"en": 0.5, "de": 0.5, "fr": 0.5, "es": 0.5, "zh": 0.5}, "doc_id")
            t = time.time(); n_s = sampled.count(); ts["sampled_count"] = round(time.time() - t, 3)
            shutil.rmtree(stage_root, ignore_errors=True)
            print(json.dumps({"leg": leg, "stages": ts, "total": round(sum(ts.values()), 3),
                              "counts": {"in": n_in, "q": n_q, "e": n_e, "n": n_n, "s": n_s}}))
        elif leg == "pipeline":
            B1 = B.bench_pipeline_throughput(spark, sf_dir, n_pages)
            print(json.dumps({"leg": leg, "sec": round(B1[0], 3), "pps": round(B1[1])}))
        elif leg == "pipeline_jvm":
            B1 = B.bench_pipeline_throughput(spark, sf_dir, n_pages, engine="jvm")
            print(json.dumps({"leg": leg, "sec": round(B1[0], 3), "pps": round(B1[1])}))
        elif leg == "snap":
            B1 = B.bench_snap_throughput(spark, sf_dir, n_pages)
            print(json.dumps({"leg": leg, "sec": round(B1[0], 3), "pps": round(B1[1])}))
        else:
            raise SystemExit(f"unknown leg {leg}")
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
