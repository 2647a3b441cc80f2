"""Benchmark harness: headline engine queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "pages_per_sec": ...}

The headline set covers the engine's hot paths: page tiling (codegen
math + Arrow UDF extraction on synthetic html), the kNN snap join, the
per-road aggregate, PIP, zonal stats, dedup and a TPC-H-style join-agg.
``synthetic_pages`` scales the pages side beyond the small documents
table so the spatial join is measured at meaningful density (rows =
SPARK_GRAFT_BENCH_PAGES, default 2,000,000 — generated distributed,
never collected).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from streetview_naturevisibility_spark.operators.knn import knn_snap
from streetview_naturevisibility_spark.operators.aggregates import gvi_per_road
from streetview_naturevisibility_spark.session import get_spark
from streetview_naturevisibility_spark.sources import derived as D


SNAP_BENCH_RADIUS = 25.0  # the reference's faithful snap radius


def synthetic_pages(
    spark: SparkSession, n: int, zoom: int, partitions: int | None = None
) -> DataFrame:
    """Deterministic pages table of n rows (ids only -> derived columns,
    same hash contract as sources/derived). ``partitions`` defaults to
    4x the scheduler's cores so stragglers rebalance (one-task-per-core
    leaves the whole stage waiting on its slowest thread)."""
    if partitions is None:
        partitions = 4 * spark.sparkContext.defaultParallelism
    k = F.col("id")
    ux = ((k * F.lit(D.HX_A) + F.lit(D.HX_B)) % F.lit(D.M32)).cast("double") / F.lit(float(D.M32))
    uy = ((k * F.lit(D.HY_A) + F.lit(D.HY_B)) % F.lit(D.M32)).cast("double") / F.lit(float(D.M32))
    df = spark.range(0, n, 1, partitions).select(
        k.alias("doc_id"),
        F.concat(F.lit("https://example.org/p/"), k.cast("string")).alias("url"),
        (F.lit(D.LON0) + ux * F.lit(D.LON_SPAN)).alias("lon"),
        (F.lit(D.LAT0) + uy * F.lit(D.LAT_SPAN)).alias("lat"),
        (ux * F.lit(D.MX_SCALE)).alias("x"),
        (uy * F.lit(D.MY_SCALE)).alias("y"),
        (k % 5 == 0).alias("is_panoramic"),
    )
    from streetview_naturevisibility_spark.geo.cells import with_cell

    return with_cell(df, "lon", "lat", zoom)


def bench_snap_throughput(spark: SparkSession, sf_dir: str, n_pages: int) -> tuple[float, float]:
    """Flagship spatial join at scale: n_pages synthetic pages snapped
    to the derived points at the reference's 25 m radius, cell zoom
    matched to the radius (geo/cells.zoom_for_radius)."""
    from streetview_naturevisibility_spark.geo.cells import zoom_for_radius
    from streetview_naturevisibility_spark.geo.mercator import tile_x_col, tile_y_col

    zoom = zoom_for_radius(SNAP_BENCH_RADIUS, D.LAT0)
    points = (
        D.spark_points(spark, sf_dir)
        .drop("tile_x", "tile_y")
        .withColumn("tile_x", tile_x_col(F.col("lon"), zoom))
        .withColumn("tile_y", tile_y_col(F.col("lat"), zoom))
    )
    pages = synthetic_pages(spark, n_pages, zoom)
    # t0 BEFORE the operator call: the two_phase reduce materializes
    # its winners eagerly inside knn_snap (cache-lifecycle fix), so the
    # timed window must include the call itself
    t0 = time.time()
    # numeric page key through the reduce (see knn_snap docstring)
    snapped = knn_snap(
        points, pages, max_distance=2 * SNAP_BENCH_RADIUS, zoom=zoom, key_col="doc_id"
    )
    snapped.groupBy("road_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("snap_distance").alias("d"),
    ).collect()
    dt = time.time() - t0
    return dt, n_pages / dt


def synthetic_html_pages(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Pages with real html payloads (codegen-built from the pinned
    template) — the input shape of the north-star metric."""
    if partitions is None:
        partitions = 4 * spark.sparkContext.defaultParallelism
    k = F.col("id")
    ux = ((k * F.lit(D.HX_A) + F.lit(D.HX_B)) % F.lit(D.M32)).cast("double") / F.lit(float(D.M32))
    uy = ((k * F.lit(D.HY_A) + F.lit(D.HY_B)) % F.lit(D.M32)).cast("double") / F.lit(float(D.M32))
    lat = F.lit(D.LAT0) + uy * F.lit(D.LAT_SPAN)
    lon = F.lit(D.LON0) + ux * F.lit(D.LON_SPAN)
    html = F.concat(
        F.lit("<html><head><title>t"),
        k.cast("string"),
        F.lit("</title></head><body><p>page "),
        k.cast("string"),
        F.lit(" alpha beta gamma delta epsilon zeta"),
        F.lit("</p><span class='geo' data-lat='"),
        F.format_number(lat, 7),
        F.lit("' data-lon='"),
        F.format_number(lon, 7),
        F.lit("'></span></body></html>"),
    ).cast("binary")
    return spark.range(0, n, 1, partitions).select(
        k.alias("doc_id"),
        F.concat(F.lit("https://example.org/p/"), k.cast("string")).alias("url"),
        html.alias("html"),
        (k % 5 == 0).alias("is_panoramic"),
    )


def bench_pipeline_throughput(
    spark: SparkSession, sf_dir: str, n_pages: int, engine: str = "arrow"
) -> tuple[float, float]:
    """The north-star workload end-to-end: html pages -> extract_text +
    parse_coords -> UTM -> tile/cell -> kNN snap -> per-road reduce.
    engine="arrow" (fused Arrow UDF, the r1-r3 recorded protocol and
    the prepare_pages default) or "jvm" (pure-codegen regex+Krüger,
    zero Python workers). The interleaved A/B (BENCH/
    pages_interleaved.py) measured jvm 1.46x slower at local[32]; the
    jvm leg stays recorded because a no-Python pipeline scales on N
    threads, not ~2N, and wins when Python workers are the
    bottleneck."""
    from streetview_naturevisibility_spark.geo.cells import zoom_for_radius
    from streetview_naturevisibility_spark.geo.mercator import tile_x_col, tile_y_col
    from streetview_naturevisibility_spark.operators.tiling import prepare_pages

    zoom = zoom_for_radius(SNAP_BENCH_RADIUS, D.LAT0)
    points = (
        D.spark_points(spark, sf_dir)
        .drop("tile_x", "tile_y")
        .withColumn("tile_x", tile_x_col(F.col("lon"), zoom))
        .withColumn("tile_y", tile_y_col(F.col("lat"), zoom))
    )
    raw = synthetic_html_pages(spark, n_pages)
    # doc_id flows through prepare_pages — never re-derive keys from
    # strings in the hot path
    pages = prepare_pages(raw, zoom=zoom, keep_text=False, engine=engine)
    t0 = time.time()  # include the eager two_phase materialization
    snapped = knn_snap(
        points, pages, max_distance=2 * SNAP_BENCH_RADIUS, zoom=zoom, key_col="doc_id"
    )
    snapped.groupBy("road_id").agg(
        F.count(F.lit(1)).alias("n"), F.avg("snap_distance").alias("d")
    ).collect()
    dt = time.time() - t0
    return dt, n_pages / dt


VOCAB = 30_000
WORDS_PER_DOC = 40


def synthetic_docs(spark: SparkSession, n: int, partitions: int):
    """Deterministic distributed corpus (shared with BENCH/
    corpus_scale.py): ~40 hash-derived tokens per doc; doc_id % 100 ==
    1 repeats the predecessor's token stream plus one extra token (a
    planted near-duplicate at Jaccard ~0.95); doc_id % 100 >= 95 is
    planted LOW-QUALITY junk (16-char all-digit tokens: mean token
    length > 12 and alpha_ratio 0 -> quality_score 0.1 < the funnel's
    0.3 cut) so the quality stage has a real ~5% selectivity at bench
    scale. Junk tokens stay hash-distinct per doc — no exact-dup
    collapse, no shared shingles, no LSH mega-bucket."""
    base = F.col("id") - (F.col("id") % 100 == 1).cast("long")
    words = F.transform(
        F.sequence(F.lit(1), F.lit(WORDS_PER_DOC)),
        lambda i: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(base * F.lit(41) + i), F.lit(VOCAB)).cast("string"),
        ),
    )
    junk_words = F.transform(
        F.sequence(F.lit(1), F.lit(WORDS_PER_DOC)),
        lambda i: F.lpad(
            F.pmod(
                F.xxhash64(F.col("id") * F.lit(43) + i), F.lit(10**12)
            ).cast("string"),
            16,
            "0",
        ),
    )
    text = F.when(
        F.col("id") % 100 >= 95, F.array_join(junk_words, " ")
    ).when(
        F.col("id") % 100 == 1,
        F.concat(F.array_join(words, " "), F.lit(" extra")),
    ).otherwise(F.array_join(words, " "))
    lang = F.element_at(
        F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("es"), F.lit("zh")),
        (F.col("id") % 5 + 1).cast("int"),
    )
    return spark.range(0, n, 1, partitions).select(
        F.col("id").alias("doc_id"), text.alias("text"), lang.alias("lang")
    )


def bench_curate_funnel(
    spark: SparkSession, n_docs: int, cpus: int, persist: str = "none"
) -> tuple[float, dict[str, int]]:
    """The LLM-training-data curate funnel end-to-end (the same
    composition as `cli curate`): quality score -> exact dedup ->
    MinHash-LSH near-dup pairs -> connected-component clustering ->
    keep-canonical -> stratified sample. Input is staged as parquet
    first (a real table scan, like the 100 TB path), the funnel wall
    includes every stage count (the job boundaries a real funnel run
    pays). No separate warm-up pass: JIT and Python workers are already
    warm from the preceding legs, and a second 1M-doc pass would double
    the suite wall for no attribution value."""
    import tempfile

    from streetview_naturevisibility_spark.operators.corpus import (
        dedup_keep_canonical,
        duplicate_clusters,
        stratified_sample,
    )
    from streetview_naturevisibility_spark.operators.dedup import minhash_lsh_pairs
    from streetview_naturevisibility_spark.operators.textops import analyze_documents

    import shutil

    stage_root = tempfile.mkdtemp(prefix="bench_funnel_")
    stage = os.path.join(stage_root, "docs")
    synthetic_docs(spark, n_docs, 4 * cpus).write.mode("overwrite").parquet(stage)
    docs = spark.read.parquet(stage)

    t0 = time.time()
    counts: dict[str, int] = {"in": docs.count()}
    scored = analyze_documents(docs, keep_input_cols=True)
    kept_q = scored.where(F.col("quality_score") >= F.lit(0.3))
    counts["quality"] = kept_q.count()
    digests = kept_q.withColumn("_digest", F.md5(F.col("text")))
    keepers = digests.groupBy("_digest").agg(F.min("doc_id").alias("doc_id"))
    exact = digests.join(keepers, ["_digest", "doc_id"], "left_semi").drop("_digest")
    # persist="none" is the MEASURED default: the survivor frame
    # feeds four consumers (LSH, pair join-back, keep-canonical
    # anti-join, sampler) and caching it looks like an obvious win —
    # but an interleaved A/B at 200k docs ran persist [344, 75] s vs
    # plain [33, 23] s. Caching materializes EVERY column of the
    # analyze_documents projection (including the expensive rolling
    # fingerprint) for all rows, while without the cache Catalyst
    # prunes each consumer down to (doc_id, text, lang) and never
    # computes the unused columns at all. Recompute-with-pruning beats
    # cache-without-pruning here; at 100 TB checkpoint a PRUNED
    # projection to parquet instead. persist="pruned" caches only the
    # (doc_id, text, lang) projection the consumers actually read —
    # the A/B switch BENCH/funnel_repeats.py measures.
    if persist in ("full", "pruned"):
        from pyspark import StorageLevel

        if persist == "pruned":
            exact = exact.select("doc_id", "text", "lang")
        exact = exact.persist(StorageLevel.MEMORY_AND_DISK)
    elif persist != "none":
        raise ValueError(f"persist must be none|full|pruned, got {persist!r}")
    counts["exact"] = exact.count()
    pairs, metrics = minhash_lsh_pairs(
        exact, jaccard_threshold=0.5, max_bucket=100_000, return_metrics=True
    )
    clusters = duplicate_clusters(pairs)
    near = dedup_keep_canonical(exact, clusters)
    counts["near"] = near.count()
    m = metrics.collect()[0]
    counts["lsh_dropped_buckets"] = int(m.dropped_buckets)
    counts["lsh_dropped_members"] = int(m.dropped_members)
    sampled = stratified_sample(
        near, "lang", {"en": 0.5, "de": 0.5, "fr": 0.5, "es": 0.5, "zh": 0.5}, "doc_id"
    )
    counts["sampled"] = sampled.count()
    dt = time.time() - t0
    if persist in ("full", "pruned"):
        exact.unpersist()
    shutil.rmtree(stage_root, ignore_errors=True)
    return dt, counts


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_pages = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "8000000"))
    spark = get_spark(app_name="svnv-bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(int(cpus), 8))
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM (codegen JIT) and the Arrow Python workers once so
    # the first headline query doesn't absorb session startup cost
    spark.range(0, 2_000_000, 1, 32).agg(
        F.avg(F.xxhash64("id").cast("double"))
    ).collect()
    _warm = F.pandas_udf(lambda s: s, "long")
    spark.range(0, 10_000, 1, 8).select(_warm(F.col("id"))).write.format(
        "noop"
    ).mode("overwrite").save()
    # parquet reader + noop sink init (first scan otherwise pays it)
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).limit(
        1000
    ).write.format("noop").mode("overwrite").save()

    # headline legs draw from the live contract registry PLUS the
    # retired round-1 rows (the r6 rotation moved e.g. text_stats to
    # retired_queries(); the bench leg must keep timing it so the
    # round-over-round series stays comparable)
    qs = dict(entrymod.retired_queries(), **entrymod.queries())
    headline = [
        "tile_assign",
        "knn_snap",
        "gvi_per_road",
        "pipeline_metrics",
        "highway_rollup",
        "pip_hexagon",
        "zonal_mean",
        "gap_fill_linreg",
        "dedup_exact",
        "text_stats",
        "events_window",
        "pricing_summary",
        "top_customers",
        # r3 additions: hex snap, stateful sessionize, MinHash LSH —
        # round-over-round coverage for the newer operator families
        "knn_snap_hex",
        "sessionize",
        "minhash_lsh",
        # r3 corpus-analytics family: CC duplicate clustering + n-gram
        # document-frequency top-k
        "dup_clusters",
        "ngram_topk",
    ]
    times: dict[str, float] = {}
    for name in headline:
        if name not in qs:
            continue
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)

    # warm-up pass each (JIT + Python workers), then the timed run.
    # clearCache between passes is belt-and-braces: since the r3
    # lifecycle fix the two-phase kNN reduce unpersists its candidate
    # set before returning, but any future persist in these paths would
    # silently serve the timed run via CacheManager's canonical-plan
    # matching (the r2 24M-pages/s lie), so keep the clear.
    bench_snap_throughput(spark, sf_dir, n_pages)
    spark.catalog.clearCache()
    snap_sec, kernel_pps = bench_snap_throughput(spark, sf_dir, n_pages)
    times["snap_kernel_pages"] = round(snap_sec, 3)
    bench_pipeline_throughput(spark, sf_dir, n_pages)
    spark.catalog.clearCache()
    pipe_sec, pages_per_sec = bench_pipeline_throughput(spark, sf_dir, n_pages)
    times["full_pipeline_pages"] = round(pipe_sec, 3)
    bench_pipeline_throughput(spark, sf_dir, n_pages, engine="jvm")
    spark.catalog.clearCache()
    jvm_sec, jvm_pps = bench_pipeline_throughput(spark, sf_dir, n_pages, engine="jvm")
    times["full_pipeline_jvm_pages"] = round(jvm_sec, 3)

    n_funnel = int(os.environ.get("SPARK_GRAFT_FUNNEL_DOCS", "1000000"))
    funnel_sec, funnel_counts = bench_curate_funnel(spark, n_funnel, int(cpus))
    times["curate_funnel"] = round(funnel_sec, 3)

    # r5 selection family at 1M rows (driver-recorded twins of the
    # BENCH/selection_scale.py legs): SemDeDup (pairs="local" BLAS
    # dominance), DSIR top-k, sequence packing. Each asserts its
    # planted/closed-form expectation so a wrong plan can't "win".
    from streetview_naturevisibility_spark.operators.corpus import (
        pack_assignments,
    )
    from streetview_naturevisibility_spark.operators.similarity import (
        semantic_dedup,
    )
    from streetview_naturevisibility_spark.operators.textops import dsir_select

    docs1m = synthetic_docs(spark, n_funnel, int(cpus) * 2)

    t0 = time.time()
    pa = pack_assignments(docs1m, budget_tokens=2048, bucket_span=100_000)
    r = pa.agg(
        F.countDistinct("bin_id").alias("bins"), F.sum("n_tokens").alias("tok")
    ).collect()[0]
    times["pack_1m"] = round(time.time() - t0, 3)
    assert int(r.bins) == -(-int(r.tok) // 2048), "packing bin count off"

    t0 = time.time()
    sel = dsir_select(
        docs1m,
        docs1m.where(F.col("doc_id") % 1000 == 995).select("text"),
        n=10_000,
        n_buckets=10_000,
    )
    n_junk = sel.where(F.col("doc_id") % 100 >= 95).count()
    times["dsir_select_1m"] = round(time.time() - t0, 3)

    base_vec = F.col("id") - (F.col("id") % 100 == 1).cast("long")
    emb1m = spark.range(0, n_funnel, 1, int(cpus) * 2).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(16)),
            lambda i: (
                (F.pmod(F.xxhash64(base_vec * F.lit(31) + i), F.lit(2_000_001))
                 - F.lit(1_000_000)) / F.lit(1_000_000.0)
            ),
        ).alias("embedding"),
    )
    t0 = time.time()
    sd = semantic_dedup(
        emb1m, threshold=0.95, n_lists=4096, dim=16, assign="udf", pairs="local"
    )
    r = sd.agg(
        F.sum(((~F.col("kept")) & (F.col("vec_id") % 100 == 1)).cast("long")).alias(
            "dp"
        )
    ).collect()[0]
    times["semdedup_local_1m"] = round(time.time() - t0, 3)
    assert int(r.dp) == n_funnel // 100, "planted semantic dups not all found"
    funnel_counts["dsir_top10k_from_target_domain"] = int(n_junk)

    # r6 additions: C4 cleaning (codegen generator, 50k planted
    # lorem-ipsum kills asserted) and BPE subword counting (bounded
    # sample train + broadcast-ranks Arrow map stage) at 1M docs
    from streetview_naturevisibility_spark.operators.textops import c4_clean
    from streetview_naturevisibility_spark.operators.tokenize import (
        bpe_token_count,
        train_bpe_from_corpus,
    )

    c4_docs = docs1m.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(". End sentence one. Two more here. Three now. "
                  "Four follow. Five close."),
            F.when(F.col("doc_id") % 20 == 3, F.lit(" lorem ipsum")).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )
    t0 = time.time()
    r = c4_clean(c4_docs).agg(
        F.sum(F.col("keep").cast("long")).alias("kept")
    ).collect()[0]
    times["c4_clean_1m"] = round(time.time() - t0, 3)
    assert int(r.kept) <= n_funnel - n_funnel // 20, "planted lorem survived c4"

    t0 = time.time()
    merges = train_bpe_from_corpus(docs1m, n_merges=100, sample_docs=2000)
    r = (
        bpe_token_count(docs1m, merges)
        .agg(F.sum("n_tokens_bpe").alias("t"))
        .collect()[0]
    )
    times["bpe_count_1m"] = round(time.time() - t0, 3)
    assert int(r.t) > 0 and len(merges) > 0

    total = round(sum(times.values()), 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "pages_per_sec": round(pages_per_sec),
                "pages_per_sec_jvm": round(jvm_pps),
                "snap_kernel_pages_per_sec": round(kernel_pps),
                "bench_pages": n_pages,
                "funnel_docs_per_sec": round(n_funnel / funnel_sec),
                "funnel_counts": funnel_counts,
                "cpus": int(cpus),
            }
        )
    )


if __name__ == "__main__":
    main()
