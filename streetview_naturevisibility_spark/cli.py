"""spark-submit entry point — the engine twin of the reference CLIs.

    spark-submit --py-files svnv_spark.zip -m ... cli.py pipeline \\
        --roads roads.parquet --pages pages.parquet --out results/ \\
        [--spacing 50] [--max-distance 50] [--cut-by-road-centres] \\
        [--checkpoint results/_ckpt] [--begin N --end M]

Subcommands (reference analogs cited):
- ``pipeline``  — main_script.py end-to-end: sample points -> tile ->
  kNN snap -> GVI -> per-road aggregate, each stage checkpointed with
  per-partition lineage (resume = rerun the same command).
- ``metrics``   — scripts/mean_gvi_street.py + results_metrics.py
  reporting chain over a finished pipeline output.
- ``gap-fill``  — predict_missing_gvi.py: zonal NDVI + OLS fill.
- ``stac-ndvi`` — availability.py NDVI flow over a LOCAL static STAC
  catalog: search -> lowest-cloud item -> red/nir -> NDVI grid in the
  exact shape ``gap-fill --ndvi-grid`` consumes.
- ``stac-landcover`` — availability.py get_landcover_percentages flow:
  most-recent esa-worldcover item -> per-point class percentages.
- ``curate``    — training-corpus curation funnel over a documents
  table (engine addendum, no reference analog): quality filter ->
  exact dedup -> MinHash-LSH near-dup clustering with canonical
  keepers -> deterministic stratified sample; prints the funnel
  counts and the LSH bucket-drop metrics.

On a real cluster drop ``--master``; on the sandbox it defaults to
local[$SPARK_GRAFT_CPUS].
"""

from __future__ import annotations

import argparse
import os

from pyspark.sql import functions as F

from .operators.aggregates import (
    availability_score,
    build_intersection,
    gvi_per_road,
    missing_images_metrics,
    panoramic_images_metrics,
    roads_with_avg_gvi,
    top5_highways,
    unavailable_images_per_highway,
    usability_score,
)
from .operators.gvi import score_snapped_points
from .operators.knn import knn_snap
from .operators.regression import gap_fill_cv_metrics, gap_fill_linear
from .operators.resume import read_lineage, run_stage
from .operators.sampling import sample_points
from .operators.tiling import prepare_pages
from .operators.zonal import zonal_mean
from .session import get_spark


def cmd_pipeline(args: argparse.Namespace) -> None:
    spark = get_spark(app_name="svnv-pipeline", master=args.master)
    roads = spark.read.parquet(args.roads)
    pages_raw = spark.read.parquet(args.pages)
    root = args.checkpoint or os.path.join(args.out, "_ckpt")

    points = run_stage(
        spark, root, "sample_points", lambda: sample_points(roads, args.spacing)
    )
    pages = run_stage(
        spark, root, "pages_prepared", lambda: prepare_pages(pages_raw)
    )
    snapped = run_stage(
        spark,
        root,
        "snapped",
        lambda: knn_snap(points, pages, max_distance=args.max_distance),
    )
    gvi_sel = snapped
    if args.begin is not None or args.end is not None:
        lo = args.begin or 0
        hi = args.end if args.end is not None else 1 << 62
        gvi_sel = snapped.where(
            (F.col("point_id") >= F.lit(lo)) & (F.col("point_id") < F.lit(hi))
        )
    gvi = run_stage(
        spark,
        root,
        "gvi_points",
        lambda: score_snapped_points(gvi_sel, pages, args.cut_by_road_centres),
    )
    per_road = gvi_per_road(build_intersection(gvi, points, roads))
    per_road.orderBy("road_id").write.mode("overwrite").parquet(
        os.path.join(args.out, "gvi_per_road")
    )
    gvi.orderBy("point_id").write.mode("overwrite").parquet(
        os.path.join(args.out, "gvi_points")
    )
    for stage in ("sample_points", "pages_prepared", "snapped", "gvi_points"):
        recs = read_lineage(root, stage)
        rows = sum(r["rows"] for r in recs)
        print(f"[lineage] {stage}: {len(recs)} partitions, {rows} rows")


def cmd_metrics(args: argparse.Namespace) -> None:
    spark = get_spark(app_name="svnv-metrics", master=args.master)
    roads = spark.read.parquet(args.roads)
    points = spark.read.parquet(os.path.join(args.results, "_ckpt", "sample_points", "data"))
    gvi = spark.read.parquet(os.path.join(args.results, "gvi_points"))
    inter = build_intersection(gvi, points, roads).cache()

    print("gvi-streets (per-road):")
    roads_with_avg_gvi(roads, gvi_per_road(inter)).orderBy("road_id").show(20)
    print("missing images:")
    missing_images_metrics(inter).show()
    print("panoramic images:")
    panoramic_images_metrics(inter).show()
    print("availability score:")
    availability_score(inter).show()
    print("usability score:")
    usability_score(inter).show()
    print("top-5 highway types by image count:")
    top5_highways(unavailable_images_per_highway(inter)).show()


def cmd_gap_fill(args: argparse.Namespace) -> None:
    spark = get_spark(app_name="svnv-gapfill", master=args.master)
    gvi = spark.read.parquet(os.path.join(args.results, "gvi_points"))
    points = spark.read.parquet(os.path.join(args.results, "_ckpt", "sample_points", "data"))
    grid = spark.read.parquet(args.ndvi_grid)
    ndvi = zonal_mean(points, grid, radius=args.distance / 2.0)
    feats = gvi.join(ndvi, "point_id", "left").withColumnRenamed("mean_ndvi", "ndvi")
    known_feats = feats.where(F.col("ndvi").isNotNull())
    # Collect the CV metrics row BEFORE choosing/fitting a model: the
    # GAM path fits eagerly on the driver (toPandas + np.quantile), so
    # a zero-known input (e.g. the NDVI raster does not overlap the
    # study area at all) must be caught here, not after the fit
    # crashes on an empty array.
    m = gap_fill_cv_metrics(known_feats, feature="ndvi", target="gvi").collect()[0]
    if not m.n_known:
        # nothing to fit — write an empty (schema-stable) gvi_filled,
        # report and stop instead of crashing on None comparisons
        known_feats.withColumn(
            "gvi_filled", F.lit(None).cast("double")
        ).write.mode("overwrite").parquet(os.path.join(args.results, "gvi_filled"))
        print(
            "WARNING: no points with NDVI values — check that the NDVI "
            "raster covers the study area; gvi_filled is empty (points "
            "without an NDVI feature cannot be predicted)"
        )
        return
    # --model selects the filler (the reference evaluates both and its
    # README picks the GAM on its data; linear stays the default for
    # protocol continuity with rounds 1-3)
    if getattr(args, "model", "linear") == "gam":
        from .operators.regression import gap_fill_gam

        out = gap_fill_gam(known_feats, feature="ndvi", target="gvi")
    else:
        out = gap_fill_linear(known_feats, feature="ndvi", target="gvi")
    out.orderBy("point_id").write.mode("overwrite").parquet(
        os.path.join(args.results, "gvi_filled")
    )
    # the reference's model-selection printout
    # (predict_missing_gvi.py:81-85: cv=5 R2 / RMSE / AIC)
    if m.n_known < 5 or m.avg_rmse is None or m.avg_r2 is None:
        print(
            f"WARNING: CV metrics degenerate (n_known={m.n_known}; "
            "constant-x training fold or constant-y test fold) — "
            "metrics below may be null; gap-fill output itself is unaffected"
        )
    print("<----- Linear Regression ----->")
    print("R2 value:", m.avg_r2)
    print("RMSE:", m.avg_rmse)
    print("AIC value:", m.aic)
    # the GAM half of the reference printout (predict_missing_gvi.py:139-144)
    from .operators.regression import gam_cv_metrics

    g = gam_cv_metrics(known_feats, feature="ndvi", target="gvi")
    print("<----- Linear GAM ----->")
    print("RMSE:", g["avg_rmse"])
    print("AIC value:", g["aic"])
    print("gap-fill complete -> gvi_filled")


def cmd_stac_ndvi(args: argparse.Namespace) -> None:
    """S9 end-to-end as a user command (reference availability.py
    get_ndvi flow): search a LOCAL static STAC catalog, pick the
    lowest-cloud item, compute NDVI from its red/nir band rasters and
    write an ``ndvi_grid.parquet`` in exactly the shape ``gap-fill
    --ndvi-grid`` consumes (cell_x, cell_y, cx, cy, value) — catalog
    to regression with no manual glue. Prints the reference's
    image-info lines (availability.py:166-170)."""
    from .sources.stac import ndvi_for_aoi

    spark = get_spark(app_name="svnv-stac-ndvi", master=args.master)
    try:
        bbox = tuple(float(v) for v in args.bbox.split(","))
    except ValueError:
        raise SystemExit("--bbox expects x0,y0,x1,y1 (numbers)")
    if len(bbox) != 4:
        raise SystemExit("--bbox expects x0,y0,x1,y1")
    date_range = tuple(args.date_range.split(","))
    if len(date_range) != 2:
        raise SystemExit("--date-range expects start,end")
    ndvi, item = ndvi_for_aoi(
        spark, args.catalog, bbox, date_range,
        collection=args.collection, max_cloud=args.max_cloud,
    )
    os.makedirs(args.out, exist_ok=True)
    out_path = os.path.join(args.out, "ndvi_grid.parquet")
    ndvi.select(
        "cell_x", "cell_y", "cx", "cy", F.col("ndvi").alias("value")
    ).write.mode("overwrite").parquet(out_path)
    print(
        "Information on the satellite item used to compute NDVI values:"
        f"\n   item: {item.item_id} ({item.collection})"
        f"\n   datetime: {item.datetime}"
        f"\n   cloud cover: {item.cloud_cover}"
    )
    print(f"stac-ndvi complete -> {out_path}")


def cmd_stac_landcover(args: argparse.Namespace) -> None:
    """Reference get_landcover_percentages flow (availability.py:292):
    per-point landcover class percentages from the most recent
    esa-worldcover item of a LOCAL static STAC catalog, euclidean
    buffer of --radius meters."""
    from .sources.stac import landcover_percentages

    spark = get_spark(app_name="svnv-stac-landcover", master=args.master)
    points = spark.read.parquet(args.points)
    out, item = landcover_percentages(
        spark, args.catalog, points, radius=args.radius
    )
    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "landcover_percentages.parquet")
    out.write.mode("overwrite").parquet(path)
    print(
        "Information on the land cover item used:"
        f"\n   item: {item.item_id} ({item.collection})"
        f"\n   datetime: {item.datetime}"
    )
    print(f"stac-landcover complete -> {path}")


def cmd_curate(args: argparse.Namespace) -> None:
    """Training-corpus curation over a documents table: quality filter
    -> exact dedup -> MinHash-LSH near-dup clustering (keep canonical)
    -> optional deterministic stratified sample. Prints a funnel
    summary; every stage is a distributed DataFrame op (the near-dup
    bucket join is capped via --max-bucket with drop metrics printed,
    never silent)."""
    from .operators.corpus import (
        dedup_keep_canonical,
        duplicate_clusters,
        stratified_sample,
    )
    from .operators.dedup import minhash_lsh_pairs
    from .operators.textops import analyze_documents

    if getattr(args, "dsir_target", None) and getattr(args, "dsir_keep", None) is None:
        raise SystemExit("--dsir-target requires --dsir-keep")

    spark = get_spark(app_name="svnv-curate", master=args.master)
    docs = spark.read.parquet(args.docs)
    n_in = docs.count()

    if getattr(args, "fix_text", False):
        # encoding cleanup FIRST: every later stage (shingles, LM,
        # classifier, dedup digests) judges the repaired text
        from .operators.textops import fix_text

        fx = fix_text(docs).localCheckpoint(eager=True)
        n_fixed = fx.where("changed").count()
        docs = docs.drop("text").join(
            fx.select("doc_id", F.col("text_fixed").alias("text")), "doc_id"
        )
        print(f"[fix] repaired={n_fixed} docs (mojibake/spaces/control chars)")

    if getattr(args, "c4", False):
        # C4 line/page heuristics (Raffel et al. 2020 §2.2) directly
        # after encoding repair: later stages (shingles, LM, dedup
        # digests) judge the line-cleaned text
        from .operators.textops import c4_clean

        cc = c4_clean(
            docs,
            min_words_per_line=getattr(args, "c4_min_words", 3),
            min_sentences=getattr(args, "c4_min_sentences", 5),
        ).localCheckpoint(eager=True)
        st = cc.agg(
            F.sum(F.col("keep").cast("long")).alias("kept"),
            F.sum("n_lines").alias("nl"),
            F.sum("n_lines_kept").alias("nk"),
        ).collect()[0]
        docs = docs.drop("text").join(
            cc.where("keep").select(
                "doc_id", F.col("text_clean").alias("text")
            ),
            "doc_id",
        )
        print(
            f"[c4] kept={int(st.kept or 0)} of {n_in} pages; "
            f"lines {int(st.nl or 0)} -> {int(st.nk or 0)}"
        )
        n_in = int(st.kept or 0)

    if getattr(args, "blocklist", None):
        from .operators.textops import decontaminate

        blk = spark.read.parquet(args.blocklist)
        n_before = n_in
        docs = decontaminate(docs, blk, n=args.decontam_n).localCheckpoint(
            eager=True
        )
        n_in = docs.count()
        print(
            f"[decontam] dropped={n_before - n_in} "
            f"({args.decontam_n}-gram overlap vs blocklist)"
        )

    if getattr(args, "para_dedup", False):
        # boilerplate removal BEFORE scoring: quality/LM judge the
        # text the downstream corpus will actually contain
        from .operators.textops import paragraph_dedup

        pd_out = paragraph_dedup(
            docs,
            max_docs=getattr(args, "para_max_docs", 1),
            min_chars=getattr(args, "para_min_chars", 0),
        ).localCheckpoint(eager=True)
        n_para_removed = pd_out.agg(F.sum("n_removed")).collect()[0][0] or 0
        docs = docs.drop("text").join(
            pd_out.select("doc_id", F.col("text_deduped").alias("text")),
            "doc_id",
        )
        print(f"[para] removed={n_para_removed} boilerplate paragraph instances")

    if getattr(args, "chunk_dedup", None):
        # substring-level dedup (RETRO-chunk approximation): cut every
        # repeated L-char chunk except its globally-first occurrence
        from .operators.textops import chunk_dedup

        cd_out = chunk_dedup(docs, chunk_chars=args.chunk_dedup).localCheckpoint(
            eager=True
        )
        n_chunks_removed = cd_out.agg(F.sum("n_removed")).collect()[0][0] or 0
        docs = docs.drop("text").join(
            cd_out.select("doc_id", F.col("text_deduped").alias("text")),
            "doc_id",
        )
        print(
            f"[chunk] removed={n_chunks_removed} duplicated "
            f"{args.chunk_dedup}-char chunk instances"
        )

    if getattr(args, "span_dedup", None):
        # C4 §2.2 companion: remove all but the globally-first
        # occurrence of any n-sentence span (sentence-unit analog of
        # the chunk grid; pairs naturally with --c4)
        from .operators.textops import span_dedup_c4

        sd_out = span_dedup_c4(docs, n_sents=args.span_dedup).localCheckpoint(
            eager=True
        )
        n_spans_removed = sd_out.agg(F.sum("n_removed")).collect()[0][0] or 0
        docs = docs.drop("text").join(
            sd_out.select("doc_id", F.col("text_deduped").alias("text")),
            "doc_id",
        )
        print(
            f"[span] removed={n_spans_removed} duplicated "
            f"{args.span_dedup}-sentence span instances"
        )

    if getattr(args, "chunk_dedup_cdc", None):
        # alignment-free substring dedup: content-defined token chunks
        # (boundaries from the token hash, so repeats match at ANY
        # position — see BENCH/BASELINE.md "grid-alignment recall")
        from .operators.textops import chunk_dedup_cdc

        cdc_out = chunk_dedup_cdc(docs, avg_tokens=args.chunk_dedup_cdc).localCheckpoint(
            eager=True
        )
        n_cdc_removed = cdc_out.agg(F.sum("n_removed")).collect()[0][0] or 0
        docs = docs.drop("text").join(
            cdc_out.select("doc_id", F.col("text_deduped").alias("text")),
            "doc_id",
        )
        print(
            f"[chunk-cdc] removed={n_cdc_removed} duplicated "
            f"content-defined chunk instances (~{args.chunk_dedup_cdc} tokens)"
        )

    if (
        getattr(args, "fix_text", False)
        or getattr(args, "c4", False)
        or getattr(args, "para_dedup", False)
        or getattr(args, "chunk_dedup", None)
        or getattr(args, "chunk_dedup_cdc", None)
        or getattr(args, "span_dedup", None)
    ):
        # cut the text-rewrite lineage before the scoring stages: every
        # downstream stage otherwise replans the full fix/para/chunk
        # expression tree and the composed plan grows multiplicatively
        # (an all-stages run OOMed a 4g driver on PLAN size, not data).
        # This is the pruned-projection checkpoint strategy
        # BENCH/BASELINE.md documents — on a cluster use checkpoint()
        # to reliable storage.
        docs = docs.localCheckpoint(eager=False)

    scored = analyze_documents(docs, keep_input_cols=True)
    kept_q = scored.where(F.col("quality_score") >= F.lit(args.min_quality))

    max_dup_line = getattr(args, "max_dup_line_frac", None)
    max_top2gram = getattr(args, "max_top2gram_frac", None)
    if max_dup_line is not None or max_top2gram is not None:
        # Gopher-style repetition filter between the heuristic quality
        # gate and the LM gate
        from .operators.textops import repetition_signals

        rep = repetition_signals(kept_q.select("doc_id", "text"), top_ns=(2,))
        cond = F.lit(False)
        if max_dup_line is not None:
            cond = cond | (F.col("dup_line_frac") > max_dup_line)
        if max_top2gram is not None:
            cond = cond | (F.col("top2gram_char_frac") > max_top2gram)
        bad = rep.where(cond).select("doc_id")
        n_rep_dropped = bad.count()
        kept_q = kept_q.join(bad, "doc_id", "left_anti")
        print(f"[rep] dropped={n_rep_dropped} repetitive docs")

    if getattr(args, "lm_ref", None):
        # CCNet-style in-domain filter: bigram LM trained on the
        # reference corpus; docs below --min-logprob are dropped.
        # Docs with NO score (fewer than 2 tokens -> NULL mean_logprob)
        # are KEPT, per score_bigram_logprob's contract: an unscorable
        # doc is not a bad doc — the quality filter already judged it.
        from .operators.textops import score_bigram_logprob, train_bigram_lm

        ref = spark.read.parquet(args.lm_ref)
        uni, bi, v = train_bigram_lm(ref)
        lp = score_bigram_logprob(kept_q, uni, bi, v)
        kept_q = kept_q.join(lp.select("doc_id", "mean_logprob"), "doc_id", "left")
        n_unscorable = kept_q.where(F.col("mean_logprob").isNull()).count()
        if n_unscorable:
            print(
                f"[lm] kept {n_unscorable} unscorable docs "
                "(<2 tokens, no LM score — not dropped)"
            )
        kept_q = kept_q.where(
            F.col("mean_logprob").isNull()
            | (F.col("mean_logprob") >= F.lit(args.min_logprob))
        ).drop("mean_logprob")

    if getattr(args, "clf_ref", None):
        # fastText-style classifier gate: logistic regression trained
        # driver-side on (reference sample) vs (deterministic sample of
        # this corpus), scored distributed. Unscorable NULL-text docs
        # are KEPT (the LM-filter contract).
        from .operators.textops import (
            score_quality_classifier,
            train_quality_classifier,
        )

        n_train = getattr(args, "clf_train_n", 500)
        ref = spark.read.parquet(args.clf_ref)
        pos = [r.text for r in ref.where(F.col("text").isNotNull())
               .orderBy("doc_id").limit(n_train).collect()
               if r.text is not None]
        neg = [r.text for r in kept_q.where(F.col("text").isNotNull())
               .orderBy("doc_id").limit(n_train).select("doc_id", "text").collect()]
        if not pos or not neg:
            # an empty/all-NULL reference (or an already-empty pool)
            # would reach np.stack([]) deep in the trainer — fail at
            # the gate with the actual cause instead
            raise SystemExit(
                "[clf] --clf-ref/corpus produced no training texts "
                f"(pos={len(pos)}, neg={len(neg)})"
            )
        w, bias = train_quality_classifier(pos, neg)
        cp = score_quality_classifier(kept_q, w, bias)
        kept_q = kept_q.join(cp, "doc_id", "left")
        n_dropped_clf = kept_q.where(
            F.col("clf_prob") < F.lit(args.clf_min_prob)
        ).count()
        kept_q = kept_q.where(
            F.col("clf_prob").isNull()
            | (F.col("clf_prob") >= F.lit(args.clf_min_prob))
        ).drop("clf_prob")
        print(f"[clf] dropped={n_dropped_clf} below P(reference-like) {args.clf_min_prob}")

    n_quality = kept_q.count()

    # exact dedup: keep the min doc_id per content digest (shuffle on
    # the digest only; the digest frame is corpus-sized, NOT broadcast)
    digests = kept_q.withColumn("_digest", F.md5(F.col("text")))
    keepers = digests.groupBy("_digest").agg(F.min("doc_id").alias("doc_id"))
    exact = digests.join(keepers, ["_digest", "doc_id"], "left_semi").drop("_digest")
    # deliberately NOT cached: a measured A/B (bench.bench_curate_funnel
    # docstring) showed caching this frame 3-10x SLOWER — the cache
    # materializes every analyze_documents column (incl. the rolling
    # fingerprint) while uncached consumers are column-pruned to
    # (doc_id, text, lang); at 100 TB checkpoint a pruned projection
    n_exact = exact.count()

    if getattr(args, "done_digests", None):
        # INCREMENTAL exact dedup vs the already-curated done set:
        # drop every doc whose md5 digest appears in the given parquet
        # (column `digest`). --done-bloom routes through the Bloom
        # pre-probe (operators/bloom.py) — same survivors, the done
        # set is scanned, never shuffled; the filter would be built
        # once and reused across batches on a real deployment.
        done = spark.read.parquet(args.done_digests).select("digest")
        # a pre-existing `digest` column on the docs would make the
        # rename below ambiguous — the funnel's digest is its own
        if "digest" in exact.columns:
            exact = exact.drop("digest")
        keyed = exact.withColumn("_digest", F.md5(F.col("text")))
        if getattr(args, "done_bloom", False):
            from .operators.bloom import bloom_anti_join, build_bloom

            cap = done.count()
            bloom = build_bloom(done, "digest", capacity=max(cap, 1))
            exact = bloom_anti_join(
                keyed.withColumnRenamed("_digest", "digest"),
                done,
                "digest",
                bloom,
            ).drop("digest")
            mode = f"bloom(capacity={cap})"
        else:
            exact = keyed.join(
                done, keyed["_digest"] == done["digest"], "left_anti"
            ).drop("_digest")
            mode = "anti-join"
        n_after_done = exact.count()
        print(
            f"[done-set] dropped={n_exact - n_after_done} already-curated "
            f"docs ({mode})"
        )
        n_exact = n_after_done

    # near-dup: LSH pairs -> connected components -> keep canonical
    pairs, metrics = minhash_lsh_pairs(
        exact,
        jaccard_threshold=args.jaccard,
        max_bucket=args.max_bucket,
        return_metrics=True,
    )
    clusters = duplicate_clusters(
        pairs, algorithm=getattr(args, "cc_algorithm", "propagation")
    )
    near = dedup_keep_canonical(exact, clusters)
    n_near = near.count()
    m = metrics.collect()[0]
    print(
        f"[lsh] buckets={m.n_buckets} dropped_buckets={m.dropped_buckets} "
        f"dropped_members={m.dropped_members}"
    )

    out = near
    if getattr(args, "semdedup", None):
        # SemDeDup semantic dedup: embeddings parquet keyed by vec_id
        # == doc_id; docs whose embedding has a preferred within-
        # cluster near-duplicate are dropped. Docs WITHOUT an
        # embedding row are kept (an unembedded doc is not a dup —
        # same keep-on-unscorable contract as the LM filter).
        from .operators.similarity import semantic_dedup

        emb = spark.read.parquet(args.semdedup)
        big = getattr(args, "semdedup_lists", 8) > 32
        sd = semantic_dedup(
            emb,
            threshold=getattr(args, "semdedup_threshold", 0.92),
            n_lists=getattr(args, "semdedup_lists", 8),
            dim=getattr(args, "semdedup_dim", 64),
            # scale path past the literal-Column limit: Arrow matmul
            # assignment + per-cluster BLAS dominance (10.9x vs the
            # pair join at 1M vectors, identical outputs)
            assign="udf" if big else "column",
            pairs="local" if big else "join",
        )
        dup_ids = sd.where(~F.col("kept")).select(
            F.col("vec_id").alias("doc_id")
        )
        n_before_sd = out.count()
        out = out.join(dup_ids, "doc_id", "left_anti")
        n_after_sd = out.count()
        print(f"[semdedup] dropped={n_before_sd - n_after_sd} semantic near-dups")
    if getattr(args, "dsir_target", None):
        # DSIR importance resampling: keep the --dsir-keep docs whose
        # hashed-n-gram profile best matches the target domain. Runs
        # AFTER dedup (the published setup selects from the deduped
        # pool) and before sampling/budget mixing.
        from .operators.textops import dsir_select

        tgt = spark.read.parquet(args.dsir_target)
        # count the ACTUAL pool (semdedup may have shrunk it past
        # n_near) and the actual kept rows (fewer docs than --dsir-keep
        # keeps them all) — funnel accounting must not report the ask
        n_before_dsir = out.count()
        out = dsir_select(
            out, tgt, n=args.dsir_keep, n_buckets=args.dsir_buckets
        ).drop("dsir_logweight")
        n_after_dsir = out.count()
        print(f"[dsir] kept={n_after_dsir} of {n_before_dsir} (target-likeness rank)")
    if args.sample:
        rates = {
            kv.split("=")[0]: float(kv.split("=")[1])
            for kv in args.sample.split(",")
        }
        out = stratified_sample(out, "lang_pred", rates, "doc_id",
                                default_rate=args.default_rate)

    tokens_col = "n_tokens" if "n_tokens" in out.columns else None
    if getattr(args, "bpe_merges", None):
        # real subword counts for the budget/pack stages: merges are
        # learned ONCE from a bounded sample of the SELECTED pool,
        # broadcast, applied Arrow-batched (operators/tokenize.py)
        from .operators.tokenize import bpe_token_count, train_bpe_from_corpus

        merges = train_bpe_from_corpus(
            out,
            n_merges=args.bpe_merges,
            sample_docs=getattr(args, "bpe_sample", 10_000),
        )
        out = bpe_token_count(out, merges)
        tokens_col = "n_tokens_bpe"
        print(
            f"[bpe] learned {len(merges)} merges; budget/pack count "
            "subwords (n_tokens_bpe)"
        )

    if getattr(args, "token_budget", None):
        # final mixing stage: fill each language's token budget with
        # its best remaining docs (bucketed two-phase — only the
        # boundary quality-bucket per stratum is sorted)
        from .operators.corpus import token_budget_select

        budgets = {
            kv.split("=")[0]: int(kv.split("=")[1])
            for kv in args.token_budget.split(",")
        }
        out = token_budget_select(
            out,
            budgets,
            strata_col="lang_pred",
            quality_col="quality_score",
            # analyze_documents already counted tokens — reuse, don't
            # re-split the text (or the BPE subword counts when asked)
            tokens_col=tokens_col,
            default_budget=getattr(args, "budget_default", 0),
        )
        budget_col = tokens_col or "n_tokens"
        tot = out.groupBy("lang_pred").agg(F.sum(budget_col).alias("t"))
        mix = {r.lang_pred: int(r.t) for r in tot.collect()}
        print(
            "[budget] tokens kept per lang: "
            + ", ".join(f"{k}={v}" for k, v in sorted(mix.items(), key=str))
        )
    if getattr(args, "pack_tokens", None):
        # final stage: materialize fixed-token-budget training rows
        from .operators.corpus import pack_rows

        out = pack_rows(out, args.pack_tokens, tokens_col=tokens_col)
        print(f"[pack] budget={args.pack_tokens} tokens/row")

    n_out = out.count()

    out.write.mode("overwrite").parquet(os.path.join(args.out, "curated"))
    print(
        f"[curate] in={n_in} quality>={args.min_quality}: {n_quality} "
        f"exact-dedup: {n_exact} near-dedup: {n_near} sampled: {n_out}"
    )


def cmd_layout(args: argparse.Namespace) -> None:
    """Rewrite a pages/points parquet clustered by Z-order of
    (tile_x, tile_y): disjoint per-file morton ranges + tight tile
    min/max stats, so bbox scans skip files (sources/layout.py)."""
    from .sources.layout import write_spatial_sorted

    spark = get_spark(app_name="svnv-layout", master=args.master)
    df = spark.read.parquet(args.input)
    write_spatial_sorted(
        df, args.out, x_col=args.x_col, y_col=args.y_col,
        num_files=args.num_files,
    )
    n = spark.read.parquet(args.out).count()
    print(f"[layout] wrote {n} rows z-ordered by ({args.x_col}, {args.y_col}) -> {args.out}")


def main() -> None:
    p = argparse.ArgumentParser(prog="svnv-spark")
    p.add_argument("--master", default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    pp = sub.add_parser("pipeline")
    pp.add_argument("--roads", required=True)
    pp.add_argument("--pages", required=True)
    pp.add_argument("--out", required=True)
    pp.add_argument("--spacing", type=int, default=50)
    pp.add_argument("--max-distance", type=float, default=50.0)
    pp.add_argument("--cut-by-road-centres", action="store_true")
    pp.add_argument("--checkpoint", default=None)
    pp.add_argument("--begin", type=int, default=None)
    pp.add_argument("--end", type=int, default=None)
    pp.set_defaults(fn=cmd_pipeline)

    pm = sub.add_parser("metrics")
    pm.add_argument("--roads", required=True)
    pm.add_argument("--results", required=True)
    pm.set_defaults(fn=cmd_metrics)

    pg = sub.add_parser("gap-fill")
    pg.add_argument("--results", required=True)
    pg.add_argument("--ndvi-grid", required=True)
    pg.add_argument("--distance", type=float, default=50.0)
    pg.add_argument("--model", choices=["linear", "gam"], default="linear")
    pg.set_defaults(fn=cmd_gap_fill)

    pc = sub.add_parser("curate")
    pc.add_argument("--docs", required=True)
    pc.add_argument("--out", required=True)
    pc.add_argument("--min-quality", type=float, default=0.5)
    pc.add_argument("--jaccard", type=float, default=0.5)
    pc.add_argument("--max-bucket", type=int, default=10_000)
    pc.add_argument(
        "--cc-algorithm",
        choices=["propagation", "star"],
        default="propagation",
        help="connected-components kernel for near-dup clustering: "
        "min-label propagation (O(diameter) rounds, right for the "
        "near-clique components LSH emits) or large/small-star "
        "(O(log^2 n) rounds, for adversarial chain-shaped dup graphs)",
    )
    pc.add_argument(
        "--sample",
        default=None,
        help="per-stratum rates over predicted lang, e.g. en=0.25,de=0.5",
    )
    pc.add_argument("--default-rate", type=float, default=1.0)
    pc.add_argument(
        "--blocklist",
        default=None,
        help="parquet of benchmark docs (column `text`); docs sharing any "
        "n-gram with it are dropped before the funnel (decontamination)",
    )
    pc.add_argument("--decontam-n", type=int, default=13)
    pc.add_argument(
        "--c4",
        action="store_true",
        help="C4-style cleaning (Raffel et al. 2020): keep only "
        "terminal-punctuated lines with >= --c4-min-words words and no "
        "'javascript'; drop pages with 'lorem ipsum', curly brackets, "
        "or fewer than --c4-min-sentences sentences after cleaning",
    )
    pc.add_argument("--c4-min-words", type=int, default=3)
    pc.add_argument("--c4-min-sentences", type=int, default=5)
    pc.add_argument(
        "--bpe-merges",
        type=int,
        default=None,
        help="learn this many BPE merges from a --bpe-sample doc sample "
        "of the selected pool and make --token-budget/--pack-tokens "
        "count real subwords instead of whitespace tokens",
    )
    pc.add_argument("--bpe-sample", type=int, default=10_000)
    pc.add_argument(
        "--done-digests",
        default=None,
        help="parquet of already-curated content digests (column "
        "`digest`, md5 of text): incremental runs drop matching docs "
        "after within-corpus exact dedup",
    )
    pc.add_argument(
        "--done-bloom",
        action="store_true",
        help="route the --done-digests anti-join through the Bloom "
        "pre-probe (scan the done set, never shuffle it)",
    )
    pc.add_argument(
        "--lm-ref",
        default=None,
        help="parquet of in-domain reference docs (column `text`): train a "
        "bigram LM on it and drop docs below --min-logprob; docs too short "
        "to score (<2 tokens) are kept and counted, not dropped",
    )
    pc.add_argument("--min-logprob", type=float, default=-12.0)
    pc.add_argument(
        "--para-dedup",
        action="store_true",
        help="corpus-level paragraph dedup before scoring: paragraphs "
        "appearing in more than --para-max-docs distinct docs are removed "
        "from every doc (RefinedWeb-style boilerplate removal)",
    )
    pc.add_argument("--para-max-docs", type=int, default=1)
    pc.add_argument("--para-min-chars", type=int, default=0)
    pc.add_argument(
        "--chunk-dedup",
        type=int,
        default=None,
        metavar="L",
        help="substring-level exact dedup before scoring: every "
        "repeated non-overlapping L-char chunk is cut from all but "
        "its globally-first occurrence (RETRO-chunk approximation of "
        "suffix-array dedup)",
    )
    pc.add_argument(
        "--chunk-dedup-cdc",
        type=int,
        default=None,
        metavar="AVG_TOKENS",
        help="alignment-free substring dedup before scoring: content-"
        "defined token chunks (boundary after tokens hashing to bucket "
        "0 of AVG_TOKENS) so repeated passages match at any position; "
        "composes with --chunk-dedup (grid pass runs first)",
    )
    pc.add_argument(
        "--span-dedup",
        type=int,
        default=None,
        metavar="N_SENTS",
        help="C4-style span dedup before scoring: remove all but the "
        "globally-first occurrence of any N_SENTS-sentence span "
        "(C4 pairs this with --c4; 3 is the paper's value)",
    )
    pc.add_argument(
        "--token-budget",
        default=None,
        help="final mixing stage: per-lang token budgets like "
        "'en=40000,de=20000' — keeps each language's highest-quality "
        "docs until the budget fills (bucketed two-phase select)",
    )
    pc.add_argument(
        "--budget-default",
        type=int,
        default=0,
        help="token budget for languages not listed in --token-budget "
        "(0 drops them)",
    )
    pc.add_argument(
        "--max-dup-line-frac",
        type=float,
        default=None,
        help="drop docs whose duplicate-line fraction exceeds this "
        "(Gopher repetition filter)",
    )
    pc.add_argument(
        "--max-top2gram-frac",
        type=float,
        default=None,
        help="drop docs where the most-repeated 2-gram covers more than "
        "this fraction of characters (Gopher repetition filter)",
    )
    pc.add_argument(
        "--dsir-target",
        default=None,
        help="parquet of in-domain documents: after near-dedup, keep the "
        "--dsir-keep docs whose hashed-n-gram profile is most "
        "target-like (DSIR importance resampling)",
    )
    pc.add_argument("--dsir-keep", type=int, default=None)
    pc.add_argument("--dsir-buckets", type=int, default=10_000)
    pc.add_argument(
        "--semdedup",
        default=None,
        help="embeddings parquet (vec_id == doc_id): drop docs whose "
        "embedding has a preferred within-cluster near-duplicate "
        "(SemDeDup); docs without an embedding are kept",
    )
    pc.add_argument("--semdedup-threshold", type=float, default=0.92)
    pc.add_argument("--semdedup-lists", type=int, default=8)
    pc.add_argument("--semdedup-dim", type=int, default=64)
    pc.add_argument(
        "--clf-ref",
        default=None,
        help="parquet of reference documents: train a hashed-n-gram "
        "logistic classifier (reference vs a sample of this corpus) "
        "and drop docs with P(reference-like) below --clf-min-prob "
        "(unscorable NULL-text docs are kept)",
    )
    pc.add_argument("--clf-min-prob", type=float, default=0.5)
    pc.add_argument("--clf-train-n", type=int, default=500)
    pc.add_argument(
        "--fix-text",
        action="store_true",
        help="repair mojibake/exotic spaces/control chars BEFORE any "
        "other stage (CCNet-style fix_text)",
    )
    pc.add_argument(
        "--pack-tokens",
        type=int,
        default=None,
        help="final stage: pack the curated docs into training rows of "
        "this token budget (contiguous id-order packing); the output "
        "schema becomes (bin_id, packed_text, n_docs, n_tokens)",
    )
    pc.set_defaults(fn=cmd_curate)

    ps = sub.add_parser("stac-ndvi")
    ps.add_argument("--catalog", required=True)
    ps.add_argument("--bbox", required=True, help="x0,y0,x1,y1 (AOI)")
    ps.add_argument("--date-range", default="2021-01-01,2021-12-30")
    ps.add_argument("--collection", default="sentinel-2-l2a")
    ps.add_argument("--max-cloud", type=float, default=20.0)
    ps.add_argument("--out", required=True)
    ps.set_defaults(fn=cmd_stac_ndvi)

    pw = sub.add_parser("stac-landcover")
    pw.add_argument("--catalog", required=True)
    pw.add_argument("--points", required=True,
                    help="parquet with point_id, x, y (projected meters)")
    pw.add_argument("--radius", type=float, default=50.0)
    pw.add_argument("--out", required=True)
    pw.set_defaults(fn=cmd_stac_landcover)

    pl = sub.add_parser("layout")
    pl.add_argument("--input", required=True)
    pl.add_argument("--out", required=True)
    pl.add_argument("--x-col", default="tile_x")
    pl.add_argument("--y-col", default="tile_y")
    pl.add_argument("--num-files", type=int, default=None)
    pl.set_defaults(fn=cmd_layout)

    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
