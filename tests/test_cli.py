"""End-to-end smoke of the spark-submit CLI subcommands over the
fixture tables (pipeline -> metrics -> gap-fill), including resume."""

import argparse
import os

import pytest

from streetview_naturevisibility_spark import cli


def _ns(**kw):
    return argparse.Namespace(master="local[4]", **kw)


class TestCli:
    @pytest.fixture(scope="class")
    def outdir(self, fixture_dir, tmp_path_factory, spark):
        out = str(tmp_path_factory.mktemp("cli_out"))
        args = _ns(
            roads=os.path.join(fixture_dir, "roads.parquet"),
            pages=os.path.join(fixture_dir, "web_pages.parquet"),
            out=out,
            spacing=50,
            max_distance=50.0,
            cut_by_road_centres=False,
            checkpoint=None,
            begin=None,
            end=None,
        )
        cli.cmd_pipeline(args)
        return out

    def test_pipeline_outputs(self, spark, outdir):
        per_road = spark.read.parquet(os.path.join(outdir, "gvi_per_road"))
        gvi = spark.read.parquet(os.path.join(outdir, "gvi_points"))
        assert per_road.count() > 0
        assert gvi.count() > 0
        assert set(per_road.columns) >= {"road_id", "avg_gvi", "total_points"}

    def test_pipeline_resume_reuses_stages(self, spark, fixture_dir, outdir, capsys):
        """Re-running the same command must resume from checkpoints
        (run_stage compute-once) and produce identical outputs."""
        before = (
            spark.read.parquet(os.path.join(outdir, "gvi_per_road"))
            .orderBy("road_id")
            .collect()
        )
        args = _ns(
            roads=os.path.join(fixture_dir, "roads.parquet"),
            pages=os.path.join(fixture_dir, "web_pages.parquet"),
            out=outdir,
            spacing=50,
            max_distance=50.0,
            cut_by_road_centres=False,
            checkpoint=None,
            begin=None,
            end=None,
        )
        cli.cmd_pipeline(args)
        after = (
            spark.read.parquet(os.path.join(outdir, "gvi_per_road"))
            .orderBy("road_id")
            .collect()
        )
        assert before == after

    def test_metrics(self, fixture_dir, outdir, capsys):
        cli.cmd_metrics(_ns(roads=os.path.join(fixture_dir, "roads.parquet"), results=outdir))
        text = capsys.readouterr().out
        assert "availability score" in text
        assert "top-5 highway types" in text

    def test_gap_fill_prints_model_selection(self, spark, fixture_dir, outdir, capsys):
        cli.cmd_gap_fill(
            _ns(
                results=outdir,
                ndvi_grid=os.path.join(fixture_dir, "ndvi_grid.parquet"),
                distance=100.0,
            )
        )
        text = capsys.readouterr().out
        assert "<----- Linear Regression ----->" in text
        assert "<----- Linear GAM ----->" in text
        assert "RMSE:" in text and "AIC value:" in text
        filled = spark.read.parquet(os.path.join(outdir, "gvi_filled"))
        assert filled.count() > 0
        assert "gvi_filled" in filled.columns

    def test_gap_fill_gam_model_flag(self, spark, fixture_dir, outdir, capsys):
        cli.cmd_gap_fill(
            _ns(
                results=outdir,
                ndvi_grid=os.path.join(fixture_dir, "ndvi_grid.parquet"),
                distance=100.0,
                model="gam",
            )
        )
        capsys.readouterr()
        filled = spark.read.parquet(os.path.join(outdir, "gvi_filled")).toPandas()
        assert len(filled) > 0 and filled["gvi_filled"].notna().any()


    @pytest.mark.parametrize("model", ["linear", "gam"])
    def test_gap_fill_disjoint_raster_warns_not_crashes(
        self, spark, fixture_dir, outdir, tmp_path, capsys, model
    ):
        """An NDVI raster that does not overlap the study area at all:
        clean warning + empty output, not a TypeError on None metrics
        (found by the stac-ndvi -> gap-fill integration drive). The gam
        variant guards the eager driver fit: n_known==0 must be caught
        BEFORE gap_fill_gam's toPandas/np.quantile sees an empty array."""
        import pandas as pd

        far = str(tmp_path / "far_grid.parquet")
        pd.DataFrame(
            {
                "cell_x": [0, 1],
                "cell_y": [0, 0],
                "cx": [9e6, 9e6 + 10],
                "cy": [9e6, 9e6],
                "value": [0.5, 0.6],
            }
        ).to_parquet(far, index=False)
        cli.cmd_gap_fill(
            _ns(results=outdir, ndvi_grid=far, distance=100.0, model=model)
        )
        text = capsys.readouterr().out
        assert "WARNING: no points with NDVI values" in text
        assert spark.read.parquet(os.path.join(outdir, "gvi_filled")).count() == 0

class TestCurate:
    def test_curate_funnel(self, spark, tmp_path, capsys):
        """Curation funnel over the sf0.001 documents table: counts are
        monotone non-increasing, exact duplicates are gone, the output
        parquet is readable, and the LSH drop metrics are printed."""
        out = str(tmp_path / "cur")
        args = _ns(
            docs="/root/testdata/sf0.001/documents.parquet",
            out=out,
            min_quality=0.3,
            jaccard=0.5,
            max_bucket=10_000,
            sample="en=0.5,de=1.0,es=1.0,fr=1.0,zh=1.0",
            default_rate=1.0,
        )
        cli.cmd_curate(args)
        text = capsys.readouterr().out
        assert "[lsh] buckets=" in text
        assert "[curate] in=" in text
        import re

        m = re.search(
            r"in=(\d+) quality>=[\d.]+: (\d+) exact-dedup: (\d+) "
            r"near-dedup: (\d+) sampled: (\d+)",
            text,
        )
        assert m, text
        n_in, n_q, n_ex, n_near, n_s = map(int, m.groups())
        assert n_in >= n_q >= n_ex >= n_near >= n_s
        assert n_s > 0
        cur = spark.read.parquet(os.path.join(out, "curated"))
        assert cur.count() == n_s
        # no exact duplicates survive
        from pyspark.sql import functions as F

        assert (
            cur.groupBy(F.md5("text")).count().where("count > 1").count() == 0
        )
        assert "weight" in cur.columns

    def test_lm_filter_keeps_unscorable_short_docs(self, spark, tmp_path, capsys):
        """--lm-ref must KEEP docs too short to score (<2 tokens, NULL
        mean_logprob) per score_bigram_logprob's contract, and print
        the kept-unscorable count — not silently drop them (review
        finding). min_logprob=0 makes every SCORED doc fail (log-probs
        are always negative), so only the single-token doc survives."""
        import pandas as pd

        docs = str(tmp_path / "docs.parquet")
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "hello",  # 1 token -> no bigrams -> unscorable
                    "the quick brown fox jumps over the lazy dog today",
                    "a completely different sentence about spark engines",
                ],
                "lang": ["en", "en", "en"],
                "source": ["t", "t", "t"],
                "n_chars": [5, 49, 51],
            }
        ).to_parquet(docs, index=False)
        out = str(tmp_path / "cur")
        args = _ns(
            docs=docs,
            out=out,
            min_quality=0.0,
            jaccard=0.5,
            max_bucket=10_000,
            sample=None,
            default_rate=1.0,
            lm_ref=docs,
            min_logprob=0.0,
        )
        cli.cmd_curate(args)
        text = capsys.readouterr().out
        assert "[lm] kept 1 unscorable docs" in text
        cur = spark.read.parquet(os.path.join(out, "curated"))
        assert [r.doc_id for r in cur.collect()] == [1]


    def test_para_dedup_and_repetition_filter(self, spark, tmp_path, capsys):
        """--para-dedup strips corpus-wide boilerplate paragraphs before
        scoring; --max-top2gram-frac drops the repetitive doc (Gopher
        axis). Both print their stage lines and the funnel stays
        monotone."""
        import pandas as pd

        boiler = "subscribe to our newsletter today for more updates"
        rows = []
        for i in range(8):
            body = " ".join(f"word{i}x{j} token{(i * 7 + j) % 11}" for j in range(30))
            rows.append((i, body + "\n\n" + boiler))
        rows.append((100, "spam ham " * 40))
        docs = str(tmp_path / "docs.parquet")
        pd.DataFrame(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
                "lang": ["en"] * len(rows),
                "source": ["t"] * len(rows),
                "n_chars": [len(r[1]) for r in rows],
            }
        ).to_parquet(docs, index=False)
        out = str(tmp_path / "cur")
        args = _ns(
            docs=docs,
            out=out,
            min_quality=0.0,
            jaccard=0.5,
            max_bucket=10_000,
            sample=None,
            default_rate=1.0,
            para_dedup=True,
            max_top2gram_frac=0.5,
        )
        cli.cmd_curate(args)
        text = capsys.readouterr().out
        assert "[para] removed=8 boilerplate paragraph instances" in text
        assert "[rep] dropped=1 repetitive docs" in text
        cur = spark.read.parquet(os.path.join(out, "curated"))
        got = {r.doc_id: r.text for r in cur.collect()}
        assert set(got) == set(range(8))  # spam doc gone
        assert all(boiler not in t for t in got.values())


    def test_token_budget_stage(self, spark, tmp_path, capsys):
        """--token-budget fills each predicted language's budget with
        its best docs and prints the per-lang token mix."""
        import pandas as pd

        rows = []
        for i in range(12):
            body = " ".join(
                f"word{i}x{j} the and of to {j}" for j in range(10 + i)
            )
            rows.append((i, body))
        docs = str(tmp_path / "docs.parquet")
        pd.DataFrame(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
                "lang": ["en"] * len(rows),
                "source": ["t"] * len(rows),
                "n_chars": [len(r[1]) for r in rows],
            }
        ).to_parquet(docs, index=False)
        out = str(tmp_path / "cur")
        args = _ns(
            docs=docs,
            out=out,
            min_quality=0.0,
            jaccard=0.5,
            max_bucket=10_000,
            sample=None,
            default_rate=1.0,
            token_budget="en=200",
            budget_default=0,
        )
        cli.cmd_curate(args)
        text = capsys.readouterr().out
        assert "[budget] tokens kept per lang: en=" in text
        cur = spark.read.parquet(os.path.join(out, "curated"))
        total = sum(r.n_tokens for r in cur.select("n_tokens").collect())
        assert 0 < total <= 200

    def test_chunk_dedup_stage(self, spark, tmp_path, capsys):
        """--chunk-dedup cuts repeated L-char chunks from all but the
        first doc before scoring."""
        import pandas as pd

        shared = "0123456789abcdefghij" * 2  # 40 chars = one L=40 chunk
        rows = []
        for i in range(6):
            body = " ".join(f"word{i}x{j} tok{(i * 5 + j) % 13}" for j in range(25))
            rows.append((i, shared + body))
        docs = str(tmp_path / "docs.parquet")
        pd.DataFrame(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
                "lang": ["en"] * len(rows),
                "source": ["t"] * len(rows),
                "n_chars": [len(r[1]) for r in rows],
            }
        ).to_parquet(docs, index=False)
        out = str(tmp_path / "cur")
        args = _ns(
            docs=docs,
            out=out,
            min_quality=0.0,
            jaccard=0.5,
            max_bucket=10_000,
            sample=None,
            default_rate=1.0,
            chunk_dedup=40,
        )
        cli.cmd_curate(args)
        text = capsys.readouterr().out
        assert "[chunk] removed=5 duplicated 40-char chunk instances" in text
        cur = spark.read.parquet(os.path.join(out, "curated"))
        got = {r.doc_id: r.text for r in cur.collect()}
        assert sum(1 for t in got.values() if t.startswith(shared)) == 1

    def test_chunk_dedup_cdc_stage(self, spark, tmp_path, capsys):
        """--chunk-dedup-cdc cuts a repeated passage planted at a
        DIFFERENT token offset in every doc — the case the aligned
        grid provably misses (BENCH/BASELINE.md recall table)."""
        import pandas as pd

        passage = " ".join(f"sharedtok{j:02d}" for j in range(24))
        rows = []
        for i in range(6):
            prefix = " ".join(f"pre{i}x{j}" for j in range(i + 1))
            suffix = f"suf{i}a suf{i}b"
            rows.append((i, f"{prefix} {passage} {suffix}"))
        docs = str(tmp_path / "docs.parquet")
        pd.DataFrame(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
                "lang": ["en"] * len(rows),
                "source": ["t"] * len(rows),
                "n_chars": [len(r[1]) for r in rows],
            }
        ).to_parquet(docs, index=False)
        out = str(tmp_path / "cur")
        args = _ns(
            docs=docs,
            out=out,
            min_quality=0.0,
            jaccard=0.99,
            max_bucket=10_000,
            sample=None,
            default_rate=1.0,
            chunk_dedup_cdc=8,
        )
        cli.cmd_curate(args)
        text = capsys.readouterr().out
        assert "[chunk-cdc] removed=" in text
        cur = spark.read.parquet(os.path.join(out, "curated"))
        got = {r.doc_id: r.text for r in cur.collect()}
        # the passage survives in exactly one doc's full form; the
        # other five lost their interior content-defined chunks
        n_full = sum(1 for t in got.values() if passage in t)
        assert n_full == 1, got
        assert all(f"suf{i}a" in got[i] for i in range(6))  # edges kept

    def test_dsir_stage_keeps_target_like_docs(self, spark, tmp_path, capsys):
        """--dsir-target/--dsir-keep: after dedup, the kept docs are the
        most target-like by hashed-n-gram importance weight — the
        in-domain docs all outrank the out-of-domain ones."""
        import pandas as pd

        voc_a = ["apple", "banana", "cherry", "date", "elder", "fig"]
        voc_b = ["quark", "lepton", "boson", "gluon", "meson", "hadron"]
        import numpy as np

        rng = np.random.RandomState(3)
        rows = []
        for i in range(20):
            voc = voc_a if i < 10 else voc_b
            rows.append((i, " ".join(voc[j] for j in rng.randint(0, 6, size=25))))
        docs = str(tmp_path / "docs.parquet")
        pd.DataFrame(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
                "lang": ["en"] * len(rows),
                "source": ["t"] * len(rows),
                "n_chars": [len(r[1]) for r in rows],
            }
        ).to_parquet(docs, index=False)
        target = str(tmp_path / "target.parquet")
        pd.DataFrame(
            {
                "doc_id": list(range(5)),
                "text": [
                    " ".join(voc_a[j] for j in rng.randint(0, 6, size=20))
                    for _ in range(5)
                ],
            }
        ).to_parquet(target, index=False)
        out = str(tmp_path / "cur")
        args = _ns(
            docs=docs,
            out=out,
            min_quality=0.0,
            jaccard=0.99,
            max_bucket=10_000,
            sample=None,
            default_rate=1.0,
            dsir_target=target,
            dsir_keep=10,
            dsir_buckets=512,
        )
        cli.cmd_curate(args)
        text = capsys.readouterr().out
        assert "[dsir] kept=10 of " in text
        cur = spark.read.parquet(os.path.join(out, "curated"))
        kept = sorted(r.doc_id for r in cur.collect())
        assert kept == list(range(10))  # exactly the in-domain docs
        assert "dsir_logweight" not in cur.columns

    def test_semdedup_stage_drops_embedding_near_dups(
        self, spark, tmp_path, capsys
    ):
        """--semdedup: of a pair of docs with identical embeddings the
        lower doc_id survives; docs with no embedding row are kept."""
        import numpy as np
        import pandas as pd

        rng = np.random.RandomState(9)

        def unit(v):
            return [float(x) for x in v / np.sqrt((v**2).sum())]

        rows = []
        for i in range(6):
            body = " ".join(f"word{i}x{j} tok{(i * 5 + j) % 13}" for j in range(25))
            rows.append((i, body))
        docs = str(tmp_path / "docs.parquet")
        pd.DataFrame(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
                "lang": ["en"] * len(rows),
                "source": ["t"] * len(rows),
                "n_chars": [len(r[1]) for r in rows],
            }
        ).to_parquet(docs, index=False)
        base = rng.randn(8)
        emb = pd.DataFrame(
            {
                # docs 0 and 1 share an embedding; 2-4 distinct; 5 has
                # NO embedding row
                "vec_id": [0, 1, 2, 3, 4],
                "embedding": [
                    unit(base),
                    unit(base),
                    unit(rng.randn(8)),
                    unit(rng.randn(8)),
                    unit(rng.randn(8)),
                ],
            }
        )
        embp = str(tmp_path / "emb.parquet")
        spark.createDataFrame(
            [(int(r.vec_id), r.embedding) for r in emb.itertuples()],
            "vec_id bigint, embedding array<double>",
        ).write.mode("overwrite").parquet(embp)
        out = str(tmp_path / "cur")
        args = _ns(
            docs=docs,
            out=out,
            min_quality=0.0,
            jaccard=0.99,
            max_bucket=10_000,
            sample=None,
            default_rate=1.0,
            semdedup=embp,
            semdedup_threshold=0.95,
            semdedup_lists=4,
            semdedup_dim=8,
        )
        cli.cmd_curate(args)
        text = capsys.readouterr().out
        assert "[semdedup] dropped=1 semantic near-dups" in text
        cur = spark.read.parquet(os.path.join(out, "curated"))
        kept = sorted(r.doc_id for r in cur.collect())
        assert kept == [0, 2, 3, 4, 5]  # 1 dropped; unembedded 5 kept

    def test_clf_gate_drops_off_domain_docs(self, spark, tmp_path, capsys):
        """--clf-ref: the trained classifier gate keeps the
        reference-like half of the corpus and drops the rest."""
        import numpy as np
        import pandas as pd

        voc_a = ["apple", "banana", "cherry", "date", "elder", "fig"]
        voc_b = ["quark", "lepton", "boson", "gluon", "meson", "hadron"]
        rng = np.random.RandomState(7)
        rows = []
        for i in range(24):
            voc = voc_a if i < 12 else voc_b
            rows.append((i, " ".join(voc[j] for j in rng.randint(0, 6, size=20))))
        docs = str(tmp_path / "docs.parquet")
        pd.DataFrame(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
                "lang": ["en"] * len(rows),
                "source": ["t"] * len(rows),
                "n_chars": [len(r[1]) for r in rows],
            }
        ).to_parquet(docs, index=False)
        # positives must outweigh the reference-like docs that leak
        # into the negative sample (negatives are a sample of the
        # corpus ITSELF — the published setup's documented caveat)
        ref = str(tmp_path / "ref.parquet")
        pd.DataFrame(
            {
                "doc_id": list(range(60)),
                "text": [
                    " ".join(voc_a[j] for j in rng.randint(0, 6, size=18))
                    for _ in range(60)
                ],
            }
        ).to_parquet(ref, index=False)
        out = str(tmp_path / "cur")
        args = _ns(
            docs=docs,
            out=out,
            min_quality=0.0,
            jaccard=0.99,
            max_bucket=10_000,
            sample=None,
            default_rate=1.0,
            clf_ref=ref,
            clf_min_prob=0.5,
            clf_train_n=100,
        )
        cli.cmd_curate(args)
        text = capsys.readouterr().out
        assert "[clf] dropped=12 below P(reference-like) 0.5" in text
        cur = spark.read.parquet(os.path.join(out, "curated"))
        assert sorted(r.doc_id for r in cur.collect()) == list(range(12))

    def test_fix_text_stage_repairs_before_dedup(self, spark, tmp_path, capsys):
        """--fix-text runs FIRST: two docs identical except one is
        mojibake-encoded collapse in exact dedup after repair."""
        import pandas as pd

        body = "café crème " + " ".join(
            f"tok{j}" for j in range(30)
        )
        moji = body.encode("utf-8").decode("latin-1")
        assert moji != body
        rows = [(0, body), (1, moji)]
        for i in range(2, 8):
            rows.append(
                (i, " ".join(f"word{i}x{j}" for j in range(30)))
            )
        docs = str(tmp_path / "docs.parquet")
        pd.DataFrame(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
                "lang": ["en"] * len(rows),
                "source": ["t"] * len(rows),
                "n_chars": [len(r[1]) for r in rows],
            }
        ).to_parquet(docs, index=False)
        out = str(tmp_path / "cur")
        args = _ns(
            docs=docs,
            out=out,
            min_quality=0.0,
            jaccard=0.99,
            max_bucket=10_000,
            sample=None,
            default_rate=1.0,
            fix_text=True,
        )
        cli.cmd_curate(args)
        text = capsys.readouterr().out
        assert "[fix] repaired=1 docs" in text
        cur = spark.read.parquet(os.path.join(out, "curated"))
        kept = sorted(r.doc_id for r in cur.collect())
        assert kept == [0, 2, 3, 4, 5, 6, 7]  # mojibake twin deduped away
        got0 = {r.doc_id: r.text for r in cur.collect()}[0]
        assert got0 == body

    def test_pack_tokens_stage_outputs_training_rows(
        self, spark, tmp_path, capsys
    ):
        """--pack-tokens: the curated output becomes fixed-budget
        training rows; total tokens and doc count are conserved."""
        import pandas as pd

        rows = []
        for i in range(12):
            rows.append((i, " ".join(f"w{i}x{j}" for j in range(25))))
        docs = str(tmp_path / "docs.parquet")
        pd.DataFrame(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
                "lang": ["en"] * len(rows),
                "source": ["t"] * len(rows),
                "n_chars": [len(r[1]) for r in rows],
            }
        ).to_parquet(docs, index=False)
        out = str(tmp_path / "cur")
        args = _ns(
            docs=docs,
            out=out,
            min_quality=0.0,
            jaccard=0.99,
            max_bucket=10_000,
            sample=None,
            default_rate=1.0,
            pack_tokens=60,
        )
        cli.cmd_curate(args)
        text = capsys.readouterr().out
        assert "[pack] budget=60 tokens/row" in text
        cur = spark.read.parquet(os.path.join(out, "curated"))
        rows_out = cur.collect()
        assert set(cur.columns) == {"bin_id", "packed_text", "n_docs", "n_tokens"}
        assert sum(r.n_docs for r in rows_out) == 12
        assert sum(r.n_tokens for r in rows_out) == 12 * 25
        # 12 docs x 25 tokens at 60/row -> bins of 2-3 docs
        assert len(rows_out) == 5  # floor packing: 300 tokens / 60

    def test_kitchen_sink_funnel_composes_all_stages(
        self, spark, tmp_path, capsys
    ):
        """EVERY curate stage in one invocation: fix-text, decontam,
        para-dedup, chunk-dedup, repetition filter, LM filter,
        classifier gate, semdedup, DSIR select, stratified sample,
        token budget, packing. The assertion is compositional: each
        stage prints its line, the funnel stays monotone, and the
        final output is packed training rows."""
        import numpy as np
        import pandas as pd

        rng = np.random.RandomState(99)
        voc = ["apple", "banana", "cherry", "date", "elder", "fig",
               "grape", "melon"]
        boiler = "subscribe to our newsletter now for more"
        bench_gram = " ".join(f"b{i}" for i in range(13))
        rows = []
        for i in range(40):
            body = " ".join(voc[j] for j in rng.randint(0, 8, size=40))
            if i == 5:
                body = f"lead {bench_gram} tail " + body  # contaminated
            if i == 9:
                body = "spam ham " * 40  # repetitive
            rows.append((i, body + "\n\n" + boiler))
        docs = str(tmp_path / "docs.parquet")
        pd.DataFrame(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
                "lang": ["en"] * len(rows),
                "source": ["t"] * len(rows),
                "n_chars": [len(r[1]) for r in rows],
            }
        ).to_parquet(docs, index=False)
        ref = str(tmp_path / "ref.parquet")
        pd.DataFrame(
            {
                "doc_id": list(range(50)),
                "text": [
                    " ".join(voc[j] for j in rng.randint(0, 8, size=30))
                    for _ in range(50)
                ],
            }
        ).to_parquet(ref, index=False)
        blk = str(tmp_path / "blk.parquet")
        pd.DataFrame({"doc_id": [0], "text": [f"x {bench_gram} y"]}).to_parquet(
            blk, index=False
        )

        def unit(v):
            return [float(x) for x in v / np.sqrt((v**2).sum())]

        base_vec = rng.randn(8)
        emb_rows = []
        for i in range(40):
            # docs 2 and 3 share an embedding -> semdedup drops 3
            v = base_vec if i in (2, 3) else rng.randn(8)
            emb_rows.append((i, unit(np.asarray(v, dtype=np.float64))))
        embp = str(tmp_path / "emb.parquet")
        spark.createDataFrame(
            emb_rows, "vec_id bigint, embedding array<double>"
        ).write.mode("overwrite").parquet(embp)

        out = str(tmp_path / "cur")
        args = _ns(
            docs=docs,
            out=out,
            min_quality=0.0,
            jaccard=0.8,
            max_bucket=10_000,
            sample="en=1.0",
            default_rate=1.0,
            fix_text=True,
            blocklist=blk,
            decontam_n=13,
            para_dedup=True,
            para_max_docs=1,
            para_min_chars=0,
            chunk_dedup=40,
            max_top2gram_frac=0.5,
            lm_ref=ref,
            min_logprob=-20.0,
            clf_ref=ref,
            clf_min_prob=0.01,
            clf_train_n=50,
            semdedup=embp,
            semdedup_threshold=0.95,
            semdedup_lists=4,
            semdedup_dim=8,
            dsir_target=ref,
            dsir_keep=20,
            dsir_buckets=512,
            # stopword-free fruit vocab language-IDs as "de" (the
            # zero-score tie-fold default) — budget that stratum
            token_budget="de=400",
            budget_default=0,
            pack_tokens=64,
        )
        cli.cmd_curate(args)
        text = capsys.readouterr().out
        for tag in ("[fix]", "[decontam]", "[para]", "[chunk]", "[rep]",
                    "[clf]", "[semdedup]", "[dsir]", "[budget]", "[pack]",
                    "[lsh]", "[curate]"):
            assert tag in text, f"missing stage line {tag}\n{text}"
        assert "[decontam] dropped=1" in text  # doc 5
        assert "[semdedup] dropped=1" in text  # doc 3 (2's twin)
        cur = spark.read.parquet(os.path.join(out, "curated"))
        assert set(cur.columns) == {
            "bin_id", "packed_text", "n_docs", "n_tokens"
        }
        assert cur.count() > 0
        assert cur.agg({"n_tokens": "sum"}).collect()[0][0] <= 400

    def test_dsir_target_requires_keep(self, tmp_path):
        with pytest.raises(SystemExit, match="dsir-keep"):
            cli.cmd_curate(
                _ns(
                    docs="/root/testdata/sf0.001/documents.parquet",
                    out=str(tmp_path / "cur"),
                    min_quality=0.0,
                    jaccard=0.5,
                    max_bucket=10_000,
                    sample=None,
                    default_rate=1.0,
                    dsir_target="/root/testdata/sf0.001/documents.parquet",
                    dsir_keep=None,
                )
            )


class TestLayout:
    def test_layout_subcommand(self, spark, tmp_path):
        from streetview_naturevisibility_spark.sources import derived as D

        src = str(tmp_path / "src")
        D.spark_pages(spark, "/root/testdata/sf0.001").select(
            "doc_id", "tile_x", "tile_y"
        ).write.parquet(src)
        out = str(tmp_path / "z")
        args = _ns(input=src, out=out, x_col="tile_x", y_col="tile_y", num_files=4)
        cli.cmd_layout(args)
        got = spark.read.parquet(out)
        assert "_morton" in got.columns
        assert got.count() == spark.read.parquet(src).count()
