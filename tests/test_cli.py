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
