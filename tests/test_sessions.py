"""Session windows: batch gaps-and-islands vs the stateful streaming
operator (applyInPandasWithState) — stream must equal batch."""

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from streetview_naturevisibility_spark.streaming.sessions import (
    sessionize_batch,
    sessionize_stream,
)

SF = "/root/testdata/sf0.001"
GAP = 1800
FLUSH_USER = 9999


class TestSessionizeBatch:
    def test_matches_pandas_oracle(self, spark):
        ev = spark.read.parquet(f"{SF}/events.parquet")
        got = (
            sessionize_batch(ev, gap_seconds=GAP)
            .orderBy("user_id", "session_start")
            .toPandas()
        )
        pdf = ev.select("user_id", "event_id", "ts", "value").toPandas()
        pdf = pdf.sort_values(["user_id", "ts", "event_id"])
        rows = []
        for uid, g in pdf.groupby("user_id"):
            us = g["ts"].astype("int64").to_numpy() // 1000
            brk = np.concatenate([[True], np.diff(us) > GAP * 1_000_000])
            sid = np.cumsum(brk)
            for s in np.unique(sid):
                sel = g[sid == s]
                rows.append(
                    {
                        "user_id": uid,
                        "session_start": sel["ts"].min(),
                        "session_end": sel["ts"].max(),
                        "n_events": len(sel),
                        "sum_value": sel["value"].sum(),
                    }
                )
        exp = (
            pd.DataFrame(rows)
            .sort_values(["user_id", "session_start"])
            .reset_index(drop=True)
        )
        assert len(got) == len(exp)
        assert (got["user_id"].to_numpy() == exp["user_id"].to_numpy()).all()
        assert (got["n_events"].to_numpy() == exp["n_events"].to_numpy()).all()
        assert (
            got["session_start"].to_numpy() == exp["session_start"].to_numpy()
        ).all()
        assert np.allclose(got["sum_value"], exp["sum_value"])


class TestSessionizeStream:
    def test_stream_equals_batch_after_watermark_flush(self, spark, tmp_path):
        ev = spark.read.parquet(f"{SF}/events.parquet")
        src = str(tmp_path / "events_stream")
        out = str(tmp_path / "sessions_out")
        ckpt = str(tmp_path / "ckpt")
        ev.write.mode("overwrite").parquet(src)
        sessionize_stream(spark, src, out, ckpt, gap_seconds=GAP)

        # advance the watermark far past every open session's
        # last_event + gap, so all real sessions time out and emit
        max_ts = ev.agg(F.max("ts")).collect()[0][0]
        flush = spark.createDataFrame(
            [(10_000_000, max_ts + pd.Timedelta(days=10), FLUSH_USER, "flush", 0.0, "{}")],
            ev.schema,
        )
        flush.write.mode("append").parquet(src)
        sessionize_stream(spark, src, out, ckpt, gap_seconds=GAP)

        got = (
            spark.read.parquet(out)
            .where(F.col("user_id") != FLUSH_USER)
            .orderBy("user_id", "session_start")
            .toPandas()
        )
        exp = (
            sessionize_batch(ev, gap_seconds=GAP)
            .orderBy("user_id", "session_start")
            .toPandas()
        )
        assert len(got) == len(exp)
        for col in ("user_id", "n_events", "session_start", "session_end"):
            assert (got[col].to_numpy() == exp[col].to_numpy()).all(), col
        assert np.allclose(got["sum_value"], exp["sum_value"])
