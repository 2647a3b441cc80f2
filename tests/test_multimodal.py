"""Multimodal plumbing: schemas, mapInPandas batch shapes, 1->N frame
expansion — real Spark pipelines over stubbed decoders."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from streetview_naturevisibility_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.synth_media(spark, 90)


class TestMultimodal:
    def test_image_features_schema_and_determinism(self, spark, media):
        a = mm.image_features(media).orderBy("media_id").toPandas()
        b = mm.image_features(media.repartition(7)).orderBy("media_id").toPandas()
        assert a["media_id"].tolist() == b["media_id"].tolist()
        assert a["sha256"].tolist() == b["sha256"].tolist()
        assert all(len(e) == 16 for e in a["embedding"])
        # embeddings are normalized histograms
        assert all(abs(sum(e) - 1.0) < 1e-5 for e in a["embedding"])
        # only image rows processed
        assert len(a) == 30

    def test_resize_shapes(self, spark, media):
        out = mm.resize_images(media, 8, 8).toPandas()
        assert (out["width"] == 8).all() and (out["height"] == 8).all()
        assert all(len(p) == 64 for p in out["pixels"])

    def test_frame_sampling_expansion(self, spark, media):
        frames = mm.sample_video_frames(media, every_ms=1000).toPandas()
        # one video every 3 ids, duration (i%7+1)*1500ms -> >=1 frame each
        vids = frames["media_id"].unique()
        assert len(vids) == 30
        per = frames.groupby("media_id").size()
        durs = {i: (i % 7 + 1) * 1500 for i in range(90) if i % 3 == 2}
        for mid, n in per.items():
            assert n == max(durs[mid] // 1000, 1)

    def test_stub_decoder_raises_on_empty_payload(self):
        with pytest.raises(NotImplementedError):
            mm._fake_decode_image(b"", 4, 4)
