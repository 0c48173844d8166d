"""Multimodal binary-column operators: real RAWGRAY path + stub seam."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from qwen_ocr_spark.operators.multimodal import (
    image_features,
    resize_images,
    sample_frames,
    synth_media,
)

N = 60


@pytest.fixture(scope="module")
def media(spark):
    return synth_media(spark, N, partitions=4).cache()


def test_media_schema_and_kinds(media):
    assert media.count() == N
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "video"}
    row = media.where(F.col("codec") == "RAWGRAY").first()
    assert row["meta"]["width"] >= 8
    assert isinstance(row["payload"], (bytes, bytearray))


def test_image_features_real_decode(media):
    feats = {r["media_id"]: r for r in image_features(media).collect()}
    ok = [r for r in feats.values() if r["error"] is None]
    bad = [r for r in feats.values() if r["error"] is not None]
    assert len(ok) + len(bad) == N
    # undecodable JPEG rows hit the stub seam, not a job failure
    assert bad and all("UnsupportedCodec" in r["error"] for r in bad)
    # verify one decode against numpy ground truth
    r = next(r for r in ok if r["kind"] == "image")
    i = r["media_id"]
    w, h = 8 + (i % 9), 8 + ((i * 3) % 9)
    px = np.array([(i * 7 + p) % 251 for p in range(w * h)], dtype=np.uint8)
    assert abs(r["mean_px"] - float(px.mean())) < 1e-9
    assert (r["width"], r["height"]) == (w, h)


def test_resize_nearest_neighbor(media):
    res = {r["media_id"]: r for r in resize_images(media, 4, 4).collect()}
    ok = [r for r in res.values() if r["error"] is None]
    assert ok and all(len(r["payload"]) == 16 for r in ok)
    # deterministic: same input, same bytes
    res2 = {r["media_id"]: r["payload"] for r in resize_images(media, 4, 4).collect()}
    assert all(res[k]["payload"] == res2[k] for k in res2)


def test_frame_sampling(media):
    frames = sample_frames(media, every=2).collect()
    assert frames
    by_vid = {}
    for r in frames:
        by_vid.setdefault(r["media_id"], []).append(r["frame_index"])
    for vid, idxs in by_vid.items():
        assert idxs == sorted(idxs)
        assert all(ix % 2 == 0 for ix in idxs)
        w, h = 8 + (vid % 9), 8 + ((vid * 3) % 9)
        frame_rows = [r for r in frames if r["media_id"] == vid]
        assert all(len(r["payload"]) == w * h for r in frame_rows)
