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
    assert kinds == {"image", "video", "audio"}
    codecs_present = {r["codec"] for r in media.select("codec").distinct().collect()}
    assert {"RAWGRAY", "PNG", "BMP", "PGM", "WAV", "JPEG", "GIF",
            "WEBP", "TIFF"} <= codecs_present
    # GIF appears both as an image still and a video container (round 5)
    gif_kinds = {r["kind"] for r in
                 media.where(F.col("codec") == "GIF").select("kind").distinct().collect()}
    assert gif_kinds == {"image", "video"}
    row = media.where(F.col("codec") == "RAWGRAY").first()
    assert row["meta"]["width"] >= 8
    assert isinstance(row["payload"], (bytes, bytearray))


def test_image_features_encoding_invariant(media):
    """PNG/BMP/PGM rows carry the same pixel content as the RAWGRAY
    formula — a real container decode must recover identical stats; JPEG
    is lossy, so its rows match within tolerance instead of exactly."""
    feats = [r for r in image_features(media).collect() if r["error"] is None]
    by_codec = {}
    rows = {r["media_id"]: r for r in media.collect()}
    for r in feats:
        if rows[r["media_id"]]["kind"] != "image":
            continue
        i = r["media_id"]
        w, h = 8 + (i % 9), 8 + ((i * 3) % 9)
        px = np.array([(i * 7 + p) % 251 for p in range(w * h)], dtype=np.uint8)
        tol = 3.0 if rows[i]["codec"] == "JPEG" else 1e-9
        assert abs(r["mean_px"] - float(px.mean())) < tol, \
            f"codec {rows[i]['codec']} drifted"
        by_codec.setdefault(rows[i]["codec"], 0)
        by_codec[rows[i]["codec"]] += 1
    for c in ("PNG", "BMP", "PGM", "RAWGRAY", "JPEG", "GIF", "WEBP",
              "TIFF"):
        assert by_codec.get(c, 0) > 0, f"no decoded {c} rows in fixture"


def test_audio_features_real_wav(media):
    from qwen_ocr_spark.operators.multimodal import audio_features
    feats = [r for r in audio_features(media).collect()]
    assert feats and all(r["error"] is None for r in feats)
    r = feats[0]
    i = r["media_id"]
    rate = 8000 * (1 + i % 3)
    assert r["sample_rate"] == rate
    assert r["n_samples"] == rate // 100
    assert r["duration_ms"] == r["n_samples"] * 1000 // rate
    samp = np.array([((i * 31 + k * 7) % 2048) - 1024
                     for k in range(rate // 100)], dtype=np.float64)
    import math
    assert r["rms_e6"] == int(math.floor(math.sqrt((samp ** 2).mean()) * 1e6))


def test_image_features_real_decode(media):
    feats = {r["media_id"]: r for r in image_features(media).collect()}
    ok = [r for r in feats.values() if r["error"] is None]
    bad = [r for r in feats.values() if r["error"] is not None]
    n_audio = media.where(F.col("kind") == "audio").count()
    assert len(ok) + len(bad) == N - n_audio  # audio handled by audio_features
    # hierarchical-JPEG rows hit the (narrowed) stub seam, not a job
    # failure; progressive, arithmetic, progressive-arithmetic (round 4)
    # AND lossless SOF3 (round 5) rows now REALLY decode
    assert bad and all("UnsupportedCodec" in r["error"] for r in bad)
    assert all("hierarchical" in r["error"] for r in bad)
    assert all(r["media_id"] % 176 == 32 and r["media_id"] % 32 != 16
               for r in bad)  # only the SOF5 rows
    jpeg_ids = {r["media_id"] for r in
                media.where(F.col("codec") == "JPEG").select("media_id").collect()}
    # baseline AND progressive JPEG rows decode — lossy, so stats match
    # within tolerance
    decoded_jpegs = [r for r in ok if r["media_id"] in jpeg_ids]
    assert decoded_jpegs
    assert any(r["media_id"] % 4 == 2 for r in decoded_jpegs)  # progressive
    for r in decoded_jpegs:
        i = r["media_id"]
        w, h = 8 + (i % 9), 8 + ((i * 3) % 9)
        px = np.array([(i * 7 + p) % 251 for p in range(w * h)], dtype=np.uint8)
        assert (r["width"], r["height"]) == (w, h)
        assert abs(r["mean_px"] - float(px.mean())) < 3.0  # lossy tolerance
    # verify one LOSSLESS decode against numpy ground truth exactly
    r = next(r for r in ok
             if r["kind"] == "image" and r["media_id"] not in jpeg_ids)
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
        # container-invariant content: RAWGRAY slices and GIF-decoded
        # frames must both reproduce the generator formula exactly
        for r in frame_rows:
            f = r["frame_index"]
            expect = bytes(((vid * 7 + f * 13 + p) % 251)
                           for p in range(w * h))
            assert bytes(r["payload"]) == expect, (vid, f)
    # both containers are present among the sampled videos
    vid_codecs = {r["media_id"]: r["codec"]
                  for r in media.where(F.col("kind") == "video").collect()}
    assert {vid_codecs[v] for v in by_vid} == {"RAWGRAY", "GIF"}
