"""Multimodal columns: opaque binary payloads + typed metadata.

Pattern for image/audio/video at corpus scale: the payload is an opaque
``binary`` column; a typed ``meta`` struct travels beside it; every
transform is an Arrow-batched ``mapInPandas`` whose UDF operates on
``bytes`` + numpy — the Spark-side plumbing (schemas, batch shapes,
partitioning, error channel) is real and tested.

Decoders: this container has no image/audio codecs (no PIL/ffmpeg), so
* RAWGRAY (our synthetic format: width*height single-byte pixels, the same
  bytes the PDF path stores for figure XObjects) is decoded/resized/
  sampled FOR REAL with numpy;
* any other codec raises ``UnsupportedCodec`` inside the row-level error
  channel — the clearly-marked stub seam where a real decoder plugs in.

media(media_id bigint, kind string, codec string, payload binary,
      meta struct<width int, height int, n_frames int, sample_rate int>)
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id bigint, kind string, codec string, payload binary, "
    "meta struct<width int, height int, n_frames int, sample_rate int>"
)


class UnsupportedCodec(NotImplementedError):
    """STUB SEAM: raised for codecs this container cannot decode (no
    PIL/libav here).  Replace by a real decoder in a full deployment."""


def _require_rawgray(codec: str) -> None:
    if codec != "RAWGRAY":
        raise UnsupportedCodec(f"no decoder for codec={codec!r} in this container")


def _decode_gray(payload: bytes, w: int, h: int) -> np.ndarray:
    a = np.frombuffer(payload, dtype=np.uint8)
    if a.size < w * h:
        raise ValueError(f"payload {a.size}B < {w}x{h}")
    return a[: w * h].reshape(h, w)


def synth_media(spark, n: int, partitions: int | None = None) -> DataFrame:
    """Deterministic synthetic media table: RAWGRAY images and 'videos'
    (stacked frames), plus a sprinkling of undecodable codecs to exercise
    the stub seam."""
    if partitions is None:
        partitions = max(4, spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for b in batches:
            for i in b["id"]:
                i = int(i)
                w, h = 8 + (i % 9), 8 + ((i * 3) % 9)
                if i % 11 == 10:
                    rows.append((i, "image", "JPEG", b"\xff\xd8fakejpeg",
                                 (w, h, 1, 0)))
                elif i % 3 == 2:
                    n_frames = 4 + (i % 5)
                    frames = bytes(
                        ((i * 7 + f * 13 + p) % 251)
                        for f in range(n_frames) for p in range(w * h)
                    )
                    rows.append((i, "video", "RAWGRAY", frames,
                                 (w, h, n_frames, 0)))
                else:
                    px = bytes(((i * 7 + p) % 251) for p in range(w * h))
                    rows.append((i, "image", "RAWGRAY", px, (w, h, 1, 0)))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "codec", "payload", "meta"])
            rows = []

    return spark.range(0, n, numPartitions=partitions).mapInPandas(
        gen, schema=MEDIA_SCHEMA)


FEATURES_SCHEMA = (
    "media_id bigint, kind string, width int, height int, mean_px double, "
    "std_px double, error string"
)


def image_features(media: DataFrame) -> DataFrame:
    """Decode + per-image stats (mean/std pixel) — numpy per Arrow batch.
    Undecodable rows land in the error column, never fail the task."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for mid, kind, codec, payload, meta in zip(
                b["media_id"], b["kind"], b["codec"], b["payload"], b["meta"]
            ):
                try:
                    _require_rawgray(codec)
                    w, h = int(meta["width"]), int(meta["height"])
                    img = _decode_gray(bytes(payload), w, h)
                    out.append((int(mid), kind, w, h,
                                float(img.mean()), float(img.std()), None))
                except Exception as e:
                    out.append((int(mid), kind, 0, 0, 0.0, 0.0,
                                f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(out, columns=[
                "media_id", "kind", "width", "height", "mean_px", "std_px",
                "error"])
    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = "media_id bigint, width int, height int, payload binary, error string"


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize on raw grayscale (real numpy implementation)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for mid, codec, payload, meta in zip(
                b["media_id"], b["codec"], b["payload"], b["meta"]
            ):
                try:
                    _require_rawgray(codec)
                    w, h = int(meta["width"]), int(meta["height"])
                    img = _decode_gray(bytes(payload), w, h)
                    ys = (np.arange(out_h) * h // out_h)
                    xs = (np.arange(out_w) * w // out_w)
                    resized = img[np.ix_(ys, xs)]
                    out.append((int(mid), out_w, out_h,
                                resized.tobytes(), None))
                except Exception as e:
                    out.append((int(mid), 0, 0, b"", f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(out, columns=[
                "media_id", "width", "height", "payload", "error"])
    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = "media_id bigint, frame_index int, payload binary"


def sample_frames(media: DataFrame, every: int = 2) -> DataFrame:
    """Video → every k-th frame as its own image row (frame extraction)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for mid, kind, codec, payload, meta in zip(
                b["media_id"], b["kind"], b["codec"], b["payload"], b["meta"]
            ):
                if kind != "video" or codec != "RAWGRAY":
                    continue
                w, h = int(meta["width"]), int(meta["height"])
                n_frames = int(meta["n_frames"])
                raw = bytes(payload)
                for f in range(0, n_frames, every):
                    frame = raw[f * w * h: (f + 1) * w * h]
                    out.append((int(mid), f, frame))
            yield pd.DataFrame(out, columns=["media_id", "frame_index", "payload"])
    return media.mapInPandas(run, schema=FRAMES_SCHEMA)
