"""Multimodal column ops: decode / feature-extract / resize / frame-sample.

Images/audio/video are opaque ``binary`` columns with typed metadata
(w, h, fmt). Because this container ships no PIL/cv2/ffmpeg, the *codec* for
standard formats is stubbed behind ``NotImplementedError``; the engine's own
formats (raw/rle/q8 — sources/images.py) decode for real, so the Spark-side
plumbing — schemas, mapInPandas batching, UDF signatures — is real and
tested end-to-end, and swapping in a real codec is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType

from geojson_spark.sources.images import average_phash, decode_image

_ENGINE_FMTS = {"raw", "rle", "q8"}


def decode_any(buf: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    if fmt in _ENGINE_FMTS:
        return decode_image(buf, fmt, w, h)
    # jpeg/png/webp need an image codec not present in this container
    raise NotImplementedError(f"no codec for fmt={fmt!r} in this environment")


def resize_nearest(px: np.ndarray, w: int, h: int, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize, pure NumPy (real, not a stub)."""
    img = px.reshape(h, w, 3)
    yi = (np.arange(out_h) * h) // out_h
    xi = (np.arange(out_w) * w) // out_w
    return img[yi][:, xi].reshape(-1)


def image_features(images: DataFrame, out_size: int = 8) -> DataFrame:
    """bytes → decoded features: per-channel means, std, recomputed phash,
    and an ``out_size``² thumbnail vector. mapInPandas keeps the binary
    column in Arrow buffers; Catalyst prunes ``bytes`` for queries that
    don't call this."""

    def extract(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                px = decode_any(r.bytes, r.fmt, r.w, r.h)
                img = px.reshape(r.h, r.w, 3).astype(np.float64)
                thumb = resize_nearest(px, r.w, r.h, out_size, out_size)
                rows.append(
                    {
                        "image_id": r.image_id,
                        "mean_r": float(img[:, :, 0].mean()),
                        "mean_g": float(img[:, :, 1].mean()),
                        "mean_b": float(img[:, :, 2].mean()),
                        "std": float(img.std()),
                        "phash2": average_phash(px, r.w, r.h),
                        "thumb": (thumb.astype(np.float64) / 255.0).tolist(),
                    }
                )
            yield pd.DataFrame(rows)

    schema = (
        "image_id string, mean_r double, mean_g double, mean_b double, "
        "std double, phash2 long, thumb array<double>"
    )
    return images.select("image_id", "bytes", "fmt", "w", "h").mapInPandas(extract, schema=schema)


def frame_sample(videos: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling — plumbing-real, codec-stubbed.

    Treats the binary column as a concatenation of raw frames when
    fmt='rawvideo' (deterministic fake for tests); any real container
    format raises NotImplementedError at the decode seam.
    """

    def sample(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.fmt != "rawvideo":
                    raise NotImplementedError(f"no video codec for fmt={r.fmt!r}")
                frame_bytes = r.w * r.h * 3
                n_frames = len(r.bytes) // frame_bytes
                for fi in range(0, n_frames, every_n):
                    frame = r.bytes[fi * frame_bytes : (fi + 1) * frame_bytes]
                    px = np.frombuffer(frame, dtype=np.uint8)
                    rows.append(
                        {"video_id": r.video_id, "frame_no": fi,
                         "mean_px": float(px.mean()) if px.size else 0.0}
                    )
            yield pd.DataFrame(rows, columns=["video_id", "frame_no", "mean_px"])

    return videos.mapInPandas(sample, schema="video_id string, frame_no long, mean_px double")


def audio_features(
    audio: DataFrame, *, frame_samples: int = 1024, id_col: str = "audio_id"
) -> DataFrame:
    """Audio feature extraction — plumbing-real, codec-stubbed.

    fmt='rawpcm16' treats the binary column as mono int16 little-endian
    PCM (deterministic fake for tests); compressed containers (mp3/ogg/
    flac) raise NotImplementedError at the decode seam, mirroring
    ``decode_any``. Per ``frame_samples`` window: RMS, zero-crossing
    count, peak — the standard cheap VAD/quality signals. All math is
    vectorized NumPy over the whole clip (reshape + axis reductions);
    mapInPandas keeps the binary column in Arrow buffers end-to-end.
    """

    def extract(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.fmt != "rawpcm16":
                    raise NotImplementedError(f"no audio codec for fmt={r.fmt!r}")
                pcm = np.frombuffer(r.bytes, dtype="<i2").astype(np.float64) / 32768.0
                n_frames = len(pcm) // frame_samples
                if n_frames == 0:
                    rows.append({id_col: getattr(r, id_col), "frame_no": 0,
                                 "rms": 0.0, "zero_crossings": 0, "peak": 0.0})
                    continue
                fr = pcm[: n_frames * frame_samples].reshape(n_frames, frame_samples)
                rms = np.sqrt((fr * fr).mean(axis=1))
                zc = (np.diff(np.signbit(fr), axis=1) != 0).sum(axis=1)
                peak = np.abs(fr).max(axis=1)
                for i in range(n_frames):
                    rows.append({id_col: getattr(r, id_col), "frame_no": i,
                                 "rms": float(rms[i]), "zero_crossings": int(zc[i]),
                                 "peak": float(peak[i])})
            yield pd.DataFrame(
                rows, columns=[id_col, "frame_no", "rms", "zero_crossings", "peak"]
            )

    return audio.mapInPandas(
        extract,
        schema=f"{id_col} string, frame_no long, rms double, zero_crossings long, peak double",
    )
