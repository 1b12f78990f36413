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

from geojson_spark.sources.images import average_phash, decode_image, encode_with_phash

_ENGINE_FMTS = {"raw", "rle", "q8"}


def _spread_scan(df: DataFrame) -> DataFrame:
    """Every operator here is an expensive per-row decode loop inside
    mapInPandas — one task per input partition, so a small parquet (one
    partition) would serialize the whole loop on a single core (CLAUDE.md
    small-parquet rule; same guard as images.verify_invariants)."""
    from geojson_spark.functions.spark_funcs import ensure_min_partitions

    return ensure_min_partitions(df)


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
    return _spread_scan(
        images.select("image_id", "bytes", "fmt", "w", "h")
    ).mapInPandas(extract, schema=schema)


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

    # prune to the consumed columns BEFORE Arrow serialization (captions /
    # embeddings / wide metadata must not ride the binary hot path)
    return _spread_scan(videos.select("video_id", "bytes", "fmt", "w", "h")).mapInPandas(
        sample, schema="video_id string, frame_no long, mean_px double"
    )


def audio_features(
    audio: DataFrame, *, frame_samples: int = 1024, id_col: str = "audio_id"
) -> DataFrame:
    """Audio feature extraction — plumbing-real, codec-stubbed.

    fmt='rawpcm16' treats the binary column as mono int16 little-endian
    PCM (deterministic fake for tests); compressed containers (mp3/ogg/
    flac) raise NotImplementedError at the decode seam, mirroring
    ``decode_any``. Per ``frame_samples`` window: RMS, zero-crossing
    count, peak — the standard cheap VAD/quality signals. A trailing
    partial window is measured as its own (shorter) frame — never
    fabricated as silence — and an empty clip emits no rows. All math is
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
                if n_frames:
                    fr = pcm[: n_frames * frame_samples].reshape(n_frames, frame_samples)
                    rms = np.sqrt((fr * fr).mean(axis=1))
                    zc = (np.diff(np.signbit(fr), axis=1) != 0).sum(axis=1)
                    peak = np.abs(fr).max(axis=1)
                    for i in range(n_frames):
                        rows.append({id_col: getattr(r, id_col), "frame_no": i,
                                     "rms": float(rms[i]), "zero_crossings": int(zc[i]),
                                     "peak": float(peak[i])})
                # partial tail (or a clip shorter than one frame): measure
                # the REAL samples — fabricating a silent rms=0 frame made
                # a loud sub-frame clip indistinguishable from silence to
                # any downstream VAD/quality gate. Truly empty clips emit
                # no rows (there is nothing to measure).
                tail = pcm[n_frames * frame_samples :]
                if tail.size:
                    rows.append({
                        id_col: getattr(r, id_col), "frame_no": n_frames,
                        "rms": float(np.sqrt((tail * tail).mean())),
                        "zero_crossings": int((np.diff(np.signbit(tail)) != 0).sum()),
                        "peak": float(np.abs(tail).max()),
                    })
            yield pd.DataFrame(
                rows, columns=[id_col, "frame_no", "rms", "zero_crossings", "peak"]
            )

    # prune to the consumed columns before Arrow serialization
    return _spread_scan(audio.select(id_col, "bytes", "fmt")).mapInPandas(
        extract,
        schema=f"{id_col} string, frame_no long, rms double, zero_crossings long, peak double",
    )


def resize_images(
    images: DataFrame, out_w: int, out_h: int, *, out_fmt: str = "raw"
) -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode: a REAL image
    transform producing a new image table (the standard pre-training
    normalization step). Output schema matches the input-hint table
    (image_id, bytes, w, h, fmt, phash) so resized tables compose with
    every downstream operator (pHash dedup, tiling, invariants).

    Scale: mapInPandas keeps the binary column in Arrow buffers; each
    output row is O(out_w·out_h), so the operator SHRINKS data for
    thumbnailing — the common case — and the scan prunes all other
    columns. No shuffle."""
    def work(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                px = decode_any(r.bytes, r.fmt, r.w, r.h)
                rp = resize_nearest(px, r.w, r.h, out_w, out_h)
                # stored-bytes phash discipline lives in encode_with_phash
                buf, ph = encode_with_phash(rp, out_fmt, out_w, out_h)
                rows.append(
                    {
                        "image_id": r.image_id,
                        "bytes": buf,
                        "w": out_w,
                        "h": out_h,
                        "fmt": out_fmt,
                        "phash": ph,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "fmt", "phash"]
            )

    return _spread_scan(images.select("image_id", "bytes", "fmt", "w", "h")).mapInPandas(
        work, schema="image_id string, bytes binary, w int, h int, fmt string, phash long"
    )


def tile_images(
    images: DataFrame, tile_w: int = 32, tile_h: int = 32, *, out_fmt: str = "raw"
) -> DataFrame:
    """Split every image into a (tile_x, tile_y) grid of sub-images — the
    raster mirror of the vector tile pyramid. Edge tiles are clipped to
    the image bounds (their w/h carry the actual size), so every pixel
    lands in exactly one tile and a GROUP BY (image_id) over tile pixel
    counts reconstructs w·h exactly (asserted in tests).

    One row per tile with a recomputed per-tile pHash, so tile outputs
    feed the SAME hamming-join dedup as whole images (e.g. finding images
    that share a crop). Fan-out = ceil(w/tile_w)·ceil(h/tile_h); no
    shuffle in the operator itself."""
    def work(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                img = decode_any(r.bytes, r.fmt, r.w, r.h).reshape(r.h, r.w, 3)
                for ty in range(0, r.h, tile_h):
                    for tx in range(0, r.w, tile_w):
                        t = img[ty : ty + tile_h, tx : tx + tile_w]
                        th, tw = t.shape[0], t.shape[1]
                        flat = np.ascontiguousarray(t).reshape(-1)
                        # stored-bytes phash discipline: encode_with_phash
                        buf, ph = encode_with_phash(flat, out_fmt, tw, th)
                        rows.append(
                            {
                                "image_id": r.image_id,
                                "tile_x": tx // tile_w,
                                "tile_y": ty // tile_h,
                                "bytes": buf,
                                "w": tw,
                                "h": th,
                                "fmt": out_fmt,
                                "phash": ph,
                            }
                        )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "tile_x", "tile_y", "bytes", "w", "h", "fmt", "phash"],
            )

    return _spread_scan(images.select("image_id", "bytes", "fmt", "w", "h")).mapInPandas(
        work,
        schema=(
            "image_id string, tile_x int, tile_y int, bytes binary, "
            "w int, h int, fmt string, phash long"
        ),
    )


def luma_histogram(images: DataFrame, bins: int = 16) -> DataFrame:
    """Integer-exact luma histogram + brightness per image (the cheap
    exposure/quality filters an image-curation pipeline gates on).

    Luma uses the BT.601 weights as EXACT integer millis —
    ``(299·R + 587·G + 114·B) div 1000`` — and ``bin = luma·bins div 256``,
    so every output is a deterministic integer (reproducible anywhere,
    no float luck). brightness_milli = 1000·Σluma div (n_px·255)."""

    def work(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                img = decode_any(r.bytes, r.fmt, r.w, r.h).reshape(-1, 3).astype(np.int64)
                luma = (299 * img[:, 0] + 587 * img[:, 1] + 114 * img[:, 2]) // 1000
                hist = np.bincount(luma * bins // 256, minlength=bins)
                rows.append(
                    {
                        "image_id": r.image_id,
                        "hist": hist.astype(np.int64).tolist(),
                        "brightness_milli": int(1000 * int(luma.sum()) // (luma.size * 255)),
                    }
                )
            yield pd.DataFrame(rows, columns=["image_id", "hist", "brightness_milli"])

    return _spread_scan(images.select("image_id", "bytes", "fmt", "w", "h")).mapInPandas(
        work, schema="image_id string, hist array<long>, brightness_milli long"
    )
