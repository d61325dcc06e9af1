"""Multimodal columns for training-data pipelines: image/audio/video as
opaque `binary` columns with typed metadata, processed by Arrow-batched
`mapInPandas` kernels.

The Spark-side plumbing — schemas, batch iteration, partition-preserving
transforms, metadata structs — is real and tested. The media *decode*
step is behind `register_decoder`: this container has no image/audio
libraries, so the default decoders are either a clearly-marked
`NotImplementedError` (real formats) or a deterministic fake codec
(`x-fake` formats) that the tests and synthetic corpus use. Swapping in
Pillow/torchaudio/PyAV is a one-function registration, no plan changes.

Fake codec layout (deterministic, seedable):
    image/x-fake : b"FIMG" + u16 width + u16 height + pixel bytes (w*h)
    audio/x-fake : b"FAUD" + u32 sample_rate + u32 n_samples + i8 samples
    video/x-fake : b"FVID" + u16 w + u16 h + u16 n_frames + frames(w*h each)
"""

from __future__ import annotations

import struct
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META = StructType(
    [
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("n_bytes", LongType()),
    ]
)

MEDIA_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("meta", MEDIA_META),
        StructField("features", ArrayType(DoubleType())),
    ]
)

RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("pixels", BinaryType()),
    ]
)

FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("pixels", BinaryType()),
    ]
)

# --- codec registry (S6-style dispatch: format → decoder) ------------------

Decoder = Callable[[bytes], dict]
_DECODERS: dict[str, Decoder] = {}


def register_decoder(fmt: str, decoder: Decoder) -> None:
    _DECODERS[fmt] = decoder


def _unimplemented(fmt: str) -> Decoder:
    def decode(_data: bytes) -> dict:
        raise NotImplementedError(
            f"decoder for {fmt!r} requires a media library not present in "
            "this environment; register one with register_decoder()"
        )

    return decode


def decode_fake_image(data: bytes) -> dict:
    assert data[:4] == b"FIMG", "bad magic"
    w, h = struct.unpack("<HH", data[4:8])
    pixels = np.frombuffer(data[8 : 8 + w * h], dtype=np.uint8)
    return {"kind": "image", "width": w, "height": h, "pixels": pixels.reshape(h, w)}


def decode_fake_audio(data: bytes) -> dict:
    assert data[:4] == b"FAUD", "bad magic"
    sr, n = struct.unpack("<II", data[4:12])
    samples = np.frombuffer(data[12 : 12 + n], dtype=np.int8)
    return {"kind": "audio", "sample_rate": sr, "samples": samples}


def decode_fake_video(data: bytes) -> dict:
    assert data[:4] == b"FVID", "bad magic"
    w, h, nf = struct.unpack("<HHH", data[4:10])
    frames = np.frombuffer(data[10 : 10 + w * h * nf], dtype=np.uint8)
    return {"kind": "video", "width": w, "height": h, "frames": frames.reshape(nf, h, w)}


register_decoder("image/x-fake", decode_fake_image)
register_decoder("audio/x-fake", decode_fake_audio)
register_decoder("video/x-fake", decode_fake_video)
for _fmt in ("image/jpeg", "image/png", "audio/wav", "video/mp4"):
    register_decoder(_fmt, _unimplemented(_fmt))


# --- fake encoders (synthetic corpus) ---------------------------------------


def encode_fake_image(width: int, height: int, seed: int) -> bytes:
    rng = np.random.RandomState(seed)
    return b"FIMG" + struct.pack("<HH", width, height) + rng.randint(
        0, 256, width * height, dtype=np.int64
    ).astype(np.uint8).tobytes()


def encode_fake_audio(sample_rate: int, n_samples: int, seed: int) -> bytes:
    rng = np.random.RandomState(seed)
    return b"FAUD" + struct.pack("<II", sample_rate, n_samples) + rng.randint(
        -128, 128, n_samples, dtype=np.int64
    ).astype(np.int8).tobytes()


def encode_fake_video(width: int, height: int, n_frames: int, seed: int) -> bytes:
    rng = np.random.RandomState(seed)
    return b"FVID" + struct.pack("<HHH", width, height, n_frames) + rng.randint(
        0, 256, width * height * n_frames, dtype=np.int64
    ).astype(np.uint8).tobytes()


LCG_MULT = 2654435761  # Knuth multiplicative constant


def lcg_bytes(n: int, seed: int) -> np.ndarray:
    """Deterministic byte stream b_i = (seed + (i+1)·LCG_MULT) mod 256,
    i = 0..n-1 — closed-form per position, so a SQL oracle can
    reconstruct every byte (catalog media_features entry)."""
    idx = np.arange(1, n + 1, dtype=np.int64)
    return ((seed + idx * LCG_MULT) % 256).astype(np.uint8)


def encode_lcg_image(width: int, height: int, seed: int) -> bytes:
    """image/x-fake payload with oracle-reproducible LCG pixels."""
    return b"FIMG" + struct.pack("<HH", width, height) + lcg_bytes(width * height, seed).tobytes()


def encode_lcg_audio(sample_rate: int, n_samples: int, seed: int) -> bytes:
    """audio/x-fake payload; samples are the LCG bytes shifted to int8
    (b − 128), so the amplitude histogram matches the image bins."""
    samples = (lcg_bytes(n_samples, seed).astype(np.int16) - 128).astype(np.int8)
    return b"FAUD" + struct.pack("<II", sample_rate, n_samples) + samples.tobytes()


# --- operators ---------------------------------------------------------------


def _meta_of(fmt: str, decoded: dict, n_bytes: int) -> dict:
    return {
        "format": fmt,
        "width": decoded.get("width"),
        "height": decoded.get("height"),
        "n_frames": int(decoded["frames"].shape[0]) if "frames" in decoded else None,
        "sample_rate": decoded.get("sample_rate"),
        "n_samples": int(len(decoded["samples"])) if "samples" in decoded else None,
        "n_bytes": n_bytes,
    }


def extract_media_features(
    media: DataFrame,
    *,
    id_col: str = "media_id",
    fmt_col: str = "format",
    data_col: str = "data",
    n_bins: int = 8,
) -> DataFrame:
    """media(media_id, format, data binary) → (media_id, format, meta,
    features): typed metadata + a deterministic feature vector (an
    n_bins intensity/amplitude histogram, normalized) per item.

    mapInPandas: one Arrow batch in, one out — the executor-side shape a
    real embedding/decode kernel would use.
    """

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for mid, fmt, data in zip(batch[id_col], batch[fmt_col], batch[data_col]):
                decoder = _DECODERS.get(fmt)
                if decoder is None:
                    raise ValueError(f"no decoder registered for {fmt!r}")
                decoded = decoder(bytes(data))
                if decoded["kind"] == "image":
                    values = decoded["pixels"].ravel().astype(np.float64)
                    hist, _ = np.histogram(values, bins=n_bins, range=(0, 256))
                elif decoded["kind"] == "audio":
                    values = decoded["samples"].astype(np.float64)
                    hist, _ = np.histogram(values, bins=n_bins, range=(-128, 128))
                else:
                    values = decoded["frames"].ravel().astype(np.float64)
                    hist, _ = np.histogram(values, bins=n_bins, range=(0, 256))
                total = hist.sum()
                features = (hist / total if total else hist).astype(np.float64)
                rows.append(
                    {
                        "media_id": int(mid),
                        "format": fmt,
                        "meta": _meta_of(fmt, decoded, len(bytes(data))),
                        "features": features.tolist(),
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(proc, MEDIA_FEATURES_SCHEMA)


def resize_images(
    media: DataFrame,
    out_w: int,
    out_h: int,
    *,
    id_col: str = "media_id",
    fmt_col: str = "format",
    data_col: str = "data",
) -> DataFrame:
    """Nearest-neighbor resize of image items (others filtered out)."""

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for mid, fmt, data in zip(batch[id_col], batch[fmt_col], batch[data_col]):
                if not fmt.startswith("image/"):
                    continue
                decoded = _DECODERS[fmt](bytes(data))
                px = decoded["pixels"]
                h, w = px.shape
                yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                resized = px[np.ix_(yi, xi)]
                rows.append(
                    {
                        "media_id": int(mid),
                        "width": out_w,
                        "height": out_h,
                        "pixels": resized.tobytes(),
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "pixels"])

    return media.mapInPandas(proc, RESIZED_SCHEMA)


def sample_video_frames(
    media: DataFrame,
    every_n: int = 2,
    *,
    id_col: str = "media_id",
    fmt_col: str = "format",
    data_col: str = "data",
) -> DataFrame:
    """Every-n-th frame of video items → one row per sampled frame."""

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for mid, fmt, data in zip(batch[id_col], batch[fmt_col], batch[data_col]):
                if not fmt.startswith("video/"):
                    continue
                decoded = _DECODERS[fmt](bytes(data))
                frames = decoded["frames"]
                for fi in range(0, frames.shape[0], every_n):
                    rows.append(
                        {
                            "media_id": int(mid),
                            "frame_index": fi,
                            "width": decoded["width"],
                            "height": decoded["height"],
                            "pixels": frames[fi].tobytes(),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_index", "width", "height", "pixels"]
            )

    return media.mapInPandas(proc, FRAME_SAMPLE_SCHEMA)


def generate_media_df(spark, n: int, *, seed: int = 42, partitions: int = 4) -> DataFrame:
    """Deterministic synthetic media table (media_id, format, data)."""
    ids = spark.range(0, n, 1, partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for i in batch["id"]:
                i = int(i)
                kind = i % 3
                s = seed * 7919 + i
                if kind == 0:
                    rows.append((i, "image/x-fake", encode_fake_image(16 + i % 8, 12, s)))
                elif kind == 1:
                    rows.append((i, "audio/x-fake", encode_fake_audio(8000, 200 + i % 50, s)))
                else:
                    rows.append((i, "video/x-fake", encode_fake_video(8, 6, 4 + i % 3, s)))
            yield pd.DataFrame(rows, columns=["media_id", "format", "data"])

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("format", StringType()),
            StructField("data", BinaryType()),
        ]
    )
    return ids.mapInPandas(gen, schema)
