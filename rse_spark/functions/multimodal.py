"""Multimodal column plumbing: image/audio/video as opaque binary +
typed metadata, processed through Arrow-batched mapInPandas.

The DECODE step is REAL for container-free formats — BMP / PPM images
and PCM WAV audio parse with numpy alone (functions/codecs.py) — and
honestly NotImplementedError for entropy-coded formats (JPEG/PNG/MP4),
which require native codec libraries this sandbox doesn't ship.
``fake=True`` keeps the deterministic sha-derived stand-in for
exercising the plumbing with arbitrary payloads.

Asset schema:
    asset_id long, kind string (image|audio|video), data binary,
    meta struct<width int, height int, duration_ms int, codec string>
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("data", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)


def synth_assets(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake asset table (binary payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=256 + (i % 7) * 64, dtype=np.uint8)
        rows.append(
            (
                i,
                kind,
                bytes(payload.tobytes()),
                (64 + i % 512, 48 + i % 256, 1000 * (1 + i % 30), "synthetic"),
            )
        )
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def _fake_pixels(data: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for a real image decode."""
    h = hashlib.sha256(data or b"").digest()
    base = np.frombuffer((h * ((width * height * 3) // 32 + 1))[: width * height * 3],
                         dtype=np.uint8)
    return base.reshape(height, width, 3)


DECODED_SCHEMA = (
    "asset_id long, kind string, width int, height int,"
    " mean_intensity double, feat array<float>"
)


def _pool16(px: np.ndarray) -> list[float]:
    """4x4 block-mean pooling -> 16-dim feature (the 'resize' step)."""
    h, w = px.shape[:2]
    ys = np.linspace(0, h, 5, dtype=int)
    xs = np.linspace(0, w, 5, dtype=int)
    feat = []
    for yi in range(4):
        for xi in range(4):
            block = px[ys[yi]: ys[yi + 1], xs[xi]: xs[xi + 1]]
            feat.append(float(block.mean()) if block.size else 0.0)
    return feat


def _audio_feats(samples: np.ndarray) -> tuple[float, list[float]]:
    """(rms, 16 frame-RMS values) over mono-mixed float samples."""
    mono = samples.astype(np.float64).mean(axis=1)
    rms = float(np.sqrt(np.mean(mono ** 2))) if len(mono) else 0.0
    bounds = np.linspace(0, len(mono), 17, dtype=int)
    frames = [
        float(np.sqrt(np.mean(mono[bounds[i]: bounds[i + 1]] ** 2)))
        if bounds[i + 1] > bounds[i] else 0.0
        for i in range(16)
    ]
    return rms, frames


def decode_and_featurize(assets: DataFrame, fake: bool = False,
                         target_size: int = 32,
                         skip_undecodable: bool = False) -> DataFrame:
    """Decode -> resize/frame -> feature-extract over mapInPandas batches.

    Real decode paths (numpy-only, functions/codecs.py):
      image + codec bmp/ppm  -> pixels, 4x4 block-mean 16-dim feat,
                                mean intensity; width/height from the
                                actual decoded array, not the metadata
      audio + codec wav      -> PCM samples, 16 frame-RMS feat, overall
                                RMS as mean_intensity, width=n_samples,
                                height=channels
    Everything else raises NotImplementedError (JPEG/PNG/MP4 need
    native codec libs) — or is dropped when ``skip_undecodable=True``
    (the dead-letter-route choice of a production pipeline).

    ``fake=True``: deterministic sha-derived pixel buffer for any
    payload — exercises the identical plumbing with arbitrary bytes."""
    from rse_spark.functions.codecs import decode_image, decode_wav

    def _proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "asset_id": [], "kind": [], "width": [], "height": [],
                "mean_intensity": [], "feat": [],
            }
            for r in pdf.itertuples():
                data = bytes(r.data) if r.data is not None else b""
                codec = (r.meta["codec"] if r.meta is not None else "") or ""
                try:
                    if fake:
                        w = int(r.meta["width"]) if r.meta is not None else target_size
                        h = int(r.meta["height"]) if r.meta is not None else target_size
                        px = _fake_pixels(data, w, h)
                        mean, feat = float(px.mean()), _pool16(px)
                    elif r.kind == "image":
                        px = decode_image(data, codec)
                        h, w = px.shape[:2]
                        mean, feat = float(px.mean()), _pool16(px)
                    elif r.kind == "audio" and codec == "wav":
                        samples, _rate = decode_wav(data)
                        w, h = int(samples.shape[0]), int(samples.shape[1])
                        mean, feat = _audio_feats(samples)
                    else:
                        raise NotImplementedError(
                            f"decode for kind={r.kind!r} codec={codec!r}"
                            " needs native codec libraries (ffmpeg/PIL)"
                        )
                except NotImplementedError:
                    if skip_undecodable:
                        continue
                    raise
                out["asset_id"].append(r.asset_id)
                out["kind"].append(r.kind)
                out["width"].append(w)
                out["height"].append(h)
                out["mean_intensity"].append(mean)
                out["feat"].append(np.asarray(feat, dtype=np.float32))
            yield pd.DataFrame(out)

    return assets.mapInPandas(_proc, schema=DECODED_SCHEMA)


def synth_real_assets(spark: SparkSession, n: int = 24,
                      seed: int = 42) -> DataFrame:
    """Asset table with REAL payloads: BMP/PPM gradient images and PCM
    WAV sine tones (deterministic), plus 'mp4' video rows whose payload
    is opaque bytes (decode honestly unsupported)."""
    from rse_spark.functions.codecs import encode_bmp, encode_ppm, encode_wav

    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        m = i % 3
        if m == 0:  # image
            w, h = 16 + (i % 5) * 7, 12 + (i % 4) * 5  # odd widths: padding
            yy, xx = np.mgrid[0:h, 0:w]
            px = np.stack(
                [
                    (xx * 255 // max(w - 1, 1)).astype(np.uint8),
                    (yy * 255 // max(h - 1, 1)).astype(np.uint8),
                    np.full((h, w), i * 9 % 256, dtype=np.uint8),
                ],
                axis=-1,
            )
            codec = "bmp" if i % 2 == 0 else "ppm"
            data = encode_bmp(px) if codec == "bmp" else encode_ppm(px)
            rows.append((i, "image", data, (w, h, 0, codec)))
        elif m == 1:  # audio: 440*k Hz sine, 0.25s @ 8kHz
            rate, dur = 8000, 0.25
            t = np.arange(int(rate * dur)) / rate
            amp = 0.5 + 0.04 * (i % 5)
            sig = (amp * 32767 * np.sin(2 * np.pi * 440 * (1 + i % 3) * t))
            data = encode_wav(sig.astype(np.int16), rate)
            rows.append((i, "audio", data, (len(t), 1, 250, "wav")))
        else:  # video: opaque payload
            payload = rng.integers(0, 256, size=512, dtype=np.uint8)
            rows.append(
                (i, "video", bytes(payload.tobytes()),
                 (320, 240, 1000 * (1 + i % 10), "mp4"))
            )
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def frame_sample(assets: DataFrame, every_ms: int = 1000,
                 fake: bool = True) -> DataFrame:
    """Video frame sampling: one output row per sampled timestamp.
    Decode stubbed like above; the row-explosion plumbing (variable
    output cardinality per input row) is the real part."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"asset_id": [], "ts_ms": [], "frame_sha": []}
            for r in pdf.itertuples():
                if r.kind != "video":
                    continue
                if not fake:
                    raise NotImplementedError("video decode needs ffmpeg")
                dur = int(r.meta["duration_ms"]) if r.meta is not None else 0
                for ts in range(0, dur, every_ms):
                    sig = hashlib.sha256(
                        (bytes(r.data) if r.data is not None else b"")
                        + ts.to_bytes(4, "little")
                    ).hexdigest()
                    rows["asset_id"].append(r.asset_id)
                    rows["ts_ms"].append(ts)
                    rows["frame_sha"].append(sig)
            yield pd.DataFrame(rows)

    return assets.mapInPandas(
        _frames, schema="asset_id long, ts_ms int, frame_sha string"
    )
