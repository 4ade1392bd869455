"""Multimodal column plumbing: image/audio/video as opaque binary +
typed metadata, processed through Arrow-batched mapInPandas.

The container has no image/audio libraries, so the DECODE step is
stubbed (NotImplementedError) behind ``fake=True`` deterministic fakes —
but everything Spark-side is real and tested: the asset schema, the
batch iterator shape, the UDF signatures, partition sizing for large
binaries, and the downstream feature pipeline (the fake embedding is a
deterministic md5-derived vector, so joins/ANN over it are exercised
end-to-end).

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


def decode_and_featurize(assets: DataFrame, fake: bool = True,
                         target_size: int = 32) -> DataFrame:
    """Decode -> resize -> feature-extract over mapInPandas batches.

    ``fake=False`` raises NotImplementedError at the decode step (the
    sandbox ships no codecs); ``fake=True`` substitutes a deterministic
    sha-derived pixel buffer so the full Spark plumbing — Arrow batch
    iteration, per-row binary handling, vectorized feature math, output
    schema — runs for real. feat = 16-dim block-mean vector of the
    (fake-)resized image."""

    def _proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "asset_id": [], "kind": [], "width": [], "height": [],
                "mean_intensity": [], "feat": [],
            }
            for r in pdf.itertuples():
                w = int(r.meta["width"]) if r.meta is not None else target_size
                h = int(r.meta["height"]) if r.meta is not None else target_size
                if not fake:
                    raise NotImplementedError(
                        "real image/audio decode requires PIL/ffmpeg —"
                        " not available in this container; run with"
                        " fake=True for the deterministic stand-in"
                    )
                px = _fake_pixels(bytes(r.data) if r.data is not None else b"", w, h)
                # "resize": average-pool to target_size x target_size
                ys = np.linspace(0, h, 5, dtype=int)
                xs = np.linspace(0, w, 5, dtype=int)
                feat = []
                for yi in range(4):
                    for xi in range(4):
                        block = px[ys[yi]: ys[yi + 1], xs[xi]: xs[xi + 1]]
                        feat.append(
                            float(block.mean()) if block.size else 0.0
                        )
                out["asset_id"].append(r.asset_id)
                out["kind"].append(r.kind)
                out["width"].append(w)
                out["height"].append(h)
                out["mean_intensity"].append(float(px.mean()))
                out["feat"].append(np.asarray(feat, dtype=np.float32))
            yield pd.DataFrame(out)

    return assets.mapInPandas(_proc, schema=DECODED_SCHEMA)


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
