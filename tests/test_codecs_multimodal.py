"""Pure-numpy media codecs (WAV/BMP/PPM round-trips) and the REAL
multimodal decode path over them."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from rse_spark.functions.codecs import (
    decode_bmp,
    decode_image,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_wav,
)
from rse_spark.functions.multimodal import (
    decode_and_featurize,
    synth_real_assets,
)


def test_wav_roundtrip_mono_stereo():
    rng = np.random.default_rng(3)
    mono = rng.integers(-30000, 30000, size=1234, dtype=np.int16)
    got, rate = decode_wav(encode_wav(mono, 22_050))
    assert rate == 22_050
    np.testing.assert_array_equal(got[:, 0], mono)
    stereo = rng.integers(-30000, 30000, size=(777, 2), dtype=np.int16)
    got2, rate2 = decode_wav(encode_wav(stereo, 8000))
    assert rate2 == 8000 and got2.shape == (777, 2)
    np.testing.assert_array_equal(got2, stereo)


@pytest.mark.parametrize("w,h", [(16, 12), (17, 9), (1, 1), (31, 3)])
def test_bmp_roundtrip_with_row_padding(w, h):
    rng = np.random.default_rng(w * 100 + h)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_bmp(encode_bmp(px)), px)


def test_ppm_roundtrip_and_comment_header():
    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_ppm(encode_ppm(px)), px)
    with_comment = b"P6\n# a comment\n7 5\n255\n" + px.tobytes()
    np.testing.assert_array_equal(decode_ppm(with_comment), px)


def test_decode_image_rejects_entropy_coded():
    with pytest.raises(NotImplementedError, match="jpeg"):
        decode_image(b"\xff\xd8\xff", "jpeg")


def test_real_multimodal_pipeline(spark):
    assets = synth_real_assets(spark, n=24)
    feats = decode_and_featurize(
        assets, fake=False, skip_undecodable=True
    ).toPandas().set_index("asset_id")
    # images + audio decoded; videos (mp4) dropped as undecodable
    kinds = set(feats["kind"])
    assert kinds == {"image", "audio"}
    assert len(feats) == 16  # 8 images + 8 audio of 24

    # image 0: known gradient -> exact mean of the constructed pixels
    w, h = 16, 12
    yy, xx = np.mgrid[0:h, 0:w]
    px = np.stack(
        [
            (xx * 255 // (w - 1)).astype(np.uint8),
            (yy * 255 // (h - 1)).astype(np.uint8),
            np.zeros((h, w), dtype=np.uint8),
        ],
        axis=-1,
    )
    assert feats.loc[0, "width"] == w and feats.loc[0, "height"] == h
    assert feats.loc[0, "mean_intensity"] == pytest.approx(float(px.mean()))

    # audio 1: amp = 0.5 + 0.04*(1%5) = 0.54 -> RMS ~ 0.54*32767/sqrt(2)
    want_rms = 0.54 * 32767 / np.sqrt(2)
    assert feats.loc[1, "mean_intensity"] == pytest.approx(
        want_rms, rel=0.01
    )
    assert feats.loc[1, "width"] == 2000 and feats.loc[1, "height"] == 1
    assert all(len(f) == 16 for f in feats["feat"])


def test_real_decode_raises_without_skip(spark):
    assets = synth_real_assets(spark, n=24).filter(
        F.col("kind") == "video"
    )
    with pytest.raises(Exception, match="NotImplementedError|ffmpeg|codec"):
        decode_and_featurize(assets, fake=False).collect()


def test_multimodal_features_feed_ann(spark):
    """End-to-end multimodal retrieval: REAL-decoded image features
    flow into the cosine top-k operator (asset similarity search)."""
    from rse_spark.functions.simsearch import cosine_topk

    assets = synth_real_assets(spark, n=24).filter(
        F.col("kind") == "image"
    )
    feats = decode_and_featurize(assets, fake=False)
    q = [
        float(x)
        for x in feats.filter(F.col("asset_id") == 0)
        .collect()[0]["feat"]
    ]
    top = cosine_topk(
        feats.filter(F.col("asset_id") != 0), q, k=3,
        id_col="asset_id", emb_col="feat",
    ).collect()
    assert len(top) == 3
    # gradient images share structure: nearest neighbors are highly similar
    assert top[0]["cosine"] > 0.9
