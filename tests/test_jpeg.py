"""Baseline-JPEG codec (rayhll.functions.jpeg): round-trips within IDCT
tolerance, container sniffing, envelope rejection, and the multimodal
integration (JPEG rotated into the synthetic media table).

Unlike the lossless codecs in test_codecs.py, JPEG round-trips are asserted
within a quality-dependent error budget — the codec is lossy by design.
"""

import numpy as np
import pytest

from rayhll.functions import codecs
from rayhll.functions.jpeg import decode_jpeg, encode_jpeg

rng = np.random.default_rng(987)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            xx * 255 // max(w - 1, 1),
            yy * 255 // max(h - 1, 1),
            (xx + yy) * 255 // max(w + h - 2, 1),
        ],
        axis=2,
    ).astype(np.uint8)


@pytest.mark.parametrize("shape", [(8, 8), (40, 56), (17, 23), (1, 1), (9, 64)])
def test_jpeg_roundtrip_444_high_quality(shape):
    """4:4:4 at q=95: smooth content must survive within a small budget,
    and padding must not corrupt non-multiple-of-8 dimensions."""
    img = _gradient(*shape)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 2.0


def test_jpeg_roundtrip_420_subsampled():
    img = _gradient(30, 46)
    out = decode_jpeg(encode_jpeg(img, quality=90, subsample=True))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 4.0


def test_jpeg_roundtrip_grayscale():
    g = _gradient(24, 40)[:, :, 0]
    out = decode_jpeg(encode_jpeg(g, quality=92))
    assert out.shape == g.shape and out.ndim == 2
    assert np.abs(out.astype(int) - g.astype(int)).mean() < 1.5


@pytest.mark.parametrize("subsample", [False, True])
def test_jpeg_restart_intervals_match_unrestarted(subsample):
    """DRI/RSTn segmentation must not change decoded pixels at all —
    restart markers only reset the entropy coder, not the data."""
    img = _gradient(33, 49)
    plain = decode_jpeg(encode_jpeg(img, quality=80, subsample=subsample))
    restarted = decode_jpeg(
        encode_jpeg(img, quality=80, subsample=subsample, restart_interval=3)
    )
    np.testing.assert_array_equal(plain, restarted)


def test_jpeg_noise_high_quality_bounded_error():
    """Random noise is worst-case for DCT coding; q=98 keeps every sample
    within the quantization step (coarse bound) and the mean small."""
    noise = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(noise, quality=98))
    assert np.abs(out.astype(int) - noise.astype(int)).mean() < 3.0


def test_jpeg_flat_image_near_exact():
    img = np.full((16, 24, 3), 131, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=85))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_jpeg_rejects_bad_inputs():
    with pytest.raises(ValueError):
        decode_jpeg(b"NOTAJPEG")
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((0, 4, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4, 3), dtype=np.float32))
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4, 2), dtype=np.uint8))
    with pytest.raises(ValueError, match="quality"):
        encode_jpeg(np.zeros((4, 4, 3), dtype=np.uint8), quality=0)


def test_jpeg_rejects_progressive_and_truncated():
    data = bytearray(encode_jpeg(_gradient(16, 16), quality=85))
    # flip SOF0 (FFC0) to SOF2 (FFC2) -> progressive must be named
    i = bytes(data).index(b"\xff\xc0")
    data[i + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(data))
    # hard truncation mid-entropy-stream
    whole = encode_jpeg(_gradient(64, 64), quality=85)
    with pytest.raises(ValueError):
        decode_jpeg(whole[: len(whole) // 2])


def test_jpeg_sniff_and_decode_image_dispatch():
    img = _gradient(12, 20)
    data = encode_jpeg(img, quality=95)
    assert codecs.sniff_media(data) == "jpeg"
    out = codecs.decode_image(data)
    assert out.shape == (12, 20, 3)
    # grayscale JPEG broadcasts to RGB through decode_image
    gdata = encode_jpeg(img[:, :, 0], quality=95)
    gout = codecs.decode_image(gdata)
    assert gout.shape == (12, 20, 3)
    assert (gout[:, :, 0] == gout[:, :, 1]).all()


def test_jpeg_in_synth_media_table_decodes():
    """JPEG payloads rotate through synth_media_table and the numpy
    DecodeStage recovers their true dimensions."""
    from rayhll.pipelines.multimodal import DecodeStage, synth_media_table

    tbl = synth_media_table(48)
    kinds = [
        codecs.sniff_media(p)
        for p, m in zip(
            tbl.column("payload").to_pylist(), tbl.column("media_type").to_pylist()
        )
        if m == "image"
    ]
    assert "jpeg" in kinds  # the rotation actually emits JPEGs
    out = DecodeStage(decoder="numpy")(tbl)
    assert out.column("decode_ok").to_pylist() == [True] * 48
