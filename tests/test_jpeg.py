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


def test_jpeg_rejects_invalid_and_truncated():
    data = bytearray(encode_jpeg(_gradient(16, 16), quality=85))
    # flip SOF0 (FFC0) to SOF2: the baseline scan header (Ss=0, Se=63) is
    # illegal for a progressive DC scan and must fail loudly, not decode
    # garbage
    i = bytes(data).index(b"\xff\xc0")
    data[i + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(data))
    # lossless SOF3 stays rejected by name
    data[i + 1] = 0xC3
    with pytest.raises(ValueError, match="lossless"):
        decode_jpeg(bytes(data))
    # hard truncation mid-entropy-stream
    whole = encode_jpeg(_gradient(64, 64), quality=85)
    with pytest.raises(ValueError):
        decode_jpeg(whole[: len(whole) // 2])


def test_jpeg_progressive_decodes_identical_to_baseline():
    """A progressive file holds the same quantized coefficients as the
    baseline encoding, so decoding both must give IDENTICAL pixels — this
    pins every progressive scan type (DC/AC first + refinement, EOB runs,
    per-scan optimal Huffman tables) against the independent baseline
    path."""
    rng = np.random.default_rng(11)
    for h, w, gray, sub, q in [
        (24, 17, False, False, 85),  # odd dims, 4:4:4
        (33, 29, False, True, 70),   # 4:2:0 with partial MCUs
        (21, 5, True, False, 92),    # grayscale
        (1, 1, True, False, 85),     # degenerate
    ]:
        if gray:
            img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        else:
            yy, xx = np.mgrid[0:h, 0:w]
            base = ((yy * 3 + xx * 5) % 256).astype(np.uint8)
            img = np.stack([base, base[::-1], 255 - base], axis=2)
            img = np.clip(
                img.astype(int) + rng.integers(-40, 40, img.shape), 0, 255
            ).astype(np.uint8)
        pb = encode_jpeg(img, quality=q, subsample=sub, progressive=True)
        assert b"\xff\xc2" in pb  # really SOF2
        b = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub))
        p = decode_jpeg(pb)
        np.testing.assert_array_equal(b, p)


def test_jpeg_progressive_spectral_only_script():
    """A custom spectral-selection-only script (no successive
    approximation) exercises the plain Ss/Se banding path."""
    img = _gradient(40, 24)
    script = [
        ("dc_first", None, 0, 0, 0, 0),
        ("ac_first", 0, 1, 5, 0, 0),
        ("ac_first", 1, 1, 63, 0, 0),
        ("ac_first", 2, 1, 63, 0, 0),
        ("ac_first", 0, 6, 63, 0, 0),
    ]
    p = decode_jpeg(encode_jpeg(img, quality=80, progressive=True, scan_script=script))
    b = decode_jpeg(encode_jpeg(img, quality=80))
    np.testing.assert_array_equal(b, p)


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


def test_jpeg_decode_failure_contract_fuzz():
    """Any truncation or single-byte corruption must either decode or
    raise ValueError/struct.error — never leak OverflowError/IndexError/
    KeyError (corpus-scale decode stages catch exactly those two) and
    never hang.  A truncated PROGRESSIVE file may legitimately decode
    (incremental rendering is the format's design: a cut inside a
    trailing EOB run just leaves late refinements unapplied) — but then
    the result must be a full-shape uint8 image."""
    from struct import error as struct_error

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (24, 20, 3), dtype=np.uint8)
    data = bytearray(encode_jpeg(img, quality=80, progressive=True))
    for cut in range(2, len(data), 11):
        try:
            out = decode_jpeg(bytes(data[:cut]))
        except (ValueError, struct_error):
            continue
        assert out.shape == img.shape and out.dtype == np.uint8
    for _ in range(300):
        pos = int(rng.integers(2, len(data)))
        old = data[pos]
        data[pos] = int(rng.integers(0, 256))
        try:
            decode_jpeg(bytes(data))
        except (ValueError, struct_error):
            pass
        finally:
            data[pos] = old
