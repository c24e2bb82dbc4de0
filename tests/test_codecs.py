"""Pure-numpy codec round-trips and the real (numpy-decoder) multimodal path.

Pixel/sample values are asserted EXACTLY — these are lossless uncompressed
formats, so any off-by-one in padding/stride/channel order fails loudly.
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from rayhll.functions import codecs


rng = np.random.default_rng(1234)


@pytest.mark.parametrize("shape", [(3, 5), (1, 1), (7, 4), (16, 16), (3, 2)])
def test_bmp_roundtrip_exact(shape):
    img = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
    data = codecs.encode_bmp(img)
    out = codecs.decode_bmp(data)
    np.testing.assert_array_equal(out, img)


def test_bmp_top_down_rows():
    img = rng.integers(0, 256, size=(4, 3, 3), dtype=np.uint8)
    data = bytearray(codecs.encode_bmp(img[::-1]))  # encode flipped, then
    import struct

    # rewrite height negative -> top-down; raster rows are now top-first
    struct.pack_into("<i", data, 22, -4)
    out = codecs.decode_bmp(bytes(data))
    np.testing.assert_array_equal(out, img[::-1][::-1])  # == img reversed twice
    # explicit: top-down raster read in file order
    assert out.shape == (4, 3, 3)


def test_bmp_rejects_non_bmp_and_unsupported():
    with pytest.raises(ValueError):
        codecs.decode_bmp(b"NOTABMP" + b"\x00" * 64)
    img = rng.integers(0, 256, size=(2, 2, 3), dtype=np.uint8)
    data = bytearray(codecs.encode_bmp(img))
    data[28] = 8  # bpp -> 8
    with pytest.raises(ValueError):
        codecs.decode_bmp(bytes(data))


def test_ppm_p6_p5_roundtrip_and_comments():
    img = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    np.testing.assert_array_equal(codecs.decode_ppm(codecs.encode_ppm(img)), img)
    gray = rng.integers(0, 256, size=(4, 9), dtype=np.uint8)
    np.testing.assert_array_equal(codecs.decode_ppm(codecs.encode_ppm(gray)), gray)
    # header comments + odd whitespace
    with_comment = b"P6\n# a comment\n 5 6 # trailing\n255\n" + img.tobytes()
    np.testing.assert_array_equal(codecs.decode_ppm(with_comment), img)


def test_wav_roundtrip_pcm16_stereo():
    samples = rng.integers(-30000, 30000, size=(500, 2)).astype(np.int16)
    out, rate = codecs.decode_wav(codecs.encode_wav(samples, 44100))
    assert rate == 44100
    np.testing.assert_array_equal(out, samples)


def test_wav_roundtrip_pcm8_mono_and_float32():
    s8 = rng.integers(0, 256, size=300, dtype=np.uint8)
    out, rate = codecs.decode_wav(codecs.encode_wav(s8, 8000))
    assert rate == 8000
    np.testing.assert_array_equal(out[:, 0], s8)
    f32 = rng.standard_normal(256).astype(np.float32)
    out, _ = codecs.decode_wav(codecs.encode_wav(f32, 16000))
    np.testing.assert_array_equal(out[:, 0], f32)


def test_wav_skips_unknown_chunks():
    samples = np.arange(-50, 50, dtype=np.int16)
    data = codecs.encode_wav(samples, 22050)
    # splice a LIST chunk between fmt and data
    import struct

    fmt_end = 12 + 8 + 16
    junk = b"LIST" + struct.pack("<I", 6) + b"INFOab"
    spliced = data[:fmt_end] + junk + data[fmt_end:]
    # fix RIFF size
    spliced = b"RIFF" + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    out, rate = codecs.decode_wav(spliced)
    assert rate == 22050
    np.testing.assert_array_equal(out[:, 0], samples)


def test_rawvideo_roundtrip_and_partial_frame_drop():
    frames = rng.integers(0, 256, size=(5, 6, 4, 3), dtype=np.uint8)
    data = codecs.encode_rawvideo(frames)
    np.testing.assert_array_equal(codecs.decode_rawvideo(data, 4, 6), frames)
    # trailing partial frame dropped
    np.testing.assert_array_equal(
        codecs.decode_rawvideo(data + b"\x01\x02", 4, 6), frames
    )


def test_mjpeg_roundtrip_and_dispatch():
    """MJPEG: concatenated JPEG frames split exactly on EOI, decode within
    JPEG quantization error, self-describe their dims through
    decode_video's sniffing, and reject malformed streams."""
    # smooth gradient frames: high-quality JPEG stays within a tight bound
    base = np.linspace(0, 200, 6 * 8 * 3).reshape(6, 8, 3)
    frames = np.stack(
        [np.clip(base + 10 * k, 0, 255).astype(np.uint8) for k in range(4)]
    )
    data = codecs.encode_mjpeg(frames, quality=95)
    got = codecs.decode_mjpeg(data)
    assert got.shape == frames.shape
    assert np.max(np.abs(got.astype(int) - frames.astype(int))) <= 12
    # container sniffing: SOI prefix -> MJPEG (dims hints ignored), else raw
    np.testing.assert_array_equal(codecs.decode_video(data, -1, -1), got)
    raw = codecs.encode_rawvideo(frames)
    np.testing.assert_array_equal(codecs.decode_video(raw, 8, 6), frames)
    # trailing partial frame dropped (rawvideo parity)
    assert len(codecs.decode_mjpeg(data + data[: len(data) // 9])) == 4
    with pytest.raises(ValueError):
        codecs.decode_mjpeg(b"\x00\x01rubbish")
    with pytest.raises(ValueError):  # frames disagreeing on dims
        one = codecs.encode_mjpeg(frames[:1], quality=95)
        other = codecs.encode_mjpeg(
            np.zeros((1, 12, 4, 3), dtype=np.uint8), quality=95
        )
        codecs.decode_mjpeg(one + other)


def test_resize_nearest_exact():
    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    half = codecs.resize_nearest(img, 2, 2)
    np.testing.assert_array_equal(half, img[::2, ::2])
    same = codecs.resize_nearest(img, 4, 4)
    np.testing.assert_array_equal(same, img)
    up = codecs.resize_nearest(img, 8, 8)
    assert up.shape == (8, 8, 3)
    np.testing.assert_array_equal(up[::2, ::2], img)


def test_image_grid_features_constant_image():
    img = np.full((16, 16, 3), 128, dtype=np.uint8)
    feats = codecs.image_grid_features(img, grid=8)
    assert feats.shape == (64,)
    np.testing.assert_allclose(feats, 128 / 255.0, rtol=1e-6)


def test_image_grid_features_block_means():
    # 2x2 grid over a 4x4 image: each block mean computable by hand
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[:2, :2] = 255  # top-left block all white
    feats = codecs.image_grid_features(img, grid=2)
    np.testing.assert_allclose(feats, [1.0, 0.0, 0.0, 0.0], atol=1e-6)


def test_audio_band_energy_constant_tone():
    samples = np.full(1000, 16384, dtype=np.int16)  # 0.5 amplitude
    bands = codecs.audio_band_energy(samples, bands=4)
    np.testing.assert_allclose(bands, 0.5, rtol=1e-4)
    assert codecs.audio_band_energy(np.array([], dtype=np.int16), 4).shape == (4,)


def test_sniff_media():
    img = rng.integers(0, 256, size=(2, 2, 3), dtype=np.uint8)
    assert codecs.sniff_media(codecs.encode_bmp(img)) == "bmp"
    assert codecs.sniff_media(codecs.encode_ppm(img)) == "pnm"
    assert codecs.sniff_media(codecs.encode_wav(np.zeros(4, np.int16), 8000)) == "wav"
    assert codecs.sniff_media(b"\x00\x01\x02") is None


# ----------------------------------------------------------------------
# numpy-decoder multimodal stages (real decode end-to-end)


def test_decode_stage_numpy_recovers_metadata():
    from rayhll.pipelines.multimodal import DecodeStage, synth_media_table

    tbl = synth_media_table(60)
    out = DecodeStage(decoder="numpy")(tbl)
    assert out.column("decode_ok").to_pylist() == [True] * 60
    media = out.column("media_type").to_pylist()
    rates = out.column("sample_rate").to_pylist()
    ws = out.column("width").to_pylist()
    for m, r, w, payload in zip(media, rates, ws, tbl.column("payload").to_pylist()):
        if m == "audio":
            assert r == 8000
        else:
            assert r == -1
        if m == "image":
            # width recovered from the payload header, not the (-1) metadata
            assert w == codecs.decode_image(payload).shape[1]


def test_feature_extract_stage_numpy_matches_direct():
    from rayhll.pipelines.multimodal import FeatureExtractStage

    img = rng.integers(0, 256, size=(20, 30, 3), dtype=np.uint8)
    samples = rng.integers(-1000, 1000, size=800).astype(np.int16)
    tbl = pa.table(
        {
            "asset_id": pa.array([0, 1], type=pa.int64()),
            "media_type": pa.array(["image", "audio"]),
            "payload": pa.array(
                [codecs.encode_bmp(img), codecs.encode_wav(samples, 8000)],
                type=pa.binary(),
            ),
            "width": pa.array([-1, -1], type=pa.int32()),
            "height": pa.array([-1, -1], type=pa.int32()),
        }
    )
    out = FeatureExtractStage(dim=64, decoder="numpy")(tbl)
    feats = np.array(out.column("features").to_pylist(), dtype=np.float32)
    np.testing.assert_array_equal(feats[0], codecs.image_grid_features(img, grid=8))
    np.testing.assert_array_equal(feats[1], codecs.audio_band_energy(samples, bands=64))


def test_resize_stage_numpy_rewrites_payload():
    from rayhll.pipelines.multimodal import ResizeStage

    img = rng.integers(0, 256, size=(10, 8, 3), dtype=np.uint8)
    tbl = pa.table(
        {
            "asset_id": pa.array([0], type=pa.int64()),
            "media_type": pa.array(["image"]),
            "payload": pa.array([codecs.encode_ppm(img)], type=pa.binary()),
            "width": pa.array([-1], type=pa.int32()),
            "height": pa.array([-1], type=pa.int32()),
        }
    )
    out = ResizeStage(target_w=4, target_h=5, decoder="numpy")(tbl)
    resized = codecs.decode_bmp(out.column("payload")[0].as_py())
    np.testing.assert_array_equal(resized, codecs.resize_nearest(img, 4, 5))
    assert out.column("width").to_pylist() == [4]
    assert out.column("height").to_pylist() == [5]


def test_frame_sample_stage_numpy_exact_frames():
    from rayhll.pipelines.multimodal import FrameSampleStage

    frames = rng.integers(0, 256, size=(8, 6, 4, 3), dtype=np.uint8)
    tbl = pa.table(
        {
            "asset_id": pa.array([7], type=pa.int64()),
            "media_type": pa.array(["video"]),
            "payload": pa.array([codecs.encode_rawvideo(frames)], type=pa.binary()),
            "width": pa.array([4], type=pa.int32()),
            "height": pa.array([6], type=pa.int32()),
        }
    )
    out = FrameSampleStage(frames_per_video=4, decoder="numpy")(tbl)
    assert out.column("frame_idx").to_pylist() == [0, 1, 2, 3]
    # uniform sampling over 8 frames with 4 picks -> source frames 0,2,4,6
    for row, src in enumerate([0, 2, 4, 6]):
        got = codecs.decode_bmp(out.column("frame_payload")[row].as_py())
        np.testing.assert_array_equal(got, frames[src])


def test_multimodal_pipeline_numpy_end_to_end(ray_session):
    import ray.data as rd

    from rayhll.pipelines.multimodal import multimodal_pipeline, synth_media_table

    tbl = synth_media_table(45)
    feats = multimodal_pipeline(rd.from_arrow(tbl), decoder="numpy").to_pandas()
    assert len(feats) == 45
    assert set(feats.columns) == {"asset_id", "media_type", "features"}
    mat = np.array(feats.sort_values("asset_id")["features"].tolist(), dtype=np.float32)
    # real features: non-degenerate (images/audio have content)
    assert np.isfinite(mat).all()
    assert (np.abs(mat).sum(axis=1) > 0).all()
    # deterministic across runs
    feats2 = multimodal_pipeline(rd.from_arrow(tbl), decoder="numpy").to_pandas()
    mat2 = np.array(
        feats2.sort_values("asset_id")["features"].tolist(), dtype=np.float32
    )
    np.testing.assert_array_equal(mat, mat2)


# ----------------------------------------------------------------------
# PNG


@pytest.mark.parametrize("shape", [(5, 7), (8, 8, 3), (6, 4, 4)])
def test_png_roundtrip_exact(shape):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    out = codecs.decode_png(codecs.encode_png(img))
    np.testing.assert_array_equal(out, img)


def _forward_filter(img: np.ndarray, ftype: int) -> bytes:
    """Forward-apply one PNG row filter to every row (test-side reference
    implementation, independent of the library's unfilter)."""
    h, w, ch = img.shape
    bpp = ch
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int32)
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur = flat[y]
        row = np.empty(stride, dtype=np.int32)
        for x in range(stride):
            a = cur[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:  # paeth
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else c)
            row[x] = (cur[x] - pred) & 0xFF
        out.append(ftype)
        out.extend(row.astype(np.uint8).tobytes())
        prev = cur
    return bytes(out)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_all_filter_types_decode(ftype):
    """Decode PNGs whose rows use each of the five filters, produced by an
    independent forward-filter in the test."""
    import struct
    import zlib

    rng = np.random.default_rng(ftype)
    img = rng.integers(0, 256, size=(9, 5, 3), dtype=np.uint8)
    raw = _forward_filter(img, ftype)
    ihdr = struct.pack(">IIBBBBB", 5, 9, 8, 2, 0, 0, 0)
    data = (
        codecs._PNG_SIG
        + codecs._png_chunk(b"IHDR", ihdr)
        + codecs._png_chunk(b"IDAT", zlib.compress(raw))
        + codecs._png_chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(codecs.decode_png(data), img)


def test_png_palette_decode():
    import struct
    import zlib

    rng = np.random.default_rng(9)
    plte = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(6, 7), dtype=np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(6))
    data = (
        codecs._PNG_SIG
        + codecs._png_chunk(b"IHDR", struct.pack(">IIBBBBB", 7, 6, 8, 3, 0, 0, 0))
        + codecs._png_chunk(b"PLTE", plte.tobytes())
        + codecs._png_chunk(b"IDAT", zlib.compress(raw))
        + codecs._png_chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(codecs.decode_png(data), plte[idx])


def test_png_rejects_unsupported():
    import struct
    import zlib

    with pytest.raises(ValueError, match="not a PNG"):
        codecs.decode_png(b"JUNK")
    # 16-bit depth
    data = (
        codecs._PNG_SIG
        + codecs._png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
        + codecs._png_chunk(b"IDAT", zlib.compress(b"\x00" * 26))
        + codecs._png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="unsupported PNG"):
        codecs.decode_png(data)
    # interlaced
    data = (
        codecs._PNG_SIG
        + codecs._png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1))
        + codecs._png_chunk(b"IDAT", zlib.compress(b"\x00" * 14))
        + codecs._png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="interlaced"):
        codecs.decode_png(data)


def test_png_through_decode_image_and_sniff():
    rng = np.random.default_rng(4)
    rgb = rng.integers(0, 256, size=(10, 6, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, size=(4, 4), dtype=np.uint8)
    rgba = rng.integers(0, 256, size=(3, 5, 4), dtype=np.uint8)
    assert codecs.sniff_media(codecs.encode_png(rgb)) == "png"
    np.testing.assert_array_equal(codecs.decode_image(codecs.encode_png(rgb)), rgb)
    g = codecs.decode_image(codecs.encode_png(gray))
    assert g.shape == (4, 4, 3)
    np.testing.assert_array_equal(g[:, :, 0], gray)
    a = codecs.decode_image(codecs.encode_png(rgba))
    np.testing.assert_array_equal(a, rgba[:, :, :3])


def test_png_through_decode_stage(ray_session):
    """A PNG payload flows through the actor-pool DecodeStage with real
    metadata recovery (width/height from IHDR)."""
    import pyarrow as pa
    import ray.data as rd

    from rayhll.pipelines.multimodal import DecodeStage

    rng = np.random.default_rng(5)
    payloads = [
        codecs.encode_png(rng.integers(0, 256, size=(11 + i, 7 + i, 3), dtype=np.uint8))
        for i in range(4)
    ]
    tbl = pa.table(
        {
            "asset_id": pa.array(range(4), type=pa.int64()),
            "media_type": pa.array(["image"] * 4),
            "payload": pa.array(payloads, type=pa.binary()),
            "width": pa.array([0] * 4, type=pa.int32()),
            "height": pa.array([0] * 4, type=pa.int32()),
            "sample_rate": pa.array([-1] * 4, type=pa.int32()),
            "duration_ms": pa.array([-1] * 4, type=pa.int32()),
        }
    )
    out = (
        rd.from_arrow(tbl)
        .map_batches(DecodeStage("numpy"), batch_format="pyarrow")
        .to_pandas()
        .sort_values("asset_id")
    )
    assert out["decode_ok"].all()
    assert list(out["width"]) == [7, 8, 9, 10]
    assert list(out["height"]) == [11, 12, 13, 14]


def test_png_crc_and_truncation_detected():
    """Bit flips and truncation fail loudly instead of decoding garbage."""
    rng = np.random.default_rng(6)
    data = bytearray(codecs.encode_png(rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)))
    data[60] ^= 0xFF  # corrupt inside IDAT
    with pytest.raises(ValueError, match="CRC mismatch"):
        codecs.decode_png(bytes(data))
    good = codecs.encode_png(rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8))
    # cut into the IDAT chunk body (IEND is the trailing 12 bytes)
    with pytest.raises(ValueError, match="truncated|missing"):
        codecs.decode_png(good[:-20])


def test_png_gray_alpha_decode():
    import struct
    import zlib

    rng = np.random.default_rng(8)
    ga = rng.integers(0, 256, size=(5, 6, 2), dtype=np.uint8)
    raw = b"".join(b"\x00" + ga[y].tobytes() for y in range(5))
    data = (
        codecs._PNG_SIG
        + codecs._png_chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 5, 8, 4, 0, 0, 0))
        + codecs._png_chunk(b"IDAT", zlib.compress(raw))
        + codecs._png_chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(codecs.decode_png(data), ga)
    # decode_image broadcasts gray and drops alpha -> (h, w, 3) of the gray
    img = codecs.decode_image(data)
    assert img.shape == (5, 6, 3)
    np.testing.assert_array_equal(img[:, :, 0], ga[:, :, 0])


def test_dhash64_invariances():
    """dHash contract: exact under lossless re-encode, near under JPEG,
    resolution-invariant-ish (block means), and far for distinct images."""
    import numpy as np

    from rayhll.functions import codecs
    from rayhll.functions.jpeg import encode_jpeg

    def dist(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    rng = np.random.default_rng(9)
    yy, xx = np.mgrid[0:40, 0:48]
    base = ((yy * 3 + xx * 5) % 256).astype(np.uint8)
    img = np.stack([base, 255 - base, base], axis=2)
    img = np.clip(img.astype(int) + rng.integers(-25, 25, img.shape), 0, 255).astype(np.uint8)
    h0 = codecs.dhash64(img)
    assert 0 <= h0 < (1 << 64)
    # lossless containers: identical pixels -> identical hash
    assert codecs.dhash64(codecs.decode_png(codecs.encode_png(img))) == h0
    assert codecs.dhash64(codecs.decode_bmp(codecs.encode_bmp(img))) == h0
    # lossy JPEG: small hamming drift only
    from rayhll.functions.jpeg import decode_jpeg
    assert dist(codecs.dhash64(decode_jpeg(encode_jpeg(img, quality=85))), h0) <= 6
    # upscaled 2x: block means barely move
    up = codecs.resize_nearest(img, 96, 80)
    assert dist(codecs.dhash64(up), h0) <= 6
    # a different image is far away
    other = rng.integers(0, 256, img.shape, dtype=np.uint8)
    assert dist(codecs.dhash64(other), h0) > 10
    # grayscale input accepted
    assert isinstance(codecs.dhash64(img[:, :, 0]), int)


def test_audio_spectral_features_physics():
    """First-principles DSP checks: tone centroid recovers f0, rolloff just
    above it, near-zero bandwidth and flatness; white noise centers near
    rate/4 with high flatness; silence and short clips yield zeros."""
    import numpy as np

    from rayhll.functions.codecs import audio_spectral_features

    rate = 16000
    t = np.arange(rate) / rate
    for f0 in (440.0, 2000.0):
        tone = (np.sin(2 * np.pi * f0 * t) * 20000).astype(np.int16)
        f = audio_spectral_features(tone, rate)
        assert abs(f[0] - f0) < 1.0 and f0 <= f[1] <= f0 + 3
        assert f[2] < 5.0 and f[3] < 0.01
        # the tone's energy lands in exactly the right mel band
        mel_max = 2595.0 * np.log10(1.0 + (rate / 2.0) / 700.0)
        edges = 700.0 * (10.0 ** (np.linspace(0.0, mel_max, 25) / 2595.0) - 1.0)
        band = int(np.searchsorted(edges, f0)) - 1
        assert f[4:].argmax() == band
    rng = np.random.default_rng(2)
    noise = (rng.standard_normal(rate) * 8000).astype(np.int16)
    f = audio_spectral_features(noise, rate)
    assert abs(f[0] - rate / 4) < rate * 0.02 and f[3] > 0.3
    assert (audio_spectral_features(np.zeros(rate, dtype=np.int16), rate) == 0).all()
    assert (audio_spectral_features(np.zeros(2, dtype=np.int16), rate) == 0).all()
    # stereo mixes down
    stereo = np.stack([noise, noise], axis=1)
    np.testing.assert_allclose(audio_spectral_features(stereo, rate)[0], f[0], rtol=1e-6)
