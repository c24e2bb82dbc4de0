"""FLAC codec (RFC 9639): exact round-trips over every encoder knob (each
knob pins a decoder path — fixed vs LPC predictors, all four stereo
assignments, Rice vs Rice2 vs escaped partitions, wasted bits, uncommon
header codes), bitstream-level decoder paths crafted by hand where the
encoder would not naturally emit them, plus container dispatch and
malformed-stream contracts (CRC-8 / CRC-16 / MD5)."""

import numpy as np
import pytest

from rayhll.functions import codecs
from rayhll.functions.flac import (
    _crc8,
    _crc16,
    _fixed_restore,
    _rice_bit_array,
    decode_flac,
    encode_flac,
)

rng = np.random.default_rng(99)


def _tone(n, f0=440.0, rate=8000, amp=20000):
    t = np.arange(n) / rate
    return (np.sin(2 * np.pi * f0 * t) * amp).astype(np.int16)


def _rt(x, rate, **kw):
    out, r = decode_flac(encode_flac(x, rate, **kw))
    ref = np.asarray(x)
    if ref.ndim == 1:
        ref = ref[:, None]
    assert r == rate
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize(
    "n,block_size",
    [(17, 4096), (192, 192), (4096, 4096), (4097, 4096), (10000, 1024), (5000, 577)],
)
def test_roundtrip_mono_lengths(n, block_size):
    """Short/exact/overhanging frames, table and uncommon block sizes."""
    _rt(_tone(n), 8000, block_size=block_size)


@pytest.mark.parametrize(
    "mode", ["auto", "independent", "left_side", "right_side", "mid_side"]
)
def test_roundtrip_stereo_modes(mode):
    left = _tone(6000)
    right = (left.astype(np.int32) // 2 + rng.integers(-300, 300, 6000)).astype(
        np.int16
    )
    _rt(np.stack([left, right], axis=1), 16000, stereo_mode=mode)


def test_roundtrip_lpc_and_compression():
    tone = _tone(20000)
    lpc = encode_flac(tone, 8000, use_lpc=True, lpc_order=8)
    fixed = encode_flac(tone, 8000)
    assert b"fLaC" == lpc[:4]
    # LPC must genuinely engage on a sinusoid (much smaller than fixed)
    assert len(lpc) < len(fixed) < tone.nbytes
    out, _ = decode_flac(lpc)
    np.testing.assert_array_equal(out[:, 0], tone)


def test_roundtrip_noise_verbatim_escape():
    """Full-range noise forces verbatim subframes / escaped partitions."""
    noise = rng.integers(-32768, 32768, size=5000).astype(np.int16)
    _rt(noise, 44100)


@pytest.mark.parametrize("bps,amp", [(8, 100), (12, 2000), (16, 30000), (20, 500000), (24, 8_000_000), (32, 2_000_000_000)])
def test_roundtrip_bit_depths(bps, amp):
    x = rng.integers(-amp, amp, size=3000).astype(np.int64)
    if bps == 8:
        _rt(x.astype(np.int8), 8000)
    elif bps == 16:
        _rt(x.astype(np.int16), 8000)
    else:
        _rt(x.astype(np.int32), 48000, bps=bps)


def test_roundtrip_wasted_bits():
    """Samples sharing trailing zero bits round-trip through the
    wasted-bits subframe field (and compress accordingly)."""
    base = rng.integers(-1000, 1000, size=4000).astype(np.int64)
    plain = encode_flac(base.astype(np.int16), 8000)
    shifted = encode_flac((base * 16).astype(np.int16), 8000)
    _rt((base * 16).astype(np.int16), 8000)
    # 4 wasted bits: the shifted stream must not cost ~4 extra bits/sample
    assert len(shifted) < len(plain) + 600


def test_roundtrip_constant_and_zero():
    _rt(np.full(5000, -7, dtype=np.int16), 8000)
    _rt(np.zeros(300, dtype=np.int16), 8000)


def test_roundtrip_uncommon_sample_rates():
    _rt(_tone(500), 12345)  # 16-bit Hz field
    _rt(_tone(500), 123000)  # kHz field
    _rt(_tone(500), 192000)  # table entry
    _rt(_tone(500), 655360)  # tens-of-Hz field


def test_roundtrip_partition_orders():
    tone = _tone(8192)
    for po in (0, 2, 4):
        enc = encode_flac(tone, 8000, block_size=2048, partition_order=po)
        out, _ = decode_flac(enc)
        np.testing.assert_array_equal(out[:, 0], tone)


def _decode_counting_residual_methods(enc, monkeypatch):
    import rayhll.functions.flac as F

    methods = []
    orig = F._read_residual

    def probe(br, bs, order):
        p0 = br.pos
        methods.append(br.read_uint(2))
        br.pos = p0
        return orig(br, bs, order)

    monkeypatch.setattr(F, "_read_residual", probe)
    out, rate = decode_flac(enc)
    return out, rate, methods


def test_rice2_partitions(monkeypatch):
    """Heavy-tailed (Laplacian) 24-bit residuals want Rice parameters > 14,
    which requires the 5-bit-parameter method (01) — pin that the encoder
    emits it and the decoder takes that path."""
    lap = rng.laplace(scale=2**20, size=6000)
    x = np.clip(np.round(lap), -(2**23), 2**23 - 1).astype(np.int32)
    enc = encode_flac(x, 8000, bps=24)
    out, _, methods = _decode_counting_residual_methods(enc, monkeypatch)
    assert 1 in methods
    np.testing.assert_array_equal(out[:, 0], x)


def test_escape_partitions(monkeypatch):
    """A uniform-noise burst inside a smooth tone makes escaped (verbatim)
    partitions cheaper than any Rice parameter for exactly that region —
    pin that escape and Rice partitions coexist in one subframe."""
    import rayhll.functions.flac as F

    tone = _tone(8192, amp=1000)
    x = tone.copy()
    x[2048:2560] = rng.integers(-32768, 32768, size=512).astype(np.int16)
    enc = encode_flac(x, 8000, block_size=4096, partition_order=3)

    params = []
    orig = F._BitReader.read_rice

    def probe(self, k, count):
        params.append(("rice", k, count))
        return orig(self, k, count)

    monkeypatch.setattr(F._BitReader, "read_rice", probe)
    orig_ints = F._BitReader.read_ints

    def probe_ints(self, n, count):
        if count > 100:  # escaped partitions read wide vectorized blocks
            params.append(("escape", n, count))
        return orig_ints(self, n, count)

    monkeypatch.setattr(F._BitReader, "read_ints", probe_ints)
    out, _ = decode_flac(enc)
    kinds = {p[0] for p in params}
    assert kinds == {"rice", "escape"}
    np.testing.assert_array_equal(out[:, 0], x)


def test_multichannel_independent():
    x = rng.integers(-5000, 5000, size=(2000, 4)).astype(np.int16)
    _rt(x, 8000)


def test_streaminfo_md5_and_total_guard():
    enc = bytearray(encode_flac(_tone(3000), 8000))
    # STREAMINFO MD5 lives at bytes 26..42; corrupt it -> decoder raises
    enc[30] ^= 0xFF
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(enc))


def test_frame_crc_detects_corruption():
    enc = bytearray(encode_flac(_tone(3000), 8000))
    hits = 0
    for off in range(50, len(enc), 97):
        bad = bytearray(enc)
        bad[off] ^= 0x10
        try:
            out, _ = decode_flac(bytes(bad))
        except ValueError:
            hits += 1
        else:  # pragma: no cover - CRC collision would be a miracle here
            raise AssertionError("corruption slipped through")
    assert hits > 0


def test_malformed_streams_raise_valueerror():
    with pytest.raises(ValueError):
        decode_flac(b"not flac at all")
    with pytest.raises(ValueError):
        decode_flac(b"fLaC" + b"\x00" * 50)
    enc = encode_flac(_tone(500), 8000)
    with pytest.raises(ValueError):
        decode_flac(enc[: len(enc) // 2])  # truncated mid-frame
    fuzz = rng.integers(0, 256, size=400).astype(np.uint8).tobytes()
    with pytest.raises(ValueError):
        decode_flac(b"fLaC" + fuzz)


def test_encoder_input_validation():
    with pytest.raises(ValueError, match="bps"):
        encode_flac(np.zeros(10, dtype=np.int32), 8000)
    with pytest.raises(ValueError, match="range"):
        encode_flac(np.full(10, 300, dtype=np.int32), 8000, bps=8)
    with pytest.raises(ValueError, match="non-empty"):
        encode_flac(np.zeros(0, dtype=np.int16), 8000)
    with pytest.raises(ValueError, match="stereo_mode"):
        encode_flac(np.zeros((10, 2), dtype=np.int16), 8000, stereo_mode="bogus")


def test_skips_extra_metadata_blocks():
    """Decoder must walk past PADDING/APPLICATION metadata blocks."""
    enc = encode_flac(_tone(400), 8000)
    # streaminfo block: 4-byte magic + 4-byte header + 34 bytes
    head, frames = enc[: 4 + 4 + 34], enc[4 + 4 + 34 :]
    head = bytearray(head)
    head[4] &= 0x7F  # clear last-block flag on STREAMINFO
    padding = bytes([0x81]) + (8).to_bytes(3, "big") + b"\x00" * 8
    out, rate = decode_flac(bytes(head) + padding + frames)
    np.testing.assert_array_equal(out[:, 0], _tone(400))
    assert rate == 8000


def test_rice_bit_array_matches_scalar():
    """Vectorized Rice writer vs a per-value scalar reference."""
    vals = rng.integers(-500, 500, size=200).astype(np.int64)
    for k in (0, 1, 3, 7):
        bits = _rice_bit_array(vals, k)
        ref = []
        for v in vals:
            u = (int(v) << 1) ^ (int(v) >> 63)
            ref.extend([0] * (u >> k) + [1])
            ref.extend((u >> (k - 1 - j)) & 1 for j in range(k))
        np.testing.assert_array_equal(bits, np.array(ref, dtype=np.uint8))


def test_fixed_restore_orders_match_reference():
    x = rng.integers(-1000, 1000, size=64).astype(np.int64)
    for order in range(5):
        res = x.copy()
        for _ in range(order):
            res = np.diff(res)
        np.testing.assert_array_equal(_fixed_restore(order, x[:order], res), x)


def test_crc_vectors():
    # CRC-8 poly 0x07 and CRC-16 poly 0x8005 published check values
    assert _crc8(b"123456789") == 0xF4
    assert _crc16(b"123456789") == 0xFEE8


def test_decode_audio_dispatch_and_sniff():
    tone = _tone(800)
    wav = codecs.encode_wav(tone, 8000)
    flc = encode_flac(tone, 8000)
    assert codecs.sniff_media(wav) == "wav"
    assert codecs.sniff_media(flc) == "flac"
    for payload in (wav, flc):
        out, rate = codecs.decode_audio(payload)
        assert rate == 8000
        np.testing.assert_array_equal(out[:, 0], tone)


def test_synth_media_table_flac_assets_decode():
    """The synthetic asset table now rotates FLAC audio payloads and the
    decode stage recovers their STREAMINFO sample rate."""
    from rayhll.pipelines.multimodal import DecodeStage, synth_media_table

    t = synth_media_table(60)
    kinds = {
        codecs.sniff_media(p)
        for p, m in zip(
            t.column("payload").to_pylist(), t.column("media_type").to_pylist()
        )
        if m == "audio"
    }
    assert "flac" in kinds and "wav" in kinds
    decoded = DecodeStage(decoder="numpy")(t)
    assert all(decoded.column("decode_ok").to_pylist())
    rates = {
        r
        for r, m in zip(
            decoded.column("sample_rate").to_pylist(),
            decoded.column("media_type").to_pylist(),
        )
        if m == "audio"
    }
    assert rates == {8000}
