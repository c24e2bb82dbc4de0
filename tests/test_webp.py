"""VP8L (lossless WebP) codec: byte-level round-trips over every encoder
knob (each knob pins a decoder path — simple vs code-length-coded
Huffman headers, color cache, LZ77 run backreferences, SUBTRACT_GREEN),
plus container/dispatch and malformed-stream contracts."""

import numpy as np
import pytest

from rayhll.functions import codecs
from rayhll.functions.webp import (
    _DIST_MAP,
    decode_vp8l,
    decode_webp,
    encode_vp8l,
    encode_webp,
)

rng = np.random.default_rng(77)

KNOBS = [
    dict(),
    dict(subtract_green=True),
    dict(cache_bits=6),
    dict(use_runs=False),
    dict(subtract_green=True, cache_bits=4),
]


@pytest.mark.parametrize("shape", [(1, 1, 3), (3, 5, 3), (8, 8, 4), (16, 13, 3), (33, 31, 4)])
def test_vp8l_roundtrip_exact(shape):
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    want = (
        img
        if shape[2] == 4
        else np.concatenate(
            [img, np.full((*shape[:2], 1), 255, np.uint8)], axis=2
        )
    )
    for kw in KNOBS:
        out = decode_webp(encode_webp(img, **kw))
        np.testing.assert_array_equal(out, want)


def test_vp8l_run_and_cache_paths_compress():
    """Flat regions must actually flow through the LZ77/run and cache
    symbol paths (smaller stream than the literal-only encoding) and
    still decode exactly."""
    img = np.zeros((24, 24, 3), dtype=np.uint8)
    img[4:12, 2:20] = 200
    img[:, 13] = 55
    literal = encode_vp8l(img, use_runs=False)
    runs = encode_vp8l(img, use_runs=True)
    cached = encode_vp8l(img, use_runs=True, cache_bits=5)
    assert len(runs) < len(literal)
    for data in (literal, runs, cached):
        np.testing.assert_array_equal(decode_vp8l(data)[:, :, :3], img)


def test_webp_container_and_codecs_dispatch():
    img = rng.integers(0, 256, (9, 7, 3), dtype=np.uint8)
    data = encode_webp(img)
    assert data[:4] == b"RIFF" and data[8:16] == b"WEBPVP8L"
    assert codecs.sniff_media(data) == "webp"
    np.testing.assert_array_equal(codecs.decode_image(data), img)


def test_webp_malformed_and_lossy_rejection():
    img = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    data = bytearray(encode_webp(img))
    with pytest.raises(ValueError):
        decode_webp(bytes(data[:10]))  # truncated container
    with pytest.raises(ValueError):
        decode_vp8l(b"\x00\x01\x02\x03")  # bad signature
    lossy = bytes(data[:12]) + b"VP8 " + data[16:]
    with pytest.raises(ValueError):  # lossy stays behind decoder="real"
        decode_webp(lossy)
    # corrupt entropy payloads must normalize to ValueError (decode-stage
    # classification contract, same as functions/jpeg.py)
    for cut in (21, 25, 30):
        try:
            decode_webp(bytes(data[:cut]))
        except ValueError:
            pass


def test_close_distance_map_shape():
    """The generated close-distance map obeys the spec's documented
    structure: 120 unique (dx, dy) pairs starting (0,1),(1,0),(1,1),
    (-1,1), ordered by distance."""
    assert len(_DIST_MAP) == 120 and len(set(_DIST_MAP)) == 120
    assert _DIST_MAP[:4] == [(0, 1), (1, 0), (1, 1), (-1, 1)]
    d2 = [dx * dx + dy * dy for dx, dy in _DIST_MAP]
    assert d2 == sorted(d2)
    assert all(dy >= 0 and (dy > 0 or dx > 0) for dx, dy in _DIST_MAP)


def test_vp8l_dims_validation():
    with pytest.raises(ValueError):
        encode_vp8l(np.zeros((2, 2), dtype=np.uint8))  # not 3/4 channel
    big = np.zeros((1, (1 << 14) + 1, 3), dtype=np.uint8)
    with pytest.raises(ValueError):
        encode_vp8l(big)
