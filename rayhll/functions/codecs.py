"""Pure-numpy codecs for uncompressed media formats.

The container has no image/audio libraries, but uncompressed formats are
fully decodable with numpy alone, which makes the multimodal stages real
end-to-end instead of stubbed:

* **BMP** — Windows bitmap, ``BITMAPINFOHEADER``, 24-bit ``BI_RGB``
  (uncompressed), bottom-up or top-down rows, 4-byte row padding.
* **PPM / PGM** — binary netpbm ``P6`` (RGB) and ``P5`` (gray),
  maxval <= 255, ``#`` comments in the header.
* **WAV** — RIFF/WAVE, PCM (format 1) 8/16-bit, any channel count; also
  IEEE float32 (format 3).  Chunk walker skips unknown chunks (LIST etc).
* **raw video** — our own trivial container for frame sampling: a payload
  of concatenated ``height*width*3`` RGB24 frames (dims carried in the
  asset table's metadata columns, as a real pipeline would).

Each format has a matching encoder so tests can synthesize payloads and
assert exact pixel/sample round-trips.  All decoders take ``bytes`` and
return numpy arrays; all are O(payload) with no Python per-pixel loops.

These support the multimodal plumbing required by the builder brief (the
reference library at /root/reference has no multimodal surface).
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------------------
# BMP (24-bit uncompressed)


def encode_bmp(rgb: np.ndarray) -> bytes:
    """Encode an ``(h, w, 3)`` uint8 RGB array as a bottom-up 24-bit BMP."""
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("encode_bmp expects an (h, w, 3) array")
    h, w, _ = rgb.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    img_size = stride * h
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + img_size, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    # BMP stores BGR, bottom-up, padded rows
    bgr = rgb[::-1, :, ::-1]
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    return header + info + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP to an ``(h, w, 3)`` uint8 RGB array."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (off,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h_signed = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit BI_RGB supported (bpp={bpp}, comp={compression})")
    top_down = h_signed < 0
    h = abs(h_signed)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    raster = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=off)
    rows = raster.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    bgr = rows if top_down else rows[::-1]
    return np.ascontiguousarray(bgr[:, :, ::-1])


# ----------------------------------------------------------------------
# PPM / PGM (binary netpbm)


def encode_ppm(img: np.ndarray) -> bytes:
    """Encode ``(h, w, 3)`` uint8 as binary P6, or ``(h, w)`` uint8 as P5."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 3 and img.shape[2] == 3:
        magic = b"P6"
    elif img.ndim == 2:
        magic = b"P5"
    else:
        raise ValueError("encode_ppm expects (h, w, 3) or (h, w)")
    h, w = img.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode() + img.tobytes()


def _pnm_header(data: bytes) -> tuple[bytes, int, int, int, int]:
    """Parse a netpbm header: returns (magic, w, h, maxval, raster_offset).
    Handles arbitrary whitespace and ``#`` comments."""
    magic = data[:2]
    pos = 2
    vals: list[int] = []
    n = len(data)
    while len(vals) < 3:
        while pos < n and data[pos : pos + 1].isspace():
            pos += 1
        if pos < n and data[pos] == 0x23:  # '#' comment to end of line
            while pos < n and data[pos] not in (0x0A, 0x0D):
                pos += 1
            continue
        start = pos
        while pos < n and not data[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated netpbm header")
        vals.append(int(data[start:pos]))
    pos += 1  # single whitespace byte after maxval precedes the raster
    w, h, maxval = vals
    return magic, w, h, maxval, pos


def decode_ppm(data: bytes) -> np.ndarray:
    """Decode binary P6 -> ``(h, w, 3)`` uint8 or P5 -> ``(h, w)`` uint8."""
    if len(data) < 10 or data[:1] != b"P":
        raise ValueError("not a netpbm payload")
    magic, w, h, maxval, off = _pnm_header(data)
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    if magic == b"P6":
        count, shape = w * h * 3, (h, w, 3)
    elif magic == b"P5":
        count, shape = w * h, (h, w)
    else:
        raise ValueError(f"unsupported netpbm magic {magic!r}")
    return np.frombuffer(data, dtype=np.uint8, count=count, offset=off).reshape(shape).copy()


# ----------------------------------------------------------------------
# WAV (RIFF PCM / float32)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode ``(n,)`` or ``(n, channels)`` int16/uint8/float32 samples as WAV."""
    samples = np.asarray(samples)
    if samples.ndim == 1:
        samples = samples[:, None]
    channels = samples.shape[1]
    if samples.dtype == np.int16:
        fmt, bits = 1, 16
    elif samples.dtype == np.uint8:
        fmt, bits = 1, 8
    elif samples.dtype == np.float32:
        fmt, bits = 3, 32
    else:
        raise ValueError(f"unsupported sample dtype {samples.dtype}")
    raw = np.ascontiguousarray(samples).tobytes()
    block = channels * bits // 8
    fmt_chunk = struct.pack(
        "<HHIIHH", fmt, channels, sample_rate, sample_rate * block, block, bits
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
        + b"data" + struct.pack("<I", len(raw)) + raw
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a WAV payload -> ``((n, channels) samples, sample_rate)``.

    Supports PCM 8/16-bit and IEEE float32; walks chunks so payloads with
    LIST/INFO metadata decode fine."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, n = 12, len(data)
    fmt = channels = sample_rate = bits = None
    raw = None
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if cid == b"fmt ":
            fmt, channels, sample_rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", data, body
            )
        elif cid == b"data":
            raw = data[body : body + size]
        pos = body + size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("WAV missing fmt/data chunk")
    if fmt == 1 and bits == 16:
        dt = np.dtype("<i2")
    elif fmt == 1 and bits == 8:
        dt = np.dtype("u1")
    elif fmt == 3 and bits == 32:
        dt = np.dtype("<f4")
    else:
        raise ValueError(f"unsupported WAV format {fmt}/{bits}-bit")
    flat = np.frombuffer(raw, dtype=dt, count=len(raw) // dt.itemsize)
    return flat.reshape(-1, channels).copy(), sample_rate


# ----------------------------------------------------------------------
# raw RGB24 video (concatenated frames)


def encode_rawvideo(frames: np.ndarray) -> bytes:
    """Encode ``(n_frames, h, w, 3)`` uint8 as concatenated RGB24 frames."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError("encode_rawvideo expects (n, h, w, 3)")
    return frames.tobytes()


def decode_rawvideo(data: bytes, width: int, height: int) -> np.ndarray:
    """Decode concatenated RGB24 frames -> ``(n_frames, h, w, 3)`` uint8.
    Trailing partial frames are dropped."""
    frame_size = width * height * 3
    if frame_size <= 0:
        raise ValueError("invalid frame dimensions")
    n_frames = len(data) // frame_size
    return (
        np.frombuffer(data, dtype=np.uint8, count=n_frames * frame_size)
        .reshape(n_frames, height, width, 3)
        .copy()
    )


# ----------------------------------------------------------------------
# shared helpers built on the decoders


def sniff_media(data: bytes) -> str | None:
    """Best-effort container sniff by magic bytes."""
    if data[:2] == b"BM":
        return "bmp"
    if data[:2] in (b"P5", b"P6"):
        return "pnm"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    return None


def decode_image(data: bytes) -> np.ndarray:
    """Decode BMP or PPM/PGM to ``(h, w, 3)`` RGB (gray is broadcast)."""
    kind = sniff_media(data)
    if kind == "bmp":
        return decode_bmp(data)
    if kind == "pnm":
        img = decode_ppm(data)
        if img.ndim == 2:
            img = np.repeat(img[:, :, None], 3, axis=2)
        return img
    raise ValueError("unrecognized image container (expected BMP or binary netpbm)")


def resize_nearest(rgb: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resize of ``(h, w, 3)`` uint8 (pure indexing)."""
    h, w = rgb.shape[:2]
    ys = np.minimum((np.arange(target_h) * h) // target_h, h - 1)
    xs = np.minimum((np.arange(target_w) * w) // target_w, w - 1)
    return rgb[ys[:, None], xs[None, :]]


def image_grid_features(rgb: np.ndarray, grid: int = 8) -> np.ndarray:
    """``grid*grid`` grayscale block means in [0, 1] — a deterministic,
    resolution-invariant perceptual feature vector (float32)."""
    gray = rgb.astype(np.float32).mean(axis=2)
    h, w = gray.shape
    ye = ((np.arange(grid + 1) * h) // grid).astype(np.int64)
    xe = ((np.arange(grid + 1) * w) // grid).astype(np.int64)
    csum = np.zeros((h + 1, w + 1), dtype=np.float64)
    np.cumsum(np.cumsum(gray, axis=0), axis=1, out=csum[1:, 1:])
    blk = (
        csum[ye[1:, None], xe[None, 1:]]
        - csum[ye[:-1, None], xe[None, 1:]]
        - csum[ye[1:, None], xe[None, :-1]]
        + csum[ye[:-1, None], xe[None, :-1]]
    )
    area = (ye[1:, None] - ye[:-1, None]) * (xe[None, 1:] - xe[None, :-1])
    area = np.maximum(area, 1)
    return (blk / area / 255.0).astype(np.float32).ravel()


def audio_band_energy(samples: np.ndarray, bands: int = 64) -> np.ndarray:
    """Per-band RMS energy over ``bands`` equal time windows (mono-mixed,
    normalized to [-1, 1] first) — deterministic float32 features."""
    if samples.ndim == 2:
        mono = samples.astype(np.float64).mean(axis=1)
    else:
        mono = samples.astype(np.float64)
    if samples.dtype == np.int16:
        mono /= 32768.0
    elif samples.dtype == np.uint8:
        mono = (mono - 128.0) / 128.0
    n = len(mono)
    out = np.zeros(bands, dtype=np.float32)
    if n == 0:
        return out
    edges = (np.arange(bands + 1) * n) // bands
    sq = np.concatenate(([0.0], np.cumsum(mono * mono)))
    widths = np.maximum(edges[1:] - edges[:-1], 1)
    out[:] = np.sqrt((sq[edges[1:]] - sq[edges[:-1]]) / widths)
    return out
