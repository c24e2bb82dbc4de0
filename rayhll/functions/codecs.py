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
* **PNG** — 8-bit non-interlaced gray/RGB/palette/gray+A/RGBA, all five
  row filters, via the stdlib ``zlib`` (the one COMPRESSED format that
  needs no external codec library).

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
# MJPEG video: a raw .mjpeg byte stream — concatenated JPEG frames
# (the classic webcam/security-camera interchange; reference container
# semantics per the JPEG spec's standalone-stream usage).  Every frame
# goes through the full functions/jpeg.py codec, so the video path
# exercises a real COMPRESSED format end-to-end.


def encode_mjpeg(frames: np.ndarray, quality: int = 85) -> bytes:
    """Encode ``(n_frames, h, w, 3)`` uint8 as concatenated JPEG frames."""
    from rayhll.functions.jpeg import encode_jpeg

    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError("encode_mjpeg expects (n, h, w, 3)")
    return b"".join(encode_jpeg(f, quality=quality) for f in frames)


def decode_mjpeg(data: bytes) -> np.ndarray:
    """Decode a concatenated-JPEG stream -> ``(n_frames, h, w, 3)`` uint8.

    Frames split on the EOI marker (FF D9): JPEG entropy data byte-stuffs
    every FF (FF 00 / FF D0-D7 restarts), so an unescaped FF D9 is a
    genuine frame end for streams without arbitrary-payload APPn/COM
    segments (ours, and raw camera MJPEG).  All frames must share
    dimensions; anything malformed raises ``ValueError``."""
    from rayhll.functions.jpeg import decode_jpeg

    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not an MJPEG stream (missing SOI)")
    frames = []
    pos = 0
    while pos < len(data):
        end = data.find(b"\xff\xd9", pos)
        if end < 0:
            break  # trailing partial frame dropped (decode_rawvideo parity)
        img = decode_jpeg(data[pos : end + 2])
        if img.ndim == 2:
            img = np.repeat(img[:, :, None], 3, axis=2)
        frames.append(img)
        pos = end + 2
    if not frames:
        raise ValueError("no JPEG frames found")
    if any(f.shape != frames[0].shape for f in frames[1:]):
        raise ValueError("MJPEG frames disagree on dimensions")
    return np.stack(frames)


def decode_video(data: bytes, width: int = -1, height: int = -1) -> np.ndarray:
    """Decode a video payload -> ``(n_frames, h, w, 3)`` uint8, sniffing
    the container: an SOI prefix (FF D8) is MJPEG (self-describing — the
    width/height hints are ignored), anything else is raw RGB24 (which
    genuinely needs the dimension metadata)."""
    if len(data) >= 2 and data[:2] == b"\xff\xd8":
        return decode_mjpeg(data)
    return decode_rawvideo(data, width, height)


# ----------------------------------------------------------------------
# shared helpers built on the decoders


# ----------------------------------------------------------------------
# PNG (8-bit, non-interlaced; compression via the stdlib zlib)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: color type -> samples per pixel
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """Encode ``(h, w)`` gray, ``(h, w, 3)`` RGB or ``(h, w, 4)`` RGBA uint8
    as an 8-bit non-interlaced PNG (filter 0 rows, stdlib zlib deflate)."""
    import zlib

    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color, ch = 0, 1
        flat = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] == 3:
        color, ch = 2, 3
        flat = img
    elif img.ndim == 3 and img.shape[2] == 4:
        color, ch = 6, 4
        flat = img
    else:
        raise ValueError("encode_png expects (h,w), (h,w,3) or (h,w,4) uint8")
    h, w = flat.shape[:2]
    # one 0x00 filter byte per row, then raw samples
    rows = np.zeros((h, 1 + w * ch), dtype=np.uint8)
    rows[:, 1:] = flat.reshape(h, w * ch)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(rows.tobytes(), 6))
        + _png_chunk(b"IEND", b"")
    )


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG row filters.  Filters 0/1/2 are vectorized per row; 3/4
    (average/Paeth) carry an in-row left-neighbor dependency and fall back
    to a per-byte loop — bounded by the rows that actually use them (our
    own encoder always emits filter 0)."""
    raw = raw.reshape(h, 1 + stride)
    filters = raw[:, 0]
    data = raw[:, 1:].astype(np.int32)
    recon = np.zeros((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = filters[y]
        row = data[y]
        if f == 0:
            cur = row.copy()
        elif f == 1:  # sub: prefix sum per byte lane
            cur = row.copy()
            for lane in range(bpp):
                cur[lane::bpp] = np.cumsum(cur[lane::bpp]) & 0xFF
        elif f == 2:  # up
            cur = (row + prev) & 0xFF
        elif f == 3:  # average
            cur = row.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # paeth
            cur = row.copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        recon[y] = cur
        prev = cur
    return recon.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG (gray / RGB / palette / gray+A /
    RGBA) to uint8 ``(h, w)`` or ``(h, w, channels)``.  All five row
    filters supported; 16-bit depth and Adam7 interlacing are not."""
    import zlib

    if data[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    ihdr = None
    plte = None
    idat = []
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if pos + 12 + length > len(data):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch (corrupt payload)")
        pos += 12 + length
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0:
        raise ValueError(f"unsupported PNG (depth={depth}, comp={comp})")
    if interlace != 0:
        raise ValueError("interlaced (Adam7) PNG not supported")
    if color not in _PNG_CHANNELS:
        raise ValueError(f"bad PNG color type {color}")
    ch = _PNG_CHANNELS[color]
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG pixel data length mismatch")
    px = _png_unfilter(raw, h, stride, ch)
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        return plte[px.reshape(h, w)]
    if ch == 1:
        return px.reshape(h, w)
    return px.reshape(h, w, ch)


def sniff_media(data: bytes) -> str | None:
    """Best-effort container sniff by magic bytes."""
    if data[:2] == b"BM":
        return "bmp"
    if data[:2] in (b"P5", b"P6"):
        return "pnm"
    if data[: len(_PNG_SIG)] == _PNG_SIG:
        return "png"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "webp"
    if data[:4] == b"fLaC":
        return "flac"
    return None


def decode_image(data: bytes) -> np.ndarray:
    """Decode BMP, PPM/PGM, PNG, JPEG or lossless WebP (VP8L) to
    ``(h, w, 3)`` RGB (gray broadcast, alpha dropped)."""
    kind = sniff_media(data)
    if kind == "bmp":
        return decode_bmp(data)
    if kind == "png":
        img = decode_png(data)
        if img.ndim == 2:
            return np.repeat(img[:, :, None], 3, axis=2)
        if img.shape[2] == 2:  # gray+alpha: broadcast gray, drop alpha
            return np.repeat(img[:, :, :1], 3, axis=2)
        return img[:, :, :3]
    if kind == "jpeg":
        from rayhll.functions.jpeg import decode_jpeg

        img = decode_jpeg(data)
        if img.ndim == 2:
            return np.repeat(img[:, :, None], 3, axis=2)
        return img
    if kind == "pnm":
        img = decode_ppm(data)
        if img.ndim == 2:
            img = np.repeat(img[:, :, None], 3, axis=2)
        return img
    if kind == "webp":
        from rayhll.functions.webp import decode_webp

        return decode_webp(data)[:, :, :3]
    raise ValueError(
        "unrecognized image container (expected BMP, binary netpbm, PNG, JPEG "
        "or lossless WebP)"
    )


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a WAV or FLAC payload -> ``((n, channels) samples, rate)``,
    sniffing the container (FLAC decodes through the full RFC 9639 codec
    in :mod:`rayhll.functions.flac` — a real compressed format)."""
    if data[:4] == b"fLaC":
        from rayhll.functions.flac import decode_flac

        return decode_flac(data)
    return decode_wav(data)


def resize_nearest(rgb: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resize of ``(h, w, 3)`` uint8 (pure indexing)."""
    h, w = rgb.shape[:2]
    ys = np.minimum((np.arange(target_h) * h) // target_h, h - 1)
    xs = np.minimum((np.arange(target_w) * w) // target_w, w - 1)
    return rgb[ys[:, None], xs[None, :]]


def _block_means(gray: np.ndarray, rows: int, cols: int) -> np.ndarray:
    """``(rows, cols)`` area-averaged block means of a 2-D grayscale image
    via one integral image (exact block averages, not nearest sampling —
    robust to codec noise)."""
    h, w = gray.shape
    ye = ((np.arange(rows + 1) * h) // rows).astype(np.int64)
    xe = ((np.arange(cols + 1) * w) // cols).astype(np.int64)
    csum = np.zeros((h + 1, w + 1), dtype=np.float64)
    np.cumsum(np.cumsum(gray, axis=0), axis=1, out=csum[1:, 1:])
    blk = (
        csum[ye[1:, None], xe[None, 1:]]
        - csum[ye[:-1, None], xe[None, 1:]]
        - csum[ye[1:, None], xe[None, :-1]]
        + csum[ye[:-1, None], xe[None, :-1]]
    )
    area = (ye[1:, None] - ye[:-1, None]) * (xe[None, 1:] - xe[None, :-1])
    return blk / np.maximum(area, 1)


def image_grid_features(rgb: np.ndarray, grid: int = 8) -> np.ndarray:
    """``grid*grid`` grayscale block means in [0, 1] — a deterministic,
    resolution-invariant perceptual feature vector (float32)."""
    gray = rgb.astype(np.float32).mean(axis=2)
    return (_block_means(gray, grid, grid) / 255.0).astype(np.float32).ravel()


def dhash64(rgb: np.ndarray) -> int:
    """64-bit perceptual difference hash (dHash, Krawetz 2013): 8 rows x 9
    columns of area-averaged grayscale block means, one bit per horizontal
    gradient sign.  Robust to re-encoding (lossless containers AND sane
    JPEG quality levels) and resolution changes; hamming distance over the
    returned uint64 measures visual similarity.  Returns a Python int in
    [0, 2^64)."""
    gray = rgb.astype(np.float32).mean(axis=2) if rgb.ndim == 3 else rgb.astype(np.float32)
    blk = _block_means(gray, 8, 9)
    bits = (blk[:, :-1] > blk[:, 1:]).ravel()
    return int(np.packbits(bits).view(">u8")[0])


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


def audio_spectral_features(
    samples: np.ndarray, sample_rate: int, n_mel: int = 24
) -> np.ndarray:
    """Frequency-domain audio features via one rfft (pure numpy DSP):

    ``[centroid_hz, rolloff85_hz, bandwidth_hz, flatness, log-mel[n_mel]]``
    — spectral centroid (power-weighted mean frequency), 85% energy
    rolloff, power-weighted frequency std-dev, spectral flatness
    (geometric/arithmetic mean ratio), and ``n_mel`` log-compressed
    triangular-less mel-spaced band energies.  Deterministic float32; a
    pure tone's centroid recovers its frequency (pinned by tests)."""
    if samples.ndim == 2:
        mono = samples.astype(np.float64).mean(axis=1)
    else:
        mono = samples.astype(np.float64)
    if samples.dtype == np.int16:
        mono /= 32768.0
    elif samples.dtype == np.uint8:
        mono = (mono - 128.0) / 128.0
    out = np.zeros(4 + n_mel, dtype=np.float32)
    n = len(mono)
    if n < 4 or sample_rate <= 0:
        return out
    spec = np.abs(np.fft.rfft(mono * np.hanning(n))) ** 2
    freqs = np.fft.rfftfreq(n, d=1.0 / sample_rate)
    total = spec.sum()
    if total <= 0:
        return out
    p = spec / total
    centroid = float((freqs * p).sum())
    cum = np.cumsum(p)
    rolloff = float(freqs[np.searchsorted(cum, 0.85)])
    bandwidth = float(np.sqrt(((freqs - centroid) ** 2 * p).sum()))
    # flatness over nonzero bins (geometric mean via mean-log)
    nz = spec[spec > 0]
    flatness = float(np.exp(np.log(nz).mean()) / nz.mean()) if len(nz) else 0.0
    # mel-spaced band energies (log1p-compressed), hz -> mel: 2595*log10(1+f/700)
    mel_max = 2595.0 * np.log10(1.0 + (sample_rate / 2.0) / 700.0)
    edges_hz = 700.0 * (10.0 ** (np.linspace(0.0, mel_max, n_mel + 1) / 2595.0) - 1.0)
    idx = np.searchsorted(freqs, edges_hz)
    sq = np.concatenate(([0.0], np.cumsum(spec)))
    band = sq[np.minimum(idx[1:], len(spec))] - sq[np.minimum(idx[:-1], len(spec))]
    out[0], out[1], out[2], out[3] = centroid, rolloff, bandwidth, flatness
    out[4:] = np.log1p(band).astype(np.float32)
    return out
