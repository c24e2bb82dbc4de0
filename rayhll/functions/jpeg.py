"""JPEG (ITU-T T.81) codec in pure numpy + stdlib.

Closes the multimodal pipeline's one remaining decode gap (compressed
images) without codec libraries: real corpora are mostly JPEG.  Scope:

* **decode**: baseline sequential DCT (SOF0), extended sequential (SOF1),
  and **progressive (SOF2)** — spectral selection, successive
  approximation (DC + AC first/refinement scans, EOB runs), per Annex G —
  8-bit samples, Huffman entropy coding, grayscale or YCbCr with
  arbitrary sampling factors (4:4:4 / 4:2:2 / 4:2:0 / ...), restart
  intervals (DRI/RSTn), interleaved and non-interleaved (multi-scan)
  files.  Arithmetic coding, 12-bit, hierarchical and lossless modes
  raise ``ValueError`` with the mode named.
* **encode**: 4:4:4 or 4:2:0 YCbCr / grayscale with the Annex K example
  quantization tables and libjpeg-compatible quality scaling; baseline
  (standard Huffman tables) or ``progressive=True`` (the standard libjpeg
  scan script with per-scan optimal Huffman tables, since progressive AC
  scans need EOBn symbols the Annex K tables lack) — used to synthesize
  test/benchmark payloads in this codec-less environment (and usable as
  a real writer).  A progressive file holds the same quantized
  coefficients in a different entropy layout, so both encodings of one
  image decode to IDENTICAL pixels — the structural test pinning the
  progressive code paths.

Performance note (honest): DCT/quantization/color transforms are
vectorized numpy over all blocks at once, but the entropy layer is an
inherently sequential bit-serial Huffman loop per coefficient, in Python.
That is fine for the test/synthesis path; a 100-TB image corpus should
swap a codec library at the documented ``decode_image`` call site
(pipelines/multimodal.py) — the Ray-side plumbing is identical.

All tables/constants below are published in ITU-T T.81 Annex K.
reference: none (builder-brief requirement beyond the AdRoll/python-hll
surface; no counterpart module in /root/reference).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# spec constants (ITU-T T.81 Annex K)

#: raster index of the i-th coefficient in zigzag order
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
_UNZIGZAG = np.argsort(ZIGZAG)

STD_QUANT_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
STD_QUANT_CHROM = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# (BITS[1..16], HUFFVAL) per standard table
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROM = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# orthonormal 8x8 DCT-II matrix: F = C @ f @ C.T, f = C.T @ F @ C
_k = np.arange(8, dtype=np.float64)
_DCT = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) * 0.5
_DCT[0, :] = np.sqrt(1.0 / 8.0)


def _canonical_codes(bits: list[int], vals: list[int]):
    """(length, code) assignments for a canonical Huffman table."""
    out = []
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out.append((length, code, vals[i]))
            code += 1
            i += 1
        code <<= 1
    return out


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg-compatible quality scaling of the Annex K example tables."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (STD_QUANT_LUM, STD_QUANT_CHROM):
        q = (base * scale + 50) // 100
        out.append(np.clip(q, 1, 255).astype(np.int64))
    return out[0], out[1]


# ---------------------------------------------------------------------------
# encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def byte_align(self) -> None:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


def _mag_category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_blocks(
    writer: _BitWriter,
    mcu_blocks: list[tuple[int, np.ndarray]],
    dc_codes: list[dict],
    ac_codes: list[dict],
    preds: list[int],
) -> None:
    """Entropy-encode one MCU's blocks (each ``(comp_idx, zigzag int64[64])``)."""
    for ci, zz in mcu_blocks:
        dct, act = dc_codes[ci], ac_codes[ci]
        diff = int(zz[0]) - preds[ci]
        preds[ci] = int(zz[0])
        s = _mag_category(diff)
        length, code = dct[s]
        writer.write(code, length)
        if s:
            writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        run = 0
        nz = np.flatnonzero(zz[1:])
        last = int(nz[-1]) + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                length, code = act[0xF0]  # ZRL
                writer.write(code, length)
                run -= 16
            s = _mag_category(v)
            length, code = act[(run << 4) | s]
            writer.write(code, length)
            writer.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last < 63:
            length, code = act[0x00]  # EOB
            writer.write(code, length)


# --- progressive scan encoders (ITU-T T.81 Annex G.1, the libjpeg scheme) ---
#
# Progressive AC scans use EOBn run symbols the Annex K example tables do
# not contain, so (like libjpeg, where progressive implies optimized
# entropy coding) each AC scan gets a per-scan optimal Huffman table: a
# counting pass collects symbol frequencies, `_optimal_huffman` builds the
# canonical table, and a second pass writes the bits.


class _SymbolCounter:
    """Pass-1 emitter: count Huffman symbols, ignore raw bits."""

    def __init__(self):
        self.freq = [0] * 257

    def symbol(self, s: int) -> None:
        self.freq[s] += 1

    def bits(self, v: int, n: int) -> None:
        pass


class _SymbolWriter:
    """Pass-2 emitter: write Huffman codes + raw bits to a _BitWriter."""

    def __init__(self, writer: _BitWriter, codes: dict):
        self.writer = writer
        self.codes = codes

    def symbol(self, s: int) -> None:
        length, code = self.codes[s]
        self.writer.write(code, length)

    def bits(self, v: int, n: int) -> None:
        self.writer.write(v, n)


def _optimal_huffman(freq: list[int]) -> tuple[list[int], list[int]]:
    """Optimal length-limited canonical Huffman table (the libjpeg
    ``jpeg_gen_optimal_table`` algorithm): pseudo-symbol 256 reserves the
    all-ones code, code lengths are merged pairwise, then folded to the
    16-bit JPEG limit.  Returns ``(bits[16], huffval)``."""
    freq = list(freq)
    freq[256] = 1
    codesize = [0] * 257
    others = [-1] * 257
    while True:
        c1, v = -1, 1 << 60
        for i in range(257):
            if freq[i] and freq[i] <= v:
                v = freq[i]
                c1 = i
        c2, v = -1, 1 << 60
        for i in range(257):
            if freq[i] and freq[i] <= v and i != c1:
                v = freq[i]
                c2 = i
        if c2 < 0:
            break
        freq[c1] += freq[c2]
        freq[c2] = 0
        codesize[c1] += 1
        while others[c1] >= 0:
            c1 = others[c1]
            codesize[c1] += 1
        others[c1] = c2
        codesize[c2] += 1
        while others[c2] >= 0:
            c2 = others[c2]
            codesize[c2] += 1
    bits = [0] * 33
    for i in range(257):
        if codesize[i]:
            bits[codesize[i]] += 1
    for length in range(32, 16, -1):  # fold over-long codes down to 16
        while bits[length]:
            l2 = length - 2
            while bits[l2] == 0:
                l2 -= 1
            bits[length] -= 2
            bits[length - 1] += 1
            bits[l2 + 1] += 2
            bits[l2] -= 1
    length = 16
    while bits[length] == 0:
        length -= 1
    bits[length] -= 1  # drop the reserved pseudo-symbol's code
    huffval = [
        s
        for size in range(1, 33)
        for s in range(256)
        if codesize[s] == size
    ]
    return bits[1:17], huffval


def _emit_eobrun(emitter, state: dict) -> None:
    """Flush a pending EOB run + its buffered correction bits."""
    if state["eobrun"] > 0:
        eb = state["eobrun"]
        nbits = eb.bit_length() - 1
        emitter.symbol(nbits << 4)
        if nbits:
            emitter.bits(eb & ((1 << nbits) - 1), nbits)
        state["eobrun"] = 0
        for b in state["bits"]:
            emitter.bits(b, 1)
        state["bits"] = []


def _enc_scan_dc_first(writer, comp_blocks, factors, mcux, mcuy, dc_codes, al):
    preds = [0] * len(comp_blocks)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (hc, vc) in enumerate(factors):
                for by in range(vc):
                    for bx in range(hc):
                        dc = int(comp_blocks[ci][my * vc + by, mx * hc + bx][0]) >> al
                        diff = dc - preds[ci]
                        preds[ci] = dc
                        s = _mag_category(diff)
                        length, code = dc_codes[ci][s]
                        writer.write(code, length)
                        if s:
                            writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)


def _enc_scan_dc_refine(writer, comp_blocks, factors, mcux, mcuy, al):
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (hc, vc) in enumerate(factors):
                for by in range(vc):
                    for bx in range(hc):
                        dc = int(comp_blocks[ci][my * vc + by, mx * hc + bx][0])
                        writer.write((dc >> al) & 1, 1)


def _enc_scan_ac_first(emitter, blocks, ss, se, al, state):
    """AC first scan over one component's blocks (raster, non-padded)."""
    for zz in blocks:
        r = 0
        for k in range(ss, se + 1):
            v = int(zz[k])
            if v >= 0:
                t = v >> al
                t2 = t
            else:
                t = (-v) >> al
                t2 = ~t
            if t == 0:
                r += 1
                continue
            _emit_eobrun(emitter, state)
            while r > 15:
                emitter.symbol(0xF0)
                r -= 16
            s = t.bit_length()
            emitter.symbol((r << 4) | s)
            emitter.bits(t2 & ((1 << s) - 1), s)
            r = 0
        if r:
            state["eobrun"] += 1
            if state["eobrun"] == 0x7FFF:
                _emit_eobrun(emitter, state)


def _enc_scan_ac_refine(emitter, blocks, ss, se, al, state):
    """AC refinement scan: newly-significant coefficients are coded with
    magnitude 1; history-nonzero ones contribute buffered correction bits."""
    for zz in blocks:
        absv = [(int(v) if v >= 0 else -int(v)) >> al for v in zz[ss : se + 1]]
        eobpos = ss - 1
        for k in range(ss, se + 1):
            if absv[k - ss] == 1:
                eobpos = k
        r = 0
        br: list[int] = []
        for k in range(ss, se + 1):
            t = absv[k - ss]
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= eobpos:
                _emit_eobrun(emitter, state)
                emitter.symbol(0xF0)
                r -= 16
                for b in br:
                    emitter.bits(b, 1)
                br = []
            if t > 1:  # history-nonzero: correction bit only
                br.append(t & 1)
                continue
            _emit_eobrun(emitter, state)
            emitter.symbol((r << 4) | 1)
            emitter.bits(0 if int(zz[k]) < 0 else 1, 1)
            for b in br:
                emitter.bits(b, 1)
            br = []
            r = 0
        if r or br:
            state["eobrun"] += 1
            state["bits"].extend(br)
            if state["eobrun"] == 0x7FFF:
                _emit_eobrun(emitter, state)


def _plane_to_zigzag_blocks(plane: np.ndarray, qtable: np.ndarray) -> np.ndarray:
    """(by, bx, 64) quantized zigzag coefficients for an 8-aligned plane."""
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).astype(np.float64)
        - 128.0
    )
    coef = np.einsum("ij,abjk,lk->abil", _DCT, blocks, _DCT)
    q = np.round(coef.reshape(h // 8, w // 8, 64) / qtable).astype(np.int64)
    return q[:, :, ZIGZAG]


def _pad_edge(plane: np.ndarray, mult_y: int, mult_x: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mult_y
    pw = (-w) % mult_x
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def encode_jpeg(
    img: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
    progressive: bool = False,
    scan_script: list | None = None,
) -> bytes:
    """Encode ``(h, w, 3)`` RGB or ``(h, w)`` grayscale uint8 as baseline
    JPEG (4:4:4, or 4:2:0 with ``subsample=True``).  With
    ``progressive=True`` the file is SOF2 progressive using the standard
    libjpeg scan script (spectral selection + successive approximation) —
    the same quantized coefficients in a different entropy layout, so it
    decodes to pixels identical to the baseline encoding."""
    img = np.asarray(img)
    if progressive and restart_interval:
        raise ValueError("restart intervals are not supported with progressive=True")
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("expected uint8 (h, w) or (h, w, 3)")
    gray = img.ndim == 2
    if not gray and img.shape[2] != 3:
        raise ValueError("expected 3 channels")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qlum, qchrom = _quality_tables(quality)

    if gray:
        factors = [(1, 1)]
        planes = [_pad_edge(img, 8, 8)]
        qsel = [0]
    else:
        rgb = img.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128.0
        cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128.0
        if subsample:
            factors = [(2, 2), (1, 1), (1, 1)]
            yp = _pad_edge(np.round(y), 16, 16)
            chroma = []
            for c in (cb, cr):
                cpad = _pad_edge(c, 16, 16)
                ch2, cw2 = cpad.shape
                sub = cpad.reshape(ch2 // 2, 2, cw2 // 2, 2).mean(axis=(1, 3))
                chroma.append(np.round(sub))
            planes = [yp, chroma[0], chroma[1]]
        else:
            factors = [(1, 1), (1, 1), (1, 1)]
            planes = [_pad_edge(np.round(p), 8, 8) for p in (y, cb, cr)]
        planes = [np.clip(p, 0, 255) for p in planes]
        qsel = [0, 1, 1]

    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    qtabs = [qlum, qchrom]
    comp_blocks = [
        _plane_to_zigzag_blocks(p, qtabs[qsel[i]]) for i, p in enumerate(planes)
    ]
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # Huffman code dicts: symbol -> (length, code)
    def codes(tbl):
        return {v: (l, c) for l, c, v in _canonical_codes(*tbl)}

    dc_codes = [codes(_DC_LUM)] + [codes(_DC_CHROM)] * (len(planes) - 1)
    ac_codes = [codes(_AC_LUM)] + [codes(_AC_CHROM)] * (len(planes) - 1)

    nf = len(planes)
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, q in enumerate(qtabs[: 1 if gray else 2]):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) + bytes(q[ZIGZAG].tolist())
    sof = 0xC2 if progressive else 0xC0
    out += bytes([0xFF, sof]) + struct.pack(">HBHHB", 8 + 3 * nf, 8, h, w, nf)
    for i, (hc, vc) in enumerate(factors):
        out += struct.pack(">BBB", i + 1, (hc << 4) | vc, qsel[i])
    huff_tabs = [(0, 0, _DC_LUM), (1, 0, _AC_LUM)]
    if not gray:
        huff_tabs += [(0, 1, _DC_CHROM), (1, 1, _AC_CHROM)]
    for tc, th, (bits, vals) in huff_tabs:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), (tc << 4) | th)
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    def sos_header(
        comp_idxs: list[int], ss: int, se: int, ah: int, al: int,
        ac_table: int | None = None,
    ) -> bytes:
        hdr = bytes([0xFF, 0xDA]) + struct.pack(">HB", 6 + 2 * len(comp_idxs), len(comp_idxs))
        for i in comp_idxs:
            td = 0 if i == 0 else 1
            ta = (0 if i == 0 else 1) if ac_table is None else ac_table
            hdr += struct.pack(">BB", i + 1, (td << 4) | ta)
        return hdr + struct.pack(">BBB", ss, se, (ah << 4) | al)

    if not progressive:
        writer = _BitWriter()
        preds = [0] * len(planes)
        rst = 0
        n_mcu = 0
        entropy_parts: list[bytes] = []
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                    writer.byte_align()
                    entropy_parts.append(bytes(writer.out))
                    entropy_parts.append(bytes([0xFF, 0xD0 + rst]))
                    writer = _BitWriter()
                    rst = (rst + 1) & 7
                    preds = [0] * len(planes)
                mcu = []
                for ci, (hc, vc) in enumerate(factors):
                    for by in range(vc):
                        for bx in range(hc):
                            mcu.append((ci, comp_blocks[ci][my * vc + by, mx * hc + bx]))
                _encode_blocks(writer, mcu, dc_codes, ac_codes, preds)
                n_mcu += 1
        writer.byte_align()
        entropy_parts.append(bytes(writer.out))
        out += sos_header(list(range(nf)), 0, 63, 0, 0)
        for part in entropy_parts:
            out += part
        out += b"\xff\xd9"  # EOI
        return bytes(out)

    # progressive: the standard libjpeg scan script.  AC scans are
    # single-component over the component's own (non-padded) block grid.
    def comp_ac_blocks(ci: int):
        hc, vc = factors[ci]
        bw = -(-(-(-w * hc // hmax)) // 8)  # ceil(ceil(w*hc/hmax)/8)
        bh = -(-(-(-h * vc // vmax)) // 8)
        blk = comp_blocks[ci]
        return [blk[by, bx] for by in range(bh) for bx in range(bw)]

    if scan_script is not None:
        script = scan_script
    elif gray:
        script = [
            ("dc_first", None, 0, 0, 0, 1),
            ("ac_first", 0, 1, 5, 0, 2),
            ("ac_first", 0, 6, 63, 0, 2),
            ("ac_refine", 0, 1, 63, 2, 1),
            ("dc_refine", None, 0, 0, 1, 0),
            ("ac_refine", 0, 1, 63, 1, 0),
        ]
    else:
        script = [
            ("dc_first", None, 0, 0, 0, 1),
            ("ac_first", 0, 1, 5, 0, 2),
            ("ac_first", 2, 1, 63, 0, 1),
            ("ac_first", 1, 1, 63, 0, 1),
            ("ac_first", 0, 6, 63, 0, 2),
            ("ac_refine", 0, 1, 63, 2, 1),
            ("dc_refine", None, 0, 0, 1, 0),
            ("ac_refine", 2, 1, 63, 1, 0),
            ("ac_refine", 1, 1, 63, 1, 0),
            ("ac_refine", 0, 1, 63, 1, 0),
        ]
    for kind, ci, ss, se, ah, al in script:
        writer = _BitWriter()
        if kind == "dc_first":
            out += sos_header(list(range(nf)), ss, se, ah, al)
            _enc_scan_dc_first(writer, comp_blocks, factors, mcux, mcuy, dc_codes, al)
        elif kind == "dc_refine":
            out += sos_header(list(range(nf)), ss, se, ah, al)
            _enc_scan_dc_refine(writer, comp_blocks, factors, mcux, mcuy, al)
        else:
            blocks = comp_ac_blocks(ci)
            enc = _enc_scan_ac_first if kind == "ac_first" else _enc_scan_ac_refine
            # pass 1: symbol frequencies -> per-scan optimal table
            counter = _SymbolCounter()
            cstate = {"eobrun": 0, "bits": []}
            enc(counter, blocks, ss, se, al, cstate)
            _emit_eobrun(counter, cstate)
            bits, vals = _optimal_huffman(counter.freq)
            # per-scan DHT redefining AC table 0 (tc=1, th=0)
            out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), 0x10)
            out += bytes(bits) + bytes(vals)
            codes = {v: (l, c) for l, c, v in _canonical_codes(bits, vals)}
            out += sos_header([ci], ss, se, ah, al, ac_table=0)
            state = {"eobrun": 0, "bits": []}
            emitter = _SymbolWriter(writer, codes)
            enc(emitter, blocks, ss, se, al, state)
            _emit_eobrun(emitter, state)
        writer.byte_align()
        out += bytes(writer.out)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder


class _BitReader:
    """MSB-first bit reader over a stuffing-stripped entropy segment."""

    __slots__ = ("buf", "pos", "acc", "nbits", "overrun")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0
        self.acc = 0
        self.nbits = 0
        self.overrun = 0

    def readbits(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.buf):
                # the final byte may legitimately be 1-padded, but reading
                # beyond that means a truncated stream, not padding
                self.overrun += 1
                if self.overrun > 2:
                    raise ValueError("truncated JPEG entropy stream")
                self.acc = (self.acc << 8) | 0xFF
            else:
                self.acc = (self.acc << 8) | self.buf[self.pos]
                self.pos += 1
            self.nbits += 8
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v


def _build_decode_table(bits: list[int], vals: list[int]) -> dict:
    return {(l, c): v for l, c, v in _canonical_codes(bits, vals)}


def _read_huff(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.readbits(1)
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid JPEG Huffman code (corrupt entropy data)")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _split_entropy(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Split one scan's entropy stream (starting at ``pos``) into restart
    segments with stuffed 0x00 stripped.  Returns ``(segments, end)`` where
    ``end`` points at the 0xFF of the marker that terminated the scan."""
    n = len(data)
    segments: list[bytes] = []
    cur = bytearray()
    i = pos
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        m = data[i + 1] if i + 1 < n else 0xD9
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:
            segments.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # EOI or any other marker ends the scan
            break
    segments.append(bytes(cur))
    return segments, min(i, n)


def _decode_block_seq(zz, reader, dct, act, preds, ci) -> None:
    """Sequential-mode block: full DC + AC band (baseline/extended)."""
    s = _read_huff(reader, dct)
    diff = _extend(reader.readbits(s), s) if s else 0
    preds[ci] += diff
    zz[0] = preds[ci]
    k = 1
    while k < 64:
        rs = _read_huff(reader, act)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC coefficient overrun")
        zz[k] = _extend(reader.readbits(s), s)
        k += 1


def _decode_block_ac_first(zz, reader, act, ss, se, al, eobrun: int) -> int:
    """Progressive AC first scan (T.81 G.2.2); returns the new EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _read_huff(reader, act)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r < 15:
                return (1 << r) - 1 + (reader.readbits(r) if r else 0)
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("JPEG AC coefficient overrun")
        zz[k] = _extend(reader.readbits(s), s) << al
        k += 1
    return 0


def _refine_nonzero(zz, reader, k, p1, m1) -> None:
    """Correction bit for a history-nonzero coefficient (T.81 G.2.2.3)."""
    if reader.readbits(1) and (int(zz[k]) & p1) == 0:
        zz[k] += p1 if zz[k] >= 0 else m1


def _decode_block_ac_refine(zz, reader, act, ss, se, al, eobrun: int) -> int:
    """Progressive AC refinement scan; returns the EOB run remaining for
    FUTURE blocks (an EOBn symbol's run value already excludes the block
    in which it is read)."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        new_run = None
        while k <= se:
            rs = _read_huff(reader, act)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r < 15:
                    new_run = (1 << r) - 1 + (reader.readbits(r) if r else 0)
                    break
                val = 0  # ZRL: skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("bad JPEG AC refinement magnitude")
                val = p1 if reader.readbits(1) else m1
            while k <= se:
                if zz[k] != 0:
                    _refine_nonzero(zz, reader, k, p1, m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                zz[k] = val
            k += 1
        if new_run is None:
            return 0
        # the EOB run starts here: correction bits for the rest of THIS
        # block, then new_run more blocks are covered
        while k <= se:
            if zz[k] != 0:
                _refine_nonzero(zz, reader, k, p1, m1)
            k += 1
        return new_run
    # entered inside an EOB run: nonzero-history coefficients still take
    # correction bits; one run slot is consumed
    while k <= se:
        if zz[k] != 0:
            _refine_nonzero(zz, reader, k, p1, m1)
        k += 1
    return eobrun - 1


def _decode_scan(
    coeffs,
    comps,
    scomps,
    htables,
    ss,
    se,
    ah,
    al,
    segments,
    restart_interval,
    progressive,
    fh,
    fw,
) -> None:
    """Decode one scan's entropy data into the coefficient arrays."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    dc_tabs, ac_tabs = [], []
    for ci, td, ta in scomps:
        need_dc = ss == 0 and not (progressive and ah > 0)
        need_ac = se > 0
        if need_dc and (0, td) not in htables:
            raise ValueError("JPEG DC Huffman table missing")
        if need_ac and (1, ta) not in htables:
            raise ValueError("JPEG AC Huffman table missing")
        dc_tabs.append(htables.get((0, td)))
        ac_tabs.append(htables.get((1, ta)))

    seg_iter = iter(segments)
    reader = _BitReader(next(seg_iter))
    preds = [0] * len(comps)
    eobrun = 0
    n_unit = 0

    def maybe_restart():
        nonlocal reader, preds, eobrun
        if restart_interval and n_unit and n_unit % restart_interval == 0:
            nxt = next(seg_iter, None)
            if nxt is None:
                raise ValueError("JPEG truncated at restart boundary")
            reader = _BitReader(nxt)
            preds = [0] * len(comps)
            eobrun = 0

    def decode_one(si, ci, zz):
        nonlocal eobrun
        if not progressive:
            _decode_block_seq(zz, reader, dc_tabs[si], ac_tabs[si], preds, ci)
        elif ss == 0:
            if ah == 0:  # DC first
                s = _read_huff(reader, dc_tabs[si])
                diff = _extend(reader.readbits(s), s) if s else 0
                preds[ci] += diff
                zz[0] = preds[ci] << al
            else:  # DC refinement: one raw bit
                if reader.readbits(1):
                    zz[0] = int(zz[0]) | (1 << al)
        elif ah == 0:
            eobrun = _decode_block_ac_first(zz, reader, ac_tabs[si], ss, se, al, eobrun)
        else:
            eobrun = _decode_block_ac_refine(zz, reader, ac_tabs[si], ss, se, al, eobrun)

    if len(scomps) > 1:  # interleaved: MCU order over padded block grids
        mcux = -(-fw // (8 * hmax))
        mcuy = -(-fh // (8 * vmax))
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart()
                for si, (ci, _, _) in enumerate(scomps):
                    _, hc, vc, _ = comps[ci]
                    for by in range(vc):
                        for bx in range(hc):
                            decode_one(si, ci, coeffs[ci][my * vc + by, mx * hc + bx])
                n_unit += 1
    else:  # non-interleaved: raster over the component's own block grid
        ci = scomps[0][0]
        _, hc, vc, _ = comps[ci]
        comp_w = -(-fw * hc // hmax)
        comp_h = -(-fh * vc // vmax)
        bw = -(-comp_w // 8)
        bh = -(-comp_h // 8)
        for by in range(bh):
            for bx in range(bw):
                maybe_restart()
                decode_one(0, ci, coeffs[ci][by, bx])
                n_unit += 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline, extended-sequential, or progressive JPEG bytes to
    uint8 ``(h, w, 3)`` RGB or ``(h, w)`` grayscale.  See the module
    docstring for the supported envelope.

    Failure contract: ANY malformed/corrupt input raises ``ValueError``
    (or ``struct.error`` from header parsing) — arithmetic/index faults
    from garbage entropy data are normalized so corpus-scale decode
    stages can classify bad payloads instead of crashing the task."""
    try:
        return _decode_jpeg_impl(data)
    except (ValueError, struct.error):
        raise
    except (OverflowError, IndexError, KeyError, ZeroDivisionError, MemoryError) as ex:
        raise ValueError(f"corrupt JPEG stream ({type(ex).__name__})") from ex


def _decode_jpeg_impl(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    restart_interval = 0
    frame = None  # (h, w, [(comp_id, hc, vc, tq)])
    progressive = False
    coeffs = None
    comps = None
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        while pos + 1 < n and data[pos + 1] == 0xFF:
            pos += 1  # legal fill bytes between markers
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            continue  # standalone markers
        (seglen,) = struct.unpack_from(">H", data, pos)
        body = data[pos + 2 : pos + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        pos += seglen
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                off += 1
                if pq == 0:
                    q = np.frombuffer(body, np.uint8, 64, off).astype(np.int64)
                    off += 64
                elif pq == 1:
                    q = np.frombuffer(body, ">u2", 64, off).astype(np.int64)
                    off += 128
                else:
                    raise ValueError(f"bad DQT precision {pq}")
                raster = np.empty(64, dtype=np.int64)
                raster[ZIGZAG] = q
                qtables[tq] = raster
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            prec, fh, fw, nf = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError(f"{prec}-bit JPEG not supported (8-bit only)")
            progressive = marker == 0xC2
            if fh < 1 or fw < 1 or not 1 <= nf <= 4:
                raise ValueError("bad JPEG frame header (dims/component count)")
            if fh * fw > (1 << 28):  # ~268 MP: refuse absurd declared dims
                raise ValueError("JPEG declared dimensions exceed the decode cap")
            comps = []
            for i in range(nf):
                cid, hv, tq = struct.unpack_from(">BBB", body, 3 + 3 * i + 3)
                hc, vc = hv >> 4, hv & 0xF
                if not (1 <= hc <= 4 and 1 <= vc <= 4):
                    raise ValueError("bad JPEG sampling factors")
                comps.append((cid, hc, vc, tq))
            if nf == 1:
                # single-component frames decode as 1x1-sampled regardless
                # of declared factors (libjpeg convention)
                comps = [(comps[0][0], 1, 1, comps[0][3])]
            frame = (fh, fw, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            kind = {0xC3: "lossless"}.get(marker, "non-baseline")
            raise ValueError(
                f"{kind} JPEG (SOF{marker - 0xC0}) not supported; "
                "sequential/progressive Huffman only"
            )
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0xF
                bits = list(body[off + 1 : off + 17])
                nv = sum(bits)
                vals = list(body[off + 17 : off + 17 + nv])
                htables[(tc, th)] = _build_decode_table(bits, vals)
                off += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            fh, fw, comps = frame
            ns = body[0]
            cids = [c[0] for c in comps]
            scomps = []
            for i in range(ns):
                cid, tdta = struct.unpack_from(">BB", body, 1 + 2 * i)
                scomps.append((cids.index(cid), tdta >> 4, tdta & 0xF))
            ss, se, ahal = struct.unpack_from(">BBB", body, 1 + 2 * ns)
            ah, al = ahal >> 4, ahal & 0xF
            if not progressive and (ss != 0 or se != 63 or ah != 0 or al != 0):
                raise ValueError("bad sequential JPEG scan header")
            if progressive:
                if ss == 0 and se != 0:
                    raise ValueError("bad progressive JPEG scan header (DC scan needs Se=0)")
                if ss > 0 and (ns != 1 or se < ss or se > 63):
                    raise ValueError("bad progressive JPEG scan header (AC scan)")
            if coeffs is None:
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mcux = -(-fw // (8 * hmax))
                mcuy = -(-fh // (8 * vmax))
                coeffs = [
                    np.zeros((mcuy * c[2], mcux * c[1], 64), dtype=np.int64)
                    for c in comps
                ]
            segments, pos = _split_entropy(data, pos)
            _decode_scan(
                coeffs, comps, scomps, htables, ss, se, ah, al,
                segments, restart_interval, progressive, fh, fw,
            )
        # else: APPn / COM / unknown — skipped via seglen
    if frame is None or coeffs is None:
        raise ValueError("JPEG missing SOF/SOS")
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    for _, hc, vc, tq in comps:
        if tq not in qtables:
            raise ValueError(f"JPEG quantization table {tq} missing")

    # vectorized dequant + de-zigzag + IDCT per component
    planes = []
    for ci, (_, hc, vc, tq) in enumerate(comps):
        q = coeffs[ci] * qtables[tq][ZIGZAG][None, None, :]
        raster = q[:, :, _UNZIGZAG].reshape(q.shape[0], q.shape[1], 8, 8)
        pix = np.einsum("ji,abjk,kl->abil", _DCT, raster.astype(np.float64), _DCT)
        by, bx = pix.shape[:2]
        plane = pix.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8) + 128.0
        fy, fx = vmax // vc, hmax // hc
        if fy > 1:
            plane = np.repeat(plane, fy, axis=0)
        if fx > 1:
            plane = np.repeat(plane, fx, axis=1)
        planes.append(plane[:fh, :fw])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    if len(planes) != 3:
        raise ValueError(f"{len(planes)}-component JPEG not supported (1 or 3)")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    out = np.stack([r, g, b], axis=2)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)
