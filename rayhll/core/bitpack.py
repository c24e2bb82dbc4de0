"""Vectorized big-endian ascending word (de)packing.

Byte-layout contract of storage-spec v1.0.0's word streams
(reference: python_hll/serialization.py:149-275): fixed-width words are packed
MSB-first; a high byte of a word lands at a lower array index than a low byte;
the first word occupies the lowest index; the final byte is zero-padded in its
low bits.  The reference packs word-at-a-time in pure Python; here the whole
stream is one ``np.unpackbits``/``np.packbits`` round (np.packbits's trailing
zero-pad is exactly the spec's final-byte padding).

The deserializer mirrors the reference's padding caveat
(reference: python_hll/serialization.py:134-146): ``data_bits // word_length``
is only an upper bound on the word count, so callers slice FULL streams to
exactly ``m`` words and drop zero-valued SPARSE registers.
"""

from __future__ import annotations

import numpy as np


def pack_words(words: np.ndarray, word_length: int, byte_padding: int = 3) -> bytearray:
    """Pack ``words`` (any int dtype, values < 2**word_length) into a
    big-endian ascending bit stream preceded by ``byte_padding`` zero bytes."""
    n = len(words)
    out = bytearray(byte_padding)
    if n == 0:
        return out
    if word_length == 64:
        out += np.ascontiguousarray(words, dtype=np.uint64).astype(">u8").tobytes()
        return out
    w = np.ascontiguousarray(words, dtype=np.uint64).astype(">u8")
    # Bits of each word, MSB first, truncated to the low word_length bits.
    bits = np.unpackbits(w.view(np.uint8).reshape(n, 8), axis=1)[:, 64 - word_length:]
    out += np.packbits(bits.ravel()).tobytes()
    return out


def unpack_words(
    data: bytes | bytearray | memoryview, word_length: int, byte_padding: int = 3
) -> np.ndarray:
    """Unpack every whole word from a big-endian ascending bit stream.

    Returns a uint64 array of ``data_bits // word_length`` words (upper bound;
    the tail may contain fabricated zero words from byte padding — see module
    docstring).
    """
    body = np.frombuffer(data, dtype=np.uint8, offset=byte_padding)
    data_bits = len(body) * 8
    word_count = data_bits // word_length
    if word_count == 0:
        return np.empty(0, dtype=np.uint64)
    if word_length == 64:
        return body[: word_count * 8].view(">u8").astype(np.uint64)
    bits = np.unpackbits(body)[: word_count * word_length].reshape(word_count, word_length)
    padded = np.zeros((word_count, 64), dtype=np.uint8)
    padded[:, 64 - word_length:] = bits
    return (
        np.packbits(padded, axis=1)
        .reshape(word_count, 8)
        .view(">u8")
        .ravel()
        .astype(np.uint64)
    )
