"""Lossy 1-byte ("Char4") doc-length encoding.

WiSER stores every document length as a single byte using a float-like
format: 3 mantissa bits + 5 exponent bits (reference ``utils.h:301-329``,
modeled on Lucene's ``longToInt4``). The QUERY-TIME BM25 tfnorm uses the
DECODED lossy length (reference ``scoring.h:64-96`` routes through a
256-entry cache indexed by the byte), so the encoding is score-visible:
any rebuild that uses exact doc lengths produces different ranks. These
kernels replicate the bit semantics exactly, vectorized over numpy arrays.

Encoding (value v >= 0, v < 2**31):
  v < 8          -> byte = v                      ("subnormal": exponent 0)
  otherwise      -> nbits = bit_length(v); shift = nbits - 4
                    byte = ((v >> shift) & 7) | ((shift + 1) << 3)
Decoding (byte c):
  shift = (c >> 3) - 1
  shift == -1    -> value = c & 7
  otherwise      -> value = ((c & 7) | 8) << shift
"""

from __future__ import annotations

import numpy as np


def uint_to_char4(values) -> np.ndarray:
    """Vectorized lossy length encode: uint32-ish array -> uint8 array."""
    v = np.asarray(values, dtype=np.int64)
    if np.any(v < 0) or np.any(v >= (1 << 31)):
        raise ValueError("Char4 input must be in [0, 2^31)")
    # bit_length via frexp: for integer v > 0 (< 2^53 so the double is
    # exact), frexp exponent == bit_length. v == 0 -> exponent 0.
    nbits = np.frexp(v.astype(np.float64))[1].astype(np.int64)
    shift = np.maximum(nbits - 4, 0)
    encoded = ((v >> shift) & 7) | ((shift + 1) << 3)
    out = np.where(v < 8, v, encoded)
    return out.astype(np.uint8)


def char4_to_uint(codes) -> np.ndarray:
    """Vectorized lossy length decode: uint8 array -> int64 array.

    The shift is computed in uint32 like the reference (``utils.h:
    301-329``), so codes >= 232 WRAP — Char4ToUint(240) == 0, pinned by
    the reference's tests_8.cc. Unreachable from uint_to_char4 (max
    emitted byte is 231) but the 256-entry tfnorm cache indexes every
    byte, so the table must agree at those codes too."""
    c = np.asarray(codes, dtype=np.int64) & 0xFF
    bits = c & 7
    shift = (c >> 3) - 1
    normal = ((bits | 8) << np.maximum(shift, 0)) & 0xFFFFFFFF
    return np.where(shift < 0, bits, normal).astype(np.int64)


def char4_decode_table() -> np.ndarray:
    """The 256-entry byte->decoded-length table (reference scoring.h:85-90)."""
    return char4_to_uint(np.arange(256))


def uint_to_char4_scalar(v: int) -> int:
    return int(uint_to_char4(np.array([v]))[0])


def char4_to_uint_scalar(c: int) -> int:
    return int(char4_to_uint(np.array([c]))[0])
