"""ASCII / binary (complex) vector IO.

Parity with the reference's templated helpers (io.h:24-90), which the
offline pipeline uses to exchange per-mode pressure vectors with the
wavesolver: whitespace ASCII floats, raw little-endian binary, and complex
vectors stored as interleaved (re, im) pairs.
"""
from __future__ import annotations

import numpy as np


def read_vector_ascii(path: str) -> np.ndarray:
    return np.loadtxt(path, dtype=np.float64).ravel()


def write_vector_ascii(path: str, v: np.ndarray) -> None:
    np.savetxt(path, np.asarray(v, np.float64).ravel(), fmt="%.17g")


def read_vector_binary(path: str, dtype=np.float64) -> np.ndarray:
    return np.fromfile(path, dtype=np.dtype(dtype).newbyteorder("<"))


def write_vector_binary(path: str, v: np.ndarray,
                        dtype=np.float64) -> None:
    np.asarray(v, dtype).astype(np.dtype(dtype).newbyteorder("<"),
                                copy=False).tofile(path)


def read_complex_vector(path: str) -> np.ndarray:
    """Interleaved (re, im) float64 pairs -> complex128."""
    raw = np.fromfile(path, dtype="<f8")
    if raw.size % 2:
        raise ValueError(f"odd float count in complex vector file: {path}")
    return raw[0::2] + 1j * raw[1::2]


def write_complex_vector(path: str, v: np.ndarray) -> None:
    v = np.asarray(v, np.complex128).ravel()
    raw = np.empty(2 * v.size, np.float64)
    raw[0::2] = v.real
    raw[1::2] = v.imag
    raw.astype("<f8", copy=False).tofile(path)
