"""rANS (range asymmetric numeral system) codec for the NFLR bitstreams.

The reference delegates bitstream coding to compressai's C++ range coder
(reference utils/Networks.py:1062-1086, CompressFramework.py:379-392).
compressai is not available here, so we ship our own codec.  rANS is chosen
over a carry-based range coder for its simpler, provably-correct renorm.

Encoding uses per-symbol (cum_freq, freq) from a quantized CDF with total
1 << PRECISION; symbols are encoded in reverse and the byte stream is
emitted little-end-first, the standard rANS construction (Duda 2014).

All functions operate on numpy int arrays; pmf->CDF quantisation lives in
nflr/entropy.py.

A byte-exact native backend (native/rans.cpp -> native/bin/librans.so,
built by `make -C native`) is loaded via ctypes when present — the
per-symbol Python loops below are the fallback and the readable spec.
"""
from __future__ import annotations

import ctypes
import os
from typing import List, Sequence

import numpy as np

PRECISION = 12                 # cdf total = 4096
RANS_L = 1 << 23               # renormalisation lower bound
_MASK = (1 << PRECISION) - 1

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                         "bin", "librans.so")


def _load_native():
    try:
        lib = ctypes.CDLL(os.path.abspath(_LIB_PATH))
    except OSError:
        return None
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
    lib.rans_encode_indexed.restype = ctypes.c_int64
    lib.rans_encode_indexed.argtypes = [
        i32p, ctypes.c_int64, u32p, i64p, ctypes.c_void_p, u8p,
        ctypes.c_int64]
    lib.rans_decode_indexed.restype = ctypes.c_int64
    lib.rans_decode_indexed.argtypes = [
        u8p, ctypes.c_int64, ctypes.c_int64, u32p, i64p, ctypes.c_int64,
        ctypes.c_void_p, i32p]
    return lib


_NATIVE = _load_native()


def _flatten_cdfs(cdfs: Sequence[np.ndarray]):
    flat = np.concatenate([np.asarray(c, np.uint32) for c in cdfs])
    off = np.zeros(len(cdfs) + 1, np.int64)
    off[1:] = np.cumsum([len(c) for c in cdfs])
    return np.ascontiguousarray(flat), off


def _native_encode(symbols, cdfs, channel_idx) -> bytes:
    symbols = np.ascontiguousarray(symbols, np.int32).ravel()
    flat, off = _flatten_cdfs(cdfs)
    n = len(symbols)
    out = np.empty(4 * n + 16, np.uint8)
    if channel_idx is None:
        idx_p = None
    else:
        channel_idx = np.ascontiguousarray(channel_idx, np.int32).ravel()
        idx_p = channel_idx.ctypes.data_as(ctypes.c_void_p)
    written = _NATIVE.rans_encode_indexed(symbols, n, flat, off, idx_p,
                                          out, len(out))
    if written <= 0:   # not assert: must fire under python -O
        raise RuntimeError("native rans encode overflow")
    return out[:written].tobytes()


def _native_decode(data: bytes, n: int, cdfs, channel_idx) -> np.ndarray:
    buf = np.frombuffer(data, np.uint8)
    flat, off = _flatten_cdfs(cdfs)
    out = np.empty(n, np.int32)
    if channel_idx is None:
        idx_p = None
    else:
        channel_idx = np.ascontiguousarray(channel_idx, np.int32).ravel()
        idx_p = channel_idx.ctypes.data_as(ctypes.c_void_p)
    rc = _NATIVE.rans_decode_indexed(np.ascontiguousarray(buf), len(buf), n,
                                     flat, off, len(cdfs), idx_p, out)
    if rc != 0:        # not assert: must fire under python -O
        raise ValueError("native rans decode failed (truncated stream?)")
    return out.astype(np.int64)


def encode(symbols: np.ndarray, cdf: np.ndarray) -> bytes:
    if _NATIVE is not None:
        return _native_encode(symbols, [cdf], None)
    return _encode_py(symbols, cdf)


def decode(data: bytes, n_symbols: int, cdf: np.ndarray) -> np.ndarray:
    if _NATIVE is not None:
        return _native_decode(data, n_symbols, [cdf], None)
    return _decode_py(data, n_symbols, cdf)


def encode_per_channel(symbols: np.ndarray, cdfs: Sequence[np.ndarray],
                       channel_idx: np.ndarray) -> bytes:
    """Encode symbols where symbol i uses cdfs[channel_idx[i]]."""
    if _NATIVE is not None:
        return _native_encode(symbols, cdfs, channel_idx)
    return _encode_per_channel_py(symbols, cdfs, channel_idx)


def decode_per_channel(data: bytes, cdfs: Sequence[np.ndarray],
                       channel_idx: np.ndarray) -> np.ndarray:
    """Inverse of encode_per_channel."""
    if _NATIVE is not None:
        n = len(np.asarray(channel_idx).ravel())
        return _native_decode(data, n, cdfs, channel_idx)
    return _decode_per_channel_py(data, cdfs, channel_idx)


def _encode_py(symbols: np.ndarray, cdf: np.ndarray) -> bytes:
    """Encode int symbols with one shared quantized CDF.

    cdf: (S+1,) uint32 cumulative frequencies, cdf[0]=0,
    cdf[-1]=1<<PRECISION, strictly increasing (every symbol has freq >= 1).
    """
    symbols = np.asarray(symbols, np.int64).ravel()
    freqs = (cdf[1:] - cdf[:-1]).astype(np.int64)
    starts = cdf[:-1].astype(np.int64)
    out = bytearray()
    x = RANS_L
    for s in symbols[::-1]:
        f = int(freqs[s])
        c = int(starts[s])
        # renormalise: keep x < (RANS_L >> PRECISION) << 8) * f after encode
        x_max = ((RANS_L >> PRECISION) << 8) * f
        while x >= x_max:
            out.append(x & 0xFF)
            x >>= 8
        x = ((x // f) << PRECISION) + (x % f) + c
    # flush 32-bit state, little-end-first like the renorm bytes
    for _ in range(4):
        out.append(x & 0xFF)
        x >>= 8
    return bytes(out[::-1])


def _decode_py(data: bytes, n_symbols: int, cdf: np.ndarray) -> np.ndarray:
    """Inverse of encode: recover n_symbols ints."""
    freqs = (cdf[1:] - cdf[:-1]).astype(np.int64)
    starts = cdf[:-1].astype(np.int64)
    # symbol lookup table: slot -> symbol
    slot2sym = np.zeros(1 << PRECISION, np.int64)
    for s in range(len(freqs)):
        slot2sym[starts[s]:starts[s] + freqs[s]] = s
    pos = 0
    x = 0
    for _ in range(4):
        x = (x << 8) | data[pos]
        pos += 1
    out = np.empty(n_symbols, np.int64)
    for i in range(n_symbols):
        slot = x & _MASK
        s = int(slot2sym[slot])
        out[i] = s
        x = int(freqs[s]) * (x >> PRECISION) + slot - int(starts[s])
        while x < RANS_L and pos < len(data):
            x = (x << 8) | data[pos]
            pos += 1
    return out


def _encode_per_channel_py(symbols: np.ndarray, cdfs: Sequence[np.ndarray],
                           channel_idx: np.ndarray) -> bytes:
    symbols = np.asarray(symbols, np.int64).ravel()
    channel_idx = np.asarray(channel_idx, np.int64).ravel()
    out = bytearray()
    x = RANS_L
    for i in range(len(symbols) - 1, -1, -1):
        cdf = cdfs[channel_idx[i]]
        s = int(symbols[i])
        f = int(cdf[s + 1] - cdf[s])
        c = int(cdf[s])
        x_max = ((RANS_L >> PRECISION) << 8) * f
        while x >= x_max:
            out.append(x & 0xFF)
            x >>= 8
        x = ((x // f) << PRECISION) + (x % f) + c
    for _ in range(4):
        out.append(x & 0xFF)
        x >>= 8
    return bytes(out[::-1])


def _decode_per_channel_py(data: bytes, cdfs: Sequence[np.ndarray],
                           channel_idx: np.ndarray) -> np.ndarray:
    channel_idx = np.asarray(channel_idx, np.int64).ravel()
    n = len(channel_idx)
    luts = []
    for cdf in cdfs:
        freqs = (cdf[1:] - cdf[:-1]).astype(np.int64)
        starts = cdf[:-1].astype(np.int64)
        lut = np.zeros(1 << PRECISION, np.int64)
        for s in range(len(freqs)):
            lut[starts[s]:starts[s] + freqs[s]] = s
        luts.append((lut, freqs, starts))
    pos = 0
    x = 0
    for _ in range(4):
        x = (x << 8) | data[pos]
        pos += 1
    out = np.empty(n, np.int64)
    for i in range(n):
        lut, freqs, starts = luts[channel_idx[i]]
        slot = x & _MASK
        s = int(lut[slot])
        out[i] = s
        x = int(freqs[s]) * (x >> PRECISION) + slot - int(starts[s])
        while x < RANS_L and pos < len(data):
            x = (x << 8) | data[pos]
            pos += 1
    return out


def quantize_pmf(pmf: np.ndarray) -> np.ndarray:
    """Quantize a pmf into a strictly-increasing CDF with total 1<<PRECISION.

    Every symbol gets freq >= 1 so it stays encodable (matching the
    range-coder convention the reference's backend uses).
    """
    pmf = np.asarray(pmf, np.float64).clip(0)
    n = len(pmf)
    total = 1 << PRECISION
    assert n <= total, "alphabet too large for CDF precision"
    if pmf.sum() <= 0:
        freqs = np.full(n, total // n, np.int64)
        freqs[: total - freqs.sum()] += 1
    else:
        freqs = np.maximum(1, np.round(pmf / pmf.sum() * total)).astype(np.int64)
        # fix the rounding drift, never dropping a freq below 1
        drift = int(freqs.sum()) - total
        while drift != 0:
            if drift > 0:
                i = int(np.argmax(freqs))
                take = min(drift, int(freqs[i]) - 1)
                if take == 0:
                    raise ValueError("cannot normalise pmf")
                freqs[i] -= take
                drift -= take
            else:
                i = int(np.argmax(freqs))
                freqs[i] += -drift
                drift = 0
    cdf = np.zeros(n + 1, np.uint32)
    cdf[1:] = np.cumsum(freqs)
    assert cdf[-1] == total
    return cdf
