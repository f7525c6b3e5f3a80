"""Exact int32 preprocessing ops — numpy host implementations.

These are the bit-exactness oracles mirrored by the JAX ops in
rspt_tpu/ops/jax_ops.py. All arithmetic is int32 with wraparound,
matching the reference's C semantics
(lib_rspt/lib_signalpacker/utils.cpp).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Layout: interleaved native sample bytes <-> channel-major int32
# (reference: utils.cpp:123-191 convert_native_to_i32, :51-121 inverse)
# ---------------------------------------------------------------------------


def native_to_i32(native, nr_samples: int, nr_channels: int,
                  bytes_per_sample: int, reverse_byte_order: bool = False
                  ) -> np.ndarray:
    """Interleaved native bytes ``[s0c0][s0c1]...`` → (channels, samples)
    int32 with sign extension. reverse_byte_order=True means the native
    stream is big-endian per sample."""
    buf = np.frombuffer(memoryview(native).cast("B"), dtype=np.uint8) \
        if not isinstance(native, np.ndarray) else native.reshape(-1)
    bps = bytes_per_sample
    if not reverse_byte_order and bps in (1, 2, 4):
        # pure-view fast paths: little-endian widths numpy reads natively
        flat = buf[: nr_samples * nr_channels * bps]
        v = flat.view({1: np.int8, 2: "<i2", 4: "<i4"}[bps])
        return np.ascontiguousarray(
            v.reshape(nr_samples, nr_channels).T.astype(np.int32))
    b = buf[: nr_samples * nr_channels * bps].reshape(nr_samples, nr_channels, bps)
    if reverse_byte_order:
        b = b[..., ::-1]
    v = np.zeros((nr_samples, nr_channels), dtype=np.int64)
    for k in range(bps):
        v |= b[..., k].astype(np.int64) << (8 * k)
    half = np.int64(1) << (8 * bps - 1)
    v = np.where(v >= half, v - (np.int64(1) << (8 * bps)), v)
    return np.ascontiguousarray(v.T.astype(np.int32))


def i32_to_native(arr: np.ndarray, bytes_per_sample: int,
                  reverse_byte_order: bool = False) -> bytes:
    """(channels, samples) int32 → interleaved native low bytes."""
    bps = bytes_per_sample
    if not reverse_byte_order and bps == 4:
        return np.ascontiguousarray(
            arr.astype(np.int32, copy=False).T).astype("<i4").tobytes()
    v = np.ascontiguousarray(arr.T).astype(np.uint32)  # (samples, channels)
    planes = [(v >> np.uint32(8 * k)).astype(np.uint8) for k in range(bps)]
    b = np.stack(planes, axis=-1)  # (samples, channels, bps) little-endian
    if reverse_byte_order:
        b = b[..., ::-1]
    return np.ascontiguousarray(b).tobytes()


# ---------------------------------------------------------------------------
# Scans (reference: utils.cpp:193-236) — int32 wraparound semantics
# ---------------------------------------------------------------------------

def delta_encode(arr: np.ndarray) -> np.ndarray:
    a = arr.astype(np.int32, copy=False)
    prev = np.concatenate(([np.int32(0)], a[:-1]))
    with np.errstate(over="ignore"):
        return (a - prev).astype(np.int32)


def delta_decode(arr: np.ndarray, min_val: int = 0) -> np.ndarray:
    a = arr.astype(np.int64, copy=False) + np.int64(min_val)
    return np.cumsum(a).astype(np.uint64).astype(np.uint32).astype(np.int32) \
        if min_val == 0 else _delta_decode_slow(arr, min_val)


def _delta_decode_slow(arr, min_val):
    out = np.empty_like(arr, dtype=np.int32)
    last = np.int64(0)
    for i, d in enumerate(arr):
        last = np.int64(np.int32(d + last + min_val))
        out[i] = last
    return out


def offset32(arr: np.ndarray, val: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        return (arr.astype(np.int32, copy=False) + np.int32(val)).astype(np.int32)


def xor_encode(arr: np.ndarray) -> np.ndarray:
    a = arr.astype(np.int32, copy=False)
    prev = np.concatenate(([np.int32(0)], a[:-1]))
    return np.bitwise_xor(a, prev)


def xor_decode(arr: np.ndarray) -> np.ndarray:
    return np.bitwise_xor.accumulate(arr.astype(np.int32, copy=False))


def xor_encode_y(arr2d: np.ndarray) -> np.ndarray:
    """Column-wise xor encode across rows — the reference's unused
    xor_encode_32_y with its quirky bounds replicated exactly
    (utils.cpp:238-247): rows 0..1 untouched, row 2 xored with an
    initial 0 (i.e. unchanged), rows ≥3 xored with the previous
    original row."""
    a = arr2d.astype(np.int32, copy=True)
    if a.shape[0] > 3:
        a[3:] = np.bitwise_xor(a[3:], arr2d[2:-1].astype(np.int32))
    return a


def xor_decode_y(arr2d: np.ndarray) -> np.ndarray:
    """Inverse of xor_encode_y (utils.cpp:249-257): sequential
    arr[i] ^= arr[i-1] for rows ≥3."""
    a = arr2d.astype(np.int32, copy=True)
    for i in range(3, a.shape[0]):
        a[i] = np.bitwise_xor(a[i - 1], a[i])
    return a


def fwht_sum_absolute_difference(a: np.ndarray, b: np.ndarray) -> int:
    """Similarity helper (the reference's unused
    fwht_sum_absolute_difference, lib_fwht/fwht.c:42-53): sum of |a-b|
    over the common length."""
    x = a.astype(np.int64)
    y = b.astype(np.int64)
    n = min(x.size, y.size)
    return int(np.abs(x[:n] - y[:n]).sum())


def average32(arr: np.ndarray) -> int:
    """int64-accumulated mean (reference: utils.cpp:30-40).

    Quirk replicated exactly: the reference divides ``int64_t`` by a
    ``size_t`` — C++ usual arithmetic conversions make this an *unsigned*
    64-bit division, so negative sums wrap modulo 2^64 before dividing;
    the result is then truncated to int32 by the return type.
    """
    s = int(np.sum(arr.astype(np.int64)))
    n = arr.size
    q = (s % (1 << 64)) // n  # unsigned 64-bit division
    q &= 0xFFFFFFFF  # int32 return truncation
    return q - (1 << 32) if q >= (1 << 31) else q


# ---------------------------------------------------------------------------
# Byte planes (reference: signal_packer_base.cpp:40-68 split, :122-138 merge)
# ---------------------------------------------------------------------------

def plane_split(flat_i32: np.ndarray, nr_planes: int) -> np.ndarray:
    """(N,) int32 → (nr_planes, N) uint8, plane k = byte k (LSB first)."""
    v = flat_i32.astype(np.uint32, copy=False)
    return np.stack([(v >> np.uint32(8 * k)).astype(np.uint8)
                     for k in range(nr_planes)])


def plane_merge(planes: np.ndarray) -> np.ndarray:
    """(nr_planes, N) uint8 → (N,) int32 sign-extended from the top plane
    (the ``<<8>>8`` tricks in signal_packer_base.cpp:122-138)."""
    p = planes.shape[0]
    v = np.zeros(planes.shape[1], dtype=np.uint32)
    for k in range(p):
        v |= planes[k].astype(np.uint32) << np.uint32(8 * k)
    if p < 4:
        shift = np.uint32(32 - 8 * p)
        v = (v << shift)
        out = v.view(np.int32) >> np.int32(shift)
        return out.astype(np.int32)
    return v.view(np.int32).copy()


# ---------------------------------------------------------------------------
# Transforms
# ---------------------------------------------------------------------------

def fwht(arr: np.ndarray) -> np.ndarray:
    """Fast Walsh-Hadamard transform, int32 wraparound butterflies
    (reference: lib_fwht/fwht.c:4-28). Length must be a power of two."""
    a = arr.astype(np.int32, copy=True)
    n = a.size
    assert n & (n - 1) == 0, "FWHT length must be 2^k"
    i = n >> 1
    with np.errstate(over="ignore"):
        while i > 0:
            g = a.reshape(-1, 2, i)
            u = g[:, 0, :]
            v = g[:, 1, :]
            a = np.stack((u + v, u - v), axis=1).reshape(-1).astype(np.int32)
            i >>= 1
    return a


def fwht_normalize(arr: np.ndarray, n: int, ratio: float) -> np.ndarray:
    """Encode-side quantization: x = trunc(x / (n/ratio))
    (reference: fwht.c:30-34; C int /= double truncates toward zero)."""
    return np.trunc(arr.astype(np.float64) / (n / ratio)).astype(np.int32)


def fwht_normalize2(arr: np.ndarray, ratio: float) -> np.ndarray:
    """Decode-side dequantization: x = trunc(x / ratio) (fwht.c:36-40)."""
    return np.trunc(arr.astype(np.float64) / ratio).astype(np.int32)


def dct_cos_table(n: int) -> np.ndarray:
    """float32 cosine table COSINES[i][j] = cos(j*(2i+1)*pi/(2n))
    (reference: signal_packer_dct.cpp:60-74; tensor_f32 storage)."""
    i = np.arange(n, dtype=np.float64)[:, None]
    j = np.arange(n, dtype=np.float64)[None, :]
    return np.cos(((2 * i) * j + j) * (np.pi / (2.0 * n))).astype(np.float32)


def dct_cs(n: int) -> np.ndarray:
    cs = np.ones(n, dtype=np.float32)
    cs[0] = np.float32(1.0 / np.sqrt(2.0))
    return cs


def dct_forward(src: np.ndarray, cos_table: np.ndarray, cs: np.ndarray,
                quality: float) -> np.ndarray:
    """DCT-II with folded-in quantization (signal_packer_dct.cpp:76-87).

    The reference's inner product `src[x] * COSINES[x][i]` is a FLOAT
    multiply (int promotes to float); the accumulator is double and runs
    serially. numpy's pairwise f64 sum of the f32 products matches on all
    tested signals; the native kernel (rspt_tpu/native) is the serial-
    order exact path used by the packers.
    """
    n = src.size
    ratio1 = np.sqrt(2.0 / n)
    prods = (src.astype(np.float32)[:, None] * cos_table).astype(np.float64)
    sums = prods.sum(axis=0)
    sums = sums * (cs.astype(np.float64) * ratio1 / quality)
    return np.trunc(sums).astype(np.int32)


def dct_inverse(dct: np.ndarray, cos_table: np.ndarray, cs: np.ndarray,
                quality: float) -> np.ndarray:
    """IDCT (signal_packer_dct.cpp:89-100); float products, double sum."""
    n = dct.size
    ratio1 = np.sqrt(2.0 / n)
    weighted = (cs * dct.astype(np.float32)).astype(np.float32)
    prods = (weighted[None, :] * cos_table).astype(np.float64)
    sums = prods.sum(axis=1)
    sums = sums * (ratio1 * quality)
    return np.trunc(sums).astype(np.int32)
