"""Exact int32 signal ops — JAX/XLA device implementations.

TPU-native mirrors of rspt_tpu/ops/numpy_ops.py (the host oracles), which
in turn replicate the C semantics of the reference's serial loops
(lib_rspt/lib_signalpacker/utils.cpp, lib_fwht/fwht.c,
signal_packer_dct.cpp). All integer arithmetic is int32 two's-complement
wraparound — XLA's int32 ops wrap exactly like C, and logical shifts go
through uint32. Nothing here uses int64/float64 so every function runs
natively on TPU (x64 stays disabled).

Design notes (TPU-first, not a translation):
* The reference's serial scans (delta_encode/xor_encode,
  utils.cpp:193-236) become shift-and-op one-liners; the *inverse* scans
  (prefix sum / prefix xor) become `jnp.cumsum` / `lax.associative_scan`
  — O(log n) depth on the VPU instead of O(n) serial.
* The layout swizzle (convert_native_to_i32, utils.cpp:123-191) becomes
  a reshape + widening shift-or tree: XLA fuses it into one pass.
* FWHT (fwht.c:4-28) becomes log2(n) reshape butterflies on int32.
* DCT-II (signal_packer_dct.cpp:76-87) becomes an MXU matmul against a
  precomputed cosine table. The f32 fast path can differ from the
  reference's serial-double accumulation by ±1 after truncation on a
  tiny fraction of coefficients; `highacc=True` uses a two-float
  (df32) compensated matmul that reproduces f64 accumulation closely
  enough to match the reference on all tested signals.

Every public function is jittable; config (shapes, plane counts) is
static.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Layout: interleaved native sample bytes <-> channel-major int32
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def native_to_i32(native_u8, nr_samples: int, nr_channels: int,
                  bytes_per_sample: int, reverse_byte_order: bool = False):
    """Interleaved native bytes ``[s0c0][s0c1]...`` → (channels, samples)
    int32 with sign extension (reference: utils.cpp:123-191)."""
    bps = bytes_per_sample
    if native_u8.dtype == jnp.int32:
        # Host-side '<i4' word view (packers _as_words): for bps=4 the
        # words ARE the little-endian samples, so the device does pure
        # layout. (Device-side byte assembly — u8 OR tree or a
        # bitcast_convert_type — measured 0.46/1.75 ms on chip for the
        # 1.64 MB ECG payload vs ~0 for this path.)
        assert bps == 4 and not reverse_byte_order
        return native_u8[: nr_samples * nr_channels].reshape(
            nr_samples, nr_channels).T
    flat = native_u8[: nr_samples * nr_channels * bps]
    b = flat.reshape(nr_samples, nr_channels, bps)
    if reverse_byte_order:
        b = b[..., ::-1]
    v = jnp.zeros((nr_samples, nr_channels), dtype=jnp.uint32)
    for k in range(bps):
        v = v | (b[..., k].astype(jnp.uint32) << np.uint32(8 * k))
    # Sign-extend from bit 8*bps-1 via shift-up/arith-shift-down.
    if bps < 4:
        sh = np.int32(32 - 8 * bps)
        v = jnp.right_shift((v << np.uint32(sh)).astype(jnp.int32), sh)
    return v.astype(jnp.int32).T


@functools.partial(jax.jit, static_argnums=(1, 2))
def i32_to_native(arr, bytes_per_sample: int,
                  reverse_byte_order: bool = False):
    """(channels, samples) int32 → interleaved native low bytes, flat u8."""
    bps = bytes_per_sample
    v = arr.T.astype(jnp.uint32)  # (samples, channels)
    planes = [((v >> np.uint32(8 * k)) & np.uint32(0xFF)).astype(jnp.uint8)
              for k in range(bps)]
    b = jnp.stack(planes, axis=-1)
    if reverse_byte_order:
        b = b[..., ::-1]
    return b.reshape(-1)


# ---------------------------------------------------------------------------
# Scans — int32 wraparound (reference: utils.cpp:193-236)
# ---------------------------------------------------------------------------


@jax.jit
def delta_encode(a):
    a = a.astype(jnp.int32)
    prev = jnp.concatenate([jnp.zeros_like(a[:1]), a[:-1]])
    return a - prev


@jax.jit
def delta_decode(a):
    """Inverse of delta_encode (min_val=0): int32 wraparound prefix sum."""
    return jnp.cumsum(a.astype(jnp.int32))


@functools.partial(jax.jit, static_argnums=(1,))
def offset32(a, val: int):
    return a.astype(jnp.int32) + jnp.int32(val)


@jax.jit
def xor_encode(a):
    a = a.astype(jnp.int32)
    prev = jnp.concatenate([jnp.zeros_like(a[:1]), a[:-1]])
    return a ^ prev


@jax.jit
def xor_decode(a):
    """Prefix-xor scan, O(log n) depth (inverse of xor_encode)."""
    return jax.lax.associative_scan(jnp.bitwise_xor, a.astype(jnp.int32))


@jax.jit
def sum64_parts(a):
    """int64-equivalent channel sum without int64: returns (hi16_sum,
    lo16_sum) int32 per row for host reconstruction of the reference's
    64-bit mean (utils.cpp:30-40). a: (channels, n) int32."""
    a = a.astype(jnp.int32)
    hi = jnp.right_shift(a, 16)          # arithmetic shift, keeps sign
    lo = a & jnp.int32(0xFFFF)
    return jnp.sum(hi, axis=-1), jnp.sum(lo, axis=-1)


def average32_host(hi_sum, lo_sum, n: int):
    """Rebuild the reference's quirky mean from device partial sums.

    The reference divides int64_t by size_t — unsigned 64-bit division
    (utils.cpp:38), then truncates to int32 by the return type.
    """
    out = []
    for h, l in zip(np.atleast_1d(np.asarray(hi_sum)),
                    np.atleast_1d(np.asarray(lo_sum))):
        s = (int(h) << 16) + int(l)
        q = ((s % (1 << 64)) // n) & 0xFFFFFFFF
        out.append(q - (1 << 32) if q >= (1 << 31) else q)
    return np.asarray(out, dtype=np.int32)


# ---------------------------------------------------------------------------
# Byte planes (reference: signal_packer_base.cpp:40-68, :122-138)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(1,))
def plane_split(flat_i32, nr_planes: int):
    """(N,) int32 → (nr_planes, N) uint8, plane k = byte k (LSB first)."""
    v = flat_i32.astype(jnp.uint32)
    return jnp.stack([((v >> np.uint32(8 * k)) & np.uint32(0xFF))
                      .astype(jnp.uint8) for k in range(nr_planes)])


@jax.jit
def plane_merge(planes):
    """(nr_planes, N) uint8 → (N,) int32, sign-extended from the top
    plane (the <<8>>8 tricks in signal_packer_base.cpp:122-138)."""
    p = planes.shape[0]
    v = jnp.zeros(planes.shape[1], dtype=jnp.uint32)
    for k in range(p):
        v = v | (planes[k].astype(jnp.uint32) << np.uint32(8 * k))
    if p < 4:
        sh = np.int32(32 - 8 * p)
        return jnp.right_shift((v << np.uint32(sh)).astype(jnp.int32), sh)
    return v.astype(jnp.int32)


# ---------------------------------------------------------------------------
# FWHT (reference: lib_fwht/fwht.c:4-28) — int32 butterflies
# ---------------------------------------------------------------------------


@jax.jit
def fwht(a):
    """Walsh-Hadamard transform along the last axis (len = 2^k), exact
    int32 wraparound butterflies; self-inverse up to ×n."""
    a = a.astype(jnp.int32)
    shape = a.shape
    n = shape[-1]
    assert n & (n - 1) == 0, "FWHT length must be 2^k"
    x = a.reshape(-1, n)
    i = n >> 1
    while i > 0:
        g = x.reshape(x.shape[0], -1, 2, i)
        u, v = g[:, :, 0, :], g[:, :, 1, :]
        x = jnp.stack((u + v, u - v), axis=2).reshape(x.shape[0], n)
        i >>= 1
    return x.reshape(shape)


@functools.partial(jax.jit, static_argnums=(1, 2))
def fwht_normalize_pow2(a, n: int, ratio: float = 1.0):
    """Encode quantization x = trunc(x / (n/ratio)) (fwht.c:30-34).

    For the reference's only used configuration (ratio=1, n=2^k) the
    double divide-then-int-truncate is exactly integer division toward
    zero by a power of two — done here in pure int32 (TPU-native, no
    f64 needed).
    """
    d = n / ratio
    di = int(d)
    assert di == d and di & (di - 1) == 0, "use host path for non-2^k quant"
    a = a.astype(jnp.int32)
    # C-style trunc-toward-zero division by 2^j.
    j = di.bit_length() - 1
    neg = a < 0
    q = jnp.right_shift(jnp.where(neg, -a, a), np.int32(j))
    return jnp.where(neg, -q, q).astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(1,))
def fwht_normalize2_int(a, ratio: float = 1.0):
    """Decode dequantization x = trunc(x / ratio) (fwht.c:36-40); for the
    default ratio=1 this is the identity, computed exactly in int32."""
    if ratio == 1.0:
        return a.astype(jnp.int32)
    di = int(ratio)
    assert di == ratio and di & (di - 1) == 0
    j = di.bit_length() - 1
    a = a.astype(jnp.int32)
    neg = a < 0
    q = jnp.right_shift(jnp.where(neg, -a, a), np.int32(j))
    return jnp.where(neg, -q, q).astype(jnp.int32)


# ---------------------------------------------------------------------------
# DCT-II (reference: signal_packer_dct.cpp:60-100) — MXU matmuls
# ---------------------------------------------------------------------------


def dct_tables(n: int):
    """(cos_table f32 (n,n), cs f32 (n,)) matching init_cos_table
    (signal_packer_dct.cpp:60-74)."""
    i = np.arange(n, dtype=np.float64)[:, None]
    j = np.arange(n, dtype=np.float64)[None, :]
    cos_t = np.cos(((2 * i) * j + j) * (np.pi / (2.0 * n))).astype(np.float32)
    cs = np.ones(n, dtype=np.float32)
    cs[0] = np.float32(1.0 / np.sqrt(2.0))
    return cos_t, cs


# -- df32 (double-float) arithmetic on the VPU ------------------------------
#
# The reference computes each product src[x]*COSINES[x][i] as an f32
# multiply (int promoted to float, signal_packer_dct.cpp:81) but
# accumulates in a serial *double* (:79). TPUs have no f64 and the MXU
# accumulates f32, so the exact path replicates the f32 product rounding
# elementwise and then emulates the f64 accumulator with an error-free
# pairwise 2Sum reduction tree — value carried as an unevaluated (s, e)
# f32 pair, accurate to ~2^-48, which matches f64 through the final
# truncation on all tested signals.


def _two_sum(a, b):
    """Knuth 2Sum: s + e == a + b exactly (6 VPU flops, branch-free)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _df32_split(x):
    """Veltkamp-style split via bf16: hi + lo == x exactly."""
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, x - hi


def _df32_mul(s, e, kh, kl):
    """(s + e) * (kh + kl) where (kh, kl) is a df32 rendering of an f64
    scale factor. Dekker two-product on the leading term."""
    sh, sl = _df32_split(s)
    khh, khl = _df32_split(kh)
    p = s * kh
    perr = ((sh * khh - p) + sh * khl + sl * khh) + sl * khl
    return p, perr + s * kl + e * kh


def _df32_trunc(s, e):
    """trunc(s + e) as int32, resolving the boundary with the error term."""
    q0 = jnp.trunc(s)
    frac = (s - q0) + e  # s - q0 is exact (same binade)
    pos = (s + e) >= 0
    adj = jnp.where(pos, jnp.floor(frac), jnp.ceil(frac))
    return (q0 + adj).astype(jnp.int32)


def _pairwise_2sum(p):
    """Compensated pairwise reduction of f32 values along axis 0.

    Returns (s, e) with s + e == exact sum to ~2^-48 relative. p's axis-0
    length must be a power of two (pad with zeros otherwise).
    """
    s, e = p, jnp.zeros_like(p)
    while s.shape[0] > 1:
        h = s.shape[0] // 2
        s1, e1 = s[:h], e[:h]
        s2, e2 = s[h:], e[h:]
        s, err = _two_sum(s1, s2)
        e = err + (e1 + e2)
    return s[0], e[0]


@functools.partial(jax.jit, static_argnums=(3,))
def dct_forward(src_i32, cos_table, cs, quality=128.0):
    """Fast batched DCT-II with folded-in /quality quantization
    (signal_packer_dct.cpp:76-87): one f32 MXU matmul. ±1 deviations vs
    the reference's serial-double accumulation are possible on a small
    fraction of coefficients; use dct_forward_exact for bit parity.
    src: (..., n) int32 → (..., n) int32.
    """
    n = src_i32.shape[-1]
    ratio1 = np.float64(np.sqrt(2.0 / n))
    x = src_i32.astype(jnp.float32)
    # HIGHEST: the default TPU MXU f32 dot rounds operands to bf16,
    # which is catastrophic for full-magnitude sample values
    s = jnp.dot(x, cos_table, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    scale = cs.astype(jnp.float32) * np.float32(ratio1 / quality)
    return jnp.trunc(s * scale).astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(3,))
def dct_inverse(dct_i32, cos_table, cs, quality=128.0):
    """Fast batched IDCT ×quality (signal_packer_dct.cpp:89-100)."""
    n = dct_i32.shape[-1]
    ratio1 = np.float64(np.sqrt(2.0 / n))
    w = cs.astype(jnp.float32) * dct_i32.astype(jnp.float32)
    s = jnp.dot(w, cos_table.T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    return jnp.trunc(s * np.float32(ratio1 * quality)).astype(jnp.int32)


@functools.lru_cache(maxsize=8)
def _dct_exact_consts(n: int, quality: float):
    """Host-precomputed f64-accurate constants as df32 pairs.

    Forward scale vector k_i = fl64(fl64(f64(cs_i) * ratio1) / quality)
    (signal_packer_dct.cpp:84); inverse scalar k = ratio1 * quality
    (:98). Each is split hi=f32(k), lo=f32(k - hi) so device df32 math
    preserves the f64 value to ~2^-48.
    """
    cos_np, cs_np = dct_tables(n)
    ratio1 = np.float64(np.sqrt(2.0 / n))
    kf = (cs_np.astype(np.float64) * ratio1) / quality
    kf_hi = kf.astype(np.float32)
    kf_lo = (kf - kf_hi.astype(np.float64)).astype(np.float32)
    ki = np.float64(ratio1 * quality)
    ki_hi = np.float32(ki)
    ki_lo = np.float32(ki - np.float64(ki_hi))
    # pure numpy: jit treats these as baked constants at every use site
    return cos_np, cs_np, kf_hi, kf_lo, ki_hi, ki_lo


@functools.partial(jax.jit, static_argnums=(1,))
def dct_forward_exact(src_i32, quality: float = 128.0):
    """Bit-parity DCT-II: f32 products (the reference's int*float
    multiply, signal_packer_dct.cpp:81), df32 2Sum accumulation
    emulating the serial double accumulator (:79), df32 scale, trunc.

    O(n²) VPU work per channel, processed channel-serially via lax.map
    to bound memory at ~2 n² floats. Requires n = 2^k.
    """
    n = src_i32.shape[-1]
    assert n & (n - 1) == 0, "exact DCT path requires n = 2^k"
    cos_t, _, kf_hi, kf_lo, _, _ = _dct_exact_consts(n, quality)
    x2 = src_i32.reshape(-1, n).astype(jnp.float32)

    def one_channel(xrow):
        prods = xrow[:, None] * cos_t  # (n, n) f32: term x of out[i] at [x, i]
        s, e = _pairwise_2sum(prods)
        s, e = _df32_mul(s, e, kf_hi, kf_lo)
        return _df32_trunc(s, e)

    out = jax.lax.map(one_channel, x2)
    return out.reshape(src_i32.shape)


@functools.partial(jax.jit, static_argnums=(1,))
def dct_inverse_exact(dct_i32, quality: float = 128.0):
    """Bit-parity IDCT (signal_packer_dct.cpp:89-100): weights
    w[x] = f32(cs_x * f32(v_x)) (the reference's left-to-right float
    chain :96), f32 products with cos row, df32 accumulation, df32
    ×(ratio1*quality), trunc."""
    n = dct_i32.shape[-1]
    assert n & (n - 1) == 0, "exact DCT path requires n = 2^k"
    cos_t, cs, _, _, ki_hi, ki_lo = _dct_exact_consts(n, quality)
    w2 = cs * dct_i32.reshape(-1, n).astype(jnp.float32)

    def one_channel(wrow):
        # out[i] = sum_x w[x] * COSINES[i][x] → terms of out[i] along
        # axis 1 of wrow[None,:] * cos_t; transpose for axis-0 2Sum.
        prods = (wrow[None, :] * cos_t).T
        s, e = _pairwise_2sum(prods)
        s, e = _df32_mul(s, e, ki_hi, ki_lo)
        return _df32_trunc(s, e)

    out = jax.lax.map(one_channel, w2)
    return out.reshape(dct_i32.shape)
