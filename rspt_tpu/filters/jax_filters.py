"""Batched TPU filtering — the reference's per-sample feedback loops
re-expressed as parallel-friendly JAX primitives.

The reference filters one sample per virtual call
(iir_filter.cpp:81-107); on TPU the linear recurrence

    y[t] = Σ_i d[i]·x[t-i]  −  Σ_{i≥1} n[i]·y[t-i]

is split into (a) the feedforward part u = correlate(x, d) — a
convolution the XLA compiler maps to MXU/VPU — and (b) the feedback
recurrence, an affine state map s[t] = A·s[t-1] + e₀·u[t] solved with
``jax.lax.associative_scan`` over (matrix, vector) pairs in O(log n)
depth (the SURVEY §3.4 "companion-matrix scan" design).

Modes:
* ``assoc`` — associative scan, fastest, f32 (or f64 under jax x64);
  reordered arithmetic ⇒ last-ulp differences vs the serial reference.
* ``scan``  — ``lax.scan`` serial recurrence, same rounding *order* as
  the reference's filter_opt when run in f64.

State (the (xz, yz) rings of streaming.py) is explicit: pass ``zi`` and
get ``zf`` back, so block-streaming across shards/checkpoints is a pure
carry exchange (used by parallel/pipeline.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _companion(n_coefs: np.ndarray, dtype) -> np.ndarray:
    """Feedback companion matrix A (m×m, m = order): row 0 holds
    −n[1:], subdiagonal identity shifts the y history."""
    m = len(n_coefs) - 1
    A = np.zeros((m, m), dtype)
    A[0, :] = -np.asarray(n_coefs[1:], dtype)
    for i in range(1, m):
        A[i, i - 1] = 1.0
    return A


def _feedforward(x, d, xz):
    """u[t] = Σ_i d[i]·x[t-i] with pre-history xz (xz[0] = newest).

    x: (..., T). xz: (..., p-1) or None (zeros).
    """
    p = len(d)
    T = x.shape[-1]
    lead = x.shape[:-1]
    if xz is None:
        hist = jnp.zeros(lead + (p - 1,), x.dtype)
    else:
        hist = jnp.flip(xz, axis=-1)  # oldest first for concat
    xp = jnp.concatenate([hist, x], axis=-1)
    d_arr = jnp.asarray(np.asarray(d, np.float64), x.dtype)
    u = jnp.zeros(lead + (T,), x.dtype)
    for i in range(p):
        u = u + d_arr[i] * jax.lax.dynamic_slice_in_dim(
            xp, p - 1 - i, T, axis=-1)
    return u


def iir_apply(x, n, d, zi: Optional[Tuple] = None, mode: str = "assoc"):
    """Filter x (..., T) through the IIR (n=feedback, d=feedforward).

    zi: optional (xz, yz) state rings shaped (..., p-1) with index 0 the
    most recent past value (streaming.py layout minus the current slot).
    Returns (y, (xz_out, yz_out)). Coefficients are static (they shape
    the unrolled feedforward and the companion matrix).
    """
    return _iir_apply(x, tuple(float(v) for v in n),
                      tuple(float(v) for v in d), zi, mode)


@functools.partial(jax.jit, static_argnames=("n", "d", "mode"))
def _iir_apply(x, n, d, zi, mode):
    p = len(n)
    m = p - 1
    dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    x = x.astype(dtype)
    T = x.shape[-1]
    lead = x.shape[:-1]

    xz = zi[0].astype(dtype) if zi is not None else jnp.zeros(lead + (m,), dtype)
    yz = zi[1].astype(dtype) if zi is not None else jnp.zeros(lead + (m,), dtype)

    u = _feedforward(x, d, xz)
    A = jnp.asarray(_companion(np.asarray(n, np.float64),
                               np.dtype(dtype).type))

    if mode == "scan":
        # same subtraction order as the reference's filter_opt
        # (iir_filter.cpp:26-44) so f64 runs are bit-identical
        def step(s, ut):
            y = ut
            for i in range(1, p):
                y = y - np.float64(n[i]).astype(np.dtype(dtype)) * s[..., i - 1]
            s_new = jnp.concatenate([y[..., None], s[..., :-1]], axis=-1)
            return s_new, y
        s0 = yz
        xT = jnp.moveaxis(u, -1, 0)
        _, yT = jax.lax.scan(step, s0, xT)
        y = jnp.moveaxis(yT, 0, -1)
    else:
        # affine elements (A, b_t), b_t = e0 · u[t]
        b = jnp.zeros(lead + (T, m), dtype).at[..., 0].set(u)
        mats = jnp.broadcast_to(A, lead + (T, m, m))

        def combine(l, r):
            M1, v1 = l
            M2, v2 = r
            return (jnp.einsum("...ij,...jk->...ik", M2, M1),
                    jnp.einsum("...ij,...j->...i", M2, v1) + v2)

        Ms, vs = jax.lax.associative_scan(combine, (mats, b),
                                          axis=len(lead))
        s = jnp.einsum("...tij,...j->...ti", Ms, yz) + vs
        y = s[..., 0]

    # state out: most recent p-1 x's and y's, newest first
    xz_out = jnp.flip(jnp.concatenate([xz, x], axis=-1)[..., -m:], axis=-1) \
        if m else xz
    y_hist = jnp.concatenate([jnp.flip(yz, axis=-1), y], axis=-1)
    yz_out = jnp.flip(y_hist[..., -m:], axis=-1) if m else yz
    return y, (xz_out, yz_out)


@jax.jit
def fir_apply(x, kernel, window=None):
    """FIR with the reference's warmup semantics
    (fir_filter.cpp:41-60): output t is the kernel dot over the last
    ksize inputs, and 0 for the first ksize outputs when no prior
    window is given (the reference consumes one extra sample filling
    its window before producing the first dot product).

    x: (..., T); window: (..., ksize) prior samples (oldest first) or
    None. Returns (y, window_out).
    """
    k = jnp.asarray(kernel, x.dtype if jnp.issubdtype(x.dtype, jnp.floating)
                    else jnp.float32)
    ks = k.shape[0]
    dtype = k.dtype
    x = x.astype(dtype)
    T = x.shape[-1]
    lead = x.shape[:-1]
    fresh = window is None
    if fresh:
        window = jnp.zeros(lead + (ks,), dtype)
    xp = jnp.concatenate([window, x], axis=-1)
    y = jnp.zeros(lead + (T,), dtype)
    for i in range(ks):
        # window[i] at output t = xp[t + i + 1] (newest = xp[t + ks])
        y = y + k[i] * jax.lax.dynamic_slice_in_dim(xp, i + 1, T, axis=-1)
    if fresh:
        idx = jnp.arange(T)
        y = jnp.where(idx < ks, 0.0, y)
    return y, xp[..., -ks:]


def iir_warmup_state(x0, n, d, iters: int):
    """State after the reference's 4·sr constant-input warmup
    (iir_filter.cpp:109-113), computed in O(log iters) matrix squarings
    instead of a serial loop: s_K = A^K s₀ + (Σ_{j<K} A^j) b.
    (The first p-1 warmup steps differ microscopically from the serial
    loop — the x-history there is still filling — which is irrelevant
    after thousands of iterations of an anti-ripple approximation.)

    x0: (...,) constant sample. Returns (xz, yz) for iir_apply.
    """
    return _iir_warmup_state(x0, tuple(float(v) for v in n),
                             tuple(float(v) for v in d), int(iters))


@functools.partial(jax.jit, static_argnames=("n", "d", "iters"))
def _iir_warmup_state(x0, n, d, iters):
    m = len(n) - 1
    dtype = jnp.result_type(x0, jnp.float32)
    A = jnp.asarray(_companion(np.asarray(n, np.float64),
                               np.dtype(dtype).type))
    u = x0 * np.float64(np.sum(d))  # constant-x feedforward
    b = jnp.zeros(x0.shape + (m,), dtype).at[..., 0].set(u)

    # affine power: (A, b)^iters via binary exponentiation
    M = jnp.broadcast_to(A, x0.shape + (m, m))
    acc_M = jnp.broadcast_to(jnp.eye(m, dtype=dtype), x0.shape + (m, m))
    acc_v = jnp.zeros_like(b)
    k = iters
    cur_M, cur_v = M, b
    while k > 0:
        if k & 1:
            acc_v = jnp.einsum("...ij,...j->...i", cur_M, acc_v) + cur_v
            acc_M = jnp.einsum("...ij,...jk->...ik", cur_M, acc_M)
        cur_v = jnp.einsum("...ij,...j->...i", cur_M, cur_v) + cur_v
        cur_M = jnp.einsum("...ij,...jk->...ik", cur_M, cur_M)
        k >>= 1
    yz = acc_v  # starting from zero state
    xz = jnp.broadcast_to(x0[..., None], x0.shape + (m,)).astype(dtype)
    return xz, yz
