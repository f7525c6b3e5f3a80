"""Pallas TPU kernels for the transform hot path.

The FWHT is the one transform whose XLA formulation (log2 n reshape
butterflies, ops/jax_ops.fwht) materializes every stage in HBM — n log n
int32 traffic. This kernel keeps a whole channel resident in VMEM and
runs all butterfly stages in-place on the VPU: HBM traffic drops to one
read + one write per element.

Reference semantics: lib_rspt/lib_fwht/fwht.c:4-28 — int32 wraparound
butterflies, n = 2^k. Used by the Hadamard packer
(signal_packer_hadamard.cpp:66-72) where n ≤ 16384 in the reference
tests (64 KiB per channel — comfortably inside the ~16 MB VMEM).

On non-TPU backends the kernel runs in interpreter mode (tests) or
falls back to the XLA formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False


def _fwht_kernel(x_ref, o_ref):
    """All log2(n) butterfly stages on one (rows, n) VMEM block.

    Formulated with cyclic rolls + index-bit masks (Mosaic does not
    lower the reshape-based butterfly): the stage-i partner of index j
    is j XOR i, so out = where(bit_i clear, x + roll(x,-i),
    roll(x,+i) - x) — two rolls and a select per stage, pure VPU.
    """
    x = x_ref[...]
    n = x.shape[-1]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=1)
    i = n >> 1
    while i > 0:
        # cyclic rolls with non-negative shifts (pltpu.roll requirement)
        fwd = pltpu.roll(x, n - i, 1)   # x[(j+i) mod n]
        bwd = pltpu.roll(x, i, 1)       # x[(j-i) mod n]
        first = (idx & i) == 0
        x = jnp.where(first, x + fwd, bwd - x)
        i >>= 1
    o_ref[...] = x


@functools.partial(jax.jit, static_argnames=("interpret",))
def fwht_pallas(x, interpret: bool = False):
    """Walsh-Hadamard transform along the last axis via a VMEM-resident
    Pallas kernel. x: (..., n) int32, n = 2^k. Grid over leading rows.
    """
    if not _HAVE_PALLAS:
        from . import jax_ops
        return jax_ops.fwht(x)
    shape = x.shape
    n = shape[-1]
    assert n & (n - 1) == 0, "FWHT length must be 2^k"
    x2 = x.reshape(-1, n).astype(jnp.int32)
    rows = x2.shape[0]
    R = 8  # TPU sublane tiling: block rows must be a multiple of 8
    rows_p = -(-rows // R) * R
    if rows_p != rows:
        x2 = jnp.concatenate(
            [x2, jnp.zeros((rows_p - rows, n), jnp.int32)])
    out = pl.pallas_call(
        _fwht_kernel,
        out_shape=jax.ShapeDtypeStruct((rows_p, n), jnp.int32),
        grid=(rows_p // R,),
        in_specs=[pl.BlockSpec((R, n), lambda r: (r, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((R, n), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2)
    return out[:rows].reshape(shape)


K_PACK = 64    # tokens per pack chunk
W_PACK = 128   # window lanes: span of 64 tokens ≤ ceil(64*37/32)+2 = 76


def _pack_kernel(local_ref, c0_ref, c1_ref, c2_ref, bases_ref, flags_ref,
                 out_ref, dense_ref):
    """Bit-pack one block's token stream.

    Every bit position has exactly one writer, so packing is addition
    of word-aligned contributions. Phase A builds per-chunk dense
    128-word windows for ALL chunks at once (compare-accumulate over
    the K=64 token slots — the lane axis is the window, the sublane
    axis is the chunk batch). Phase B places windows into the output
    word array sequentially (windows of adjacent chunks share a
    boundary word): rotate by base&127 (dynamic pltpu.roll) and
    read-add-write two 128-word rows.

    local: (nchunks, K) word index of each token within its chunk's
    window; c0/c1/c2: contributions to words local, local+1, local+2;
    bases (nchunks, 1) window base word; flags (1,1): any token needs
    a third word (rare: >33-bit fields). out: (nrows, 128) words.
    """
    nchunks = local_ref.shape[1]
    # build in sub-batches of chunk rows so the accumulator stays in
    # vector registers (a full (nchunks, 128) live value spills)
    SUB = 128 if nchunks % 128 == 0 else 8
    lanes = jax.lax.broadcasted_iota(jnp.int32, (SUB, W_PACK), 1)
    has_c2 = flags_ref[0, 0, 0] != 0

    def subbuild(sub, _):
        rows = pl.ds(sub * SUB, SUB)
        lo = local_ref[0, rows, :]
        a0 = c0_ref[0, rows, :]
        a1 = c1_ref[0, rows, :]
        dense = jnp.zeros((SUB, W_PACK), jnp.int32)
        # static-unrolled token loop: dynamic indexing along the lane
        # axis is not lowerable, static width-1 lane slices are
        for j in range(K_PACK):
            lj = lo[:, j:j + 1]
            dense = dense + jnp.where(lanes == lj, a0[:, j:j + 1], 0)
            dense = dense + jnp.where(lanes == lj + 1, a1[:, j:j + 1], 0)

        def add_c2(d):
            a2 = c2_ref[0, rows, :]
            for j in range(K_PACK):
                lj = lo[:, j:j + 1]
                d = d + jnp.where(lanes == lj + 2, a2[:, j:j + 1], 0)
            return d

        dense = jax.lax.cond(has_c2, add_c2, lambda d: d, dense)
        dense_ref[rows, :] = dense
        return 0

    jax.lax.fori_loop(0, nchunks // SUB, subbuild, 0)
    nrows = out_ref.shape[1]
    out_ref[...] = jnp.zeros((1, nrows, 128), jnp.int32)

    def place(c, _):
        b = bases_ref[0, pl.ds(c, 1), 0:1][0, 0]
        row = jnp.minimum(b >> 7, nrows - 2)
        r = b & 127
        win = dense_ref[pl.ds(c, 1), :]
        rot = pltpu.roll(win, r, 1)
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, W_PACK), 1)
        lo = jnp.where(lane1 >= r, rot, 0)
        hi = jnp.where(lane1 < r, rot, 0)
        out_ref[0, pl.ds(row, 1), :] += lo
        out_ref[0, pl.ds(row + 1, 1), :] += hi
        return 0

    jax.lax.fori_loop(0, nchunks, place, 0)


@functools.partial(jax.jit, static_argnames=("nrows", "interpret"))
def pack_bits_pallas(local, c0, c1, c2, bases, flags, nrows: int,
                     interpret: bool = False):
    """Per-block bit packing: (nb, nchunks, K) token contributions →
    (nb, nrows, 128) int32 words. Grid over blocks."""
    nb, nchunks, _ = local.shape
    out = pl.pallas_call(
        _pack_kernel,
        out_shape=jax.ShapeDtypeStruct((nb, nrows, 128), jnp.int32),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, nchunks, K_PACK), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nchunks, K_PACK), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nchunks, K_PACK), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nchunks, K_PACK), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nchunks, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, nrows, 128), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((nchunks, W_PACK), jnp.int32)],
        interpret=interpret,
    )(local, c0, c1, c2, bases, flags)
    return out


def _xdelta_fused_kernel(x_ref, prev_ref, o_ref):
    """delta → offset(−128) → xor on a (R, T) tile block, with the
    carried previous element per tile (the cross-tile scan state).

    For one tile holding values v[0..T): the xdelta chain needs
    d[i] = v[i] − v[i−1] − 128 then x[i] = d[i] ^ d[i−1]; both
    recurrences only look back one element, so a tile plus two carried
    scalars (prev value, prev delta) is enough — no associative scan.
    """
    v = x_ref[...]
    pv = prev_ref[:, 0:1]
    pd = prev_ref[:, 1:2]
    idx = jax.lax.broadcasted_iota(jnp.int32, v.shape, dimension=1)
    first = idx == 0
    shifted = jnp.where(first, pv, pltpu.roll(v, 1, 1))
    d = v - shifted - 128
    dshift = jnp.where(first, pd, pltpu.roll(d, 1, 1))
    o_ref[...] = d ^ dshift


@functools.partial(jax.jit, static_argnames=("interpret",))
def xdelta_preprocess_pallas(flat_i32, interpret: bool = False):
    """Fused delta→offset→xor over a flat int32 signal
    (utils.cpp:193-236 chain), tiled with scalar carries.

    One HBM read + one write instead of three scan materializations.
    """
    if not _HAVE_PALLAS:
        from . import jax_ops
        return jax_ops.xor_encode(jax_ops.offset32(
            jax_ops.delta_encode(flat_i32), -128))
    n = flat_i32.shape[0]
    T = 8192
    R = 8  # tiles per grid step (TPU sublane multiple)
    nt = -(-n // T)
    nt_p = -(-nt // R) * R
    padded = jnp.zeros(nt_p * T, jnp.int32).at[:n].set(
        flat_i32.astype(jnp.int32)).reshape(nt_p, T)
    # carries per tile: pv = v[start-1], pd = d[start-1] (tile 0 → 0s)
    flat = padded.reshape(-1)
    idx_last = jnp.arange(nt_p) * T - 1
    idx_last2 = jnp.arange(nt_p) * T - 2
    pv = jnp.where(idx_last >= 0, flat[jnp.clip(idx_last, 0, None)], 0)
    pv2 = jnp.where(idx_last2 >= 0, flat[jnp.clip(idx_last2, 0, None)], 0)
    pd = jnp.where(idx_last >= 0, pv - pv2 - 128, 0)
    carries = jnp.stack([pv, pd], axis=1)  # (nt_p, 2)

    out = pl.pallas_call(
        _xdelta_fused_kernel,
        out_shape=jax.ShapeDtypeStruct((nt_p, T), jnp.int32),
        grid=(nt_p // R,),
        in_specs=[pl.BlockSpec((R, T), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((R, 2), lambda t: (t, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((R, T), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(padded, carries)
    return out.reshape(-1)[:n]