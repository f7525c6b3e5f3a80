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


K_PACK = 96    # tokens per pack chunk
W_PACK = 128   # window lanes: span of 96 tokens ≤ ceil(96*37/32)+2 = 113


def _place_windows_kernel(dense_ref, bases_ref, live_ref, out_ref):
    """Sequential placement of per-chunk dense word windows into one
    block's output word array. Windows of adjacent chunks share only
    boundary words, so an in-order read-add-write is exact: rotate the
    128-word window by base&127 (dynamic pltpu.roll) and add it into
    two consecutive 128-word output rows. Dead chunks (no live fields
    — sparse data) skip the whole body."""
    nchunks = dense_ref.shape[1]
    nrows = out_ref.shape[1]
    out_ref[...] = jnp.zeros((1, nrows, 128), jnp.int32)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, W_PACK), 1)

    def place(c, _):
        lv = live_ref[0, pl.ds(c, 1), 0:1][0, 0]

        @pl.when(lv != 0)
        def _():
            b = bases_ref[0, pl.ds(c, 1), 0:1][0, 0]
            row = jnp.minimum(b >> 7, nrows - 2)
            r = b & 127
            win = dense_ref[0, pl.ds(c, 1), :]
            rot = pltpu.roll(win, r, 1)
            out_ref[0, pl.ds(row, 1), :] += jnp.where(lane1 >= r, rot, 0)
            out_ref[0, pl.ds(row + 1, 1), :] += jnp.where(lane1 < r,
                                                          rot, 0)

        return 0

    jax.lax.fori_loop(0, nchunks, place, 0)


def _build_windows(local, c0, c1, c2, flags):
    """Compare-accumulate dense window build, in plain XLA (the VPU is
    the limit either way). Formulated as three minor-axis reductions:
    dense[b,c,w] = sum_j [local[b,c,j]+d == w] * cd[b,c,j] with the
    token axis MINOR so the XLA TPU reduce stays a fused lane
    reduction (a 64-step unrolled loop variant compiled pathologically
    slowly). local/c0/c1/c2: (nb, nchunks, K)."""
    lanes = jnp.arange(W_PACK, dtype=jnp.int32)[None, None, :, None]
    loc = local[:, :, None, :]  # (nb, nchunks, 1, K)

    def term(vals, delta):
        return jnp.sum(
            jnp.where(loc + delta == lanes, vals[:, :, None, :], 0),
            axis=3, dtype=jnp.int32)

    dense = term(c0, 0) + term(c1, 1)
    return jax.lax.cond(jnp.any(flags != 0),
                        lambda d: d + term(c2, 2), lambda d: d, dense)


@functools.partial(jax.jit, static_argnames=("nrows", "interpret"))
def pack_bits_pallas(local, c0, c1, c2, bases, flags, nrows: int,
                     interpret: bool = False, live=None):
    """Per-block bit packing: (nb, nchunks, K) token contributions →
    (nb, nrows, 128) int32 words. XLA window build + Pallas sequential
    placement, grid over blocks. ``live``: optional (nb, nchunks, 1)
    per-chunk liveness (dead chunks skipped in placement)."""
    nb, nchunks, _ = local.shape
    dense = _build_windows(local, c0, c1, c2, flags)
    dense = jax.lax.optimization_barrier(dense)
    if live is None:
        live = jnp.ones((nb, nchunks, 1), jnp.int32)
    out = pl.pallas_call(
        _place_windows_kernel,
        out_shape=jax.ShapeDtypeStruct((nb, nrows, 128), jnp.int32),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, nchunks, W_PACK), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nchunks, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nchunks, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nrows, 128), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(dense, bases, live)
    return out


def _token_values_kernel(syms_ref, extras_ref, ebits_ref, tvalid_ref,
                         lut_ref, nbits_ref, lo_ref, hi_ref, excl_ref):
    """Per-token Huffman code lookup + field build + LOCAL bit-offset
    prefix for one (8, 128) slot group.

    Replaces the XLA 261-lane masked reduction (the VPU-bound stage of
    pack_blocks) with three 128-lane `take_along_axis` gathers — the
    same primitive the Pallas decoder's LUTs ride — and folds the
    giant (nb, 65536) doubling prefix down to an in-register (8, 128)
    prefix plus a tiny per-group XLA scan.
    """
    u32 = jnp.uint32
    sym = syms_ref[0, 0]
    extra = extras_ref[0, 0]
    ebit = ebits_ref[0, 0]
    tval = tvalid_ref[0, 0]
    idx = sym & 127
    g0 = jnp.take_along_axis(lut_ref[0, 0], idx, axis=1)
    g1 = jnp.take_along_axis(lut_ref[0, 1], idx, axis=1)
    g2 = jnp.take_along_axis(lut_ref[0, 2], idx, axis=1)
    e = jnp.where(sym < 128, g0, jnp.where(sym < 256, g1, g2))
    code = pltpu.bitcast(e, u32) & u32(0xFFFFFF)
    cb = jnp.right_shift(e, 24)              # 0..24
    live = tval != 0
    nbits = jnp.where(live, cb + ebit, 0)
    exu = pltpu.bitcast(extra, u32)
    cbu = pltpu.bitcast(cb, u32)
    lo = code | (exu << cbu)
    # extra <= 14 bits: for cb <= 18 the high spill is naturally 0;
    # clamp the shift at 31 only to keep cb=0 (dead/FILL slots) defined
    # (i32 min — Mosaic has no unsigned min lowering)
    hi = exu >> pltpu.bitcast(jnp.minimum(32 - cb, 31), u32)
    lo = jnp.where(live, lo, u32(0))
    hi = jnp.where(live, hi, u32(0))

    # inclusive prefix of nbits over the group in (row, lane) order
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    v = nbits
    p = 1
    while p < 128:
        v = v + jnp.where(lane >= p, pltpu.roll(v, p, 1), 0)
        p *= 2
    tot = jnp.broadcast_to(v[:, 127:128], (8, 128))
    c = jnp.where(row >= 1, pltpu.roll(tot, 1, 0), 0)
    q = 1
    while q < 8:
        c = c + jnp.where(row >= q + 1, pltpu.roll(c, q, 0), 0)
        q *= 2
    excl = v + c - nbits

    nbits_ref[0, 0] = nbits
    lo_ref[0, 0] = pltpu.bitcast(lo, jnp.int32)
    hi_ref[0, 0] = pltpu.bitcast(hi, jnp.int32)
    excl_ref[0, 0] = excl


@functools.partial(jax.jit, static_argnames=("interpret",))
def token_values_pallas(syms, extras, ebits, tvalid, comb,
                        interpret: bool = False):
    """Token field values + group-local bit offsets.

    syms/extras/ebits/tvalid: (nb, ntok); comb: (nb, nsym<=384) int32
    packed (code | cbits<<24) per-block LUT. Returns PADDED
    (nb, ntok_p) arrays nbits/lo/hi/excl (lo/hi uint32) plus the
    (nb, ngroups) per-group bit totals; ntok_p = ngroups*1024.
    """
    nb, ntok = syms.shape
    ng = -(-ntok // 1024)
    ntok_p = ng * 1024

    def pad4(a):
        a = jnp.pad(a.astype(jnp.int32), ((0, 0), (0, ntok_p - ntok)))
        return a.reshape(nb, ng, 8, 128)

    lut = jnp.zeros((nb, 3 * 128), jnp.int32)
    lut = lut.at[:, :comb.shape[1]].set(comb.astype(jnp.int32))
    lut4 = jnp.broadcast_to(lut.reshape(nb, 3, 1, 128), (nb, 3, 8, 128))

    spec = pl.BlockSpec((1, 1, 8, 128), lambda b, g: (b, g, 0, 0),
                        memory_space=pltpu.VMEM)
    nbits, lo, hi, excl = pl.pallas_call(
        _token_values_kernel,
        out_shape=tuple(jax.ShapeDtypeStruct((nb, ng, 8, 128), jnp.int32)
                        for _ in range(4)),
        grid=(nb, ng),
        in_specs=[spec, spec, spec, spec,
                  pl.BlockSpec((1, 3, 8, 128), lambda b, g: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(spec, spec, spec, spec),
        interpret=interpret,
    )(pad4(syms), pad4(extras), pad4(ebits), pad4(tvalid), lut4)
    tot = excl[:, :, 7, 127] + nbits[:, :, 7, 127]
    flat = lambda a: a.reshape(nb, ntok_p)  # noqa: E731
    u32 = functools.partial(jax.lax.bitcast_convert_type,
                            new_dtype=jnp.uint32)
    return (flat(nbits), u32(flat(lo)), u32(flat(hi)), flat(excl), tot)


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