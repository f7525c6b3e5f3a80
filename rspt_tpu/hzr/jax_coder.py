"""TPU two-pass hzr encoder — JAX/XLA device kernels + tiny host step.

Produces byte streams identical to the C++ reference
(lib_rspt/lib_hzr/hzr_encode.c) and to the Python spec
(rspt_tpu/hzr/pyref.py), but with the bit-serial control flow re-designed
as array-parallel passes (the BASELINE "two-pass histogram+prefix-sum
parallel entropy coder"):

  pass 1 (device, jit):  per 64 KiB block — vectorized zero-run
      tokenization via max/min scans (no sorting), 261-bin histograms.
  host (tiny):           greedy Huffman tree per block with the
      reference's exact tie-breaking (hzr_encode.c:222-283) over the
      ≤261-entry histogram; preorder tree-description fields; FILL /
      COPY fallback decisions (hzr_encode.c:285-305, 399-407, 462-469).
  pass 2 (device):       the FLAT EXACT-OFFSET pack — the host derives
      every block's exact payload size from its histogram
      (host_layout), the device compacts valid tokens to a dense
      group-aligned stream (compact_tokens_pallas), builds per-group
      bit windows (token_group_windows, MXU byte-quarter prefix dots)
      and places them once into the final stream layout
      (super_place_flat); the d2h is the finished payload bytes.
      Batches with COPY-fallback blocks take the per-block path
      (pack_blocks + compact_payloads); CPU/GPU use plain scatter-add.
  host assembly:         7-byte block headers + CRC32C + concatenation.

Blocks are the data-parallel axis: all blocks of all byte-planes are
batched into one (nblocks, 65536) device call, and rspt_tpu/parallel
shards that axis over a device mesh.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..formats.crc32c import crc32c as _py_crc32c
from ..formats.hzr_constants import (
    BLOCK_HEADER_SIZE,
    ENCODING_COPY,
    ENCODING_FILL,
    ENCODING_HUFF_RLE,
    HEADER_SIZE,
    MAX_BLOCK_SIZE,
    MAX_ZERO_RUN,
    NUM_SYMBOLS,
    SYMBOL_SIZE,
)
from . import pyref

try:  # native CRC (SSE/table C) is ~20x the numpy LUT walk
    from ..native import bindings as _native
    _crc32c = _native.crc32c
except Exception:  # pragma: no cover
    _crc32c = _py_crc32c

B = MAX_BLOCK_SIZE  # 65536
MAX_DESC_BITS = (2 * NUM_SYMBOLS - 1) + SYMBOL_SIZE * NUM_SYMBOLS
MAX_OUT = B + 512  # packed payload width (cap before COPY fallback + slack)


# ---------------------------------------------------------------------------
# Pass 1 — tokenize + histogram (device)
# ---------------------------------------------------------------------------

def _running_scan(a, op, fill, reverse: bool):
    """Inclusive running op (max/min) along axis 1 by explicit doubling
    (associative_scan's TPU lowering measured 13x slower). Two-level
    when the width allows: 128-lane-local scans plus a tiny cross-row
    carry — 7+1 full-array passes instead of log2(n)."""
    nb, n = a.shape

    def leaf(x, width, pad_lo):
        p = 1
        while p < width:
            pad = ((0, 0),) * (x.ndim - 1) + (((p, 0),) if pad_lo
                                              else ((0, p),))
            sl = (Ellipsis, slice(None, width)) if pad_lo \
                else (Ellipsis, slice(p, None))
            x = op(x, jnp.pad(x, pad, constant_values=fill)[sl])
            p *= 2
        return x

    pad_lo = not reverse
    if n % 128 or n <= 128:
        return leaf(a, n, pad_lo)
    nr = n // 128
    m = leaf(a.reshape(nb, nr, 128), 128, pad_lo)
    rowv = m[..., -1] if pad_lo else m[..., 0]
    # exclusive cross-row carry (tiny: nr elements per block)
    shift = ((0, 0), (1, 0)) if pad_lo else ((0, 0), (0, 1))
    c = jnp.pad(rowv, shift, constant_values=fill)
    c = c[:, :nr] if pad_lo else c[:, 1:]
    c = leaf(c, nr, pad_lo)
    return op(m, c[..., None]).reshape(nb, n)


@jax.jit
def tokenize_blocks(blocks: jnp.ndarray, lengths: jnp.ndarray):
    """Vectorized RLE tokenization of padded blocks.

    blocks: (nb, B) uint8 (padding arbitrary), lengths: (nb,) int32.
    Returns per-position token fields (a position holds at most one
    token) and per-block histograms:
      syms (nb, B) i32, extras (nb, B) i32, ebits (nb, B) i32,
      tvalid (nb, B) bool, hist (nb, 261) i32.

    Mirrors the run rules of hzr_encode.c:133-173 / :415-447: greedy
    zero runs capped at MAX_ZERO_RUN, never crossing block ends.
    """
    nb, n = blocks.shape
    idx = jnp.arange(n, dtype=jnp.int32)[None, :]
    inblk = idx < lengths[:, None]
    x = blocks.astype(jnp.int32)
    iszero = (x == 0) & inblk

    # scans as explicit doubling (pad+slice shifts): measured 13x
    # faster than lax.associative_scan's TPU lowering on these shapes.
    # Two-level (128-lane-local + tiny cross-row carry) halves the
    # full-array passes: 7+1 instead of 16 on 64 KiB blocks.
    # last non-zero (or out-of-block) index strictly before i
    lnb = _running_scan(jnp.where(iszero, jnp.int32(-1), idx),
                        jnp.maximum, -1, reverse=False)
    lnb_excl = jnp.concatenate(
        [jnp.full((nb, 1), -1, jnp.int32), lnb[:, :-1]], axis=1)
    run_start = lnb_excl + 1

    # first non-zero (or out-of-block) index at/after i
    fna = _running_scan(jnp.where(iszero, jnp.int32(n), idx),
                        jnp.minimum, n, reverse=True)
    # for a zero at i, the run it belongs to ends just before the first
    # non-zero at/after i — clamp to the block end
    run_end = jnp.minimum(fna, lengths[:, None]) - 1

    # optimization_barrier: without it the XLA TPU fusion pass
    # duplicates the scan subgraphs into every downstream consumer and
    # compile time explodes (measured 108s → 3s with barriers)
    run_start, run_end, iszero, inblk, x = jax.lax.optimization_barrier(
        (run_start, run_end, iszero, inblk, x))

    off_in_run = idx - run_start
    is_chunk_start = iszero & (off_in_run % MAX_ZERO_RUN == 0)
    chunk_len = jnp.minimum(run_end - idx + 1, MAX_ZERO_RUN)

    L = chunk_len
    run_sym = jnp.select(
        [L == 1, L == 2, L <= 6, L <= 22, L <= 278],
        [jnp.int32(0), jnp.int32(256), jnp.int32(257), jnp.int32(258),
         jnp.int32(259)], jnp.int32(260))
    run_extra = jnp.select(
        [L <= 2, L <= 6, L <= 22, L <= 278],
        [jnp.int32(0), L - 3, L - 7, L - 23], L - 279)
    run_ebits = jnp.select(
        [L <= 2, L <= 6, L <= 22, L <= 278],
        [jnp.int32(0), jnp.int32(2), jnp.int32(4), jnp.int32(8)],
        jnp.int32(14))

    is_lit = (~iszero) & inblk
    tvalid = is_lit | is_chunk_start
    syms = jnp.where(is_lit, x, jnp.where(is_chunk_start, run_sym, 0))
    extras = jnp.where(is_chunk_start, run_extra, 0)
    ebits = jnp.where(is_chunk_start, run_ebits, 0)

    syms, extras, ebits, tvalid, is_lit, is_chunk_start, run_sym = \
        jax.lax.optimization_barrier(
            (syms, extras, ebits, tvalid, is_lit, is_chunk_start, run_sym))

    if jax.default_backend() == "tpu":
        # Histogram without scatter (TPU scatters serialize). Literals
        # via nibble decomposition onto the MXU: hist[v] = Σ_s
        # onehot_hi[s, v>>4]·onehot_lo[s, v&15] — 32 compares per slot
        # (vs 256 for the flat compare-reduce) and the (16, S)x(S, 16)
        # contraction rides the MXU; counts ≤ 65536 are exact in f32.
        # The 5 RLE symbols via masked popcounts.
        lit_syms = jnp.where(is_lit, x, jnp.int32(-1))
        io16 = jnp.arange(16, dtype=jnp.int32)
        # dead slots carry -1: arithmetic >>4 keeps them -1, matching
        # no hi-nibble lane, so their lo-nibble (15) contributes 0
        oh = (lit_syms[:, :, None] >> 4 == io16).astype(jnp.float32)
        ol = ((lit_syms[:, :, None] & 15) == io16).astype(jnp.float32)
        hist16 = jnp.einsum("bsh,bsl->bhl", oh, ol,
                            preferred_element_type=jnp.float32)
        hist_lit = hist16.reshape(nb, 256).astype(jnp.int32)
        run_hist = [
            jnp.sum(is_chunk_start & (run_sym == s), axis=1,
                    dtype=jnp.int32)
            for s in (256, 257, 258, 259, 260)]
        # symbol 0 tokens (single zeros) live in run_sym == 0
        hist0 = jnp.sum(is_chunk_start & (run_sym == 0), axis=1,
                        dtype=jnp.int32)
        hist_lit = hist_lit.at[:, 0].set(hist0)
        hist = jnp.concatenate([hist_lit, jnp.stack(run_hist, axis=1)],
                               axis=1)
    else:
        # CPU/GPU: scatter-add histogram (fast there; the compare-
        # reduce does 256x the work)
        hist = jax.vmap(
            lambda s, v: jnp.zeros(NUM_SYMBOLS, jnp.int32).at[s].add(
                v.astype(jnp.int32)))(syms, tvalid)
    return syms, extras, ebits, tvalid, hist


# ---------------------------------------------------------------------------
# Host — Huffman tables per block (reference tie-breaking via pyref)
# ---------------------------------------------------------------------------

def build_block_tables(hist: np.ndarray):
    """One block's Huffman tables from its 261-bin histogram.

    Returns (codes u32[261], code_bits i32[261], desc_bytes, desc_bits)
    — the tree description pre-packed to bytes on the host (≤ ~98 B; the
    device packs only token fields, starting at bit offset desc_bits,
    and the description is OR-merged over the first bytes afterwards) —
    or None when the block is a single-code-class FILL
    (hzr_encode.c:285-305).
    """
    if pyref._only_single_code(hist):
        return None
    root, single = pyref.build_tree(hist)
    desc_vals, desc_nbits, codes, code_bits = pyref.serialize_tree(
        root, single)
    desc_bits = int(desc_nbits.sum())
    desc_bytes = np.frombuffer(pyref.pack_bits(desc_vals, desc_nbits),
                               np.uint8)
    return codes, code_bits, desc_bytes, desc_bits


# ---------------------------------------------------------------------------
# Pass 2 — code lookup + gather-based bit packing (device)
# ---------------------------------------------------------------------------

_LO_BITS = 18  # token field split: low 18 bits / high ≤21 bits

# pack backend: "pallas" (TPU default), "xla" (CPU/GPU default and the
# TPU fallback), "interp" (Pallas interpreter — tests off-TPU)
import os as _os
_PACK_MODE = _os.environ.get("RSPT_PACK_PALLAS", "")


def _pack_tokens_pallas_v2(syms, extras, ebits, tvalid, codes,
                           code_bits, desc_bits, n, nb, max_out,
                           interpret, tokw=None):
    """Token-level Pallas bit packing, single pass over the tokens.

    Stage 1 (ops/pallas_kernels.token_group_windows_pallas): per
    8192-token group — Huffman LUT lookup, GROUP-LOCAL bit prefix, and
    2-row dense word windows per 128-token chunk, all in registers.
    Stage 2 (super_place_pallas): 32-chunk super-windows merged via
    one-hot MXU matmuls, bit-shifted by the group's global misalignment
    (so stage 1 never needed the cross-group scan), and placed with one
    RMW per super. The only XLA between them is an 8-element-per-block
    doubling scan of the group bit totals plus (nb, nchunks) index
    arithmetic — no full-size HBM intermediate exists anywhere.
    """
    from ..ops.pallas_kernels import (ACC_ROWS, D_CLAMP, SUP_CHUNKS,
                                      super_place_pallas,
                                      token_group_windows_pallas,
                                      token_group_windows_tokw_pallas)

    comb = (jax.lax.bitcast_convert_type(codes, jnp.int32)
            & jnp.int32(0xFFFFFF)) | (code_bits.astype(jnp.int32) << 24)
    if tokw is not None:
        w0, w1, cbase, clive, gtot = token_group_windows_tokw_pallas(
            tokw, comb, interpret=interpret)
    else:
        w0, w1, cbase, clive, gtot = token_group_windows_pallas(
            syms, extras, ebits, tvalid, comb, interpret=interpret)
    nc = cbase.shape[1]
    ng = gtot.shape[1]

    # exclusive scan of the group bit totals — doubling on (nb, ng<=16)
    gb = gtot
    p = 1
    while p < ng:
        gb = gb + jnp.pad(gb, ((0, 0), (p, 0)))[:, :ng]
        p *= 2
    group_base = desc_bits[:, None] + gb - gtot       # (nb, ng) bits
    total_bits = group_base[:, -1] + gtot[:, -1]

    nwords = max_out // 4 + 1
    nrows = -(-nwords // 128)
    nrows = -(-(nrows + ACC_ROWS) // 8) * 8

    nsup = nc // SUP_CHUNKS
    sup_per_g = nsup // ng
    superbase = cbase[:, ::SUP_CHUNKS]                # (nb, nsup) words
    d = jnp.clip(cbase - jnp.repeat(superbase, SUP_CHUNKS, axis=1),
                 0, D_CLAMP)
    gb_s = jnp.repeat(group_base, sup_per_g, axis=1)  # (nb, nsup) bits
    wbase = jnp.clip(jnp.right_shift(gb_s, 5) + superbase,
                     0, (nrows - ACC_ROWS) * 128)
    sbits = gb_s & 31
    slive = jnp.any(clive.reshape(nb, nsup, SUP_CHUNKS) > 0, axis=2)

    words3 = super_place_pallas(
        w0, w1, d[:, :, None], d.reshape(nb, nsup, SUP_CHUNKS),
        wbase[:, :, None], sbits[:, :, None],
        slive[:, :, None].astype(jnp.int32), nrows, interpret=interpret)
    words = words3.reshape(nb, nrows * 128)[:, :nwords]
    packed = jax.lax.bitcast_convert_type(
        words, jnp.uint8).reshape(nb, nwords * 4)[:, :max_out]
    return packed, total_bits


def _resolve_pack_mode(platform=None):
    plat = platform or jax.default_backend()
    return _PACK_MODE or ("pallas" if plat == "tpu" else "xla"), plat


def _pack_blocks_impl(syms, extras, ebits, tvalid, codes, code_bits,
                      desc_bits, platform=None, mode=None):
    """Pack each block's token bitstream starting at bit offset
    ``desc_bits`` (the host-packed tree description is OR-merged in by
    the caller).

    Formulation: every bit position is written by exactly one field, so
    OR-packing equals ADD-packing — each field becomes at most two
    word-aligned uint32 contributions (value shifted into its 32-bit
    word plus the spill into the next word), accumulated with one
    scatter-add per block. No compaction, no searchsorted, no per-byte
    gather windows — scatter-add and elementwise shifts only, all fast
    on TPU (searchsorted's XLA lowering measured ~100x slower than the
    whole scatter formulation).

    codes/code_bits: (nb, 261); desc_bits: (nb,) int32.
    Returns packed (nb, n+512) uint8 and total_bits (nb,) int32
    (description + tokens).
    """
    nb, n = syms.shape

    # `platform` pins the target (e.g. a CPU mesh under shard_map while
    # the default backend is the TPU plugin); None = default backend.
    # `mode` must already be resolved when called through the jitted
    # `pack_blocks` (it is part of the jit cache key — resolving from
    # the _PACK_MODE global at trace time silently reuses whatever
    # executable was traced first for these shapes).
    if mode is None:
        mode, plat = _resolve_pack_mode(platform)
    else:
        plat = platform or jax.default_backend()
    if mode in ("pallas", "interp"):
        return _pack_tokens_pallas_v2(
            syms, extras, ebits, tvalid, codes, code_bits, desc_bits,
            n, nb, n + 512, interpret=(mode == "interp"))

    if plat == "tpu":
        # per-token code lookup WITHOUT gather (XLA TPU gathers
        # serialize — this one pair of take_along_axis calls measured
        # 28 ms of the old 34 ms pack): combine both LUTs into one
        # int32 word (code < 2^24 | cbits<<24, cbits <= 24) and do a
        # single 261-lane masked reduction per token on the VPU.
        comb = (codes.astype(jnp.uint32)
                | (code_bits.astype(jnp.uint32) << jnp.uint32(24)))
        sym_ids = jnp.arange(NUM_SYMBOLS, dtype=jnp.int32)[None, None, :]
        tok_comb = jnp.sum(
            jnp.where(syms[:, :, None] == sym_ids,
                      comb[:, None, :].astype(jnp.int32), 0),
            axis=2, dtype=jnp.int32).astype(jnp.uint32)
        tok_codes = tok_comb & jnp.uint32(0xFFFFFF)
        tok_cbits = (tok_comb >> jnp.uint32(24)).astype(jnp.int32)
    else:
        tok_codes = jnp.take_along_axis(codes, syms,
                                        axis=1).astype(jnp.uint32)
        tok_cbits = jnp.take_along_axis(code_bits, syms, axis=1)
    # combined value: code | extra << code_bits (≤ 23 + 14 = 37 bits),
    # carried as an 18/19-bit split in two uint32 lanes
    ex = extras.astype(jnp.uint32)
    cb = jnp.minimum(tok_cbits, 31).astype(jnp.uint32)
    val_lo32 = tok_codes | (ex << cb)
    val_hi32 = jnp.where(tok_cbits > 0, ex >> (jnp.uint32(32) - cb),
                         jnp.uint32(0))
    nbits = jnp.where(tvalid, tok_cbits + ebits, 0)

    lo_mask = jnp.uint32((1 << _LO_BITS) - 1)
    f1_val = val_lo32 & lo_mask
    f1_bits = jnp.minimum(nbits, _LO_BITS)
    f2_val = (val_lo32 >> jnp.uint32(_LO_BITS)) | (
        val_hi32 << jnp.uint32(32 - _LO_BITS))
    f2_bits = jnp.maximum(nbits - _LO_BITS, 0)

    # interleave (f1, f2) per token in stream order; invalid positions
    # have zero width and zero value — they contribute nothing
    vals = jnp.stack([f1_val, f2_val], axis=2).reshape(nb, 2 * n)
    bits = jnp.stack([f1_bits, f2_bits], axis=2).reshape(nb, 2 * n)

    vals, bits = jax.lax.optimization_barrier((vals, bits))
    ends = desc_bits[:, None] + jnp.cumsum(bits, axis=1)
    offs = ends - bits
    total_bits = ends[:, -1]
    offs, vals = jax.lax.optimization_barrier((offs, vals))

    # payloads beyond the block length fall back to COPY, so the packed
    # buffer only needs block-width + slack (keeps dryrun compiles on
    # tiny block widths fast); width in 32-bit words + 1 spill word
    max_out = n + 512
    nwords = max_out // 4 + 1

    word = jnp.right_shift(offs, 5)
    sh = (offs & 31).astype(jnp.uint32)
    live = bits > 0
    v = jnp.where(live, vals, jnp.uint32(0))
    lo = (v << sh).astype(jnp.int32)
    hi = jnp.where(sh > 0, v >> (jnp.uint32(32) - sh),
                   jnp.uint32(0)).astype(jnp.int32)
    # out-of-range contributions (incompressible data destined for the
    # COPY fallback) are zeroed and their index clamped
    inr = word < nwords - 1
    lo = jnp.where(inr, lo, 0)
    hi = jnp.where(inr, hi, 0)
    word = jnp.minimum(word, nwords - 2)

    if plat == "tpu":
        # Dense accumulation without scatter (XLA TPU scatter
        # serializes: measured 115 ms vs ~1 ms for this formulation).
        # Fields are offset-sorted, so chunks of K consecutive fields
        # span < W words: build each chunk's local dense window by
        # compare-accumulate, then place windows with a sequential
        # read-add-write dynamic-slice scan (correct under overlap).
        K = 256
        W = 256
        nf = word.shape[1]
        nchunks = max(1, -(-nf // K))
        if nchunks * K != nf:  # pad fields to a chunk multiple
            padw = nchunks * K - nf
            # pad entries carry zero values; their local index goes
            # negative and never matches the window iota
            word = jnp.pad(word, ((0, 0), (0, padw)), constant_values=0)
            lo = jnp.pad(lo, ((0, 0), (0, padw)))
            hi = jnp.pad(hi, ((0, 0), (0, padw)))
        wc = word.reshape(nb, nchunks, K)
        base = wc[:, :, 0]
        local = wc - base[:, :, None]
        loc2 = jnp.concatenate([local, local + 1], axis=2)
        val2 = jnp.concatenate([lo.reshape(nb, nchunks, K),
                                hi.reshape(nb, nchunks, K)], axis=2)
        iota = jnp.arange(W, dtype=jnp.int32)[None, None, None, :]
        dense = jnp.sum(
            jnp.where(loc2[..., None] == iota, val2[..., None], 0),
            axis=2, dtype=jnp.int32)

        def place(base_b, dense_b):
            def step(acc, inp):
                b, vec = inp
                seg = jax.lax.dynamic_slice(acc, (b,), (W,))
                return (jax.lax.dynamic_update_slice(acc, seg + vec, (b,)),
                        None)
            acc, _ = jax.lax.scan(step, jnp.zeros(nwords + W, jnp.int32),
                                  (base_b, dense_b))
            return acc[:nwords]

        words = jax.vmap(place)(base, dense)
    else:
        # CPU/GPU: plain scatter-add is fast there
        def accum(word_b, lo_b, hi_b):
            out = jnp.zeros(nwords, jnp.int32)
            out = out.at[word_b].add(lo_b, mode="drop")
            out = out.at[word_b + 1].add(hi_b, mode="drop")
            return out

        words = jax.vmap(accum)(word, lo, hi)
    # words → little-endian bytes (stream bit k = bit k%32 of word k//32,
    # LSB-first — the hzr bit order, hzr_encode.c:32-113). A bitcast to
    # uint8 yields exactly that layout for free (the shift/stack
    # formulation cost ~31 ms of relayout on chip).
    packed = jax.lax.bitcast_convert_type(
        words, jnp.uint8).reshape(nb, nwords * 4)[:, :max_out]
    return packed, total_bits


_pack_blocks_jit = jax.jit(_pack_blocks_impl,
                           static_argnames=("platform", "mode"))


def pack_blocks(syms, extras, ebits, tvalid, codes, code_bits, desc_bits,
                platform=None, mode=None):
    """Jitted pack dispatch. The backend mode is resolved HERE, outside
    jit, and passed as a static argument — so "pallas"/"xla"/"interp"
    each get their own executable. (Resolving inside the traced body
    made the mode invisible to the jit cache: whichever mode compiled
    first for a shape silently served every later mode, which let a
    broken kernel masquerade as byte-exact on chip.)"""
    if mode is None:
        mode, platform = _resolve_pack_mode(platform)
    return _pack_blocks_jit(syms, extras, ebits, tvalid, codes,
                            code_bits, desc_bits, platform=platform,
                            mode=mode)


# in-jit callers (shard_map bodies, fused profiling/bench loops) use
# pack_blocks.__wrapped__; keep that surface on the plain impl
pack_blocks.__wrapped__ = _pack_blocks_impl


def _unpack_tokw(tokw):
    """Packed token words → (syms, extras, ebits, tvalid) fields."""
    syms = tokw & 511
    ebits = jnp.right_shift(tokw, 9) & 15
    extras = jnp.right_shift(tokw, 13) & 16383
    tvalid = (jnp.right_shift(tokw, 27) & 1) != 0
    return syms, extras, ebits, tvalid


def _pack_blocks_tokw_impl(tokw, codes, code_bits, desc_bits,
                           platform=None, mode=None):
    """pack_blocks over the fused tokenizer's packed token words.

    Pallas modes read the words directly (one HBM stream); the XLA
    fallback unpacks the four field arrays first."""
    if mode is None:
        mode, platform = _resolve_pack_mode(platform)
    nb, n = tokw.shape
    if mode in ("pallas", "interp"):
        return _pack_tokens_pallas_v2(
            None, None, None, None, codes, code_bits, desc_bits,
            n, nb, n + 512, interpret=(mode == "interp"), tokw=tokw)
    syms, extras, ebits, tvalid = _unpack_tokw(tokw)
    return _pack_blocks_impl(syms, extras, ebits, tvalid, codes,
                             code_bits, desc_bits, platform=platform,
                             mode=mode)


_pack_blocks_tokw_jit = jax.jit(_pack_blocks_tokw_impl,
                                static_argnames=("platform", "mode"))


def pack_blocks_tokw(tokw, codes, code_bits, desc_bits, platform=None,
                     mode=None):
    if mode is None:
        mode, platform = _resolve_pack_mode(platform)
    return _pack_blocks_tokw_jit(tokw, codes, code_bits, desc_bits,
                                 platform=platform, mode=mode)


pack_blocks_tokw.__wrapped__ = _pack_blocks_tokw_impl


_EBITS_VEC = np.zeros(NUM_SYMBOLS, np.int64)
_EBITS_VEC[256:261] = (0, 2, 4, 8, 14)


def host_layout(hist_np, lengths_np, cbits, desc_bits, is_fill):
    """Exact per-block stream layout from the histograms alone.

    The token bit count is Σ_s hist[s]·(code_bits[s]+extra_bits[s]), so
    the host knows every block's exact payload size — and therefore the
    final byte layout of the whole stream — before the device packs a
    single bit. Returns (total_bits, comp_len, is_huff, any_copy) with
    the same HUFF/COPY split as compact_payloads.
    """
    tokbits = (hist_np.astype(np.int64)
               * (cbits.astype(np.int64) + _EBITS_VEC[None, :])).sum(1)
    total_bits = desc_bits.astype(np.int64) + tokbits
    plen = (total_bits + 7) >> 3
    live = np.asarray(lengths_np) > 0
    is_huff = ((~is_fill) & live & (plen <= lengths_np)
               & (plen < MAX_BLOCK_SIZE))
    any_copy = bool(((~is_fill) & live & (~is_huff)).any())
    comp_len = np.where(is_huff, plen, 0).astype(np.int64)
    return total_bits, comp_len, is_huff, any_copy


GROUP_TOK_FLAT = 8192  # must equal ops.pallas_kernels.GROUP_TOK


def flat_compact_layout(hist_np, is_huff):
    """Host-side token layout for the compacted flat pack: per-block
    token counts from the histograms, bases group-aligned so no
    windows group straddles a block. Non-HUFF blocks park in a trash
    span past the real region (their windows never place)."""
    ntok = hist_np.sum(axis=1).astype(np.int64)
    groups = np.where(is_huff, -(-ntok // GROUP_TOK_FLAT), 0)
    gpref = np.concatenate(([0], np.cumsum(groups)[:-1]))
    T = int(groups.sum()) * GROUP_TOK_FLAT
    bases = np.where(is_huff, gpref * GROUP_TOK_FLAT, T).astype(np.int32)
    ng = int(groups.sum())
    g2b = np.repeat(np.arange(len(groups)), groups)
    gfirst = np.repeat(gpref, groups).astype(np.int32)
    return bases, T, ng, g2b, gfirst


def _pack_tokens_flat2_impl(tokw, bases, lut3, dbits_g, woff_g, gfirst,
                            t_rows: int, T: int, nrows_f: int,
                            interpret: bool = False,
                            compact_splits: tuple = (),
                            gmeta=None, hint_rows: int = 0,
                            fuse_place: bool = False):
    """Compacted flat pack: tokens of every HUFF block compacted to a
    dense group-aligned stream (3-4x fewer pack slots than the
    positional (nb, 64Ki) layout), then windows with per-group block
    LUTs and one flat exact-offset placement.

    With hint_rows > 0 (and gmeta (ng, 4) from hzr/sidecar.py), the
    windows pass also exports per-token bit offsets and a second small
    kernel turns them into aligned-decode sidecar entries — returns
    (words, entries) instead of words."""
    from ..ops.pallas_kernels import (
        ACC_ROWS, D_CLAMP, SUP_CHUNKS, compact_tokens_pallas,
        sidecar_entries_pallas, super_place_flat_pallas,
        token_group_windows_grouped_off_pallas,
        token_group_windows_rows_pallas,
        token_windows_place_flat_pallas)

    if compact_splits:
        # large batches: split the compaction into block-range chunks so
        # each launch's VMEM-resident output stays small (the single
        # 7+ MB buffer measured 1.5x/byte worse at batch 4). Chunks cut
        # at group-aligned token offsets; non-HUFF blocks park in each
        # chunk's own trash span.
        parts = []
        for blo, bhi, tlo, thi in compact_splits:
            span = thi - tlo
            bsub = jnp.where(bases[blo:bhi] >= thi, span,
                             bases[blo:bhi] - tlo)
            sub = compact_tokens_pallas(
                tokw[blo:bhi], bsub, span // 128 + 512 + 80,
                interpret=interpret, r_ct=256)
            parts.append(sub[:span // 128])
        tokc = jnp.concatenate(parts, axis=0)
    else:
        tokc = compact_tokens_pallas(tokw, bases, t_rows,
                                     interpret=interpret, r_ct=256)
    ngr = T // GROUP_TOK_FLAT
    if not hint_rows and fuse_place and ngr > 0:
        # fused windows+place (one kernel, SMEM bit-offset carry, no
        # materialized w0/w1): measured SLOWER than the two-kernel
        # pipeline on chip (interleaved A/B r5: 0.59 vs 0.21 ms at 1x,
        # 1.83 vs 1.08 at 4x) — the sequential grid serializes the
        # windows MXU prefix dots against placement, while separate
        # kernels overlap. Kept as an off-by-default reference.
        return token_windows_place_flat_pallas(
            tokc, lut3, dbits_g, woff_g, gfirst, ng=ngr,
            nrows=nrows_f, interpret=interpret)
    if hint_rows:
        flat = tokc.reshape(1, -1)[:, :T]
        w0, w1, cbase, clive, gtot, toff = \
            token_group_windows_grouped_off_pallas(
                flat, lut3, interpret=interpret)
    else:
        # windows reads the compacted rows IN PLACE (no whole-stream
        # reshape-slice, no LUT broadcast materialization — together
        # ~30 us of XLA copies in the device trace)
        w0, w1, cbase, clive, gtot = token_group_windows_rows_pallas(
            tokc, lut3, ng=ngr, interpret=interpret)
    ng = gtot.shape[1]
    # cumsum + broadcast glue (the pad-doubling scan / jnp.repeat
    # formulation measured ~15 us slower on chip)
    e = jnp.cumsum(gtot, axis=1) - gtot     # global exclusive bit scan
    e_in = e - jnp.take(e[0], gfirst)[None, :]   # restart per block
    entries = None
    if hint_rows:
        entries = sidecar_entries_pallas(flat, toff, gmeta, e_in[0],
                                         hint_rows, interpret=interpret)
    group_base = woff_g[None, :] * 8 + dbits_g[None, :] + e_in
    nc = cbase.shape[1]
    nsup = nc // SUP_CHUNKS
    sup_per_g = nsup // ng
    c3 = cbase.reshape(1, nsup, SUP_CHUNKS)
    superbase = c3[:, :, 0]
    d3 = jnp.clip(c3 - superbase[:, :, None], 0, D_CLAMP)
    gb_s = jnp.broadcast_to(
        group_base.reshape(1, ng, 1), (1, ng, sup_per_g)
    ).reshape(1, nsup)
    wbase = jnp.clip(jnp.right_shift(gb_s, 5) + superbase,
                     0, (nrows_f - ACC_ROWS) * 128)
    sbits = gb_s & 31
    slive = jnp.any(clive.reshape(1, nsup, SUP_CHUNKS) > 0, axis=2)
    words = super_place_flat_pallas(
        w0, w1, d3.reshape(1, nc, 1), d3,
        wbase[:, :, None], sbits[:, :, None],
        slive[:, :, None].astype(jnp.int32), nrows_f,
        interpret=interpret)
    return (words, entries) if hint_rows else words


pack_tokens_flat2 = jax.jit(
    _pack_tokens_flat2_impl,
    static_argnames=("t_rows", "T", "nrows_f", "interpret",
                     "compact_splits", "hint_rows"))


def compact_split_plan(hist_np, is_huff, cap_tokens: int = 640 * 1024):
    '''Static block-range chunks for the split compaction: contiguous
    block runs whose group-aligned token spans stay under cap_tokens.
    Returns () when one launch suffices.'''
    ntok = hist_np.sum(axis=1).astype(np.int64)
    groups = np.where(is_huff, -(-ntok // GROUP_TOK_FLAT), 0)
    spans = groups * GROUP_TOK_FLAT
    total = int(spans.sum())
    if total <= cap_tokens:
        return ()
    splits = []
    blo = 0
    tlo = 0
    acc = 0
    for b, sp in enumerate(spans):
        if acc and acc + int(sp) > cap_tokens:
            splits.append((blo, b, tlo, tlo + acc))
            blo, tlo, acc = b, tlo + acc, 0
        acc += int(sp)
    splits.append((blo, len(spans), tlo, tlo + acc))
    return tuple(splits)


def hist_from_tokw(tokw):
    """(nb, ntok) packed token words → (nb, 261) histograms.

    hist[0] counts single-zero tokens (they carry sym 0 — matching the
    tokenizer's run_sym==0 quirk); literals are the valid sym<256
    tokens, RLE symbols 256..260 are counted directly. Same MXU nibble
    decomposition as tokenize_blocks (counts ≤ 64Ki exact in f32)."""
    nb = tokw.shape[0]
    sym = tokw & 511
    valid = (jnp.right_shift(tokw, 27) & 1) != 0
    if jax.default_backend() == "tpu":
        lit_syms = jnp.where(valid & (sym < 256), sym, jnp.int32(-1))
        io16 = jnp.arange(16, dtype=jnp.int32)
        oh = (lit_syms[:, :, None] >> 4 == io16).astype(jnp.float32)
        ol = ((lit_syms[:, :, None] & 15) == io16).astype(jnp.float32)
        hist16 = jnp.einsum("bsh,bsl->bhl", oh, ol,
                            preferred_element_type=jnp.float32)
        hist_lit = hist16.reshape(nb, 256).astype(jnp.int32)
    else:
        lit_syms = jnp.where(valid & (sym < 256), sym, jnp.int32(256))
        hist_lit = jax.vmap(
            lambda s: jnp.zeros(257, jnp.int32).at[s].add(1))(
                lit_syms)[:, :256]
    run_hist = [jnp.sum(valid & (sym == s), axis=1, dtype=jnp.int32)
                for s in (256, 257, 258, 259, 260)]
    return jnp.concatenate([hist_lit, jnp.stack(run_hist, axis=1)],
                           axis=1)

# ---------------------------------------------------------------------------
# Orchestrator — bit-exact hzr_encode over batched blocks
# ---------------------------------------------------------------------------

def _split_blocks(buf: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Pad a byte buffer into (nb, B) blocks + lengths."""
    in_size = buf.size
    nb = max(1, -(-in_size // B))
    padded = np.zeros(nb * B, dtype=np.uint8)
    padded[:in_size] = buf
    lengths = np.full(nb, B, np.int32)
    if in_size % B:
        lengths[-1] = in_size % B
    if in_size == 0:
        lengths[0] = 0
    return padded.reshape(nb, B), lengths


DESC_STRIDE = (MAX_DESC_BITS + 7) // 8


def host_tables(hist_np: np.ndarray, lengths_np: np.ndarray):
    """Host Huffman step for a block batch: per-block code LUTs +
    packed tree descriptions + FILL flags. Uses the multithreaded
    native C++ builder when built, else the Python spec."""
    nb = hist_np.shape[0]
    try:
        from ..native import bindings as native
        codes, cbits, desc_bytes, desc_bits, is_fill = \
            native.build_tables(hist_np, DESC_STRIDE)
    except Exception:
        codes = np.zeros((nb, NUM_SYMBOLS), np.uint32)
        cbits = np.zeros((nb, NUM_SYMBOLS), np.int32)
        desc_bytes = np.zeros((nb, DESC_STRIDE), np.uint8)
        desc_bits = np.zeros(nb, np.int32)
        is_fill = np.zeros(nb, bool)
        for i in range(nb):
            if lengths_np[i] == 0:
                is_fill[i] = True
                continue
            t = build_block_tables(hist_np[i])
            if t is None:
                is_fill[i] = True
                continue
            codes[i], cbits[i], db, desc_bits[i] = t
            desc_bytes[i, :db.size] = db
    is_fill = is_fill | (np.asarray(lengths_np) == 0)
    # device-path invariants: the combined code|cbits<<24 LUT word and
    # the f1/f2 lane split both need cbits ≤ 23 — guaranteed: Huffman
    # depth over ≤64Ki+261 weights is Fibonacci-bounded at ≤ 23
    if cbits.size and int(cbits.max()) > 23:
        raise ValueError("hzr: pathological code length")
    return codes, cbits, desc_bytes, desc_bits, is_fill


def encode_blocks_device(blocks_np: np.ndarray, lengths_np: np.ndarray):
    """Run both device passes + the host Huffman step for a block batch.

    Returns (packed (nb, MAX_OUT) u8, total_bits (nb,), is_fill (nb,))
    for assemble().
    """
    blocks = jnp.asarray(blocks_np)
    lengths = jnp.asarray(lengths_np)
    syms, extras, ebits, tvalid, hist = tokenize_blocks(blocks, lengths)
    codes, cbits, desc_bytes, desc_bits, is_fill = host_tables(
        np.asarray(hist), lengths_np)

    packed, total_bits = pack_blocks(
        syms, extras, ebits, tvalid,
        jnp.asarray(codes), jnp.asarray(cbits), jnp.asarray(desc_bits))
    packed = np.array(packed)  # writable host copy
    # OR-merge the host-packed tree description over the leading bytes
    # (token bits already start at bit offset desc_bits; the straddle
    # byte holds disjoint bit ranges so OR is exact)
    packed[:, :desc_bytes.shape[1]] |= desc_bytes
    return packed, np.asarray(total_bits), is_fill


@jax.jit
def compact_payloads(packed, blocks, total_bits, lengths, is_fill):
    """Device-side compaction of the variable-length outputs so the
    host pulls only the bytes it needs (the tunneled d2h link has high
    fixed+per-byte costs; max-size buffers waste both).

    Returns (tight_huff_buf, comp_len, copy_buf, copy_len): HUFF
    payloads packed back-to-back, and raw block bytes for COPY-fallback
    blocks likewise (usually empty). Ascending dynamic-update-slices
    overwrite the previous row's overhang, so no gather/scatter.
    """
    nb, max_out = packed.shape
    B_ = blocks.shape[1]
    plen = jnp.right_shift(total_bits + 7, 3)
    live = lengths > 0
    is_huff = (~is_fill) & live & (plen <= lengths) & (plen < MAX_BLOCK_SIZE)
    comp_len = jnp.where(is_huff, plen, 0)
    offs = jnp.cumsum(comp_len) - comp_len

    def step(acc, inp):
        off, row = inp
        return jax.lax.dynamic_update_slice(acc, row, (off,)), None

    tight, _ = jax.lax.scan(
        step, jnp.zeros(nb * max_out + max_out, jnp.uint8), (offs, packed))

    is_copy = (~is_fill) & live & (~is_huff)
    copy_len = jnp.where(is_copy, lengths, 0)
    coffs = jnp.cumsum(copy_len) - copy_len
    copy_buf, _ = jax.lax.scan(
        step, jnp.zeros(nb * B_ + B_, jnp.uint8), (coffs, blocks))
    # single-transfer layout: [huff payloads | copy blocks] contiguous,
    # plus one int32 meta array [comp_len | copy_len | total_bits] —
    # every separate d2h pays the link's fixed latency
    total_comp = jnp.sum(comp_len)
    data = jnp.zeros(tight.shape[0] + copy_buf.shape[0], jnp.uint8)
    data = jax.lax.dynamic_update_slice(data, tight, (0,))
    data = jax.lax.dynamic_update_slice(data, copy_buf, (total_comp,))
    meta = jnp.concatenate([comp_len, copy_len, total_bits])
    return data, meta


def fill_bytes_from_hist(hist_np: np.ndarray) -> np.ndarray:
    """FILL blocks are single-code-class: all bytes equal one literal or
    all zero — recover block[0] from the histogram instead of
    transferring the raw block (hzr_encode.c:341-367 semantics)."""
    lits = hist_np[:, 1:256]
    has_lit = lits.max(axis=1, initial=0) > 0
    return np.where(has_lit, lits.argmax(axis=1) + 1, 0).astype(np.uint8)


def assemble_compact(lengths_np, tight_np, comp_len_np, copy_np,
                     copy_len_np, total_bits, is_fill, fill_byte) -> bytes:
    """Host assembly from device-compacted buffers (no raw block
    transfer): headers + CRC32C + concat."""
    nb = lengths_np.shape[0]
    in_size = int(lengths_np.sum())
    parts: List[bytes] = [int(in_size).to_bytes(4, "little")]
    hoff = np.concatenate(([0], np.cumsum(comp_len_np)[:-1]))
    coff = np.concatenate(([0], np.cumsum(copy_len_np)[:-1]))
    for i in range(nb):
        blen = int(lengths_np[i])
        if blen == 0:
            continue
        if is_fill[i]:
            fb = bytes([int(fill_byte[i])])
            crc = _crc32c(np.frombuffer(fb, np.uint8))
            enc = ((0).to_bytes(2, "little") + int(crc).to_bytes(4, "little")
                   + bytes([ENCODING_FILL]) + fb)
        elif comp_len_np[i] > 0:
            payload = tight_np[hoff[i]:hoff[i] + comp_len_np[i]]
            crc = _crc32c(payload)
            enc = ((int(comp_len_np[i]) - 1).to_bytes(2, "little")
                   + int(crc).to_bytes(4, "little")
                   + bytes([ENCODING_HUFF_RLE]) + payload.tobytes())
        else:  # COPY fallback
            block = copy_np[coff[i]:coff[i] + blen]
            crc = _crc32c(block)
            enc = ((blen - 1).to_bytes(2, "little")
                   + int(crc).to_bytes(4, "little")
                   + bytes([ENCODING_COPY]) + block.tobytes())
        parts.append(enc)
    return b"".join(parts)


def assemble(blocks_np, lengths_np, packed, total_bits, is_fill,
             out_capacity: Optional[int] = None) -> bytes:
    """Host assembly: headers, CRC32C, FILL/COPY fallbacks, concat
    (reference: hzr_encode.c:369-407,462-481,499-544)."""
    nb = blocks_np.shape[0]
    in_size = int(lengths_np.sum())
    parts: List[bytes] = [int(in_size).to_bytes(4, "little")]
    written = HEADER_SIZE
    for i in range(nb):
        blen = int(lengths_np[i])
        if blen == 0:
            continue
        block = blocks_np[i, :blen]
        if is_fill[i]:
            crc = _crc32c(block[:1])
            enc = ((0).to_bytes(2, "little") + int(crc).to_bytes(4, "little")
                   + bytes([ENCODING_FILL, int(block[0])]))
        else:
            payload_len = (int(total_bits[i]) + 7) // 8
            limit = blen
            if out_capacity is not None:
                limit = min(limit, out_capacity - written - BLOCK_HEADER_SIZE)
            if payload_len > limit or payload_len >= MAX_BLOCK_SIZE:
                crc = _crc32c(block)
                enc = ((blen - 1).to_bytes(2, "little")
                       + int(crc).to_bytes(4, "little")
                       + bytes([ENCODING_COPY]) + block.tobytes())
            else:
                payload = packed[i, :payload_len]
                crc = _crc32c(payload)
                enc = ((payload_len - 1).to_bytes(2, "little")
                       + int(crc).to_bytes(4, "little")
                       + bytes([ENCODING_HUFF_RLE]) + payload.tobytes())
        if out_capacity is not None and written + len(enc) > out_capacity:
            raise ValueError("hzr: output buffer too small")
        parts.append(enc)
        written += len(enc)
    return b"".join(parts)


def encode(data, out_capacity: Optional[int] = None) -> bytes:
    """Drop-in for pyref.encode / the reference's hzr_encode, with the
    heavy lifting on the accelerator."""
    buf = np.frombuffer(memoryview(data).cast("B"), dtype=np.uint8) \
        if not isinstance(data, np.ndarray) else data.astype(np.uint8,
                                                             copy=False)
    blocks_np, lengths_np = _split_blocks(buf)
    packed, total_bits, is_fill = encode_blocks_device(blocks_np, lengths_np)
    return assemble(blocks_np, lengths_np, packed, total_bits, is_fill,
                    out_capacity)
