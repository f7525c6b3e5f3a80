"""TPU hzr decoder — segment-parallel speculative decode.

Huffman decoding is bit-serial *within* a stream, but two structural
facts let it parallelize on a vector machine:

1. Blocks are independent (each 64 KiB block carries its own tree).
2. Within a block, the bitstream can be cut into fixed S-bit segments
   and decoded from *guessed* entry offsets; a fixpoint iteration over
   "entry(s+1) = exit(s)" is exact once it stabilizes (entry 0 — the
   end of the tree description — is known, and every sweep makes at
   least one more entry exact; Huffman self-synchronization makes most
   entries correct after the first sweep, so it typically converges in
   2-3 sweeps instead of S).

Decode lanes = all segments of all blocks, advanced in lockstep by a
`lax.while_loop` whose body does a 16-bit LUT lookup per lane (gathers)
— the TPU-native re-expression of the reference's per-symbol loop
(hzr_decode.c:402-480).

Emission exploits the RLE structure: the output buffer starts zeroed,
so zero-runs need NO writes — only literal bytes are scattered, at
positions from a per-segment output-count pass + prefix sum. Trailing
padding bits (< 8) may speculatively decode one bogus symbol, but its
output position lands at/after the block's true output end and is
dropped by the scatter bound.

Pipeline per call:
  host:   stream walk (headers), tree recovery + LUT build,
          COPY/FILL blocks resolved directly
  device: alignment fixpoint sweeps (count-only) → exact entries +
          per-segment output counts, then one emission sweep
  host:   output assembly

Correctness-first formulation; bit-exact against pyref on all fixtures
(tests/test_jax_decoder.py). A Pallas double-buffered variant is future
work.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..formats.hzr_constants import (
    BLOCK_HEADER_SIZE,
    ENCODING_COPY,
    ENCODING_FILL,
    ENCODING_HUFF_RLE,
    HEADER_SIZE,
    MAX_BLOCK_SIZE,
)
from . import pyref

L1_BITS = 16
L1_SIZE = 1 << L1_BITS
MAX_CODE_BITS = 24  # Fibonacci bound for ≤64Ki+261 total count is 23
L2_WIDTH = 1 << (MAX_CODE_BITS - L1_BITS)
# Segment size trades lane count against lockstep steps: smaller
# segments → more parallel lanes and fewer while-loop iterations each
# (total work constant). 1024 bits ≈ 4× the throughput of 4096 on the
# measured fixtures.
SEG_BITS = 1024

_RLE_EBITS = np.array([0, 0, 2, 4, 8, 14], np.int32)   # pad + syms 256..260
_RLE_BASE = np.array([0, 2, 3, 7, 23, 279], np.int32)


# ---------------------------------------------------------------------------
# Host: tree → flat LUTs
# ---------------------------------------------------------------------------

def build_lut(tree) -> Tuple[np.ndarray, np.ndarray]:
    """Flatten a pyref tree (nested tuples, leaves = ints) into

    l1 (L1_SIZE,) i32: leaf → sym | bits<<16; deep → slot | 1<<30.
    l2 (n_deep, L2_WIDTH) i32: completion beyond 16 bits →
        sym | totalbits<<16.
    """
    l1 = np.zeros(L1_SIZE, np.int32)
    deep: List[np.ndarray] = []

    def fill_range(arr, code, bits, value):
        step = 1 << bits
        arr[code::step] = value

    def walk(node, code, bits):
        if not isinstance(node, tuple):
            b = max(bits, 1)  # degenerate single-leaf tree consumes 1 bit
            fill_range(l1, code, bits, node | (b << 16))
            return
        if bits == L1_BITS:
            slot = len(deep)
            t = np.zeros(L2_WIDTH, np.int32)
            deep.append(t)
            l1[code] = slot | (1 << 30)

            def walk2(nd, c2, b2):
                if not isinstance(nd, tuple):
                    fill_range(t, c2, b2, nd | ((L1_BITS + b2) << 16))
                    return
                if b2 >= MAX_CODE_BITS - L1_BITS:
                    raise ValueError("hzr: code too deep")
                walk2(nd[0], c2, b2 + 1)
                walk2(nd[1], c2 | (1 << b2), b2 + 1)

            walk2(node, 0, 0)
            return
        walk(node[0], code, bits + 1)
        walk(node[1], code | (1 << bits), bits + 1)

    walk(tree, 0, 0)
    l2 = np.stack(deep) if deep else np.zeros((1, L2_WIDTH), np.int32)
    return l1, l2


def build_luts_batch(huff, return_dbits: bool = False):
    """Per-block L1/L2 LUTs for a HUFF block list, as the concatenated
    arrays _sweep_impl consumes: (l1 (nb, L1_SIZE) i32, l2 concat,
    l2_base (nb,) i32).

    Uses the native MT builder (C++ recover_tree straight from the
    payload bits — the Python per-leaf slice fill was the sharded
    decoder's largest serial host cost) and falls back to the Python
    build_lut per block. Blocks without deep slots contribute one
    zero row, matching build_lut's shape contract.

    With return_dbits=True also returns the per-block tree-description
    bit counts (the bit position where payload data starts) — huff
    entries from _walk_stream_light carry dbits=-1 and get the real
    value from here, so the Python per-block tree recovery never runs
    on the sharded decode path."""
    nb = len(huff)
    dbits_out = np.asarray([h[2] for h in huff], np.int64)
    try:
        from ..native import bindings as nbind
        l1, l2r, n_deep, dbits = nbind.declut16_batch(
            [h[0] for h in huff])
        for i, h in enumerate(huff):
            if h[2] >= 0 and int(dbits[i]) != h[2]:  # pragma: no cover
                raise ValueError("declut16 dbits mismatch")
        dbits_out = np.asarray(dbits, np.int64)
        rows = [l2r[i, :max(int(n_deep[i]), 1)] for i in range(nb)]
    except Exception:
        from . import pyref
        l1 = np.zeros((nb, L1_SIZE), np.int32)
        rows = []
        for i, h in enumerate(huff):
            tree = h[5]
            if tree is None:   # light walk deferred the recovery
                br = pyref._BitReader(memoryview(h[0].tobytes()), 0,
                                      h[0].size)
                tree = pyref._recover_tree(br)
                dbits_out[i] = br.pos
            a, b = build_lut(tree)
            l1[i] = a
            rows.append(b)
    l2_base = np.zeros(nb, np.int32)
    acc = 0
    for i, r in enumerate(rows):
        l2_base[i] = acc
        acc += r.shape[0]
    if return_dbits:
        return l1, np.concatenate(rows, axis=0), l2_base, dbits_out
    return l1, np.concatenate(rows, axis=0), l2_base


# ---------------------------------------------------------------------------
# Device sweeps
# ---------------------------------------------------------------------------

def _sweep_impl(words, l1, l2, l2_base, block_of_lane, entry, seg_end,
                payload_bits, out_base, out_limit, out_buf, emit: bool):
    """Lockstep decode of every lane from `entry` to its segment end.

    words: (nb, W) int32 payload words (little-endian bit order).
    l1: (nb, L1_SIZE) i32; l2: (total_deep, L2_WIDTH) i32 with
    l2_base: (nb,) row offsets into l2.
    Returns (exit_pos, out_count, out_buf).
    """
    nl = entry.shape[0]
    ebits_t = jnp.asarray(_RLE_EBITS)
    base_t = jnp.asarray(_RLE_BASE)

    def peek32(pos):
        w = jnp.right_shift(pos, 5)
        sh = (pos & 31).astype(jnp.uint32)
        w0 = words[block_of_lane, w].astype(jnp.uint32)
        w1 = words[block_of_lane, w + 1].astype(jnp.uint32)
        return (w0 >> sh) | jnp.where(sh > 0,
                                      w1 << (jnp.uint32(32) - sh),
                                      jnp.uint32(0))

    def body(state):
        pos, outc, buf, active = state
        pk = peek32(pos)
        e1 = l1[block_of_lane,
                (pk & jnp.uint32(L1_SIZE - 1)).astype(jnp.int32)]
        is_deep = (e1 & (1 << 30)) != 0
        slot = l2_base[block_of_lane] + (e1 & 0xFFFF)
        e2 = l2[jnp.where(is_deep, slot, 0),
                ((pk >> jnp.uint32(L1_BITS))
                 & jnp.uint32(L2_WIDTH - 1)).astype(jnp.int32)]
        ent = jnp.where(is_deep, e2, e1)
        sym = ent & 0x1FF
        cbits = (ent >> 16) & 0xFF
        pos2 = pos + cbits
        ridx = jnp.clip(sym - 255, 0, 5)  # 0 for literals, 1..5 for RLE
        eb = ebits_t[ridx]
        extra = jnp.where(
            eb > 0,
            (peek32(pos2)
             & ((jnp.uint32(1) << eb.astype(jnp.uint32)) - jnp.uint32(1))
             ).astype(jnp.int32),
            0)
        pos3 = pos2 + eb
        is_rle = sym >= 256
        nout = jnp.where(is_rle, base_t[ridx] + extra, 1)
        is_lit = (~is_rle) & (sym > 0)

        ok = active
        pos_n = jnp.where(ok, pos3, pos)
        outc_n = jnp.where(ok, outc + nout, outc)
        if emit:
            # drop sentinel must be PAST the buffer (negative indices
            # wrap in JAX); also bound by the lane's block output end so
            # speculative padding-bit symbols cannot cross into the
            # next block's region
            nbuf = buf.shape[0]
            opos = out_base + outc
            lp = jnp.where(ok & is_lit & (opos < out_limit), opos, nbuf)
            buf = buf.at[lp].set(sym.astype(jnp.uint8), mode="drop")
        active_n = ok & (pos_n < seg_end) & (pos_n < payload_bits)
        return (pos_n, outc_n, buf, active_n)

    def cond(state):
        return jnp.any(state[3])

    active0 = (entry < seg_end) & (entry < payload_bits)
    pos, outc, buf, _ = jax.lax.while_loop(
        cond, body, (entry, jnp.zeros(nl, jnp.int32), out_buf, active0))
    return pos, outc, buf


_sweep = jax.jit(_sweep_impl, static_argnames=("emit",))


@jax.jit
def _align_fixpoint(words, l1, l2, l2_base, block_of_lane, entry0,
                    seg_end, payload_bits, dfirst):
    """On-device alignment fixpoint: iterate entry(s+1)=exit(s) until
    stable, in ONE dispatch (a host-synced loop pays the link's fixed
    d2h latency per iteration). Returns (entry, counts)."""
    nl = entry0.shape[0]
    zero_base = jnp.zeros(nl, jnp.int32)
    dummy = jnp.zeros(1, jnp.uint8)

    def body(state):
        entry, _, _ = state
        exit_pos, counts, _ = _sweep_impl(
            words, l1, l2, l2_base, block_of_lane, entry, seg_end,
            payload_bits, zero_base, zero_base, dummy, False)
        shifted = jnp.concatenate([exit_pos[:1], exit_pos[:-1]])
        new_entry = jnp.where(dfirst, entry, shifted)
        return new_entry, counts, jnp.any(new_entry != entry)

    def cond(state):
        return state[2]

    entry, counts, _ = jax.lax.while_loop(
        cond, body, (entry0, jnp.zeros(nl, jnp.int32), jnp.bool_(True)))
    return entry, counts


# ---------------------------------------------------------------------------
# Orchestrator
# ---------------------------------------------------------------------------

def decode(data) -> bytes:
    """hzr_decode equivalent with the entropy stage on the accelerator."""
    return decode_many([data])[0]


def decode_many(datas) -> list:
    """Decode several hzr streams in ONE device run (their blocks'
    segments share the lane batch — e.g. all byte planes of a packer
    container). Parses streams on the host, resolves COPY/FILL blocks
    directly, and runs every HUFF block's segments as parallel lanes.
    """
    srcs = [np.frombuffer(memoryview(d).cast("B"), np.uint8)
            if not isinstance(d, np.ndarray) else d.reshape(-1)
            for d in datas]
    if not srcs:
        return []
    spans = []  # (global_start, size) per stream
    total = 0
    for src in srcs:
        if src.size < HEADER_SIZE:
            raise ValueError("hzr: input too small")
        sz = int.from_bytes(src[:4].tobytes(), "little")
        spans.append((total, sz))
        total += sz
    out_size = total
    out = np.zeros(out_size, np.uint8)

    # --- host stream walk (all streams, global output offsets) ------------
    huff = []  # (payload view, payload_bits, desc_bits, out_off, out_len, tree)
    for src, (gstart, ssize) in zip(srcs, spans):
        _walk_stream(src, ssize, gstart, out, huff)
    if not huff:
        return [out[a:a + n].tobytes() for a, n in spans]
    result = _device_decode(huff, out, out_size)
    return [result[a:a + n].tobytes() for a, n in spans]


def _walk_stream(src, out_size, gbase, out, huff):
    pos = HEADER_SIZE
    left = out_size
    out_off = gbase
    while left > 0:
        blen = min(left, MAX_BLOCK_SIZE)
        if pos + BLOCK_HEADER_SIZE > src.size:
            raise ValueError("hzr: truncated block header")
        esz = int.from_bytes(src[pos:pos + 2].tobytes(), "little") + 1
        mode = src[pos + 6]
        dstart = pos + BLOCK_HEADER_SIZE
        if mode == ENCODING_COPY:
            if esz != blen or dstart + blen > src.size:
                raise ValueError("hzr: bad COPY block")
            out[out_off:out_off + blen] = src[dstart:dstart + blen]
            pos = dstart + blen
        elif mode == ENCODING_FILL:
            if dstart + 1 > src.size:
                raise ValueError("hzr: truncated FILL block")
            out[out_off:out_off + blen] = src[dstart]
            pos = dstart + 1
        elif mode == ENCODING_HUFF_RLE:
            if dstart + esz > src.size:
                raise ValueError("hzr: truncated block")
            payload = src[dstart:dstart + esz]
            br = pyref._BitReader(memoryview(payload.tobytes()), 0,
                                  payload.size)
            tree = pyref._recover_tree(br)
            # the stored CRC32C field (hzr_encode.c:474-481) rides along
            # as a zero-cost content digest for decode-hint binding
            crc = int.from_bytes(src[pos + 2:pos + 6].tobytes(), "little")
            huff.append((payload, payload.size * 8, br.pos, out_off, blen,
                         tree, crc))
            pos = dstart + esz
        else:
            raise ValueError("hzr: invalid encoding mode")
        out_off += blen
        left -= blen


def _walk_stream_light(src, out_size, gbase, out, huff):
    """_walk_stream without the Python per-block tree recovery: huff
    entries carry dbits=-1 / tree=None, both filled in later by
    build_luts_batch(return_dbits=True) (the native builder re-derives
    dbits from the payload bits anyway). ~20x cheaper per block — the
    recovery was the sharded decoder's largest serial host stage."""
    pos = HEADER_SIZE
    left = out_size
    out_off = gbase
    while left > 0:
        blen = min(left, MAX_BLOCK_SIZE)
        if pos + BLOCK_HEADER_SIZE > src.size:
            raise ValueError("hzr: truncated block header")
        esz = int.from_bytes(src[pos:pos + 2].tobytes(), "little") + 1
        mode = src[pos + 6]
        dstart = pos + BLOCK_HEADER_SIZE
        if mode == ENCODING_COPY:
            if esz != blen or dstart + blen > src.size:
                raise ValueError("hzr: bad COPY block")
            out[out_off:out_off + blen] = src[dstart:dstart + blen]
            pos = dstart + blen
        elif mode == ENCODING_FILL:
            if dstart + 1 > src.size:
                raise ValueError("hzr: truncated FILL block")
            out[out_off:out_off + blen] = src[dstart]
            pos = dstart + 1
        elif mode == ENCODING_HUFF_RLE:
            if dstart + esz > src.size:
                raise ValueError("hzr: truncated block")
            payload = src[dstart:dstart + esz]
            crc = int.from_bytes(src[pos + 2:pos + 6].tobytes(), "little")
            huff.append((payload, payload.size * 8, -1, out_off, blen,
                         None, crc))
            pos = dstart + esz
        else:
            raise ValueError("hzr: invalid encoding mode")
        out_off += blen
        left -= blen


def _device_decode(huff, out, out_size) -> np.ndarray:
    # --- host LUTs + padded payload words ---------------------------------
    nb = len(huff)
    max_words = max(-(-p.size // 4) for p, *_ in huff) + 2
    words = np.zeros((nb, max_words * 4), np.uint8)
    for i, (payload, *_rest) in enumerate(huff):
        words[i, :payload.size] = payload
    words = np.ascontiguousarray(words).view("<u4").view(np.int32)
    l1, l2, l2_base = build_luts_batch(huff)

    # --- lanes -------------------------------------------------------------
    lane_block, lane_entry0, lane_seg_end = [], [], []
    lane_out_segidx = []
    seg_of_block = []
    for i, (payload, pbits, dbits, ooff, olen, tree,
            _crc) in enumerate(huff):
        nseg = max(1, -(-(pbits - dbits) // SEG_BITS))
        seg_of_block.append(nseg)
        for s in range(nseg):
            lane_block.append(i)
            lane_entry0.append(dbits if s == 0 else dbits
                               + s * SEG_BITS)
            lane_seg_end.append(min(dbits + (s + 1) * SEG_BITS, pbits))
    lane_block = np.asarray(lane_block, np.int32)
    lane_entry = np.asarray(lane_entry0, np.int32)
    lane_seg_end = np.asarray(lane_seg_end, np.int32)
    lane_pbits = np.asarray([huff[b][1] for b in lane_block], np.int32)

    dwords = jnp.asarray(words)
    dl1 = jnp.asarray(l1)
    dl2 = jnp.asarray(l2)
    dl2b = jnp.asarray(l2_base)
    dblock = jnp.asarray(lane_block)
    dseg_end = jnp.asarray(lane_seg_end)
    dpbits = jnp.asarray(lane_pbits)
    dummy_buf = jnp.zeros(1, jnp.uint8)
    zero_base = jnp.zeros(lane_block.shape[0], jnp.int32)

    # --- alignment fixpoint (single on-device dispatch) -------------------
    seg_starts = np.cumsum([0] + seg_of_block[:-1])
    first_lane = np.zeros(lane_block.shape[0], bool)
    first_lane[seg_starts] = True
    dfirst = jnp.asarray(first_lane)
    entry, counts = _align_fixpoint(dwords, dl1, dl2, dl2b, dblock,
                                    jnp.asarray(lane_entry), dseg_end,
                                    dpbits, dfirst)

    # --- output offsets ----------------------------------------------------
    counts_np = np.asarray(counts)
    out_bases = np.zeros_like(counts_np)
    lane_idx = 0
    for i, nseg in enumerate(seg_of_block):
        ooff, olen = huff[i][3], huff[i][4]
        c = counts_np[lane_idx:lane_idx + nseg]
        out_bases[lane_idx:lane_idx + nseg] = ooff + np.concatenate(
            ([0], np.cumsum(c[:-1])))
        lane_idx += nseg

    # --- emission sweep ----------------------------------------------------
    # literal scatter positions beyond each block's output end come only
    # from speculative padding-bit symbols; bound the buffer and drop
    lane_out_limit = np.asarray(
        [huff[b][3] + huff[b][4] for b in lane_block], np.int32)
    out_buf = jnp.zeros(out_size, jnp.uint8)
    _, _, out_buf = _sweep(dwords, dl1, dl2, dl2b, dblock, entry, dseg_end,
                           dpbits, jnp.asarray(out_bases),
                           jnp.asarray(lane_out_limit), out_buf,
                           emit=True)
    emitted = np.asarray(out_buf)
    # merge device-decoded HUFF regions with host COPY/FILL regions
    for i, (payload, pbits, dbits, ooff, olen, tree,
            _crc) in enumerate(huff):
        out[ooff:ooff + olen] = emitted[ooff:ooff + olen]
    return out
