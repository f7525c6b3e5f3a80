"""TPU-path signal packers — device pipeline, host-identical streams.

Same container formats as packers/host.py (and the C++ reference), but
every array stage runs on the accelerator, organized to MINIMIZE
DISPATCHES (each eager op / un-cached jit call costs a host↔device
round trip; a fresh ``jax.jit(lambda ...)`` per call recompiles):

  dispatch 1 (cached jit "pass 1"): layout swizzle → preprocess
      (xdelta scans / transform) → byte-plane split → verify check →
      blockify → RLE tokenize + histograms.
  host: per-block Huffman tables (multithreaded native C++).
  dispatch 2 (cached jit "pass 2"): code lookup → bit-offset prefix
      sum → scatter-add word packing.
  host: headers/CRC/concat (native CRC32C).

Reference parity: signal_packer_hzr.cpp / signal_packer_xdelta_hzr.cpp /
signal_packer_dct.cpp / signal_packer_hadamard.cpp — byte-identical
compressed output and reconstruction (tests/test_tpu_packers.py).
"""

from __future__ import annotations

import functools
import logging
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..hzr import jax_coder
from ..hzr import pyref as hzr_py
from ..ops import jax_ops as jops
from ..ops import numpy_ops as nops
from . import container
from .host import PackerConfig, _means_header, _means_from_header

log = logging.getLogger(__name__)

try:
    from ..native import bindings as native
    _HAVE_NATIVE = True
except Exception:  # pragma: no cover
    _HAVE_NATIVE = False

_warned_backend = False


def _warn_non_tpu_backend():
    """The JAX engine's pack kernels are Pallas/Mosaic TPU programs;
    on CPU/GPU backends they fall back to an XLA formulation measured
    ~100x slower (PROFILE_r03: pack_xla 47 ms vs pack_pallas 0.6 ms).
    engine='auto' never routes here off-TPU — warn ONCE when a caller
    forces engine='tpu' anyway (use 'native' or 'host' on those
    machines)."""
    global _warned_backend
    if _warned_backend:
        return
    _warned_backend = True
    try:
        backend = jax.default_backend()
    except Exception:  # pragma: no cover
        return
    if backend != "tpu":
        log.warning(
            "rspt_tpu: JAX engine on backend %r — the pack path is "
            "TPU-native (Pallas); expect ~100x slower XLA fallbacks "
            "here. Use engine='native' or 'host' on non-TPU machines.",
            backend)


# ---------------------------------------------------------------------------
# Fused pass-1 kernels (one dispatch each), cached per static config
# ---------------------------------------------------------------------------

def _block_layout(plane_len: int, nr_planes: int):
    B = jax_coder.B
    nb_per = max(1, -(-plane_len // B))
    lengths = np.full(nr_planes * nb_per, B, np.int32)
    if plane_len % B:
        lengths[nb_per - 1::nb_per] = plane_len % B
    return nb_per, lengths


def _blockify_tokenize(planes, plane_len, nr_planes, lengths_np):
    """(inside jit) planes (nr_planes, plane_len) u8 → blocks + tokens."""
    B = jax_coder.B
    nb_per = max(1, -(-plane_len // B))
    padded = jnp.zeros((nr_planes, nb_per * B), jnp.uint8)
    padded = padded.at[:, :plane_len].set(planes)
    blocks = padded.reshape(nr_planes * nb_per, B)
    toks = jax_coder.tokenize_blocks(blocks, jnp.asarray(lengths_np))
    return blocks, toks


@functools.lru_cache(maxsize=64)
def _pass1_hzr(ns: int, ch: int, bps: int, nr_planes: int,
               fmode: str = ""):
    plane_len = ch * ns
    _, lengths = _block_layout(plane_len, nr_planes)
    if fmode:
        # same fused tokenizer as the xdelta path, minus the delta
        # chain and the verify flag (hzr always keeps 4 planes —
        # signal_packer_hzr.cpp:39); tokw feeds the flat exact-offset
        # pack downstream
        from ..ops import pallas_kernels as pk
        interp_tok = fmode == "interp"

        @jax.jit
        def f_fused(raw):
            enc = jops.native_to_i32(raw, ns, ch, bps).reshape(-1)
            enc = jax.lax.optimization_barrier(enc)
            tokw, bwords = pk.tokenize_planes_pallas(
                enc, nr_planes, plane_len, interpret=interp_tok)
            blocks = jax.lax.bitcast_convert_type(
                bwords, jnp.uint8).reshape(tokw.shape[0], -1)
            hist = jax_coder.hist_from_tokw(tokw)
            return blocks, (tokw, hist)

        return f_fused, lengths

    @jax.jit
    def f(raw):
        enc = jops.native_to_i32(raw, ns, ch, bps).reshape(-1)
        planes = jops.plane_split(enc, nr_planes)
        return _blockify_tokenize(planes, plane_len, nr_planes, lengths)

    return f, lengths


def _fused_pass1_mode() -> str:
    """'' (off) / 'on' / 'interp' — resolved by CALLERS of the pass-1
    factories and passed in as an explicit argument so it participates
    in the lru_cache key (flipping RSPT_FUSED_PASS1/backend after a
    shape is cached must not serve the stale pipeline).
    RSPT_FUSED_PASS1=0 disables, =interp forces the interpreter
    (CPU tests); default: on for the TPU backend."""
    import os as _os
    v = _os.environ.get("RSPT_FUSED_PASS1", "")
    if v == "0":
        return ""
    if v == "interp":
        return "interp"
    if v == "1" or jax.default_backend() == "tpu":
        return "on"
    return ""


@functools.lru_cache(maxsize=64)
def _pass1_xdelta(ns: int, ch: int, bps: int, nr_planes: int,
                  use_pallas: bool = False, fmode: str = ""):
    plane_len = ch * ns
    _, lengths = _block_layout(plane_len, nr_planes)
    if fmode:
        from ..ops import pallas_kernels as pk
        interp_tok = fmode == "interp"

        @jax.jit
        def f_fused(raw):
            enc = jops.native_to_i32(raw, ns, ch, bps).reshape(-1)
            # fused VMEM tile kernel: one HBM read+write for the whole
            # delta→offset→xor chain instead of the materialized
            # elementwise stages (utils.cpp:193-236 semantics)
            enc = pk.xdelta_preprocess_pallas(enc, interpret=interp_tok)
            enc = jax.lax.optimization_barrier(enc)
            # verify-and-grow check: enc fits in nr_planes signed bytes
            # (== the reference's plane_merge(plane_split) round-trip,
            # signal_packer_xdelta_hzr.cpp:59-71)
            if nr_planes < 4:
                sh = jnp.int32(32 - 8 * nr_planes)
                ok = jnp.all(jnp.right_shift(
                    jnp.left_shift(enc, sh), sh) == enc)
            else:
                ok = jnp.bool_(True)
            tokw, bwords = pk.tokenize_planes_pallas(
                enc, nr_planes, plane_len, interpret=interp_tok)
            blocks = jax.lax.bitcast_convert_type(
                bwords, jnp.uint8).reshape(tokw.shape[0], -1)
            hist = jax_coder.hist_from_tokw(tokw)
            small = jnp.concatenate([hist.reshape(-1),
                                     ok.astype(jnp.int32)[None]])
            return small, blocks, (tokw, hist)

        return f_fused, lengths

    if use_pallas:
        from ..ops.pallas_kernels import xdelta_preprocess_pallas
        interp = jax.default_backend() != "tpu"

    @jax.jit
    def f(raw):
        enc = jops.native_to_i32(raw, ns, ch, bps).reshape(-1)
        if use_pallas:
            # fused VMEM tile kernel: one HBM read+write instead of
            # three materialized scan stages
            enc = xdelta_preprocess_pallas(enc, interpret=interp)
        else:
            enc = jops.xor_encode(jops.offset32(
                jops.delta_encode(enc), -128))
        # barrier: stop the TPU fusion pass duplicating the scan chain
        # into the three consumers below (see jax_coder.tokenize_blocks)
        enc = jax.lax.optimization_barrier(enc)
        # verify-and-grow check (signal_packer_xdelta_hzr.cpp:59-71):
        # hzr is lossless, so only plane truncation can lose bits
        merged = jops.plane_merge(jops.plane_split(enc, nr_planes))
        ok = jnp.array_equal(merged, enc)
        planes = jax.lax.optimization_barrier(
            jops.plane_split(enc, nr_planes))
        blocks, toks = _blockify_tokenize(planes, plane_len, nr_planes,
                                          lengths)
        syms, extras, ebits, tvalid, hist = toks
        # fold the verify flag into the histogram transfer: every
        # host-visible scalar costs a full fixed-latency d2h round trip
        small = jnp.concatenate([hist.reshape(-1),
                                 ok.astype(jnp.int32)[None]])
        return small, blocks, (syms, extras, ebits, tvalid, hist)

    return f, lengths


@functools.lru_cache(maxsize=64)
def _pass1_xdelta_batch(ns: int, ch: int, bps: int, nr_planes: int,
                        batch: int, fmode: str = None):
    """Batched pass 1: `batch` independent payloads of identical config
    in one dispatch (the serving path — fixed link costs amortize over
    the whole batch). Each payload's scan chains stay independent,
    exactly like separate reference compress() calls.

    In fused mode only the cheap elementwise pre-chain is vmapped; the
    tokenizer runs as ONE Pallas launch over the whole batch (a vmapped
    per-payload launch measured ~40% superlinear on chip)."""
    plane_len = ch * ns
    nb_per, lengths = _block_layout(plane_len, nr_planes)
    if fmode is None:  # resolved here only for back-compat callers
        fmode = _fused_pass1_mode()
    tiled = np.tile(lengths, batch)

    if fmode:
        from ..ops import pallas_kernels as pk
        interp_tok = fmode == "interp"

        @jax.jit
        def f_fused(raws):  # (batch, nwords) i32
            def pre(raw):
                enc = jops.native_to_i32(raw, ns, ch, bps).reshape(-1)
                enc = pk.xdelta_preprocess_pallas(
                    enc, interpret=interp_tok)
                if nr_planes < 4:
                    sh = jnp.int32(32 - 8 * nr_planes)
                    ok = jnp.all(jnp.right_shift(
                        jnp.left_shift(enc, sh), sh) == enc)
                else:
                    ok = jnp.bool_(True)
                return enc, ok

            encs, oks = jax.vmap(pre)(raws)
            encs = jax.lax.optimization_barrier(encs)
            tokw, bwords = pk.tokenize_planes_pallas(
                encs, nr_planes, plane_len, interpret=interp_tok)
            blocks = jax.lax.bitcast_convert_type(
                bwords, jnp.uint8).reshape(tokw.shape[0], -1)
            hist = jax_coder.hist_from_tokw(tokw)
            small = jnp.concatenate(
                [hist.reshape(batch, -1),
                 oks.astype(jnp.int32)[:, None]], axis=1)
            return small, blocks, (tokw, hist)

        return f_fused, lengths, tiled

    f_single, _ = _pass1_xdelta(ns, ch, bps, nr_planes, fmode=fmode)

    @jax.jit
    def f(raws):  # (batch, nbytes) u8
        small, blocks, toks = jax.vmap(f_single)(raws)
        nb = nr_planes * nb_per
        blocks = blocks.reshape(batch * nb, jax_coder.B)
        toks = tuple(t.reshape(batch * nb, -1) for t in toks)
        return small.reshape(batch, -1), blocks, toks

    return f, lengths, tiled


@functools.lru_cache(maxsize=64)
def _pass1_swizzle_means(ns: int, ch: int, bps: int):
    @jax.jit
    def f(raw):
        enc = jops.native_to_i32(raw, ns, ch, bps)
        hi, lo = jops.sum64_parts(enc)
        return enc, hi, lo

    return f


@functools.lru_cache(maxsize=64)
def _pass1_xdelta_tail(ns: int, ch: int, nr_planes: int, header: bool,
                       fmode: str = ""):
    """delta/offset/xor → planes → tokenize, from an int32 workspace
    already on device (the transform packers' tail)."""
    plane_len = ch * ns
    _, lengths = _block_layout(plane_len, nr_planes)
    if fmode:
        from ..ops import pallas_kernels as pk
        interp_tok = fmode == "interp"

        @jax.jit
        def f_fused(work):
            flat = work.reshape(-1)
            if header:  # dct path: delta chain (dct.cpp:117-119)
                flat = jops.xor_encode(jops.offset32(
                    jops.delta_encode(flat), -128))
            flat = jax.lax.optimization_barrier(flat)
            tokw, bwords = pk.tokenize_planes_pallas(
                flat, nr_planes, plane_len, interpret=interp_tok)
            blocks = jax.lax.bitcast_convert_type(
                bwords, jnp.uint8).reshape(tokw.shape[0], -1)
            hist = jax_coder.hist_from_tokw(tokw)
            return blocks, (tokw, hist)

        return f_fused, lengths

    @jax.jit
    def f(work):
        flat = work.reshape(-1)
        if header:  # dct path: delta chain applies (dct.cpp:117-119)
            flat = jops.xor_encode(jops.offset32(
                jops.delta_encode(flat), -128))
        planes = jops.plane_split(flat, nr_planes)
        return _blockify_tokenize(planes, plane_len, nr_planes, lengths)

    return f, lengths


# ---------------------------------------------------------------------------
# Pass 2 + assembly
# ---------------------------------------------------------------------------

def _entropy_streams(blocks_dev, toks, lengths_np, n_chunks: int,
                     encoder=None, hist_np=None, want_hints=False):
    """Host tables → pack dispatch → per-chunk hzr streams.

    The flat block batch is split into ``n_chunks`` equal chunk groups
    (byte planes for a single payload; payload×plane for a batch) and
    one complete hzr stream is assembled per chunk.

    want_hints: also build the encode-time aligned-decode sidecar
    (hzr/sidecar.py) — returns (streams, DecodeHints-or-None). The
    hints cover a decode_many over ALL n_chunks streams in order; only
    the single-process flat-pack path produces them (None otherwise),
    and a None result is always safe — decode just runs its fixpoint.
    """
    def ret(streams, hints=None):
        return (streams, hints) if want_hints else streams

    tokw = None
    if len(toks) == 2:     # fused pass-1 form: (token words, hist)
        tokw, hist = toks
        nb = tokw.shape[0]
    else:
        syms, extras, ebits, tvalid, hist = toks
        nb = syms.shape[0]
    nb_per = nb // n_chunks

    if encoder is not None:  # sharded path (multi-chip mesh)
        # flat exact-offset pack per shard when the batch allows it;
        # COPY-fallback batches use per-shard device compaction (only
        # live payload bytes cross the link either way)
        blocks_np = np.asarray(blocks_dev)
        res = None
        if hasattr(encoder, "encode_blocks_flat"):
            import os as _os2
            interp = (_os2.environ.get("RSPT_SHARD_FLAT_INTERP") == "1"
                      or (jax.default_backend() != "tpu"
                          and _os2.environ.get("RSPT_SHARD_FLAT") == "1"))
            use = jax.default_backend() == "tpu" or interp
            if use:
                res = encoder.encode_blocks_flat(blocks_np, lengths_np,
                                                 interpret=interp)
        if res is None:
            res = encoder.encode_blocks_compact(blocks_np, lengths_np)
        (_, tight, comp_len, copy_np, copy_len, total_bits, is_fill,
         fill_byte) = res
        hoff = np.concatenate(([0], np.cumsum(comp_len)[:-1]))
        cbase_arr = np.concatenate(([0], np.cumsum(copy_len)[:-1]))
        streams = []
        for k in range(n_chunks):
            s = slice(k * nb_per, (k + 1) * nb_per)
            streams.append(jax_coder.assemble_compact(
                lengths_np[s], tight[hoff[s.start]:], comp_len[s],
                copy_np[cbase_arr[s.start]:], copy_len[s],
                total_bits[s], is_fill[s], fill_byte[s]))
        return ret(streams)

    if hist_np is None:
        hist_np = np.asarray(hist)
    codes, cbits, desc_bytes, desc_bits, is_fill = \
        jax_coder.host_tables(hist_np, lengths_np)

    # flat-exact path: the host knows every block's exact payload size
    # from its histogram (host_layout), so the device packs straight
    # into the final stream layout — no per-block max-size buffers, no
    # compact_payloads pass, and the d2h is the finished payload bytes.
    mode, _plat = jax_coder._resolve_pack_mode(None)
    import os as _os
    if (tokw is not None and mode in ("pallas", "interp")
            and _os.environ.get("RSPT_FLAT_PACK", "1") != "0"):
        total_bits_h, comp_len, is_huff, any_copy = jax_coder.host_layout(
            hist_np, lengths_np, cbits, desc_bits, is_fill)
        total_payload = int(comp_len.sum())
        from ..ops.pallas_kernels import ACC_ROWS
        nrows_f = -(-(total_payload // 4 + 2) // 128) + ACC_ROWS
        nrows_f = -(-nrows_f // 8) * 8
        # COPY-fallback blocks (incompressible) keep the old path; the
        # flat buffer must also fit VMEM
        if not any_copy and nrows_f <= 12288:
            hoff = (np.cumsum(comp_len) - comp_len).astype(np.int64)
            bases, T, ng, g2b, gfirst = jax_coder.flat_compact_layout(
                hist_np, is_huff)
            t_rows = T // 128 + 512 + 24  # trash span + CT_ACC headroom
            splits = jax_coder.compact_split_plan(hist_np, is_huff)
            hplan = None
            entries = None
            if ng > 0 and (splits or t_rows <= 16384):
                # compacted flat pack: 3-4x fewer pack slots
                comb_np = ((codes.astype(np.uint32)
                            & np.uint32(0xFFFFFF))
                           | (cbits.astype(np.uint32)
                              << np.uint32(24))).view(np.int32)
                lut3 = np.zeros((ng, 3 * 128), np.int32)
                lut3[:, :comb_np.shape[1]] = comb_np[g2b]
                if want_hints:
                    from ..hzr import sidecar
                    hplan = sidecar.plan_hints(
                        lengths_np, comp_len, desc_bits, is_huff,
                        desc_bytes, g2b, gfirst, ng)
                res = jax_coder.pack_tokens_flat2(
                    tokw, jax.device_put(bases),
                    jax.device_put(lut3.reshape(ng, 3, 128)),
                    jax.device_put(desc_bits[g2b].astype(np.int32)),
                    jax.device_put(hoff[g2b].astype(np.int32)),
                    jax.device_put(gfirst),
                    t_rows=t_rows, T=T, nrows_f=nrows_f,
                    interpret=(mode == "interp"),
                    compact_splits=splits,
                    gmeta=(jax.device_put(hplan.gmeta)
                           if hplan is not None else None),
                    hint_rows=(hplan.hint_rows if hplan is not None
                               else 0))
                words, entries = res if hplan is not None else (res,
                                                                None)
            else:   # ng == 0: every block is FILL/dead — no payload
                words = jnp.zeros((nrows_f, 128), jnp.int32)
            tight = np.asarray(words).reshape(-1).view("<u4").view(
                np.uint8)[:total_payload].copy()
            for i in np.flatnonzero(comp_len):
                dlen = min(jax_coder.DESC_STRIDE, int(comp_len[i]))
                hi = int(hoff[i])
                tight[hi:hi + dlen] |= desc_bytes[i, :dlen]
            hints = None
            if hplan is not None:
                from ..hzr import sidecar
                hints = sidecar.finish_hints(hplan, entries, tight,
                                             hoff, comp_len)
            fill_byte = jax_coder.fill_bytes_from_hist(hist_np)
            copy_np = np.zeros(0, np.uint8)
            copy_len = np.zeros(len(comp_len), np.int64)
            streams = []
            for k in range(n_chunks):
                s = slice(k * nb_per, (k + 1) * nb_per)
                hbase = int(hoff[s.start]) if s.start < len(hoff) else 0
                streams.append(jax_coder.assemble_compact(
                    lengths_np[s], tight[hbase:], comp_len[s],
                    copy_np, copy_len[s], total_bits_h[s], is_fill[s],
                    fill_byte[s]))
            return ret(streams, hints)

    codes_d, cbits_d, dbits_d = jax.device_put((codes, cbits, desc_bits))
    if tokw is not None:
        packed_dev, total_bits_dev = jax_coder.pack_blocks_tokw(
            tokw, codes_d, cbits_d, dbits_d)
    else:
        packed_dev, total_bits_dev = jax_coder.pack_blocks(
            syms, extras, ebits, tvalid, codes_d, cbits_d, dbits_d)
    # device-side compaction: the host pulls only real payload bytes +
    # COPY-fallback blocks (no max-size buffers, no raw-block transfer;
    # FILL bytes are recovered from the histograms)
    data_d, meta_d = jax_coder.compact_payloads(
        packed_dev, blocks_dev, total_bits_dev,
        jax.device_put(lengths_np.astype(np.int32)),
        jax.device_put(is_fill))
    meta = np.asarray(meta_d)
    comp_len, copy_len, total_bits = np.split(meta, 3)
    tc, tcopy = int(comp_len.sum()), int(copy_len.sum())
    data = np.asarray(data_d[:tc + tcopy])
    tight = data[:tc]
    copy_np = data[tc:]
    # OR-merge the tree descriptions over each payload's leading bytes
    hoff = np.concatenate(([0], np.cumsum(comp_len)[:-1]))
    tight = tight.copy()
    for i in np.flatnonzero(comp_len):
        dlen = min(jax_coder.DESC_STRIDE, int(comp_len[i]))
        tight[hoff[i]:hoff[i] + dlen] |= desc_bytes[i, :dlen]
    fill_byte = jax_coder.fill_bytes_from_hist(hist_np)

    streams = []
    cbase_arr = np.concatenate(([0], np.cumsum(copy_len)[:-1]))
    for k in range(n_chunks):
        s = slice(k * nb_per, (k + 1) * nb_per)
        hbase = hoff[s.start] if s.start < len(hoff) else 0
        cbase = cbase_arr[s.start] if s.start < len(cbase_arr) else 0
        streams.append(jax_coder.assemble_compact(
            lengths_np[s],
            tight[hbase:], comp_len[s],
            copy_np[cbase:], copy_len[s],
            total_bits[s], is_fill[s], fill_byte[s]))
    return ret(streams)


def _entropy_streams_pipelined(toks, lengths_np, batch: int,
                               planes: int, hist_np, wave: int = 4):
    """Software-pipelined batch entropy stage (the serving e2e path).

    The sequential chain per batch is pass-1 → hist d2h → host Huffman
    tables → device pack → payload d2h → host assemble; host and
    device each idle during the other's phase. Splitting the batch
    into payload waves overlaps wave i's HOST table building with wave
    i-1's DEVICE pack and its async d2h (copy_to_host_async), so e2e
    cost per payload approaches max(host, device) instead of their
    sum. Each wave's streams are byte-identical to a per-wave
    _entropy_streams call (same tables, same flat layout).

    Returns the per-chunk stream list, or None when any wave leaves
    the flat-pack envelope (COPY fallback / VMEM caps) — the caller
    then takes the unpipelined path for the whole batch.
    """
    tokw, _hist = toks
    nb = tokw.shape[0]
    nbp = nb // batch                     # blocks per payload
    from ..ops.pallas_kernels import ACC_ROWS
    mode, _plat = jax_coder._resolve_pack_mode(None)
    if mode not in ("pallas", "interp"):
        return None

    def dispatch(p0, p1):
        """Host tables + layout + pack dispatch for payloads [p0,p1)."""
        r = slice(p0 * nbp, p1 * nbp)
        h = hist_np[r]
        ln = lengths_np[r]
        codes, cbits, desc_bytes, desc_bits, is_fill = \
            jax_coder.host_tables(h, ln)
        total_bits_h, comp_len, is_huff, any_copy = \
            jax_coder.host_layout(h, ln, cbits, desc_bits, is_fill)
        total_payload = int(comp_len.sum())
        nrows_f = -(-(total_payload // 4 + 2) // 128) + ACC_ROWS
        nrows_f = -(-nrows_f // 8) * 8
        if any_copy or nrows_f > 12288:
            return None
        hoff = (np.cumsum(comp_len) - comp_len).astype(np.int64)
        bases, T, ng, g2b, gfirst = jax_coder.flat_compact_layout(
            h, is_huff)
        t_rows = T // 128 + 512 + 24
        splits = jax_coder.compact_split_plan(h, is_huff)
        if ng == 0 or (not splits and t_rows > 16384):
            return None
        comb_np = ((codes.astype(np.uint32) & np.uint32(0xFFFFFF))
                   | (cbits.astype(np.uint32) << np.uint32(24))
                   ).view(np.int32)
        lut3 = np.zeros((ng, 3 * 128), np.int32)
        lut3[:, :comb_np.shape[1]] = comb_np[g2b]
        words = jax_coder.pack_tokens_flat2(
            tokw[r], jax.device_put(bases),
            jax.device_put(lut3.reshape(ng, 3, 128)),
            jax.device_put(desc_bits[g2b].astype(np.int32)),
            jax.device_put(hoff[g2b].astype(np.int32)),
            jax.device_put(gfirst),
            t_rows=t_rows, T=T, nrows_f=nrows_f,
            interpret=(mode == "interp"), compact_splits=splits)
        try:
            words.copy_to_host_async()
        except Exception:
            pass
        fill_byte = jax_coder.fill_bytes_from_hist(h)
        return (words, total_payload, hoff, comp_len, desc_bytes,
                total_bits_h, is_fill, fill_byte, ln, p1 - p0)

    def finish(st):
        (words, total_payload, hoff, comp_len, desc_bytes,
         total_bits_h, is_fill, fill_byte, ln, npay) = st
        tight = np.asarray(words).reshape(-1).view("<u4").view(
            np.uint8)[:total_payload].copy()
        for i in np.flatnonzero(comp_len):
            dlen = min(jax_coder.DESC_STRIDE, int(comp_len[i]))
            hi = int(hoff[i])
            tight[hi:hi + dlen] |= desc_bytes[i, :dlen]
        copy_np = np.zeros(0, np.uint8)
        copy_len = np.zeros(len(comp_len), np.int64)
        streams = []
        n_chunks = npay * planes
        nb_per = len(comp_len) // n_chunks
        for k in range(n_chunks):
            s = slice(k * nb_per, (k + 1) * nb_per)
            hbase = int(hoff[s.start]) if s.start < len(hoff) else 0
            streams.append(jax_coder.assemble_compact(
                ln[s], tight[hbase:], comp_len[s], copy_np,
                copy_len[s], total_bits_h[s], is_fill[s],
                fill_byte[s]))
        return streams

    waves = [(w, min(w + wave, batch)) for w in range(0, batch, wave)]
    staged = []
    streams_all = []
    for p0, p1 in waves:
        st = dispatch(p0, p1)
        if st is None:
            return None  # caller reruns the whole batch unpipelined
        staged.append(st)
        if len(staged) > 1:
            streams_all.extend(finish(staged.pop(0)))
    while staged:
        streams_all.extend(finish(staged.pop(0)))
    return streams_all


def _container(method: int, header: bytes, streams) -> bytes:
    parts = [bytes([method]), header]
    for stream in streams:
        parts.append(len(stream).to_bytes(4, "little"))
        parts.append(stream)
    return b"".join(parts)


def _entropy_finish(blocks_dev, toks, lengths_np, nr_planes: int,
                    method: int, header: bytes, encoder=None,
                    hist_np=None, want_hints: bool = False):
    if want_hints:
        streams, hints = _entropy_streams(
            blocks_dev, toks, lengths_np, nr_planes, encoder, hist_np,
            want_hints=True)
        return _container(method, header, streams), hints
    return _container(method, header, _entropy_streams(
        blocks_dev, toks, lengths_np, nr_planes, encoder, hist_np))


def _as_u8(src):
    return np.frombuffer(memoryview(src).cast("B"), np.uint8) \
        if not isinstance(src, np.ndarray) else src.reshape(-1)


def _as_words(src, bps: int):
    """Host-side input view for the device transfer: '<i4' words when
    they alias the samples exactly (bps=4), so native_to_i32 on device
    is a pure reshape+transpose — device byte assembly from u8 measured
    0.46-1.75 ms/1.64 MB on chip. Other bps keep the u8 byte view."""
    flat = _as_u8(src)
    if bps == 4 and flat.dtype == np.uint8 and flat.nbytes % 4 == 0:
        return flat.view("<i4")
    return flat


class _TpuPackerBase:
    def __init__(self, bytes_per_sample: int, nr_channels: int,
                 nr_samples: int, encoder=None, device_decode: bool = False):
        _warn_non_tpu_backend()
        self.cfg = PackerConfig(bytes_per_sample, nr_channels, nr_samples)
        # encoder: object with .encode_blocks(blocks, lengths) — e.g.
        # parallel.mesh.ShardedHzrEncoder for a multi-chip mesh.
        self._encoder = encoder
        # device_decode: entropy-decode on the accelerator via the
        # segment-parallel speculative decoder (hzr/jax_decoder.py)
        # instead of the host native runtime.
        self.device_decode = device_decode

    def _decode_container(self, comp, nr_planes: int, header_size: int
                          ) -> Tuple[int, bytes, jnp.ndarray, int]:
        """Entropy decode → plane merge on device. Default: host native
        C++ (block-parallel MT); device_decode=True runs the
        segment-parallel speculative decoder on the accelerator."""
        c = self.cfg
        if self.device_decode:
            import os as _os
            mode = _os.environ.get("RSPT_DECODER", "")
            if mode == "pallas" or (not mode
                                    and jax.default_backend() == "tpu"):
                from ..hzr import pallas_decoder as jax_decoder
            elif mode == "interp":
                from ..hzr import pallas_decoder
                jax_decoder = type("m", (), {
                    "decode_many": staticmethod(
                        lambda s: pallas_decoder.decode_many(
                            s, interpret=True))})
            else:
                from ..hzr import jax_decoder
            src = memoryview(bytes(comp)
                             if not isinstance(comp, (bytes, bytearray))
                             else comp)
            method = src[0]
            header = bytes(src[1:1 + header_size])
            pos = 1 + header_size
            streams = []
            for k in range(nr_planes):
                clen = int.from_bytes(src[pos:pos + 4], "little")
                pos += 4
                streams.append(bytes(src[pos:pos + clen]))
                pos += clen
            # all planes' blocks share ONE device-decoder lane batch
            decoded = jax_decoder.decode_many(streams)
            planes = np.stack([
                np.frombuffer(d, np.uint8, count=c.plane_len)
                for d in decoded])
            merged = jops.plane_merge(jnp.asarray(planes))
            return method, header, merged, pos
        if _HAVE_NATIVE:
            buf = np.frombuffer(memoryview(bytes(comp))
                                if not isinstance(comp, (bytes, bytearray))
                                else memoryview(comp), np.uint8)
            method = int(buf[0])
            header = buf[1:1 + header_size].tobytes()
            planes, consumed = native.decode_planes_blocks_mt(
                buf[1 + header_size:], nr_planes, c.plane_len)
            merged = jops.plane_merge(jnp.asarray(planes))
            return method, header, merged, 1 + header_size + consumed
        method, header, merged, consumed = container.decompress_i32(
            comp, nr_planes, c.plane_len, header_size, hzr_py.decode)
        return method, header, jnp.asarray(merged), consumed


class TpuHzrPacker(_TpuPackerBase):
    """Lossless 4-plane packer (signal_packer_hzr.cpp:39-65)."""

    NR_PLANES = 4
    METHOD = 0

    def compress(self, src) -> bytes:
        c = self.cfg
        f, lengths = _pass1_hzr(c.nr_samples, c.nr_channels,
                                c.bytes_per_sample, self.NR_PLANES,
                                _fused_pass1_mode())
        blocks, toks = f(jnp.asarray(_as_words(src, c.bytes_per_sample)))
        return _entropy_finish(blocks, toks, lengths, self.NR_PLANES,
                               self.METHOD, b"", self._encoder)

    def decompress(self, comp) -> Tuple[bytes, int]:
        c = self.cfg
        method, _, merged, consumed = self._decode_container(
            comp, self.NR_PLANES, 0)
        if method != self.METHOD:
            raise ValueError("unsupported compression method")
        out = jops.i32_to_native(merged.reshape(c.nr_channels, c.nr_samples),
                                 c.bytes_per_sample)
        return np.asarray(out).tobytes(), consumed


class TpuXdeltaHzrPacker(_TpuPackerBase):
    """Lossless delta→offset→xor packer with verify-and-grow
    (signal_packer_xdelta_hzr.cpp:34-88)."""

    METHOD = 0

    def __init__(self, bytes_per_sample, nr_channels, nr_samples,
                 nr_bytes_to_encode: int, use_pallas: bool = False, **kw):
        super().__init__(bytes_per_sample, nr_channels, nr_samples, **kw)
        self.nr_planes = int(nr_bytes_to_encode)
        self.use_pallas = use_pallas

    def compress(self, src) -> bytes:
        c = self.cfg
        raw = jnp.asarray(_as_words(src, c.bytes_per_sample))
        while True:
            f, lengths = _pass1_xdelta(c.nr_samples, c.nr_channels,
                                       c.bytes_per_sample, self.nr_planes,
                                       self.use_pallas,
                                       _fused_pass1_mode())
            small, blocks, toks = f(raw)
            small_np = np.asarray(small)  # hist + verify flag, one d2h
            if bool(small_np[-1]):
                break
            log.info("xdelta_hzr: growing plane count to %d",
                     self.nr_planes + 1)
            self.nr_planes += 1
        hist_np = small_np[:-1].reshape(-1, jax_coder.NUM_SYMBOLS)
        return _entropy_finish(blocks, toks, lengths, self.nr_planes,
                               self.METHOD, b"", self._encoder,
                               hist_np=hist_np)

    def compress_with_hints(self, src):
        """compress() plus the encode-time aligned-decode sidecar:
        returns (container, DecodeHints-or-None). The container bytes
        are identical to compress(); the hints feed
        decompress_many([container], hints=...), whose first decode
        then runs one trusted kernel sweep instead of the alignment
        fixpoint (hzr/sidecar.py). A None sidecar (non-flat pack path,
        all-host routing) simply means the decode runs unhinted."""
        c = self.cfg
        raw = jnp.asarray(_as_words(src, c.bytes_per_sample))
        while True:
            f, lengths = _pass1_xdelta(c.nr_samples, c.nr_channels,
                                       c.bytes_per_sample, self.nr_planes,
                                       self.use_pallas,
                                       _fused_pass1_mode())
            small, blocks, toks = f(raw)
            small_np = np.asarray(small)
            if bool(small_np[-1]):
                break
            log.info("xdelta_hzr: growing plane count to %d",
                     self.nr_planes + 1)
            self.nr_planes += 1
        hist_np = small_np[:-1].reshape(-1, jax_coder.NUM_SYMBOLS)
        return _entropy_finish(blocks, toks, lengths, self.nr_planes,
                               self.METHOD, b"", self._encoder,
                               hist_np=hist_np, want_hints=True)

    def compress_many(self, srcs) -> list:
        """Batched serving path: compress many same-shape payloads in
        two device dispatches total — the fixed link costs amortize over
        the batch. Each payload's scan chains are independent (vmap),
        so the streams equal per-payload compress() output, INCLUDING
        verify-and-grow: the plane count grows per payload exactly as a
        sequential run of compress() calls would grow it
        (signal_packer_xdelta_hzr.cpp:59-71 — the grown count persists
        into subsequent payloads, so payload i encodes at
        max(count reached before it, its own minimal fitting count)).
        """
        c = self.cfg
        batch = len(srcs)
        if batch == 0:
            return []
        raws = jnp.asarray(np.stack(
            [_as_words(s, c.bytes_per_sample) for s in srcs]))
        # probe plane counts upward until every payload fits; keep each
        # level's device outputs (growth is rare — the common case is
        # one pass)
        levels = {}
        minfit = np.full(batch, -1, np.int64)
        p = self.nr_planes
        while True:
            f, lengths, tiled = _pass1_xdelta_batch(
                c.nr_samples, c.nr_channels, c.bytes_per_sample, p, batch)
            small, blocks, toks = f(raws)
            small_np = np.asarray(small)  # (batch, nb*261 + 1)
            levels[p] = (small_np, blocks, toks, lengths, tiled)
            ok = small_np[:, -1].astype(bool)
            minfit[(minfit < 0) & ok] = p
            if (minfit >= 0).all() or p >= 4:
                minfit[minfit < 0] = p  # 4 planes always fit (int32)
                break
            log.info("xdelta_hzr: growing plane count to %d", p + 1)
            p += 1
        # sequential-call semantics: the plane count only ever grows
        plane_of = np.maximum.accumulate(minfit)
        self.nr_planes = int(plane_of[-1])

        containers = [None] * batch
        for lvl in sorted(set(plane_of.tolist())):
            idx = np.flatnonzero(plane_of == lvl)
            small_np, blocks, toks, lengths, tiled = levels[lvl]
            nb = lengths.shape[0]  # blocks per payload at this level
            if idx.size == batch:  # fast path: one level for everyone
                sub_blocks, sub_toks = blocks, toks
                sub_tiled = tiled
                sub_hist = small_np[:, :-1].reshape(
                    -1, jax_coder.NUM_SYMBOLS)
            else:
                rows = (idx[:, None] * nb + np.arange(nb)).reshape(-1)
                rows_d = jnp.asarray(rows)
                sub_blocks = jnp.take(blocks, rows_d, axis=0)
                sub_toks = tuple(jnp.take(t, rows_d, axis=0)
                                 for t in toks)
                sub_tiled = np.tile(lengths, idx.size)
                sub_hist = small_np[idx, :-1].reshape(
                    -1, jax_coder.NUM_SYMBOLS)
            streams = None
            if (idx.size == batch and idx.size > 4
                    and self._encoder is None and len(toks) == 2):
                # pipelined waves: wave i's host Huffman tables overlap
                # wave i-1's device pack + async d2h
                streams = _entropy_streams_pipelined(
                    sub_toks, sub_tiled, idx.size, lvl, sub_hist)
            if streams is None:
                streams = _entropy_streams(sub_blocks, sub_toks,
                                           sub_tiled, idx.size * lvl,
                                           self._encoder,
                                           hist_np=sub_hist)
            for j, b in enumerate(idx):
                containers[int(b)] = _container(
                    self.METHOD, b"", streams[j * lvl:(j + 1) * lvl])
        return containers

    @staticmethod
    @jax.jit
    def _postprocess_flat(merged):
        enc = jops.xor_decode(merged)
        enc = jops.offset32(enc, 128)
        return jops.delta_decode(enc)

    def decompress(self, comp) -> Tuple[bytes, int]:
        c = self.cfg
        method, _, merged, consumed = self._decode_container(
            comp, self.nr_planes, 0)
        if method != self.METHOD:
            raise ValueError("unsupported compression method")
        flat = self._postprocess_flat(merged)
        out = jops.i32_to_native(flat.reshape(c.nr_channels, c.nr_samples),
                                 c.bytes_per_sample)
        return np.asarray(out).tobytes(), consumed

    def decompress_many(self, comps, hints=None,
                        return_hints: bool = False):
        """Batched serving decode (packers/native.py decompress_many
        API parity): with device_decode, EVERY payload's plane streams
        share one device-decoder lane batch; otherwise the host MT path
        runs per payload (it already saturates the cores).

        hints/return_hints (device_decode only): aligned-decode hints —
        a first decode returns the converged alignment entries for this
        stream set; passing them to later decodes of the SAME streams
        skips the speculative fixpoint sweeps entirely."""
        c = self.cfg
        if not comps:
            return []
        if not self.device_decode:
            outs_ = [self.decompress(cp)[0] for cp in comps]
            return (outs_, None) if return_hints else outs_
        import os as _os
        mode = _os.environ.get("RSPT_DECODER", "")
        if mode == "pallas" or (not mode
                                and jax.default_backend() == "tpu"):
            from ..hzr import pallas_decoder
            decode_many = functools.partial(pallas_decoder.decode_many,
                                            hints=hints,
                                            return_hints=return_hints)
        elif mode == "interp":
            from ..hzr import pallas_decoder
            decode_many = functools.partial(pallas_decoder.decode_many,
                                            interpret=True, hints=hints,
                                            return_hints=return_hints)
        else:
            from ..hzr import jax_decoder
            decode_many = jax_decoder.decode_many
            return_hints = False
        streams = []
        for comp in comps:
            src = memoryview(bytes(comp)
                             if not isinstance(comp, (bytes, bytearray))
                             else comp)
            if src[0] != self.METHOD:
                raise ValueError("unsupported compression method")
            pos = 1
            for _ in range(self.nr_planes):
                clen = int.from_bytes(src[pos:pos + 4], "little")
                pos += 4
                streams.append(bytes(src[pos:pos + clen]))
                pos += clen
        decoded = decode_many(streams)
        out_hints = None
        if return_hints and isinstance(decoded, tuple):
            decoded, out_hints = decoded
        outs = []
        for i in range(len(comps)):
            planes = np.stack([
                np.frombuffer(decoded[i * self.nr_planes + k], np.uint8,
                              count=c.plane_len)
                for k in range(self.nr_planes)])
            merged = jops.plane_merge(jnp.asarray(planes))
            flat = self._postprocess_flat(merged)
            out = jops.i32_to_native(
                flat.reshape(c.nr_channels, c.nr_samples),
                c.bytes_per_sample)
            outs.append(np.asarray(out).tobytes())
        return (outs, out_hints) if return_hints else outs


class TpuDctPacker(_TpuPackerBase):
    """Lossy DCT packer (signal_packer_dct.cpp:36-156).

    Transform parity note: the reference accumulates serially in C
    double; its exact value depends on the binary64 rounding of every
    partial sum, which non-f64 hardware cannot replicate. Default
    (``device_transform=False``) runs the transform on the host native
    serial kernel — bit-identical output. ``device_transform=True``
    uses the df32 MXU/VPU kernels (jax_ops.dct_*_exact): forward has a
    128× truncation margin (no observed deviations), inverse can differ
    by ±1 on ~0.3‰ of samples."""

    METHOD = 1
    NR_PLANES = 2
    QUALITY = 128.0

    def __init__(self, bytes_per_sample, nr_channels, nr_samples,
                 device_transform: bool = False, **kw):
        super().__init__(bytes_per_sample, nr_channels, nr_samples, **kw)
        self.device_transform = device_transform
        if not device_transform:
            self._cos = nops.dct_cos_table(nr_samples)
            self._cs = nops.dct_cs(nr_samples)
            self._fwd = native.dct_forward if _HAVE_NATIVE \
                else nops.dct_forward
            self._inv = native.dct_inverse if _HAVE_NATIVE \
                else nops.dct_inverse

    def _dct_fwd(self, enc):
        if self.device_transform:
            return jops.dct_forward_exact(enc, self.QUALITY)
        host = np.asarray(enc)
        return jnp.asarray(np.stack([
            self._fwd(host[j], self._cos, self._cs, self.QUALITY)
            for j in range(host.shape[0])]))

    def _dct_inv(self, dct):
        if self.device_transform:
            return jops.dct_inverse_exact(dct, self.QUALITY)
        host = np.asarray(dct)
        return jnp.asarray(np.stack([
            self._inv(host[j], self._cos, self._cs, self.QUALITY)
            for j in range(host.shape[0])]))

    def compress(self, src) -> bytes:
        c = self.cfg
        enc, hi, lo = _pass1_swizzle_means(
            c.nr_samples, c.nr_channels, c.bytes_per_sample)(
                jnp.asarray(_as_words(src, c.bytes_per_sample)))
        means = jops.average32_host(np.asarray(hi), np.asarray(lo),
                                    c.nr_samples)
        dct = self._dct_fwd(enc - jnp.asarray(means)[:, None])
        f, lengths = _pass1_xdelta_tail(c.nr_samples, c.nr_channels,
                                        self.NR_PLANES, True,
                                        _fused_pass1_mode())
        blocks, toks = f(dct)
        return _entropy_finish(blocks, toks, lengths, self.NR_PLANES,
                               self.METHOD, _means_header(means),
                               self._encoder)

    def decompress(self, comp) -> Tuple[bytes, int]:
        c = self.cfg
        method, header, merged, consumed = self._decode_container(
            comp, self.NR_PLANES, c.nr_channels * 3)
        if method != self.METHOD:
            raise ValueError("unsupported compression method")
        flat = jops.delta_decode(jops.offset32(jops.xor_decode(merged), 128))
        rec = self._dct_inv(flat.reshape(c.nr_channels, c.nr_samples))
        means = _means_from_header(header, c.nr_channels)
        rec = rec + jnp.asarray(means)[:, None]
        out = jops.i32_to_native(rec.astype(jnp.int32), c.bytes_per_sample)
        return np.asarray(out).tobytes(), consumed


@functools.lru_cache(maxsize=64)
def _hadamard_transform_jit(ns: int, quality: float, use_pallas: bool):
    if use_pallas:
        from ..ops.pallas_kernels import fwht_pallas
        interp = jax.default_backend() != "tpu"  # interpret off-TPU

        @jax.jit
        def f(enc, means):
            centered = enc - means[:, None]
            return jops.fwht_normalize_pow2(
                fwht_pallas(centered, interpret=interp), ns, quality)
        return f

    @jax.jit
    def f(enc, means):
        centered = enc - means[:, None]
        return jops.fwht_normalize_pow2(jops.fwht(centered), ns, quality)
    return f


class TpuHadamardPacker(_TpuPackerBase):
    """Lossy FWHT packer (signal_packer_hadamard.cpp:35-107); int32
    butterflies, integer-exact /n quantization. n must be 2^k.

    The VMEM-resident Pallas butterfly kernel
    (ops/pallas_kernels.fwht_pallas) replaces the XLA reshape
    butterflies by default on TPU — int32-exact on chip (verified vs
    the serial reference, tools/check_lossy_chip.py) and at least as
    fast (one HBM read+write per element instead of one per stage).
    Off-TPU the XLA formulation runs (the Pallas interpreter is
    test-only)."""

    METHOD = 2
    NR_PLANES = 3
    QUALITY = 1.0

    def __init__(self, *a, use_pallas: bool = None, **kw):
        super().__init__(*a, **kw)
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = use_pallas

    def compress(self, src) -> bytes:
        c = self.cfg
        enc, hi, lo = _pass1_swizzle_means(
            c.nr_samples, c.nr_channels, c.bytes_per_sample)(
                jnp.asarray(_as_words(src, c.bytes_per_sample)))
        means = jops.average32_host(np.asarray(hi), np.asarray(lo),
                                    c.nr_samples)
        had = _hadamard_transform_jit(c.nr_samples, self.QUALITY,
                                      self.use_pallas)(
            enc, jnp.asarray(means))
        f, lengths = _pass1_xdelta_tail(c.nr_samples, c.nr_channels,
                                        self.NR_PLANES, False,
                                        _fused_pass1_mode())
        blocks, toks = f(had)
        return _entropy_finish(blocks, toks, lengths, self.NR_PLANES,
                               self.METHOD, _means_header(means),
                               self._encoder)

    def decompress(self, comp) -> Tuple[bytes, int]:
        c = self.cfg
        method, header, merged, consumed = self._decode_container(
            comp, self.NR_PLANES, c.nr_channels * 3)
        if method != self.METHOD:
            raise ValueError("unsupported compression method")
        had = merged.reshape(c.nr_channels, c.nr_samples)
        rec = jops.fwht_normalize2_int(jops.fwht(had), self.QUALITY)
        means = _means_from_header(header, c.nr_channels)
        rec = rec + jnp.asarray(means)[:, None]
        out = jops.i32_to_native(rec.astype(jnp.int32), c.bytes_per_sample)
        return np.asarray(out).tobytes(), consumed


# Factory API mirroring i_signal_packer (signal_packer.h:59-72).

def new_hzr(bps, ch, n, **kw):
    return TpuHzrPacker(bps, ch, n, **kw)


def new_xdelta_hzr(bps, ch, n, nr_bytes_to_encode, **kw):
    return TpuXdeltaHzrPacker(bps, ch, n, nr_bytes_to_encode, **kw)


def new_dct(bps, ch, n, **kw):
    return TpuDctPacker(bps, ch, n, **kw)


def new_hadamard(bps, ch, n, **kw):
    return TpuHadamardPacker(bps, ch, n, **kw)
