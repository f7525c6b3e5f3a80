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
GSIZE = 8      # chunks merged per super-window (span ≤ 8*112+127 words)
R_CW = 64      # chunk rows per window-build grid step


def _tri128():
    """(128,128) lower-triangular-inclusive ones, bf16 (L[j,w]=1 iff
    j<=w): right-multiplying computes an inclusive 128-lane prefix."""
    j = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    w = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    return (j <= w).astype(jnp.bfloat16)


def _mxu_iprefix32(c, tri):
    """Inclusive 128-lane prefix sum of an int32 plane, wraparound-
    exact, via 4 byte-quarter MXU dots: u8 quarters are exact in bf16
    (<=255 needs 8 significand bits) and each f32 accumulation stays
    below 2^24 (<=255*128), so quarter reassembly reproduces the int32
    sum mod 2^32. Replaces the 7-step roll doubling scan — the rolls,
    not the adds, dominated the windows kernels."""
    u = pltpu.bitcast(c, jnp.uint32)
    acc = None
    for k in range(4):
        q = pltpu.bitcast((u >> jnp.uint32(8 * k)) & jnp.uint32(255),
                          jnp.int32)
        s = jax.lax.dot_general(q.astype(jnp.bfloat16), tri,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        si = s.astype(jnp.int32) << (8 * k)
        acc = si if acc is None else acc + si
    return acc


def _chunk_windows1_kernel(local_ref, c0_ref, c1_ref, dense_ref):
    """Single-gather chunk_windows: one MXU prefix + one gather per
    contribution plane. c0 is each entry's contribution to its own
    word, c1 the spill into the NEXT word (zero when the field fits —
    8-bit at byte offsets never spills; merged multi-byte placements
    do). All 128 lanes may be live (K=128 keeps the chunk reshape a
    pure reshape — a 127-wide chunking relayouts the whole stream at a
    prime stride): the explicit loc[127] test extends the 7-step
    search to cnt=128, and the INCLUSIVE prefix gathered at cnt-1
    represents "all". The c1 plane reuses the same search counts (the
    spill of entries at word w-1 lands at w)."""
    loc = local_ref[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, loc.shape, 1)
    tri = _tri128()
    incl = _mxu_iprefix32(c0_ref[0], tri)
    incl1 = _mxu_iprefix32(c1_ref[0], tri)
    l127 = loc[:, 127:128]

    def search(target):
        cnt = jnp.zeros(loc.shape, jnp.int32)
        for b in (64, 32, 16, 8, 4, 2, 1):
            t = cnt + b
            vb = jnp.take_along_axis(loc, t - 1, axis=1)
            cnt = jnp.where(vb <= target, t, cnt)
        return jnp.where(l127 <= target, 128, cnt)

    def gsum(incl_, cnt):
        g = jnp.take_along_axis(incl_, jnp.clip(cnt - 1, 0, 127),
                                axis=1)
        return jnp.where(cnt == 0, 0, g)

    cnt0 = search(lane)
    g0 = gsum(incl, cnt0)
    g1 = gsum(incl1, cnt0)
    d1 = g1 - jnp.where(lane < 1, 0, pltpu.roll(g1, 1, 1))
    dense_ref[0] = (g0 - jnp.where(lane < 1, 0, pltpu.roll(g0, 1, 1))
                    + jnp.where(lane < 1, 0, pltpu.roll(d1, 1, 1)))


@functools.partial(jax.jit, static_argnames=("interpret",))
def chunk_windows1_pallas(local, c0, c1=None, interpret: bool = False):
    """chunk_windows_pallas for <=2-word fields (c1 spills to word+1)."""
    nb, nc, _ = local.shape
    if c1 is None:
        c1 = jnp.zeros_like(c0)
    spec = pl.BlockSpec((1, R_CW, 128), lambda b, g: (b, g, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _chunk_windows1_kernel,
        out_shape=jax.ShapeDtypeStruct((nb, nc, 128), jnp.int32),
        grid=(nb, nc // R_CW),
        in_specs=[spec] * 3,
        out_specs=spec,
        interpret=interpret,
    )(local, c0, c1)


def _chunk_windows2_kernel(local_ref, c0_ref, c1_ref, d0_ref, d1_ref):
    """Two-row variant of _chunk_windows1_kernel: dense window rows
    for words 0..127 and 128..255 past the chunk base (span <= 254
    words), for fields whose 128 entries can straddle long gaps — the
    decoder's literal placement across zero runs. The c1 plane carries
    next-word spills (merged multi-byte placements)."""
    loc = local_ref[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, loc.shape, 1)
    tri = _tri128()
    incl = _mxu_iprefix32(c0_ref[0], tri)
    incl1 = _mxu_iprefix32(c1_ref[0], tri)
    l127 = loc[:, 127:128]

    def search(target):
        cnt = jnp.zeros(loc.shape, jnp.int32)
        for b in (64, 32, 16, 8, 4, 2, 1):
            t = cnt + b
            vb = jnp.take_along_axis(loc, t - 1, axis=1)
            cnt = jnp.where(vb <= target, t, cnt)
        return jnp.where(l127 <= target, 128, cnt)

    def gsum(incl_, cnt):
        g = jnp.take_along_axis(incl_, jnp.clip(cnt - 1, 0, 127),
                                axis=1)
        return jnp.where(cnt == 0, 0, g)

    cl = search(lane)
    ch = search(lane + 128)
    g0l = gsum(incl, cl)
    g0h = gsum(incl, ch)
    g1l = gsum(incl1, cl)
    g1h = gsum(incl1, ch)
    # per-word sums of each plane (diff of gathered prefixes), then
    # the spill plane shifts one word right (crossing the row split:
    # word 128's spill comes from word 127)
    s1l = g1l - jnp.where(lane < 1, 0, pltpu.roll(g1l, 1, 1))
    s1h = g1h - jnp.where(lane < 1, pltpu.roll(g1l, 1, 1),
                          pltpu.roll(g1h, 1, 1))
    d0_ref[0] = (g0l - jnp.where(lane < 1, 0, pltpu.roll(g0l, 1, 1))
                 + jnp.where(lane < 1, 0, pltpu.roll(s1l, 1, 1)))
    d1_ref[0] = (g0h - jnp.where(lane < 1, pltpu.roll(g0l, 1, 1),
                                 pltpu.roll(g0h, 1, 1))
                 + jnp.where(lane < 1,
                             jnp.broadcast_to(s1l[:, 127:128],
                                              s1l.shape),
                             pltpu.roll(s1h, 1, 1)))


@functools.partial(jax.jit, static_argnames=("interpret",))
def chunk_windows2_pallas(local, c0, c1=None, interpret: bool = False):
    """chunk_windows1 with a 2-row (256-word) window per chunk."""
    nb, nc, _ = local.shape
    if c1 is None:
        c1 = jnp.zeros_like(c0)
    spec = pl.BlockSpec((1, R_CW, 128), lambda b, g: (b, g, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _chunk_windows2_kernel,
        out_shape=(jax.ShapeDtypeStruct((nb, nc, 128), jnp.int32),
                   jax.ShapeDtypeStruct((nb, nc, 128), jnp.int32)),
        grid=(nb, nc // R_CW),
        in_specs=[spec] * 3,
        out_specs=(spec, spec),
        interpret=interpret,
    )(local, c0, c1)


def _merge_place_kernel(dense_ref, dw_ref, gbase_ref, glive_ref,
                        out_ref):
    """Sequential placement of GSIZE-chunk super-windows.

    Each group merges its 8 chunk windows in registers — a vectorized
    per-row barrel rotate by the within-group word offsets, then a
    static row expansion into a (16,128) super-window — and the super
    is rotated once by the group's global lane offset and added into a
    16-row output span. 8× fewer serial iterations than per-chunk
    placement (the old loop was iteration-overhead-bound). Windows of
    adjacent groups share only boundary words, so in-order
    read-add-write is exact."""
    out_ref[...] = jnp.zeros(out_ref.shape, jnp.int32)
    ngroups = gbase_ref.shape[1]
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (GSIZE, 128), 1)
    lane16 = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 1)
    row16 = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 0)

    def body(g, _):
        lv = glive_ref[0, pl.ds(g, 1), 0:1][0, 0]

        @pl.when(lv != 0)
        def _():
            tile = dense_ref[0, pl.ds(g * GSIZE, GSIZE), :]
            d = dw_ref[0, pl.ds(g * GSIZE, GSIZE), 0:1]  # (8,1)
            s = d & 127
            rot = tile
            for k in (1, 2, 4, 8, 16, 32, 64):
                rot = jnp.where((s & k) != 0, pltpu.roll(rot, k, 1),
                                rot)
            lo = jnp.where(lane8 >= s, rot, 0)
            hi = jnp.where(lane8 < s, rot, 0)
            acc = jnp.zeros((16, 128), jnp.int32)
            for c in range(GSIZE):
                rc = dw_ref[0, pl.ds(g * GSIZE + c, 1), 0:1][0, 0] >> 7
                lo_c = jnp.broadcast_to(lo[c:c + 1, :], (16, 128))
                hi_c = jnp.broadcast_to(hi[c:c + 1, :], (16, 128))
                acc = (acc + jnp.where(row16 == rc, lo_c, 0)
                       + jnp.where(row16 == rc + 1, hi_c, 0))
            b = gbase_ref[0, pl.ds(g, 1), 0:1][0, 0]
            row0 = b >> 7
            sb = b & 127
            rs = pltpu.roll(acc, sb, 1)
            los = jnp.where(lane16 >= sb, rs, 0)
            his = jnp.where(lane16 < sb, rs, 0)
            # super content spans rows 0..8 (d <= 1023 ⇒ chunk rows
            # <= 7, +1 wrap), so the row-15→0 wrap of this roll only
            # ever moves zeros
            out_ref[0, pl.ds(row0, 16), :] += los + pltpu.roll(his, 1, 0)

        return 0

    jax.lax.fori_loop(0, ngroups, body, 0)


@functools.partial(jax.jit, static_argnames=("nrows", "interpret"))
def merge_place_pallas(dense, dwords, gbase, glive, nrows: int,
                       interpret: bool = False):
    """Place per-chunk dense windows into per-block word arrays.

    dense: (nb, nchunks_p, 128); dwords: (nb, nchunks_p, 1) word
    offsets within the chunk's group (∈[0,1023]); gbase:
    (nb, ngroups, 1) global word base per group, pre-clamped to
    nrows*128-2048; glive: (nb, ngroups, 1) int32 group liveness.
    Returns (nb, nrows, 128) int32 words.
    """
    nb, nc, _ = dense.shape
    ng = nc // GSIZE
    return pl.pallas_call(
        _merge_place_kernel,
        out_shape=jax.ShapeDtypeStruct((nb, nrows, 128), jnp.int32),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, nc, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nc, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ng, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ng, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nrows, 128), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(dense, dwords, gbase, glive)


R_TV = 64           # sublane rows per token-windows group
GROUP_TOK = R_TV * 128  # tokens per group (group-local bit prefixes)
SUP_CHUNKS = 32   # chunks merged per super-window placement
ACC_ROWS = 48     # super accumulator rows (real span ≤ 41, rest slack)
# Real-data bounds: a token is ≤ 37 bits (Huffman depth ≤ 23 by the
# Fibonacci bound on ≤64Ki counts, + ≤14 extra bits), so a chunk spans
# ≤ ceil(128*37/32)+2 = 150 words (2 window rows) and a super's last
# chunk starts ≤ 31*148 = 4588 words in (rc ≤ 37). Garbage offsets
# (COPY-fallback blocks) are clamped to rc ≤ 39 so every roll/slice
# below stays in bounds; their output is never read.
D_CLAMP = 40 * 128 - 1


def _token_windows_kernel(syms_ref, extras_ref, ebits_ref, tvalid_ref,
                          lut_ref, w0_ref, w1_ref, cbase_ref, clive_ref,
                          gtot_ref):
    """Tokens → per-chunk dense bit windows for one 8192-token group,
    entirely in registers (pack pass 2, stage 1 of 2).

    Fuses the old token_values_pallas + XLA glue + chunk_windows_pallas
    chain: Huffman LUT lookup, GROUP-LOCAL exclusive bit prefix,
    word-aligned contribution split, and the prefix-sum/binary-search
    window build — with no HBM round-trip for any intermediate. Bit
    offsets are group-local (the description offset and the cross-group
    scan are applied later: the whole group span is bit-rotated by
    group_base&31 during placement), so this single pass replaces the
    old two passes over the token arrays.

    Grid (nb, ng); chunk = one (1,128) lane row; window = 2 rows of 128
    words (chunk span ≤ 150 < 256). Outputs per chunk row: w0/w1 window
    rows, base word, liveness; per group: total bits.
    """
    _windows_core(syms_ref[0, 0], extras_ref[0, 0], ebits_ref[0, 0],
                  tvalid_ref[0, 0], lut_ref, w0_ref, w1_ref, cbase_ref,
                  clive_ref, gtot_ref)


def _tokw_windows_kernel(tokw_ref, lut_ref, w0_ref, w1_ref, cbase_ref,
                         clive_ref, gtot_ref):
    """Same as _token_windows_kernel, reading the fused tokenizer's
    packed token words (sym|ebits<<9|extra<<13|valid<<27) — one HBM
    input stream instead of four."""
    w = tokw_ref[0, 0]
    _windows_core(w & 511, jnp.right_shift(w, 13) & 16383,
                  jnp.right_shift(w, 9) & 15,
                  jnp.right_shift(w, 27) & 1, lut_ref, w0_ref, w1_ref,
                  cbase_ref, clive_ref, gtot_ref)


def _tokw_windows_off_kernel(tokw_ref, lut_ref, w0_ref, w1_ref,
                             cbase_ref, clive_ref, gtot_ref, off_ref):
    """_tokw_windows_kernel that ALSO exports each token's group-local
    exclusive bit offset (for the encoder-side aligned-decode sidecar:
    segment entry = first symbol start >= the nominal boundary)."""
    w = tokw_ref[0, 0]
    _windows_core(w & 511, jnp.right_shift(w, 13) & 16383,
                  jnp.right_shift(w, 9) & 15,
                  jnp.right_shift(w, 27) & 1, lut_ref, w0_ref, w1_ref,
                  cbase_ref, clive_ref, gtot_ref, off_ref)


def _windows_core(sym, extra, ebit, tval, lut_ref, w0_ref, w1_ref,
                  cbase_ref, clive_ref, gtot_ref, off_ref=None):
    u32 = jnp.uint32
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
    hi = exu >> pltpu.bitcast(jnp.minimum(32 - cb, 31), u32)
    lo = jnp.where(live, lo, u32(0))
    hi = jnp.where(live, hi, u32(0))

    # group-local exclusive bit prefix in (row, lane) order — MXU dots
    # (nbits <= 38 is bf16-exact; row sums <= 4864 get two quarters)
    R = sym.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    tri = _tri128()
    v = jax.lax.dot_general(nbits.astype(jnp.bfloat16), tri,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32
                            ).astype(jnp.int32)
    jr = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    qr = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    tris = (qr < jr).astype(jnp.bfloat16)  # strict: row r sums rows < r
    tot = jnp.broadcast_to(v[:, 127:128], (R, 128))
    c = None
    for k in (0, 1):
        qk = pltpu.bitcast((pltpu.bitcast(tot, jnp.uint32)
                            >> jnp.uint32(8 * k)) & jnp.uint32(255),
                           jnp.int32)
        sk = jax.lax.dot_general(tris, qk.astype(jnp.bfloat16),
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32
                                 ).astype(jnp.int32) << (8 * k)
        c = sk if c is None else c + sk
    excl = v + c - nbits
    if off_ref is not None:
        off_ref[0, 0] = excl
    # group bit total, broadcast over the (R, 1) column block (a (1, 1)
    # block shape is rejected by the Mosaic tiling check)
    gtot_ref[0, 0] = jnp.broadcast_to((excl + nbits)[R - 1:R, 127:128],
                                      (R, 1))

    # word-aligned contributions at the group-local alignment
    sh = pltpu.bitcast(excl & 31, u32)
    inv = u32(32) - sh
    c0 = pltpu.bitcast(lo << sh, jnp.int32)
    c1 = pltpu.bitcast(jnp.where(sh > 0, lo >> inv, u32(0))
                       | (hi << sh), jnp.int32)
    c2 = pltpu.bitcast(jnp.where(sh > 0, hi >> inv, u32(0)), jnp.int32)
    word = jnp.right_shift(excl, 5)
    base = word[:, 0:1]
    cbase_ref[0, 0] = base
    clive_ref[0, 0] = jnp.any(nbits > 0, axis=1, keepdims=True
                              ).astype(jnp.int32)
    loc = jnp.clip(word - base, 0, 254)

    # per-row INCLUSIVE prefixes of the contribution planes (all 128
    # lanes hold live tokens, so counts reach 128 and the gather below
    # is at cnt-1 — an exclusive prefix could not represent "all")
    tri = _tri128()
    e0 = _mxu_iprefix32(c0, tri)
    e1 = _mxu_iprefix32(c1, tri)
    e2 = _mxu_iprefix32(c2, tri)

    # cnt[w] = #{j: loc[j] <= w} ∈ [0,128]: 7-step binary search (loc
    # sorted within each row) reaches 127; the all-lanes case is the
    # explicit loc[127] <= w test
    l127 = loc[:, 127:128]

    def search(target):
        cnt = jnp.zeros((R, 128), jnp.int32)
        for b in (64, 32, 16, 8, 4, 2, 1):
            t = cnt + b
            vb = jnp.take_along_axis(loc, t - 1, axis=1)
            cnt = jnp.where(vb <= target, t, cnt)
        return jnp.where(l127 <= target, 128, cnt)

    def gsum(e, cnt):          # Σ_{loc<=w} = incl[cnt-1], 0 at cnt=0
        g = jnp.take_along_axis(e, jnp.clip(cnt - 1, 0, 127), axis=1)
        return jnp.where(cnt == 0, 0, g)

    cnt_lo = search(lane)
    cnt_hi = search(lane + 128)
    g0l = gsum(e0, cnt_lo)
    g1l = gsum(e1, cnt_lo)
    g2l = gsum(e2, cnt_lo)
    g0h = gsum(e0, cnt_hi)
    g1h = gsum(e1, cnt_hi)
    g2h = gsum(e2, cnt_hi)

    def back_l(g, k):          # g[w-k] within the low row, zero below
        return jnp.where(lane < k, 0, pltpu.roll(g, k, 1))

    def back_h(gh, gl, k):     # g[w-k] for the high row, spilling into
        return jnp.where(lane < k, pltpu.roll(gl, k, 1),   # the low row
                         pltpu.roll(gh, k, 1))

    w0_ref[0, 0] = (g0l - back_l(g0l, 1)
                    + back_l(g1l, 1) - back_l(g1l, 2)
                    + back_l(g2l, 2) - back_l(g2l, 3))
    w1_ref[0, 0] = (g0h - back_h(g0h, g0l, 1)
                    + back_h(g1h, g1l, 1) - back_h(g1h, g1l, 2)
                    + back_h(g2h, g2l, 2) - back_h(g2h, g2l, 3))


@functools.partial(jax.jit, static_argnames=("interpret",))
def token_group_windows_pallas(syms, extras, ebits, tvalid, comb,
                               interpret: bool = False):
    """Tokens → 2-row chunk windows + bases + group bit totals.

    syms/extras/ebits/tvalid: (nb, ntok); comb: (nb, nsym<=384) packed
    (code | cbits<<24) LUT. Returns w0/w1 (nb, nchunks, 128) int32
    window rows, cbase/clive (nb, nchunks) int32 (group-local base
    word / liveness per chunk), gtot (nb, ngroups) int32 bit totals;
    nchunks = ngroups * R_TV.
    """
    nb, ntok = syms.shape
    ng = -(-ntok // GROUP_TOK)
    ntok_p = ng * GROUP_TOK

    def pad4(a):
        a = jnp.pad(a.astype(jnp.int32), ((0, 0), (0, ntok_p - ntok)))
        return a.reshape(nb, ng, R_TV, 128)

    lut = jnp.zeros((nb, 3 * 128), jnp.int32)
    lut = lut.at[:, :comb.shape[1]].set(comb.astype(jnp.int32))
    lut4 = jnp.broadcast_to(lut.reshape(nb, 3, 1, 128),
                            (nb, 3, R_TV, 128))

    spec = pl.BlockSpec((1, 1, R_TV, 128), lambda b, g: (b, g, 0, 0),
                        memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((1, 1, R_TV, 1), lambda b, g: (b, g, 0, 0),
                         memory_space=pltpu.VMEM)
    w0, w1, cbase, clive, gtot = pl.pallas_call(
        _token_windows_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nb, ng, R_TV, 128), jnp.int32),
            jax.ShapeDtypeStruct((nb, ng, R_TV, 128), jnp.int32),
            jax.ShapeDtypeStruct((nb, ng, R_TV, 1), jnp.int32),
            jax.ShapeDtypeStruct((nb, ng, R_TV, 1), jnp.int32),
            jax.ShapeDtypeStruct((nb, ng, R_TV, 1), jnp.int32),
        ),
        grid=(nb, ng),
        in_specs=[spec, spec, spec, spec,
                  pl.BlockSpec((1, 3, R_TV, 128),
                               lambda b, g: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(spec, spec, cspec, cspec, cspec),
        interpret=interpret,
    )(pad4(syms), pad4(extras), pad4(ebits), pad4(tvalid), lut4)
    nc = ng * R_TV
    return (w0.reshape(nb, nc, 128), w1.reshape(nb, nc, 128),
            cbase.reshape(nb, nc), clive.reshape(nb, nc),
            gtot[:, :, 0, 0])


@functools.partial(jax.jit, static_argnames=("interpret",))
def token_group_windows_tokw_pallas(tokw, comb, interpret: bool = False):
    """token_group_windows_pallas over packed token words (one input
    stream — 4x less HBM read than the four-array form)."""
    nb, ntok = tokw.shape
    ng = -(-ntok // GROUP_TOK)
    ntok_p = ng * GROUP_TOK
    t4 = jnp.pad(tokw.astype(jnp.int32),
                 ((0, 0), (0, ntok_p - ntok))).reshape(nb, ng, R_TV, 128)

    lut = jnp.zeros((nb, 3 * 128), jnp.int32)
    lut = lut.at[:, :comb.shape[1]].set(comb.astype(jnp.int32))
    lut4 = jnp.broadcast_to(lut.reshape(nb, 3, 1, 128),
                            (nb, 3, R_TV, 128))

    spec = pl.BlockSpec((1, 1, R_TV, 128), lambda b, g: (b, g, 0, 0),
                        memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((1, 1, R_TV, 1), lambda b, g: (b, g, 0, 0),
                         memory_space=pltpu.VMEM)
    w0, w1, cbase, clive, gtot = pl.pallas_call(
        _tokw_windows_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nb, ng, R_TV, 128), jnp.int32),
            jax.ShapeDtypeStruct((nb, ng, R_TV, 128), jnp.int32),
            jax.ShapeDtypeStruct((nb, ng, R_TV, 1), jnp.int32),
            jax.ShapeDtypeStruct((nb, ng, R_TV, 1), jnp.int32),
            jax.ShapeDtypeStruct((nb, ng, R_TV, 1), jnp.int32),
        ),
        grid=(nb, ng),
        in_specs=[spec,
                  pl.BlockSpec((1, 3, R_TV, 128),
                               lambda b, g: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(spec, spec, cspec, cspec, cspec),
        interpret=interpret,
    )(t4, lut4)
    nc = ng * R_TV
    return (w0.reshape(nb, nc, 128), w1.reshape(nb, nc, 128),
            cbase.reshape(nb, nc), clive.reshape(nb, nc),
            gtot[:, :, 0, 0])


def _super_place_kernel(w0_ref, w1_ref, drow_ref, dlane_ref, wbase_ref,
                        sbits_ref, slive_ref, out_ref):
    """Merge SUP_CHUNKS chunk windows per super in registers and place
    into the block's output words (pack pass 2, stage 2 of 2).

    Per super: per-chunk lane rotation by the within-super word delta
    (7-step barrel roll), row expansion of the three rotated planes via
    one-hot MXU matmuls (words split into exact 16-bit f32 halves; each
    bit has one writer, so sums of halves stay < 2^16 and the f32
    accumulation is exact), then the whole span is bit-shifted by its
    group's global misalignment (group_base & 31) — which is what lets
    stage 1 build windows before the cross-group bit scan is known —
    lane-rotated to the global word base, and added into the output
    with a single read-modify-write. One dynamic iteration per super.
    """
    out_ref[...] = jnp.zeros(out_ref.shape, jnp.int32)
    _super_place_body(w0_ref, w1_ref, drow_ref, dlane_ref, wbase_ref,
                      sbits_ref, slive_ref, out_ref)


def _super_place_flat_kernel(w0_ref, w1_ref, drow_ref, dlane_ref,
                             wbase_ref, sbits_ref, slive_ref, out_ref):
    """_super_place_kernel writing one FLAT output shared by every
    block in the grid (wbase carries absolute word offsets): zero-init
    only on the first grid step, accumulate across all of them."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, jnp.int32)

    _super_place_body(w0_ref, w1_ref, drow_ref, dlane_ref, wbase_ref,
                      sbits_ref, slive_ref, out_ref)


def _super_place_body(w0_ref, w1_ref, drow_ref, dlane_ref, wbase_ref,
                      sbits_ref, slive_ref, out_ref):
    nsup = wbase_ref.shape[1]
    u32 = jnp.uint32
    lane32 = jax.lax.broadcasted_iota(jnp.int32, (SUP_CHUNKS, 128), 1)
    laneA = jax.lax.broadcasted_iota(jnp.int32, (ACC_ROWS, 128), 1)
    rowiota = jax.lax.broadcasted_iota(jnp.int32, (ACC_ROWS, SUP_CHUNKS),
                                       0)

    def body(s, _):
        lv = slive_ref[0, pl.ds(s, 1), 0:1][0, 0]

        @pl.when(lv != 0)
        def _():
            dcol = drow_ref[0, pl.ds(s * SUP_CHUNKS, SUP_CHUNKS), 0:1]
            t = dcol & 127                       # (SUP, 1)
            r0 = w0_ref[0, pl.ds(s * SUP_CHUNKS, SUP_CHUNKS), :]
            r1 = w1_ref[0, pl.ds(s * SUP_CHUNKS, SUP_CHUNKS), :]
            for k in (1, 2, 4, 8, 16, 32, 64):
                m = (t & k) != 0
                r0 = jnp.where(m, pltpu.roll(r0, k, 1), r0)
                r1 = jnp.where(m, pltpu.roll(r1, k, 1), r1)
            ge = lane32 >= t
            s0 = jnp.where(ge, r0, 0)
            s1 = jnp.where(ge, r1, r0)
            s2 = jnp.where(ge, 0, r1)

            dl = dlane_ref[0, pl.ds(s, 1), :]    # (1, SUP)
            rc = jnp.right_shift(dl, 7)
            x0 = (rowiota == rc).astype(jnp.float32)

            # Words are split into exact 8-bit quarters: the default
            # MXU f32 dot rounds operands to bf16 (8-bit mantissa), so
            # 16-bit halves are NOT exact on real hardware (interpret
            # mode computes full f32 and hides it). One-hot × [0,255]
            # products and their disjoint-bit column sums (≤ 255) stay
            # exact in bf16×bf16→f32, and a single-pass dot beats the
            # 6-pass Precision.HIGHEST alternative.
            def quarters(sp):
                up = pltpu.bitcast(sp, u32)
                return [pltpu.bitcast((up >> u32(8 * q)) & u32(0xFF),
                                      jnp.int32).astype(jnp.float32)
                        for q in range(4)]

            q0 = quarters(s0)
            q1 = quarters(s1)
            q2 = quarters(s2)
            dot = functools.partial(jnp.dot,
                                    preferred_element_type=jnp.float32)
            acc = jnp.zeros((ACC_ROWS, 128), jnp.int32)
            for q in range(4):
                acc_q = (dot(x0, q0[q]) + pltpu.roll(dot(x0, q1[q]), 1, 0)
                         + pltpu.roll(dot(x0, q2[q]), 2, 0))
                acc = acc | (acc_q.astype(jnp.int32) << (8 * q))

            # bit-shift the whole span by the group misalignment
            sb = sbits_ref[0, pl.ds(s, 1), 0:1][0, 0]
            au = pltpu.bitcast(acc, u32)
            prev = pltpu.roll(acc, 1, 1)
            prev = jnp.where(laneA == 0, pltpu.roll(prev, 1, 0), prev)
            pu = pltpu.bitcast(prev, u32)
            sbu = sb.astype(u32)           # scalar, 0..31
            inv = ((32 - sb) & 31).astype(u32)
            acc2 = pltpu.bitcast(
                jnp.where(sb > 0, (au << sbu) | (pu >> inv), au),
                jnp.int32)

            b = wbase_ref[0, pl.ds(s, 1), 0:1][0, 0]
            row0 = jnp.right_shift(b, 7)
            r = b & 127
            rot = pltpu.roll(acc2, r, 1)
            los = jnp.where(laneA >= r, rot, 0)
            his = jnp.where(laneA < r, rot, 0)
            out_ref[0, pl.ds(row0, ACC_ROWS), :] += (
                los + pltpu.roll(his, 1, 0))

        return 0

    jax.lax.fori_loop(0, nsup, body, 0)


@functools.partial(jax.jit, static_argnames=("nrows", "interpret"))
def super_place_pallas(w0, w1, drow, dlane, wbase, sbits, slive,
                       nrows: int, interpret: bool = False):
    """Place chunk windows into per-block word arrays.

    w0/w1: (nb, nchunks, 128) window rows; drow: (nb, nchunks, 1)
    within-super word deltas (clamped to D_CLAMP); dlane:
    (nb, nsup, SUP_CHUNKS) same deltas lane-major; wbase: (nb, nsup, 1)
    global word base per super, pre-clamped to (nrows-ACC_ROWS)*128;
    sbits: (nb, nsup, 1) group bit misalignment (0..31); slive:
    (nb, nsup, 1) int32. Returns (nb, nrows, 128) int32 words.
    """
    nb, nc, _ = w0.shape
    nsup = nc // SUP_CHUNKS
    wspec = pl.BlockSpec((1, nc, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, nsup, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _super_place_kernel,
        out_shape=jax.ShapeDtypeStruct((nb, nrows, 128), jnp.int32),
        grid=(nb,),
        in_specs=[
            wspec, wspec,
            pl.BlockSpec((1, nc, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nsup, SUP_CHUNKS), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            sspec, sspec, sspec,
        ],
        out_specs=pl.BlockSpec((1, nrows, 128), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(w0, w1, drow, dlane, wbase, sbits, slive)


@functools.partial(jax.jit, static_argnames=("nrows", "interpret"))
def super_place_flat_pallas(w0, w1, drow, dlane, wbase, sbits, slive,
                            nrows: int, interpret: bool = False):
    """super_place_pallas into ONE flat (nrows, 128) word buffer shared
    by all blocks — wbase carries absolute word offsets (the host knows
    every block's exact payload size from its histogram, so the final
    stream layout is known before packing)."""
    nb, nc, _ = w0.shape
    nsup = nc // SUP_CHUNKS
    wspec = pl.BlockSpec((1, nc, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, nsup, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _super_place_flat_kernel,
        out_shape=jax.ShapeDtypeStruct((1, nrows, 128), jnp.int32),
        grid=(nb,),
        in_specs=[
            wspec, wspec,
            pl.BlockSpec((1, nc, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nsup, SUP_CHUNKS), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            sspec, sspec, sspec,
        ],
        out_specs=pl.BlockSpec((1, nrows, 128), lambda b: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(w0, w1, drow, dlane, wbase, sbits, slive)
    return out[0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def token_group_windows_grouped_pallas(tokc, lut3, interpret: bool = False):
    """token_group_windows over a FLAT compacted token stream: one
    (1, ntok) row whose 8192-token groups each belong to a single block
    (compact_tokens_pallas guarantees the alignment); lut3 (ng, 3, 128)
    carries each group's own block LUT."""
    ntok = tokc.shape[1]
    ng = ntok // GROUP_TOK
    t4 = tokc.reshape(1, ng, R_TV, 128)
    lut4 = jnp.broadcast_to(lut3.reshape(ng, 3, 1, 128),
                            (ng, 3, R_TV, 128))
    spec = pl.BlockSpec((1, 1, R_TV, 128), lambda g: (0, g, 0, 0),
                        memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((1, 1, R_TV, 1), lambda g: (0, g, 0, 0),
                         memory_space=pltpu.VMEM)
    w0, w1, cbase, clive, gtot = pl.pallas_call(
        _tokw_windows_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, ng, R_TV, 128), jnp.int32),
            jax.ShapeDtypeStruct((1, ng, R_TV, 128), jnp.int32),
            jax.ShapeDtypeStruct((1, ng, R_TV, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, ng, R_TV, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, ng, R_TV, 1), jnp.int32),
        ),
        grid=(ng,),
        in_specs=[spec,
                  pl.BlockSpec((1, 3, R_TV, 128), lambda g: (g, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(spec, spec, cspec, cspec, cspec),
        interpret=interpret,
    )(t4, lut4)
    nc = ng * R_TV
    return (w0.reshape(1, nc, 128), w1.reshape(1, nc, 128),
            cbase.reshape(1, nc), clive.reshape(1, nc),
            gtot[0, :, 0, 0][None, :])


def _tokw_windows_rows_kernel(tokc_ref, lut_ref, w0_ref, w1_ref,
                              cbase_ref, clive_ref, gtot_ref):
    """_tokw_windows_kernel reading a (1, R_TV, 128) row block of the
    compact kernel's output DIRECTLY (no reshape-slice copy of the
    token stream), with the (1, 3, 128) per-group LUT block broadcast
    to gather shape in registers (no materialized (ng,3,R_TV,128))."""
    w = tokc_ref[0]
    R = w.shape[0]
    lut = jnp.broadcast_to(lut_ref[...].reshape(1, 3, 1, 128),
                           (1, 3, R, 128))
    _windows_core(w & 511, jnp.right_shift(w, 13) & 16383,
                  jnp.right_shift(w, 9) & 15,
                  jnp.right_shift(w, 27) & 1, lut, w0_ref, w1_ref,
                  cbase_ref, clive_ref, gtot_ref)


@functools.partial(jax.jit, static_argnames=("ng", "interpret"))
def token_group_windows_rows_pallas(tokc, lut3, ng: int,
                                    interpret: bool = False):
    """token_group_windows_grouped over the compact kernel's
    (t_rows, 128) output in place: group g = rows [g*R_TV, (g+1)*R_TV)
    (8192 tokens, single-block by the group-aligned bases contract).
    Saves the whole-stream reshape-slice and the LUT broadcast
    materialization of the (1, ntok) form."""
    t3 = tokc[None]                           # (1, t_rows, 128) view
    spec = pl.BlockSpec((1, 1, R_TV, 128), lambda g: (0, g, 0, 0),
                        memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((1, 1, R_TV, 1), lambda g: (0, g, 0, 0),
                         memory_space=pltpu.VMEM)
    w0, w1, cbase, clive, gtot = pl.pallas_call(
        _tokw_windows_rows_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, ng, R_TV, 128), jnp.int32),
            jax.ShapeDtypeStruct((1, ng, R_TV, 128), jnp.int32),
            jax.ShapeDtypeStruct((1, ng, R_TV, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, ng, R_TV, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, ng, R_TV, 1), jnp.int32),
        ),
        grid=(ng,),
        in_specs=[pl.BlockSpec((1, R_TV, 128), lambda g: (0, g, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 3, 128), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(spec, spec, cspec, cspec, cspec),
        interpret=interpret,
    )(t3, lut3)
    nc = ng * R_TV
    return (w0.reshape(1, nc, 128), w1.reshape(1, nc, 128),
            cbase.reshape(1, nc), clive.reshape(1, nc),
            gtot[0, :, 0, 0][None, :])


@functools.partial(jax.jit, static_argnames=("interpret",))
def token_group_windows_grouped_off_pallas(tokc, lut3,
                                           interpret: bool = False):
    """token_group_windows_grouped_pallas that also returns each
    token's group-local exclusive bit offset (sidecar entries)."""
    ntok = tokc.shape[1]
    ng = ntok // GROUP_TOK
    t4 = tokc.reshape(1, ng, R_TV, 128)
    lut4 = jnp.broadcast_to(lut3.reshape(ng, 3, 1, 128),
                            (ng, 3, R_TV, 128))
    spec = pl.BlockSpec((1, 1, R_TV, 128), lambda g: (0, g, 0, 0),
                        memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((1, 1, R_TV, 1), lambda g: (0, g, 0, 0),
                         memory_space=pltpu.VMEM)
    w0, w1, cbase, clive, gtot, off = pl.pallas_call(
        _tokw_windows_off_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, ng, R_TV, 128), jnp.int32),
            jax.ShapeDtypeStruct((1, ng, R_TV, 128), jnp.int32),
            jax.ShapeDtypeStruct((1, ng, R_TV, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, ng, R_TV, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, ng, R_TV, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, ng, R_TV, 128), jnp.int32),
        ),
        grid=(ng,),
        in_specs=[spec,
                  pl.BlockSpec((1, 3, R_TV, 128), lambda g: (g, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(spec, spec, cspec, cspec, cspec, spec),
        interpret=interpret,
    )(t4, lut4)
    nc = ng * R_TV
    return (w0.reshape(1, nc, 128), w1.reshape(1, nc, 128),
            cbase.reshape(1, nc), clive.reshape(1, nc),
            gtot[0, :, 0, 0][None, :], off.reshape(1, ng * GROUP_TOK))


def _tokw_winplace_kernel(dbg_ref, wog_ref, gfirst_ref, tokc_ref,
                          lut_ref, out_ref, w0s, w1s, cbs, cls, gts,
                          carry_ref):
    """FUSED windows+place over the compacted token stream: one grid
    step = one 8192-token group — build its chunk windows in VMEM
    scratch (never materialized to HBM), derive the group's absolute
    bit base from an SMEM running carry (replacing the XLA cumsum +
    broadcast glue between the two kernels), and place its supers into
    the shared flat output. The sequential TPU grid makes the global
    exclusive bit scan a plain accumulator, and gfirst detects each
    block's first group for the per-block bit restart.

    Everything place needs stays COLUMN-major: the one-hot row
    expansion contracts dim 0 of both operands (out[j,l] = Σ_c
    x0T[c,j]·q[c,l]), so the per-chunk row indices never need a
    transpose to lane-major form."""
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, jnp.int32)
        carry_ref[0] = 0
        carry_ref[1] = 0

    w = tokc_ref[0]
    R = w.shape[0]
    lut = jnp.broadcast_to(lut_ref[...].reshape(1, 3, 1, 128),
                           (1, 3, R, 128))
    _windows_core(w & 511, jnp.right_shift(w, 13) & 16383,
                  jnp.right_shift(w, 9) & 15,
                  jnp.right_shift(w, 27) & 1, lut, w0s, w1s,
                  cbs, cls, gts)

    e_g = carry_ref[0]

    @pl.when(gfirst_ref[g] == g)   # block's first group: bit restart
    def _():
        carry_ref[1] = e_g

    gb = wog_ref[g] * 8 + dbg_ref[g] + (e_g - carry_ref[1])
    carry_ref[0] = e_g + gts[0, 0, R - 1, 0]

    u32 = jnp.uint32
    nrows = out_ref.shape[1]
    lane32 = jax.lax.broadcasted_iota(jnp.int32, (SUP_CHUNKS, 128), 1)
    laneA = jax.lax.broadcasted_iota(jnp.int32, (ACC_ROWS, 128), 1)
    laneS = jax.lax.broadcasted_iota(jnp.int32, (SUP_CHUNKS, ACC_ROWS),
                                     1)
    cb_col = cbs[0, 0]              # (R, 1) chunk base words
    cl_col = cls[0, 0]
    for s in range(R // SUP_CHUNKS):
        sl = slice(s * SUP_CHUNKS, (s + 1) * SUP_CHUNKS)

        @pl.when(jnp.any(cl_col[sl] > 0))
        def _(s=s, sl=sl):
            sbase = cbs[0, 0, s * SUP_CHUNKS, 0]     # scalar
            d = jnp.clip(cb_col[sl] - sbase, 0, D_CLAMP)   # (SUP, 1)
            t = d & 127
            r0 = w0s[0, 0, sl, :]
            r1 = w1s[0, 0, sl, :]
            for k in (1, 2, 4, 8, 16, 32, 64):
                m = (t & k) != 0
                r0 = jnp.where(m, pltpu.roll(r0, k, 1), r0)
                r1 = jnp.where(m, pltpu.roll(r1, k, 1), r1)
            ge = lane32 >= t
            s0 = jnp.where(ge, r0, 0)
            s1 = jnp.where(ge, r1, r0)
            s2 = jnp.where(ge, 0, r1)

            rc = jnp.right_shift(d, 7)               # (SUP, 1)
            x0T = (laneS == rc).astype(jnp.float32)  # (SUP, ACC)

            def quarters(sp):
                up = pltpu.bitcast(sp, u32)
                return [pltpu.bitcast((up >> u32(8 * q)) & u32(0xFF),
                                      jnp.int32).astype(jnp.float32)
                        for q in range(4)]

            q0 = quarters(s0)
            q1 = quarters(s1)
            q2 = quarters(s2)
            dotT = functools.partial(
                jax.lax.dot_general,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = jnp.zeros((ACC_ROWS, 128), jnp.int32)
            for q in range(4):
                acc_q = (dotT(x0T, q0[q])
                         + pltpu.roll(dotT(x0T, q1[q]), 1, 0)
                         + pltpu.roll(dotT(x0T, q2[q]), 2, 0))
                acc = acc | (acc_q.astype(jnp.int32) << (8 * q))

            sb = gb & 31
            au = pltpu.bitcast(acc, u32)
            prev = pltpu.roll(acc, 1, 1)
            prev = jnp.where(laneA == 0, pltpu.roll(prev, 1, 0), prev)
            pu = pltpu.bitcast(prev, u32)
            sbu = sb.astype(u32)
            inv = ((32 - sb) & 31).astype(u32)
            acc2 = pltpu.bitcast(
                jnp.where(sb > 0, (au << sbu) | (pu >> inv), au),
                jnp.int32)

            b = jnp.clip(jnp.right_shift(gb, 5) + sbase, 0,
                         (nrows - ACC_ROWS) * 128)
            row0 = jnp.right_shift(b, 7)
            r = b & 127
            rot = pltpu.roll(acc2, r, 1)
            los = jnp.where(laneA >= r, rot, 0)
            his = jnp.where(laneA < r, rot, 0)
            out_ref[0, pl.ds(row0, ACC_ROWS), :] += (
                los + pltpu.roll(his, 1, 0))


@functools.partial(jax.jit,
                   static_argnames=("ng", "nrows", "interpret"))
def token_windows_place_flat_pallas(tokc, lut3, dbg, wog, gfirst,
                                    ng: int, nrows: int,
                                    interpret: bool = False):
    """(t_rows, 128) compacted tokens -> (nrows, 128) flat payload
    words in ONE kernel (see _tokw_winplace_kernel)."""
    t3 = tokc[None]
    out = pl.pallas_call(
        _tokw_winplace_kernel,
        out_shape=jax.ShapeDtypeStruct((1, nrows, 128), jnp.int32),
        grid=(ng,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, R_TV, 128), lambda g: (0, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, 128), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nrows, 128), lambda g: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, 1, R_TV, 128), jnp.int32),
            pltpu.VMEM((1, 1, R_TV, 128), jnp.int32),
            pltpu.VMEM((1, 1, R_TV, 1), jnp.int32),
            pltpu.VMEM((1, 1, R_TV, 1), jnp.int32),
            pltpu.VMEM((1, 1, R_TV, 1), jnp.int32),
            pltpu.SMEM((2,), jnp.int32),
        ],
        interpret=interpret,
    )(dbg.astype(jnp.int32), wog.astype(jnp.int32),
      gfirst.astype(jnp.int32), t3, lut3)
    return out[0]


R_CT = 128     # token rows per compaction tile (16 Ki positions)
CT_TACC = 136  # whole-tile accumulator rows (128-row tile spans <= 130)


def _make_compact_kernel(nonzero_valid: bool):
    def kernel(base_ref, tokw_ref, out_ref, carry_ref):
        return _compact_tokens_kernel(base_ref, tokw_ref, out_ref,
                                      carry_ref, nonzero_valid)
    return kernel


def _compact_tokens_kernel(base_ref, tokw_ref, out_ref, carry_ref,
                           nonzero_valid: bool = False):
    """Compact valid tokens of one (R_CT, 128) position tile to the
    block's flat token span, preserving order.

    Every stage is the pack machinery's own medicine: in-row ranks via
    one exact MXU tri dot, source lanes via the 7-step binary search,
    the whole tile rolled + one-hot-dot expanded and placed with one
    RMW (positions are disjoint, so ADD is exact). The running count
    carries across a block's tiles in SMEM; base_ref holds each block's
    flat token base (host-computed, group-aligned so downstream groups
    never straddle blocks)."""
    b = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when((b == 0) & (t == 0))
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, jnp.int32)

    @pl.when(t == 0)
    def _():
        carry_ref[0] = base_ref[b]

    w = tokw_ref[0, 0]                       # (R_CT, 128)
    valid = (w != 0).astype(jnp.int32) if nonzero_valid \
        else jnp.right_shift(w, 27) & 1
    _compact_tile_place(w, valid, out_ref, carry_ref)


def _compact_tile_place(w, valid, out_ref, carry_ref, extra=(),
                        row_offs=(0,)):
    """Shared whole-tile order-preserving compaction body: place the
    `valid` entries of one (128, 128) tile `w` densely at the running
    flat index carry_ref[0], then advance the carry by the tile's
    valid count.  (The compact kernel's MXU recipe — in-row tri-dot
    ranks, 7-step source binary search, roll + one-hot byte-quarter
    placement — factored out so the fused decode-placement kernel can
    reuse it on a tile it computed in-kernel.)

    extra: additional value planes placed with the SAME ranks (the
    rank dot, source search, and one-hot row masks are computed once);
    plane i lands at out_ref row offset row_offs[i] (row_offs[0] for
    `w`). Lets the merged decode placement emit paired
    (position-meta, value) words for one compaction cost.

    Empty-tile gate: sparse planes (RLE-heavy high byte planes, thin
    decode emission grids) have whole tiles with zero valid entries —
    skip the rank dot / butterfly routing / one-hot place entirely
    (carry unchanged == correct: the tile contributes 0)."""

    @pl.when(jnp.any(valid != 0))
    def _():
        _compact_tile_place_body(w, valid, out_ref, carry_ref, extra,
                                 row_offs)


def _compact_tile_place_body(w, valid, out_ref, carry_ref, extra=(),
                             row_offs=(0,)):
    lane = jax.lax.broadcasted_iota(jnp.int32, w.shape, 1)
    tri = _tri128()
    vr = jax.lax.dot_general(valid.astype(jnp.bfloat16), tri,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32
                             ).astype(jnp.int32)   # inclusive in-row rank
    cnt = vr[:, 127:128]                     # (R_CT, 1) per-row counts

    # In-row compaction via LSB-first butterfly routing: every valid
    # element moves LEFT by delta = lane - (rank-1), one power-of-2
    # stage per bit — 7 roll+select stages, no gathers (the old 7-step
    # binary search cost 7 take_along_axis per tile plus one more per
    # value plane; measured ~18% of the compact stage). Collision-free:
    # for valid a < b, delta_b - delta_a = #invalid in [a,b) < b - a,
    # so partial-delta positions never coincide; emptied slots carry
    # value 0 / delta 0 and are freely overwritten.
    delta = jnp.where(valid != 0, lane - vr + 1, 0)
    routed = [jnp.where(valid != 0, p, 0)
              for p in (w,) + tuple(extra)]
    for k in (1, 2, 4, 8, 16, 32, 64):
        candd = pltpu.roll(delta, 128 - k, 1)
        arrives = ((candd & k) != 0) & (lane < 128 - k)
        stays = (delta & k) == 0
        routed = [jnp.where(arrives, pltpu.roll(p, 128 - k, 1),
                            jnp.where(stays, p, 0)) for p in routed]
        delta = jnp.where(arrives, candd, jnp.where(stays, delta, 0))

    # exclusive cross-row carry of the counts (<=128: one quarter)
    R = w.shape[0]
    jr = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    qr = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    tris = (qr < jr).astype(jnp.bfloat16)
    rowbase = jax.lax.dot_general(
        tris, jnp.broadcast_to(cnt, (R, 128)).astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32)[:, 0:1]

    # whole-tile placement: all R=128 rows in ONE one-hot MXU pass —
    # (CT_TACC,128)@(128,128) dots keep the systolic array at full
    # contraction depth, vs 64 (24,16)@(16,128) slivers whose fixed
    # issue cost dominated (measured ~2x on the compact stage)
    carry = carry_ref[0]
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    u32 = jnp.uint32

    off = carry + rowbase                            # (R, 1)
    row0 = off[0, 0] >> 7
    d = off - (row0 << 7)                            # 0..R*128/128+1
    sh = d & 127
    rc = (d >> 7).reshape(1, R)                      # acc row per source

    def quarters(sp):
        up = pltpu.bitcast(sp, u32)
        return [pltpu.bitcast((up >> u32(8 * q)) & u32(0xFF),
                              jnp.int32).astype(jnp.float32)
                for q in range(4)]

    dot = functools.partial(jnp.dot,
                            preferred_element_type=jnp.float32)

    # rotate + split each plane ONCE (tacc-independent); only the
    # one-hot row-expansion dots below depend on the window height
    planes_q = []
    for packed, ro in zip(routed, row_offs):
        rot = packed
        for k in (1, 2, 4, 8, 16, 32, 64):
            rot = jnp.where((sh & k) != 0, pltpu.roll(rot, k, 1), rot)
        lo = jnp.where(lane8 >= sh, rot, 0)
        hi = jnp.where(lane8 < sh, rot, 0)
        planes_q.append((quarters(lo), quarters(hi), ro))

    def place(tacc):
        rowiota = jax.lax.broadcasted_iota(jnp.int32, (tacc, R), 0)
        x_lo = (rowiota == rc).astype(jnp.float32)
        x_hi = (rowiota == rc + 1).astype(jnp.float32)
        for qlo, qhi, ro in planes_q:
            acc = jnp.zeros((tacc, 128), jnp.int32)
            for q in range(4):
                a_q = dot(x_lo, qlo[q]) + dot(x_hi, qhi[q])
                acc = acc | (a_q.astype(jnp.int32) << (8 * q))
            out_ref[0, pl.ds(ro + row0, tacc), :] += acc

    total = rowbase[R - 1, 0] + cnt[R - 1, 0]
    # Runtime-gated SMALL placement window: the one-hot expansion dots
    # and the out_ref read-modify-write cost scale with the window
    # height tacc, but a tile only advances the flat cursor by its
    # VALID count — typically a small fraction of R*128 slots. Place
    # through a (3/8)R window when the span fits (the common case by a
    # wide margin), else the full R+8 fallback. Both branches are
    # bit-identical — the one-hot rows beyond the span are all-zero.
    small = R * 3 // 8
    if small >= 16:
        fits = (off[0, 0] - (row0 << 7)) + total <= (small - 2) * 128

        @pl.when(fits)
        def _():
            place(small)

        @pl.when(jnp.logical_not(fits))
        def _():
            place(R + 8)
    else:
        place(R + 8)

    carry_ref[0] = carry + rowbase[R - 1, 0] + cnt[R - 1, 0]


@functools.partial(jax.jit,
                   static_argnames=("t_rows", "interpret",
                                    "nonzero_valid", "r_ct"))
def compact_tokens_pallas(tokw, bases, t_rows: int,
                          interpret: bool = False,
                          nonzero_valid: bool = False,
                          r_ct: int = R_CT):
    """(nb, ntok) token words → (t_rows, 128) flat compacted tokens;
    block b's valid tokens land in order at flat index bases[b]
    (host-computed from the histograms, group-aligned). t_rows must
    give >= r_ct + 8 rows of headroom past the last block's span."""
    nb, ntok = tokw.shape
    ntiles = -(-ntok // (r_ct * 128))
    t4 = jnp.pad(tokw.astype(jnp.int32),
                 ((0, 0), (0, ntiles * r_ct * 128 - ntok))
                 ).reshape(nb, ntiles, r_ct, 128)
    out = pl.pallas_call(
        _make_compact_kernel(nonzero_valid),
        out_shape=jax.ShapeDtypeStruct((1, t_rows, 128), jnp.int32),
        grid=(nb, ntiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, r_ct, 128), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_rows, 128), lambda b, t: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(bases, t4)
    return out[0]


def _make_place_compact_kernel(sc_rows: int, nq: int = 4):
    def kernel(steps_ref, emis_ref, meta_ref, out_ref, carry_ref):
        return _place_compact_kernel(steps_ref, emis_ref, meta_ref,
                                     out_ref, carry_ref, sc_rows, nq)
    return kernel


def _place_compact_kernel(steps_ref, emis_ref, meta_ref, out_ref,
                          carry_ref, sc_rows: int, nq: int = 4):
    """Fused decode-placement compaction over the RAW emission grid.

    One grid step handles one (tile, sublane) 128-lane group: load the
    group's (128 steps, 128 lanes) slice of the decode kernel's
    emission grid straight from HBM (no XLA relayout — the major-dim
    transpose of the full grid used to dominate decode placement),
    transpose steps<->lanes in-kernel with exact byte-quarter MXU dots
    against the identity (dot_general contracting dim1 x dim1 — the
    MXU-native rhs-transposed form; u8 quarters are bf16-exact), MERGE
    runs of consecutive-position literals into up-to-4-byte entries
    (within one lane a literal's successor byte is the next step's
    literal — runs are contiguous live spans after the transpose, so
    three lane-rolls gather the run bytes), and compact the paired
    (pos<<2|len-1, value) words in lane-major order via the shared
    compact-tile body — meta plane at rows [0, sc_rows), values at
    [sc_rows, 2*sc_rows).

    meta holds per-lane [base, limit, live] rows (values < 2^23, so
    three byte-quarters transpose them exactly); steps (SMEM) bounds
    each tile's live ring rows. Mirrors hzr_decode.c's "emit literal
    at the running output cursor" semantics (hzr_decode.c:402-480) as
    one data-parallel pass; the merge quarters the placement entry
    count the downstream window pack pays for."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, jnp.int32)
        carry_ref[0] = 0

    ri = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    ident = (ri == ci).astype(jnp.bfloat16)
    u32 = jnp.uint32
    dotg = functools.partial(jax.lax.dot_general,
                             dimension_numbers=(((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)

    def quarter(x, q):
        up = pltpu.bitcast(x, u32)
        return pltpu.bitcast((up >> u32(8 * q)) & u32(0xFF),
                             jnp.int32).astype(jnp.bfloat16)

    def roll_left(x, k):
        return pltpu.roll(x, 128 - k, 1)

    # per-lane metadata rows -> columns via exact byte-quarter dots,
    # ONCE for the whole tile: all 8 sublane groups' (3, 128) meta rows
    # stack into one (24, 128) block, so one 3-quarter transpose serves
    # every group (was 3 dots PER group — 8x the MXU issues)
    m_all = meta_ref[0].reshape(24, 128)
    mt_all = jnp.zeros((128, 128), jnp.int32)
    mp = jnp.pad(m_all, ((0, 104), (0, 0)))
    for q in range(3):
        tq = dotg(ident, quarter(mp, q)).astype(jnp.int32)
        mt_all = mt_all | (tq << (8 * q))

    # Mosaic wants full trailing (8, 128) blocks, so one grid step
    # covers a whole tile: unroll its 8 sublane groups in lane order
    # (program order keeps the compaction carry sequential).
    for s in range(8):
        # dead-group gate: groups whose 128 lanes are all padding
        # (mt_all live column zero) contribute nothing — skip their
        # transpose dots + merge scan (carry unchanged == correct)
        @pl.when(jnp.any(mt_all[:, 3 * s + 2:3 * s + 3] > 0))
        def _(s=s):
            _place_compact_group(emis_ref, mt_all, steps_ref[t],
                                 out_ref, carry_ref, sc_rows, nq, s,
                                 ci, quarter, roll_left, dotg, ident)


def _place_compact_group(emis_ref, mt_all, steps_t, out_ref,
                         carry_ref, sc_rows, nq, s, ci, quarter,
                         roll_left, dotg, ident):
    if True:
        w = emis_ref[0, :, s, :]                 # (128 steps, 128 lanes)
        wt = jnp.zeros((128, 128), jnp.int32)
        # nq=3 when the caller knows max outc < 2^15 (packed < 2^24):
        # drops a quarter of the transpose MXU issues
        for q in range(nq):
            tq = dotg(ident, quarter(w, q)).astype(jnp.int32)
            wt = wt | (tq << (8 * q))
        # wt[lane, step] = w[step, lane]

        base = mt_all[:, 3 * s:3 * s + 1]
        lim = mt_all[:, 3 * s + 1:3 * s + 2]
        liv = mt_all[:, 3 * s + 2:3 * s + 3]

        sym = wt & 0x1FF
        outc = jax.lax.shift_right_logical(wt, 9)
        pos = base + outc
        live = ((sym > 0) & (ci < steps_t) & (pos < lim)
                & (liv > 0))

        # ---- merge: literal runs are contiguous live spans within a
        # row (a literal emits exactly one byte, and steps stay active
        # until the lane finishes), so live neighbors at cols i+1..i+3
        # hold the next output bytes. Keep every 4th entry of a run.
        liv32 = live.astype(jnp.int32)
        prev = jnp.where(ci >= 1, pltpu.roll(liv32, 1, 1), 0)
        head = live & (prev == 0)
        # row-local inclusive max-scan of head cols -> run start col
        hl = jnp.where(head, ci, -1)
        p = 1
        while p < 128:
            hl = jnp.maximum(hl, jnp.where(ci >= p,
                                           pltpu.roll(hl, p, 1), -1))
            p *= 2
        keep = live & (((ci - hl) & 3) == 0)
        in1 = (jnp.where(ci < 127, roll_left(liv32, 1), 0) > 0)
        in2 = in1 & (jnp.where(ci < 126, roll_left(liv32, 2), 0) > 0)
        in3 = in2 & (jnp.where(ci < 125, roll_left(liv32, 3), 0) > 0)
        b1 = roll_left(sym, 1)
        b2 = roll_left(sym, 2)
        b3 = roll_left(sym, 3)
        val32 = (sym | jnp.where(in1, b1 << 8, 0)
                 | jnp.where(in2, b2 << 16, 0)
                 | jnp.where(in3, b3 << 24, 0))
        ln = (in1.astype(jnp.int32) + in2.astype(jnp.int32)
              + in3.astype(jnp.int32))          # len - 1
        v_meta = jnp.where(keep, (pos << 2) | ln, 0)
        v_val = jnp.where(keep, val32, 0)
        _compact_tile_place(v_meta, keep.astype(jnp.int32), out_ref,
                            carry_ref, extra=(v_val,),
                            row_offs=(0, sc_rows))


@functools.partial(jax.jit,
                   static_argnames=("sc_rows", "interpret", "nq"))
def place_compact_pallas(emis, steps_used, meta, sc_rows: int,
                         interpret: bool = False, nq: int = 4):
    """Raw emission grid (ntiles, MAX_STEPS>=128, 8, 128) -> compacted
    (2*sc_rows, 128) placement words: rows [0, sc_rows) hold
    pos<<2|len-1 metadata, rows [sc_rows, 2*sc_rows) the up-to-4 merged
    literal bytes (little-endian; never zero, since zero bytes are
    RLE'd, so the value plane doubles as the liveness mask). Lane-major
    order. Covers decodes whose bucketed emission width is <= 128 steps
    (the flagship case); wider grids take the XLA-transpose path.

    meta: (ntiles, 8, 3, 128) i32 [out_base, out_limit, lane_live] per
    lane; steps_used: (ntiles,) i32 live ring rows per tile. All meta
    values must be < 2^23 (the caller guards total output < 8 MB).
    sc_rows sized from the exact literal count (merged entries <=
    literals, so the capacity bound holds a fortiori)."""
    ntiles = emis.shape[0]
    return pl.pallas_call(
        _make_place_compact_kernel(sc_rows, nq),
        out_shape=jax.ShapeDtypeStruct((1, 2 * sc_rows, 128), jnp.int32),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 128, 8, 128), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 3, 128), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * sc_rows, 128),
                               lambda t: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(steps_used, emis, meta)[0]


SIDE_ROWS = 16  # sidecar placement window rows: a group's flags span
#                 <= ceil(8192*37/256/128)+2 = 12 rows (token <= 37 bits,
#                 segment >= 256 bits)


def _sidecar_entries_kernel(meta_ref, ein_ref, tokw_ref, off_ref,
                            out_ref, carry_ref):
    """Aligned-decode sidecar: per-segment entry bit offsets, computed
    at ENCODE time from the flat pack's own token offsets.

    The decoder's converged fixpoint entry for segment s is exactly
    "first symbol start >= the nominal boundary dbits + s*segw*32"
    (pallas_decoder._run_kernel semantics). A token is that first
    symbol iff its boundary count c = (bits-before-token)//W exceeds
    the previous token's — and since every hzr token is <= 37 bits
    < W >= 256, c steps by at most 1, so flagged tokens within a row
    land at CONSECUTIVE segment lanes. That makes placement the
    compact kernel's own recipe: in-row flag ranks (vr = c - row
    start), the 7-step source binary search, whole-tile roll +
    one-hot MXU placement into a 16-row window.

    Grid (ng,): one 8192-token windows group per step. meta (ng, 4)
    SMEM i32: [newblk, W=segw*32, lane_base+1, dbits]; ein (ng,) SMEM:
    the group's exclusive bit offset within its block (the flat pack's
    cross-group scan). Carry: segment counter of the previous token
    (resets at each block's first group). out: (out_rows, 128) entry
    lanes matching pallas_decoder.lane_rows, plus a park area for
    blocks the decoder routes off-device."""
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, jnp.int32)

    @pl.when(meta_ref[g, 0] != 0)
    def _():
        carry_ref[0] = 0

    W = meta_ref[g, 1]
    lb1 = meta_ref[g, 2]
    dbits = meta_ref[g, 3]
    ein = ein_ref[g]

    w = tokw_ref[0, 0]                       # (R_TV, 128)
    off = off_ref[0, 0]
    valid = (jnp.right_shift(w, 27) & 1) != 0
    x = ein + off                            # body-relative bit prefix
    # exact divide by the per-block scalar W: f32 quotient + int fixup
    # (x < 2**19 and W <= 512 are f32-exact; the quotient may round
    # across an integer, the +-1 correction restores floor semantics)
    q = jnp.floor(x.astype(jnp.float32)
                  * (1.0 / W.astype(jnp.float32))).astype(jnp.int32)
    q = (q + ((q + 1) * W <= x).astype(jnp.int32)
         - (q * W > x).astype(jnp.int32))
    # invalid tail tokens never advance the prefix (nbits = 0), so q is
    # constant across them — no masking needed beyond the value plane
    c = q

    R = w.shape[0]
    riota = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    clast = c[:, 127:128]                    # (R, 1)
    # segment counter at each row start: clast shifted down one row
    # (tiny MXU shift-dot; Mosaic has no sublane roll for (R, 1)
    # shapes). Byte-quarter split: the MXU rounds f32 operands to bf16,
    # so clast (<= nseg ~ 2**11) must ride in <= 8-bit exact pieces.
    jr = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    qr = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    down = (qr == jr - 1).astype(jnp.float32)
    prev = jnp.zeros((R, 1), jnp.int32)
    for k in (0, 1):
        qk = pltpu.bitcast((pltpu.bitcast(clast, jnp.uint32)
                            >> jnp.uint32(8 * k)) & jnp.uint32(255),
                           jnp.int32)
        prev = prev | (jnp.dot(down, qk.astype(jnp.float32),
                               preferred_element_type=jnp.float32
                               ).astype(jnp.int32) << (8 * k))
    prev = jnp.where(riota == 0,
                     jnp.broadcast_to(carry_ref[0], (R, 1)), prev)
    vr = c - prev                            # inclusive in-row flag rank
    cnt = clast - prev                       # flags per row

    # source lane for output slot o: first lane with vr == o + 1
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    src = jnp.zeros((R, 128), jnp.int32)
    for step in (64, 32, 16, 8, 4, 2, 1):
        nxt = src + step
        v = jnp.take_along_axis(vr, nxt - 1, axis=1)
        src = jnp.where(v <= lane, nxt, src)
    start = jnp.where(valid, dbits + x, 0)   # block-relative bit start
    packed = jnp.where(lane < cnt,
                       jnp.take_along_axis(start, jnp.minimum(src, 127),
                                           axis=1), 0)

    # whole-tile one-hot placement (compact kernel tail, 16-row window)
    offr = lb1 + prev                        # (R, 1) dest of first flag
    row0 = offr[0, 0] >> 7
    d = offr - (row0 << 7)
    sh = d & 127
    rot = packed
    for k in (1, 2, 4, 8, 16, 32, 64):
        rot = jnp.where((sh & k) != 0, pltpu.roll(rot, k, 1), rot)
    lane8 = lane
    lo = jnp.where(lane8 >= sh, rot, 0)
    hi = jnp.where(lane8 < sh, rot, 0)
    rc = (d >> 7).reshape(1, R)
    rowiota = jax.lax.broadcasted_iota(jnp.int32, (SIDE_ROWS, R), 0)
    x_lo = (rowiota == rc).astype(jnp.float32)
    x_hi = (rowiota == rc + 1).astype(jnp.float32)
    u32 = jnp.uint32

    def quarters(sp):
        up = pltpu.bitcast(sp, u32)
        return [pltpu.bitcast((up >> u32(8 * k)) & u32(0xFF),
                              jnp.int32).astype(jnp.float32)
                for k in range(4)]

    qlo = quarters(lo)
    qhi = quarters(hi)
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    acc = jnp.zeros((SIDE_ROWS, 128), jnp.int32)
    for k in range(3):                       # starts < 2**19: 3 quarters
        a_k = dot(x_lo, qlo[k]) + dot(x_hi, qhi[k])
        acc = acc | (a_k.astype(jnp.int32) << (8 * k))
    out_ref[0, pl.ds(row0, SIDE_ROWS), :] += acc

    carry_ref[0] = clast[R - 1, 0]


@functools.partial(jax.jit, static_argnames=("out_rows", "interpret"))
def sidecar_entries_pallas(flat, off, meta, ein, out_rows: int,
                           interpret: bool = False):
    """(1, T) flat tokens + group-local bit offsets → (out_rows, 128)
    aligned-decode entry lanes (0 where no symbol starts in a segment;
    hzr/sidecar.py merges the host init plane over those)."""
    ng = flat.shape[1] // GROUP_TOK
    t4 = flat.reshape(1, ng, R_TV, 128)
    o4 = off.reshape(1, ng, R_TV, 128)
    spec = pl.BlockSpec((1, 1, R_TV, 128), lambda g: (0, g, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _sidecar_entries_kernel,
        out_shape=jax.ShapeDtypeStruct((1, out_rows, 128), jnp.int32),
        grid=(ng,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  spec, spec],
        out_specs=pl.BlockSpec((1, out_rows, 128), lambda g: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(meta, ein, t4, o4)
    return out[0]


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

# ---------------------------------------------------------------------------
# Fused pass-1 tokenizer: plane extract + RLE tokenize in VMEM
# ---------------------------------------------------------------------------
#
# The XLA pass-1 pipeline (plane_split → blockify → tokenize_blocks,
# hzr_encode.c:133-173 run semantics) materializes the byte planes,
# the block batch, and FOUR (nb, 64Ki) int32 token arrays in HBM, and
# its 8-bit relayouts lower poorly on TPU. This kernel reads each
# 64 Ki-sample int32 slab once, extracts every plane's byte lane
# in-register, runs the zero-run scans as in-VMEM doubling rolls, and
# emits ONE packed token word per byte position:
#
#   word = sym(9) | ebits(4)<<9 | extra(14)<<13 | valid(1)<<27
#
# plus the plane bytes packed 4-per-int32 (for the COPY-fallback path
# and the device decoder's oracle). Histograms and the verify flag are
# cheap XLA reductions over the token words (hzr/jax_coder.py).

_MZR = 16662          # MAX_ZERO_RUN (formats/hzr_constants.py:41)
_TOK_ROWS = 512       # 64 KiB block = (512, 128) bytes


def _tok_fscan_max(v, fill):
    """Row-major inclusive max-scan over a (R, 128) tile."""
    R = v.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
    p = 1
    while p < 128:
        v = jnp.maximum(v, jnp.where(lane >= p, pltpu.roll(v, p, 1),
                                     fill))
        p *= 2
    tot = jnp.broadcast_to(v[:, 127:128], v.shape)
    c = jnp.where(row >= 1, pltpu.roll(tot, 1, 0), fill)
    q = 1
    while q < R:
        c = jnp.maximum(c, jnp.where(row >= q + 1, pltpu.roll(c, q, 0),
                                     fill))
        q *= 2
    return jnp.maximum(v, c)


def _tok_rscan_min(v, fill):
    """Row-major inclusive (suffix) min-scan over a (R, 128) tile."""
    R = v.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
    p = 1
    while p < 128:
        v = jnp.minimum(v, jnp.where(lane < 128 - p,
                                     pltpu.roll(v, 128 - p, 1), fill))
        p *= 2
    tot = jnp.broadcast_to(v[:, 0:1], v.shape)
    c = jnp.where(row < R - 1, pltpu.roll(tot, R - 1, 0), fill)
    q = 1
    while q < R:
        c = jnp.minimum(c, jnp.where(row < R - q - 1,
                                     pltpu.roll(c, R - q, 0), fill))
        q *= 2
    return jnp.minimum(v, c)


def _make_tokenize_kernel(nr_planes: int, nb_per: int, tail_len: int):
    B_ = _TOK_ROWS * 128

    def kernel(slab_ref, tokw_ref, bw_ref):
        j = pl.program_id(0)
        slab = slab_ref[0]
        R = _TOK_ROWS
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
        idx = row * 128 + lane
        # grid is batch-major: slab j belongs to payload j // nb_per,
        # and each payload's LAST slab carries the tail
        limit = jnp.where(j % nb_per == nb_per - 1, tail_len, B_)
        inblk = idx < limit
        # packed-byte gather indices (lane l of the word tile collects
        # bytes 4l..4l+3; lanes ≥ 32 are dead)
        gidx = [jnp.minimum(lane * 4 + k, 127) for k in range(4)]

        for p in range(nr_planes):
            byte = jnp.right_shift(slab, 8 * p) & 255
            g = [jnp.take_along_axis(byte, gidx[k], axis=1)
                 for k in range(4)]
            bw_ref[p, 0] = (g[0] | (g[1] << 8) | (g[2] << 16)
                            | (g[3] << 24))[:, :32]

            iszero = (byte == 0) & inblk

            def emit_runs(run_start, run_end):
                off = idx - run_start
                is_cs = iszero & (off % _MZR == 0)
                L = jnp.minimum(run_end - idx + 1, _MZR)
                run_sym = jnp.where(
                    L == 1, 0, jnp.where(
                        L == 2, 256, jnp.where(
                            L <= 6, 257, jnp.where(
                                L <= 22, 258, jnp.where(
                                    L <= 278, 259, 260)))))
                run_extra = jnp.where(
                    L <= 2, 0, jnp.where(
                        L <= 6, L - 3, jnp.where(
                            L <= 22, L - 7, jnp.where(
                                L <= 278, L - 23, L - 279))))
                run_ebits = jnp.where(
                    L <= 2, 0, jnp.where(
                        L <= 6, 2, jnp.where(
                            L <= 22, 4, jnp.where(L <= 278, 8, 14))))

                is_lit = (~iszero) & inblk
                tval = is_lit | is_cs
                sym = jnp.where(is_lit, byte,
                                jnp.where(is_cs, run_sym, 0))
                extra = jnp.where(is_cs, run_extra, 0)
                ebits = jnp.where(is_cs, run_ebits, 0)
                tokw_ref[p, 0] = (sym | (ebits << 9) | (extra << 13)
                                  | (tval.astype(jnp.int32) << 27))

            # scan gates: the run-boundary scans (two lane+row doubling
            # passes over the (512, 128) tile) are the kernel's largest
            # cost, but an ALL-LITERAL slab (dense low planes) needs no
            # run info at all, and an ALL-ZERO slab (RLE-saturated high
            # planes / FILL content) has closed-form boundaries. Two
            # cross-lane reduces buy skipping both scans on most real
            # slabs.
            z_any = jnp.any(iszero)
            nz_any = jnp.any((byte != 0) & inblk)

            @pl.when(jnp.logical_not(z_any))
            def _():
                # every in-block byte is a literal
                tokw_ref[p, 0] = jnp.where(
                    inblk, byte | jnp.int32(1 << 27), 0)

            @pl.when(z_any & jnp.logical_not(nz_any))
            def _():
                # one all-zero run from 0 to limit-1
                emit_runs(jnp.zeros_like(idx),
                          jnp.broadcast_to(limit - 1, idx.shape))

            @pl.when(z_any & nz_any)
            def _():
                # last non-zero (or out-of-block) strictly before i
                lnb = _tok_fscan_max(jnp.where(iszero, -1, idx), -1)
                prev = pltpu.roll(lnb, 1, 1)
                prev = jnp.where(lane == 0, pltpu.roll(prev, 1, 0),
                                 prev)
                run_start = jnp.where(idx == 0, -1, prev) + 1
                # first non-zero (or out-of-block) at/after i
                fna = _tok_rscan_min(jnp.where(iszero, B_, idx), B_)
                run_end = jnp.minimum(fna, limit) - 1
                emit_runs(run_start, run_end)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("nr_planes", "plane_len", "interpret"))
def tokenize_planes_pallas(flat_i32, nr_planes: int, plane_len: int,
                           interpret: bool = False):
    """Fused plane-extract + tokenize (hzr_encode.c:133-173 runs).

    flat_i32: (plane_len,) int32 signal (already through whatever
    pre-transform the packer applies), or (batch, plane_len) for the
    serving path — ONE kernel launch covers the whole batch (a vmapped
    launch measured ~40% superlinear). Returns
      tokw   (batch*nr_planes*nb_per, 64Ki) int32 packed token words,
      bwords (batch*nr_planes*nb_per, 16Ki) int32 plane bytes 4/word
    payload-major then plane-major — the block order the packers use.
    """
    B_ = _TOK_ROWS * 128
    nb_per = max(1, -(-plane_len // B_))
    tail = plane_len - (nb_per - 1) * B_
    batched = flat_i32.ndim == 2
    batch = flat_i32.shape[0] if batched else 1
    x2 = flat_i32.reshape(batch, -1)
    xp = jnp.zeros((batch, nb_per * B_), jnp.int32).at[
        :, :plane_len].set(x2[:, :plane_len].astype(jnp.int32))
    x4 = xp.reshape(batch * nb_per, _TOK_ROWS, 128)

    # The kernel writes the PLANE-MAJOR 4-D layout (planes, batch*nb,
    # rows, 128) — a 5-D payload-major out spec measured ~4x slower on
    # chip (Mosaic handles the extra leading block dim poorly), so the
    # payload-major row order callers expect is restored below with one
    # XLA transpose (zero-cost at batch 1; ~3% of the kernel at batch 4)
    tokw, bw = pl.pallas_call(
        _make_tokenize_kernel(nr_planes, nb_per, tail),
        out_shape=(
            jax.ShapeDtypeStruct(
                (nr_planes, batch * nb_per, _TOK_ROWS, 128), jnp.int32),
            jax.ShapeDtypeStruct(
                (nr_planes, batch * nb_per, _TOK_ROWS, 32), jnp.int32),
        ),
        grid=(batch * nb_per,),
        in_specs=[pl.BlockSpec((1, _TOK_ROWS, 128), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((nr_planes, 1, _TOK_ROWS, 128),
                         lambda b: (0, b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nr_planes, 1, _TOK_ROWS, 32),
                         lambda b: (0, b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(x4)
    nb = batch * nr_planes * nb_per
    if batch > 1:
        tokw = tokw.reshape(nr_planes, batch, nb_per, _TOK_ROWS, 128
                            ).swapaxes(0, 1)
        bw = bw.reshape(nr_planes, batch, nb_per, _TOK_ROWS, 32
                        ).swapaxes(0, 1)
    return (tokw.reshape(nb, B_), bw.reshape(nb, _TOK_ROWS * 32))
