"""Interleaved A/B stage profiler for the encode path on the real chip.

The tunneled chip's effective speed varies ~2x between processes
minutes apart (shared tenancy / clock), so cross-process comparisons
are meaningless. This times every stage VARIANT in one process with
the K-loop slope method, interleaving the variants round-robin over
several outer rounds and taking per-variant minima — load noise then
cancels out of the comparison.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _enable_compile_cache, make_ecg  # noqa: E402

_enable_compile_cache()

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from rspt_tpu.hzr import jax_coder
    from rspt_tpu.ops import jax_ops as jops
    from rspt_tpu.ops import pallas_kernels as pk

    def s(x):
        return jnp.sum(x.astype(jnp.int32)).astype(jnp.float32)

    ch, n, bps, planes = 12, 34199, 4, 3
    sig, native = make_ecg(ch, n)
    raw = jax.device_put(np.frombuffer(native, "<i4"))
    raw_u8 = jax.device_put(np.frombuffer(native, np.uint8))
    plane_len = ch * n
    B = jax_coder.B
    nb_per = -(-plane_len // B)
    lengths_np = np.full(planes * nb_per, B, np.int32)
    if plane_len % B:
        lengths_np[nb_per - 1::nb_per] = plane_len % B
    lengths = jax.device_put(lengths_np)

    def pre_chain(r):
        enc = jops.native_to_i32(r, n, ch, bps).reshape(-1)
        return jops.xor_encode(jops.offset32(jops.delta_encode(enc),
                                             -128))

    enc_dev = jax.jit(pre_chain)(raw)
    planes_dev = jax.jit(
        lambda e: jops.plane_split(e, planes))(enc_dev)

    def blockify(p):
        padded = jnp.zeros((planes, nb_per * B), jnp.uint8)
        padded = padded.at[:, :plane_len].set(p)
        return padded.reshape(planes * nb_per, B)

    blocks = jax.jit(blockify)(planes_dev)
    tokw, bwords = pk.tokenize_planes_pallas(enc_dev, planes, plane_len)
    hist = jax_coder.hist_from_tokw(tokw)
    hist_np = np.asarray(hist)
    codes, cbits, _, desc_bits, _ = jax_coder.host_tables(
        hist_np, lengths_np)
    cd, cb, db = jax.device_put((codes, cbits, desc_bits))
    syms, extras, ebits, tvalid, _ = jax_coder.tokenize_blocks(
        blocks, lengths)

    bodies = {}
    only = [p for p in os.environ.get("RSPT_PROF_ONLY", "").split(",")
            if p]

    def add(name, body):
        if only and not any(p in name for p in only):
            return
        bodies[name] = body

    add("preprocess", lambda acc: acc + s(pre_chain(
        jax.lax.optimization_barrier((raw, acc))[0])[:128]))

    def n2i_words(acc):
        r, a = jax.lax.optimization_barrier((raw, acc))
        return a + s(jops.native_to_i32.__wrapped__(r, n, ch, bps))

    add("n2i_words", n2i_words)

    def n2i_bytes(acc):
        # device byte-OR assembly from u8, for within-run A/B
        r, a = jax.lax.optimization_barrier((raw_u8, acc))
        b = r[: n * ch * bps].reshape(n, ch, bps)
        v = jnp.zeros((n, ch), dtype=jnp.uint32)
        for k in range(bps):
            v = v | (b[..., k].astype(jnp.uint32) << np.uint32(8 * k))
        return a + s(v.astype(jnp.int32).T)

    add("n2i_bytes", n2i_bytes)

    def dox(acc):
        e, a = jax.lax.optimization_barrier((enc_dev, acc))
        out = jops.xor_encode.__wrapped__(
            jops.offset32.__wrapped__(
                jops.delta_encode.__wrapped__(e), -128))
        return a + s(out)

    add("delta_offset_xor", dox)

    def pre_full(acc):
        r, a = jax.lax.optimization_barrier((raw, acc))
        return a + s(pre_chain(r))

    add("preprocess_full", pre_full)
    add("plane_split+blockify", lambda acc: acc + s(blockify(
        jops.plane_split.__wrapped__(
            jax.lax.optimization_barrier((enc_dev, acc))[0],
            planes))[:, :128]))

    def tok_xla(acc):
        b, a = jax.lax.optimization_barrier((blocks, acc))
        out = jax_coder.tokenize_blocks.__wrapped__(b, lengths)
        return a + sum(s(t) for t in out)

    add("tokenize_xla", tok_xla)

    def tok_fused(acc):
        e, a = jax.lax.optimization_barrier((enc_dev, acc))
        tw, bw = pk.tokenize_planes_pallas.__wrapped__(
            e, planes, plane_len)
        return a + s(tw) + s(bw)

    add("tokenize_fused_kernel", tok_fused)

    def hist_tokw(acc):
        t_, a = jax.lax.optimization_barrier((tokw, acc))
        return a + s(jax_coder.hist_from_tokw(t_))

    add("hist_from_tokw", hist_tokw)

    def mk_pack(mode):
        def body(acc):
            s_, a = jax.lax.optimization_barrier((syms, acc))
            packed, tb = jax_coder.pack_blocks.__wrapped__(
                s_, extras, ebits, tvalid, cd, cb, db,
                platform="tpu", mode=mode)
            return a + s(packed) + s(tb)
        return body

    add("pack_xla", mk_pack("xla"))
    add("pack_pallas4", mk_pack("pallas"))

    def pack_tokw(acc):
        t_, a = jax.lax.optimization_barrier((tokw, acc))
        packed, tb = jax_coder._pack_blocks_tokw_impl(
            t_, cd, cb, db, platform="tpu", mode="pallas")
        return a + s(packed) + s(tb)

    add("pack_pallas_tokw", pack_tokw)

    # --- pack split: windows kernel (A) vs super-place (B + glue) -----
    from rspt_tpu.ops.pallas_kernels import (
        ACC_ROWS, SUP_CHUNKS, D_CLAMP, super_place_pallas,
        token_group_windows_tokw_pallas)

    comb_dev = (jax.lax.bitcast_convert_type(cd, jnp.int32)
                & jnp.int32(0xFFFFFF)) | (cb.astype(jnp.int32) << 24)
    stageA = jax.jit(lambda t_: token_group_windows_tokw_pallas(
        t_, comb_dev))(tokw)
    w0_d, w1_d, cbase_d, clive_d, gtot_d = stageA

    def packA(acc):
        t_, a = jax.lax.optimization_barrier((tokw, acc))
        w0, w1, cb_, cl_, gt_ = token_group_windows_tokw_pallas(
            t_, comb_dev)
        return a + s(w0) + s(w1) + s(cb_) + s(cl_) + s(gt_)

    add("pack_windows_A", packA)

    n_tok = tokw.shape[1]
    nbb = tokw.shape[0]
    max_out = n_tok + 512

    def packB(acc):
        (w0, w1, cbase, clive, gtot), a = jax.lax.optimization_barrier(
            (stageA, acc))
        ng = gtot.shape[1]
        gb = gtot
        p = 1
        while p < ng:
            gb = gb + jnp.pad(gb, ((0, 0), (p, 0)))[:, :ng]
            p *= 2
        group_base = db[:, None] + gb - gtot
        nwords = max_out // 4 + 1
        nrows = -(-nwords // 128)
        nrows = -(-(nrows + ACC_ROWS) // 8) * 8
        nc = cbase.shape[1]
        nsup = nc // SUP_CHUNKS
        sup_per_g = nsup // ng
        superbase = cbase[:, ::SUP_CHUNKS]
        d = jnp.clip(cbase - jnp.repeat(superbase, SUP_CHUNKS, axis=1),
                     0, D_CLAMP)
        gb_s = jnp.repeat(group_base, sup_per_g, axis=1)
        wbase = jnp.clip(jnp.right_shift(gb_s, 5) + superbase,
                         0, (nrows - ACC_ROWS) * 128)
        sbits = gb_s & 31
        slive = jnp.any(clive.reshape(nbb, nsup, SUP_CHUNKS) > 0, axis=2)
        words3 = super_place_pallas(
            w0, w1, d[:, :, None], d.reshape(nbb, nsup, SUP_CHUNKS),
            wbase[:, :, None], sbits[:, :, None],
            slive[:, :, None].astype(jnp.int32), nrows)
        return a + s(words3)

    add("pack_place_B", packB)

    # --- flat2 pack sub-stages ----------------------------------------
    from rspt_tpu.ops.pallas_kernels import (
        compact_tokens_pallas, super_place_flat_pallas,
        token_group_windows_grouped_pallas)

    codes_np, cbits_np = codes, cbits
    tb_h, comp_len, is_huff, _ac = jax_coder.host_layout(
        hist_np, lengths_np, cbits_np, desc_bits, np.zeros(
            len(lengths_np), bool))
    hoff = (np.cumsum(comp_len) - comp_len).astype(np.int64)
    bases, T, ngf, g2b, gfirst = jax_coder.flat_compact_layout(
        hist_np, is_huff)
    t_rows = T // 128 + 512 + 24  # trash span + CT_ACC headroom
    from rspt_tpu.ops.pallas_kernels import ACC_ROWS
    total_payload = int(comp_len.sum())
    nrows_f = -(-(total_payload // 4 + 2) // 128) + ACC_ROWS
    nrows_f = -(-nrows_f // 8) * 8
    comb_np = ((codes_np.astype(np.uint32) & np.uint32(0xFFFFFF))
               | (cbits_np.astype(np.uint32) << np.uint32(24))
               ).view(np.int32)
    lut3_np = np.zeros((ngf, 3 * 128), np.int32)
    lut3_np[:, :comb_np.shape[1]] = comb_np[g2b]
    bases_d, lut3_d, dbg_d, wog_d, gfirst_d = jax.device_put(
        (bases, lut3_np.reshape(ngf, 3, 128),
         desc_bits[g2b].astype(np.int32), hoff[g2b].astype(np.int32),
         gfirst))

    splits1 = jax_coder.compact_split_plan(hist_np, is_huff)

    def flat2_all(acc):
        t_, a = jax.lax.optimization_barrier((tokw, acc))
        w = jax_coder._pack_tokens_flat2_impl(
            t_, bases_d, lut3_d, dbg_d, wog_d, gfirst_d,
            t_rows=t_rows, T=T, nrows_f=nrows_f,
            compact_splits=splits1)
        return a + s(w)

    add("flat2_pack_all", flat2_all)

    def flat2_compact(acc):
        t_, a = jax.lax.optimization_barrier((tokw, acc))
        tokc = compact_tokens_pallas(t_, bases_d, t_rows)
        return a + s(tokc)

    add("flat2_compact", flat2_compact)

    tokc_dev = jax.jit(lambda t: compact_tokens_pallas(
        t, bases_d, t_rows))(tokw)
    flat_dev = jax.jit(lambda t: t.reshape(1, -1)[:, :T])(tokc_dev)

    def flat2_windows(acc):
        f_, a = jax.lax.optimization_barrier((flat_dev, acc))
        outs = token_group_windows_grouped_pallas(f_, lut3_d)
        return a + sum(s(o) for o in outs)

    add("flat2_windows", flat2_windows)

    stageW = jax.jit(lambda f: token_group_windows_grouped_pallas(
        f, lut3_d))(flat_dev)

    def flat2_place(acc):
        from rspt_tpu.ops.pallas_kernels import SUP_CHUNKS, D_CLAMP
        (w0, w1, cbase, clive, gtot), a = jax.lax.optimization_barrier(
            (stageW, acc))
        ng2 = gtot.shape[1]
        gb = gtot
        p = 1
        while p < ng2:
            gb = gb + jnp.pad(gb, ((0, 0), (p, 0)))[:, :ng2]
            p *= 2
        e = gb - gtot
        e_in = e - jnp.take(e[0], gfirst_d)[None, :]
        group_base = wog_d[None, :] * 8 + dbg_d[None, :] + e_in
        nc2 = cbase.shape[1]
        nsup = nc2 // SUP_CHUNKS
        sup_per_g = nsup // ng2
        superbase = cbase[:, ::SUP_CHUNKS]
        d = jnp.clip(cbase - jnp.repeat(superbase, SUP_CHUNKS, axis=1),
                     0, D_CLAMP)
        gb_s = jnp.repeat(group_base, sup_per_g, axis=1)
        wbase = jnp.clip(jnp.right_shift(gb_s, 5) + superbase,
                         0, (nrows_f - ACC_ROWS) * 128)
        sbits = gb_s & 31
        slive = jnp.any(clive.reshape(1, nsup, SUP_CHUNKS) > 0, axis=2)
        w = super_place_flat_pallas(
            w0, w1, d[:, :, None], d.reshape(1, nsup, SUP_CHUNKS),
            wbase[:, :, None], sbits[:, :, None],
            slive[:, :, None].astype(jnp.int32), nrows_f)
        return a + s(w)

    add("flat2_place", flat2_place)

    # --- batched flat2 (serving): per-byte scaling check ---------------
    tokw4 = jnp.concatenate([tokw] * 4, axis=0)
    hist4 = np.concatenate([hist_np] * 4, axis=0)
    lengths4 = np.tile(lengths_np, 4)
    codes4 = np.concatenate([codes] * 4, axis=0)
    cbits4 = np.concatenate([cbits] * 4, axis=0)
    dbits4 = np.concatenate([desc_bits] * 4, axis=0)
    tb4, cl4, ih4, _ = jax_coder.host_layout(
        hist4, lengths4, cbits4, dbits4, np.zeros(len(lengths4), bool))
    hoff4 = (np.cumsum(cl4) - cl4).astype(np.int64)
    bas4, T4, ng4, g2b4, gf4 = jax_coder.flat_compact_layout(hist4, ih4)
    t_rows4 = T4 // 128 + 512 + 24
    nrows4 = -(-(int(cl4.sum()) // 4 + 2) // 128) + ACC_ROWS
    nrows4 = -(-nrows4 // 8) * 8
    comb4 = ((codes4.astype(np.uint32) & np.uint32(0xFFFFFF))
             | (cbits4.astype(np.uint32) << np.uint32(24))).view(np.int32)
    lut34 = np.zeros((ng4, 3 * 128), np.int32)
    lut34[:, :comb4.shape[1]] = comb4[g2b4]
    a4 = jax.device_put((bas4, lut34.reshape(ng4, 3, 128),
                         dbits4[g2b4].astype(np.int32),
                         hoff4[g2b4].astype(np.int32), gf4))

    # production behavior: _entropy_streams splits the compaction into
    # <=640 Ki-token block ranges (compact_split_plan) so each launch's
    # VMEM-resident output stays small — measure THAT, plus the unsplit
    # variant for the A/B record
    splits4 = jax_coder.compact_split_plan(hist4, ih4)

    def flat2_b4(acc):
        t_, a = jax.lax.optimization_barrier((tokw4, acc))
        w = jax_coder._pack_tokens_flat2_impl(
            t_, *a4, t_rows=t_rows4, T=T4, nrows_f=nrows4,
            compact_splits=splits4)
        return a + s(w)

    add("flat2_pack_batch4", flat2_b4)

    def flat2_b4_unsplit(acc):
        t_, a = jax.lax.optimization_barrier((tokw4, acc))
        w = jax_coder._pack_tokens_flat2_impl(
            t_, *a4, t_rows=t_rows4, T=T4, nrows_f=nrows4)
        return a + s(w)

    add("flat2_pack_batch4_unsplit", flat2_b4_unsplit)

    def flat2_b4_compact(acc):
        t_, a = jax.lax.optimization_barrier((tokw4, acc))
        if splits4:
            parts = []
            for blo, bhi, tlo, thi in splits4:
                span = thi - tlo
                bsub = jnp.where(a4[0][blo:bhi] >= thi, span,
                                 a4[0][blo:bhi] - tlo)
                sub = compact_tokens_pallas(t_[blo:bhi], bsub,
                                            span // 128 + 512 + 80)
                parts.append(sub[:span // 128])
            tokc = jnp.concatenate(parts, axis=0)
        else:
            tokc = compact_tokens_pallas(t_, a4[0], t_rows4)
        return a + s(tokc)

    add("flat2_compact_batch4", flat2_b4_compact)

    # batch4 windows / place sub-stages (where does the batch overhead
    # live?)
    flat4_dev = jax.jit(lambda t: compact_tokens_pallas(
        t, a4[0], t_rows4).reshape(1, -1)[:, :T4])(tokw4)

    def flat2_b4_windows(acc):
        f_, a = jax.lax.optimization_barrier((flat4_dev, acc))
        outs = token_group_windows_grouped_pallas(f_, a4[1])
        return a + sum(s(o) for o in outs)

    add("flat2_windows_batch4", flat2_b4_windows)

    stageW4 = jax.jit(lambda f: token_group_windows_grouped_pallas(
        f, a4[1]))(flat4_dev)

    def flat2_b4_place(acc):
        from rspt_tpu.ops.pallas_kernels import SUP_CHUNKS, D_CLAMP
        (w0, w1, cbase, clive, gtot), a = jax.lax.optimization_barrier(
            (stageW4, acc))
        ng2 = gtot.shape[1]
        gb = gtot
        p = 1
        while p < ng2:
            gb = gb + jnp.pad(gb, ((0, 0), (p, 0)))[:, :ng2]
            p *= 2
        e = gb - gtot
        e_in = e - jnp.take(e[0], a4[4])[None, :]
        group_base = a4[3][None, :] * 8 + a4[2][None, :] + e_in
        nc2 = cbase.shape[1]
        nsup = nc2 // SUP_CHUNKS
        sup_per_g = nsup // ng2
        superbase = cbase[:, ::SUP_CHUNKS]
        d = jnp.clip(cbase - jnp.repeat(superbase, SUP_CHUNKS, axis=1),
                     0, D_CLAMP)
        gb_s = jnp.repeat(group_base, sup_per_g, axis=1)
        wbase = jnp.clip(jnp.right_shift(gb_s, 5) + superbase,
                         0, (nrows4 - ACC_ROWS) * 128)
        sbits = gb_s & 31
        slive = jnp.any(clive.reshape(1, nsup, SUP_CHUNKS) > 0, axis=2)
        w = super_place_flat_pallas(
            w0, w1, d[:, :, None], d.reshape(1, nsup, SUP_CHUNKS),
            wbase[:, :, None], sbits[:, :, None],
            slive[:, :, None].astype(jnp.int32), nrows4)
        return a + s(w)

    add("flat2_place_batch4", flat2_b4_place)

    # --- decode: kernel vs placement (same-process, same clock) ------
    import rspt_tpu.hzr.pallas_decoder as pd
    from rspt_tpu.packers import tpu as tpack

    packer = tpack.new_xdelta_hzr(bps, ch, n, planes)
    comp = packer.compress(np.frombuffer(native, np.uint8))
    src = memoryview(comp)
    pos = 1
    streams = []
    for _ in range(planes):
        clen = int.from_bytes(src[pos:pos + 4], "little")
        pos += 4
        streams.append(bytes(src[pos:pos + clen]))
        pos += clen
    holder = {}
    orig_run, orig_place = pd._run_kernel, pd._place_emissions

    def run_spy(*a, **k):
        holder["run"] = (a, k)
        return orig_run(*a, **k)

    def place_spy(*a, **k):
        holder["place"] = (a, k)
        return orig_place(*a, **k)

    pd._run_kernel, pd._place_emissions = run_spy, place_spy
    pd.decode_many(streams, hints=False)
    pd._run_kernel, pd._place_emissions = orig_run, orig_place
    ra, rk = holder["run"]
    pa, pkw = holder["place"]

    def dec_kernel(acc):
        win, a = jax.lax.optimization_barrier((ra[1], acc))
        emis, counts, steps, eo = orig_run.__wrapped__(
            ra[0], win, *ra[2:], **rk)
        return a + s(counts) + s(steps) + s(emis[:, :64])

    add("dec_kernel", dec_kernel)

    def dec_place(acc):
        e, a = jax.lax.optimization_barrier((pa[0], acc))
        words = orig_place.__wrapped__(e, *pa[1:], **pkw)
        return a + s(words)

    add("dec_place", dec_place)

    # pre-fused placement replica (XLA grid transpose + glue +
    # compact_tokens): the A/B baseline for the fused placement kernel
    def dec_place_old(acc):
        (e, su_, cnt_, oo_, ol_), a = jax.lax.optimization_barrier(
            ((pa[0], pa[1], pa[2], pa[4], pa[5]), acc))
        block_first_, lane_live_ = pa[3], pa[6]
        s_eff_, nrows_ = pa[7], pa[8]
        # the production sc_rows is sized for MERGED entries; the old
        # path compacts single bytes, so size from the output total
        # (>= literal count) like the pre-merge decoder did
        sc_rows_ = min(12288,
                       -(-(-(-int(np.asarray(pa[2]).sum()) // 128)
                           + 144) // 512) * 512)
        K = 128
        ntiles = e.shape[0]
        nl = ntiles * 8 * 128
        lanes = e[:, :s_eff_].transpose(0, 2, 3, 1).reshape(nl, s_eff_)
        step_ix = jnp.arange(s_eff_, dtype=jnp.int32)[None, :]
        live_steps = jnp.repeat(su_[:, 0], 8 * 128)[:, None]
        flat_counts = jnp.where(lane_live_, cnt_.reshape(nl), 0)
        total = jnp.cumsum(flat_counts)
        excl = total - flat_counts
        out_base = oo_ + excl - jnp.take(excl, block_first_)
        ee = jnp.where((step_ix < live_steps) & lane_live_[:, None],
                       lanes, (flat_counts << 9)[:, None])
        lane_end = jnp.minimum(out_base + flat_counts, ol_)
        ends = jnp.where(lane_live_, lane_end, 0)
        pp = 1
        while pp < nl:
            ends = jnp.maximum(ends, jnp.pad(ends, (pp, 0))[:nl])
            pp *= 2
        carry = jnp.pad(ends, (1, 0))[:nl]
        base_eff = jnp.where(lane_live_, out_base, carry)
        sym = ee & 0x1FF
        outc = jnp.right_shift(ee, 9)
        pos_raw = base_eff[:, None] + outc
        live = (sym > 0) & (pos_raw < ol_[:, None])
        posx = jnp.minimum(pos_raw, jnp.maximum(ol_, carry)[:, None])
        S = nl * s_eff_
        v = jnp.where(live, (posx << 8) | (sym & 0xFF), 0)
        vc = pk.compact_tokens_pallas(
            v.reshape(1, S), jnp.zeros(1, jnp.int32), sc_rows_,
            nonzero_valid=True)
        flatv = vc.reshape(1, -1)
        live_f = flatv != 0
        pos_f = jnp.right_shift(flatv, 8)
        pos_f = jnp.where(live_f, pos_f, jnp.max(pos_f))
        nbits = jnp.where(live_f, 8, 0)
        vals = jnp.where(live_f, flatv & 0xFF, 0).astype(jnp.uint32)
        words = pd._place_words(live_f, pos_f, nbits, vals,
                                flatv.shape[1], nrows_, False, K)
        return a + s(words)

    if pkw.get("sc_rows", 0) and pa[7] <= 128:
        add("dec_place_old", dec_place_old)

    # hinted FIRST decode: the encoder-built sidecar pins the entries,
    # so the kernel runs one trusted sweep instead of the fixpoint
    packer_h = tpack.new_xdelta_hzr(bps, ch, n, planes)
    _comp_h, enc_hints = packer_h.compress_with_hints(
        np.frombuffer(native, np.uint8))
    if enc_hints is not None:
        pd._run_kernel, pd._place_emissions = run_spy, place_spy
        pd.decode_many(streams, hints=enc_hints)
        pd._run_kernel, pd._place_emissions = orig_run, orig_place
        rah, rkh = holder["run"]

        def dec_kernel_hinted(acc):
            win, a = jax.lax.optimization_barrier((rah[1], acc))
            emis, counts, steps, eo = orig_run.__wrapped__(
                rah[0], win, *rah[2:], **rkh)
            return a + s(counts) + s(steps) + s(emis[:, :64])

        add("dec_kernel_hinted", dec_kernel_hinted)

    # compile all runners once
    runners = {}
    for name, body in bodies.items():
        @jax.jit
        def run(x0, k_arr, body=body):
            return jax.lax.fori_loop(
                0, k_arr.shape[0], lambda i, acc: body(acc), x0)
        for K in (1, 9):
            float(run(jnp.float32(0), jnp.zeros(K)))
        runners[name] = run

    best = {name: {1: float("inf"), 9: float("inf")} for name in bodies}
    ROUNDS = 7
    for r in range(ROUNDS):
        for name, run in runners.items():
            for K in (1, 9):
                t0 = time.perf_counter()
                float(run(jnp.float32(0), jnp.zeros(K)))
                dt = time.perf_counter() - t0
                best[name][K] = min(best[name][K], dt)
    for name in bodies:
        dt = max((best[name][9] - best[name][1]) / 8, 1e-7)
        print(f"{name:24s} {dt*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
