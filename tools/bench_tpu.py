"""TPU-engine bench phase (run as a subprocess from bench.py).

Prints one JSON line with:
- device-compute encode/decode times — measured with K-iteration
  in-jit loops (optimization_barrier dependency chains, full-result
  consumption) and slope timing (t_K - t_1)/(K-1). Plain
  block_until_ready timings are WRONG through the tunneled runtime:
  it returns before device execution finishes (a 4k matmul "measured"
  2354 TFLOP/s on a v5e), so only end-to-end d2h-synced differences
  are trustworthy.
- the host Huffman-step time and end-to-end compress/decompress wall
  times (link-bound on the tunneled dev box; see docs/DESIGN.md §5).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _enable_compile_cache, make_ecg  # noqa: E402

_enable_compile_cache()

import numpy as np  # noqa: E402


def wall_best(fn, reps=3):
    fn()
    t = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        t = min(t, time.perf_counter() - t0)
    return t


def main():
    import jax
    import jax.numpy as jnp

    from rspt_tpu.hzr import jax_coder
    import rspt_tpu.hzr.pallas_decoder as pd
    from rspt_tpu.packers import tpu as tpack
    from rspt_tpu.packers.tpu import (_fused_pass1_mode,
                                      _pass1_xdelta)

    def loop_time(make_body, iters=9, reps=5):
        """Per-iteration device time via the K-loop slope."""
        @jax.jit
        def run(x0, k_arr):
            return jax.lax.fori_loop(
                0, k_arr.shape[0], lambda i, acc: make_body(acc), x0)

        out = {}
        for K in (1, iters):
            karr = jnp.zeros(K)
            float(run(jnp.float32(0), karr))  # compile + sync
            b = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                float(run(jnp.float32(0), karr))
                b = min(b, time.perf_counter() - t0)
            out[K] = b
        slope = (out[iters] - out[1]) / (iters - 1)
        if slope <= 1e-6:
            # degenerate slope (shared-chip state flipped between the
            # K=1 and K=iters sections): report the conservative
            # full-loop average instead of a bogus near-zero time
            slope = out[iters] / iters
        return slope

    def s(x):
        return jnp.sum(x.astype(jnp.int32)).astype(jnp.float32)

    ch, n, bps, planes = 12, 34199, 4, 3
    sig, native = make_ecg(ch, n)
    nbytes = len(native)
    out = {"nbytes": nbytes, "backend": jax.default_backend()}

    # --- end-to-end (includes link transfers + host steps) -----------
    p = tpack.new_xdelta_hzr(bps, ch, n, planes)
    comp = p.compress(native)
    out["e2e_enc_s"] = wall_best(lambda: p.compress(native))
    dec, _ = p.decompress(comp)
    assert dec == native, "tpu roundtrip mismatch"
    out["e2e_dec_s"] = wall_best(lambda: p.decompress(comp))
    out["comp_len"] = len(comp)

    # --- device-compute encode (slope-timed) -------------------------
    # '<i4' word view, as the packer transfers it (packers/tpu._as_words)
    raw = jax.device_put(np.frombuffer(native, "<i4"))
    f1, lengths_np = _pass1_xdelta(n, ch, bps, planes,
                                   fmode=_fused_pass1_mode())
    small, blocks, toks = f1(raw)
    fused = len(toks) == 2   # fused pass-1: (token words, hist)
    hist = toks[-1]
    hist_np = np.asarray(hist)
    codes, cbits, desc_bytes, desc_bits, is_fill = jax_coder.host_tables(
        hist_np, lengths_np)
    out["t_tables_host_s"] = wall_best(
        lambda: jax_coder.host_tables(hist_np, lengths_np))
    cd, cb, db = jax.device_put((codes, cbits, desc_bits))

    def pass1_body(acc):
        rb, a = jax.lax.optimization_barrier((raw, acc))
        sm, bl, tk = f1.__wrapped__(rb)
        return a + s(sm) + s(bl) + sum(s(t) for t in tk)

    t_pass1 = loop_time(pass1_body)

    if fused:
        tokw = toks[0]

        def pack_body(acc):
            t_, a = jax.lax.optimization_barrier((tokw, acc))
            packed, tb = jax_coder.pack_blocks_tokw.__wrapped__(
                t_, cd, cb, db)
            return a + s(packed) + s(tb)

        packed_dev, tb_dev = jax_coder.pack_blocks_tokw(tokw, cd, cb, db)
    else:
        syms, extras, ebits, tvalid, _ = toks

        def pack_body(acc):
            s_, a = jax.lax.optimization_barrier((syms, acc))
            packed, tb = jax_coder.pack_blocks.__wrapped__(
                s_, extras, ebits, tvalid, cd, cb, db)
            return a + s(packed) + s(tb)

        packed_dev, tb_dev = jax_coder.pack_blocks(
            syms, extras, ebits, tvalid, cd, cb, db)

    t_pack = loop_time(pack_body)
    lengths_d = jax.device_put(lengths_np.astype(np.int32))
    fill_d = jax.device_put(is_fill)

    def compact_body(acc):
        p_, a = jax.lax.optimization_barrier((packed_dev, acc))
        data, meta = jax_coder.compact_payloads.__wrapped__(
            p_, blocks, tb_dev, lengths_d, fill_d)
        return a + s(meta) + s(data[:1024])

    t_compact = loop_time(compact_body)
    dev_enc = t_pass1 + t_pack + t_compact
    out.update(t_pass1_s=t_pass1, t_pack_s=t_pack,
               t_compact_s=t_compact)

    # flat-exact path (the production TPU pipeline): pack straight into
    # the final stream layout, no compact stage
    if fused:
        tb_h, comp_len, is_huff, any_copy = jax_coder.host_layout(
            hist_np, lengths_np, cbits, desc_bits, is_fill)
        if not any_copy:
            from rspt_tpu.ops.pallas_kernels import ACC_ROWS
            total_payload = int(comp_len.sum())
            nrows_f = -(-(total_payload // 4 + 2) // 128) + ACC_ROWS
            nrows_f = -(-nrows_f // 8) * 8
            hoff = (np.cumsum(comp_len) - comp_len).astype(np.int64)
            bases, T, ng, g2b, gfirst = jax_coder.flat_compact_layout(
                hist_np, is_huff)
            t_rows = T // 128 + 512 + 24  # trash span + CT_ACC headroom
            comb_np = ((codes.astype(np.uint32) & np.uint32(0xFFFFFF))
                       | (cbits.astype(np.uint32) << np.uint32(24))
                       ).view(np.int32)
            lut3 = np.zeros((ng, 3 * 128), np.int32)
            lut3[:, :comb_np.shape[1]] = comb_np[g2b]
            args = jax.device_put((
                bases, lut3.reshape(ng, 3, 128),
                desc_bits[g2b].astype(np.int32),
                hoff[g2b].astype(np.int32), gfirst))

            def flat_body(acc):
                t_, a = jax.lax.optimization_barrier((tokw, acc))
                words = jax_coder._pack_tokens_flat2_impl(
                    t_, *args, t_rows=t_rows, T=T, nrows_f=nrows_f)
                return a + s(words)

            t_flat = loop_time(flat_body)
            out["t_pack_flat_s"] = t_flat
            dev_enc = t_pass1 + t_flat
    out.update(device_enc_s=dev_enc,
               device_enc_gbps=nbytes / dev_enc / 1e9)

    # --- scale point: one 4x-length payload (fixed costs amortize) ----
    extras = os.environ.get("RSPT_BENCH_EXTRAS", "1") != "0"
    try:
        if not extras:
            raise RuntimeError("extras disabled")
        n4 = n * 4
        native4 = native * 4     # tiled: same statistics, no COPY blocks
        raw4 = jax.device_put(np.frombuffer(native4, "<i4"))
        f4, lengths4 = _pass1_xdelta(n4, ch, bps, planes,
                                     fmode=_fused_pass1_mode())
        small4, blocks4, toks4 = f4(raw4)
        if len(toks4) == 2:
            tokw4 = toks4[0]
            hist4 = np.asarray(toks4[-1])
            codes4, cbits4, _db4, dbits4, isf4 = jax_coder.host_tables(
                hist4, lengths4)
            _tb, cl4, ih4, ac4 = jax_coder.host_layout(
                hist4, lengths4, cbits4, dbits4, isf4)
            if not ac4:
                from rspt_tpu.ops.pallas_kernels import ACC_ROWS as AR4
                tp4 = int(cl4.sum())
                nrf4 = -(-(tp4 // 4 + 2) // 128) + AR4
                nrf4 = -(-nrf4 // 8) * 8
                ho4 = (np.cumsum(cl4) - cl4).astype(np.int64)
                ba4, T4, ng_4, g2b_4, gf_4 = jax_coder.flat_compact_layout(
                    hist4, ih4)
                tr4 = T4 // 128 + 512 + 24
                cb4 = ((codes4.astype(np.uint32) & np.uint32(0xFFFFFF))
                       | (cbits4.astype(np.uint32) << np.uint32(24))
                       ).view(np.int32)
                l34 = np.zeros((ng_4, 3 * 128), np.int32)
                l34[:, :cb4.shape[1]] = cb4[g2b_4]
                aa4 = jax.device_put((
                    ba4, l34.reshape(ng_4, 3, 128),
                    dbits4[g2b_4].astype(np.int32),
                    ho4[g2b_4].astype(np.int32), gf_4))
                # split compaction exactly as the production packer
                # does — one monolithic launch at 4x pushes the
                # compact output past the VMEM sweet spot (t_rows >
                # 16384) and fakes anti-scaling
                spl4 = jax_coder.compact_split_plan(hist4, ih4)

                def x4_body(acc):
                    r_, a = jax.lax.optimization_barrier((raw4, acc))
                    sm, bl, tk = f4.__wrapped__(r_)
                    w = jax_coder._pack_tokens_flat2_impl(
                        tk[0], *aa4, t_rows=tr4, T=T4, nrows_f=nrf4,
                        compact_splits=spl4)
                    return a + s(sm) + s(w)

                t_x4 = loop_time(x4_body, iters=5, reps=3)
                out["x4_device_enc_gbps"] = len(native4) / t_x4 / 1e9
            else:
                out["x4_error"] = "copy-fallback batch" 
    except Exception as e:  # pragma: no cover
        out["x4_error"] = str(e)[-200:]

    # --- batch serving: device-compute encode at batch 4 --------------
    try:
        if not extras:
            raise RuntimeError("extras disabled")
        from rspt_tpu.packers.tpu import _pass1_xdelta_batch
        BATCH = 4
        fb, _, lengths_b = _pass1_xdelta_batch(
            n, ch, bps, planes, BATCH, _fused_pass1_mode())
        raws = jnp.asarray(np.stack(
            [np.frombuffer(native, "<i4")] * BATCH))
        small_b, blocks_b, toks_b = fb(raws)
        tokw_b = toks_b[0]
        hist_b = np.asarray(toks_b[-1])
        codes_b, cbits_b, dbytes_b, dbits_b, isf_b = \
            jax_coder.host_tables(hist_b, lengths_b)
        tbh, clb, ishb, anyc = jax_coder.host_layout(
            hist_b, lengths_b, cbits_b, dbits_b, isf_b)
        if not anyc:
            from rspt_tpu.ops.pallas_kernels import ACC_ROWS as AR2
            tp = int(clb.sum())
            nrf = -(-(tp // 4 + 2) // 128) + AR2
            nrf = -(-nrf // 8) * 8
            hob = (np.cumsum(clb) - clb).astype(np.int64)
            basb, Tb, ngb, g2bb, gfb = jax_coder.flat_compact_layout(
                hist_b, ishb)
            trb = Tb // 128 + 512 + 24
            cmb = ((codes_b.astype(np.uint32) & np.uint32(0xFFFFFF))
                   | (cbits_b.astype(np.uint32) << np.uint32(24))
                   ).view(np.int32)
            l3b = np.zeros((ngb, 3 * 128), np.int32)
            l3b[:, :cmb.shape[1]] = cmb[g2bb]
            argsb = jax.device_put((
                basb, l3b.reshape(ngb, 3, 128),
                dbits_b[g2bb].astype(np.int32),
                hob[g2bb].astype(np.int32), gfb))

            splits_b = jax_coder.compact_split_plan(hist_b, ishb)

            def batch_body(acc):
                r_, a = jax.lax.optimization_barrier((raws, acc))
                sm, bl, tk = fb.__wrapped__(r_)
                w = jax_coder._pack_tokens_flat2_impl(
                    tk[0], *argsb, t_rows=trb, T=Tb, nrows_f=nrf,
                    compact_splits=splits_b)
                return a + s(sm) + s(w)

            t_b = loop_time(batch_body, iters=5, reps=3)
            out["batch4_device_enc_gbps"] = BATCH * nbytes / t_b / 1e9
    except Exception as e:  # pragma: no cover
        out["batch4_error"] = str(e)[-200:]

    # --- device-compute decode (Pallas kernel + placement) -----------
    src = memoryview(comp)
    pos = 1
    streams = []
    for _ in range(planes):
        clen = int.from_bytes(src[pos:pos + 4], "little")
        pos += 4
        streams.append(bytes(src[pos:pos + clen]))
        pos += clen
    plane_bytes = sum(int.from_bytes(st[:4], "little") for st in streams)
    # fraction of decoded bytes the device path handles (the rest are
    # pathologically dense trees routed to the host decoder on cost
    # grounds — past the per-block chunk cap)
    dev_chunks = int(os.environ.get("RSPT_DEC_DEVICE_CHUNKS", "64"))
    devb = totb = 0
    for st in streams:
        src_ = np.frombuffer(st, np.uint8)
        osz = int.from_bytes(st[:4], "little")
        huff_ = []
        pd._walk_stream(src_, osz, 0, np.zeros(osz, np.uint8), huff_)
        for payload, pbits, dbits, ooff, olen, tree, _crc in huff_:
            totb += olen
            lut = pd.build_lut_nib(tree)
            if lut is not None and sum(lut[2]) <= dev_chunks:
                devb += olen
    out["dec_device_bytes_frac"] = round(devb / max(totb, 1), 4)
    outs = pd.decode_many(streams, hints=False)
    from rspt_tpu.hzr import pyref
    assert all(o == pyref.decode(st) for o, st in zip(outs, streams)), \
        "device decoder output differs from the spec decoder"
    out["dec_e2e_s"] = wall_best(
        lambda: pd.decode_many(streams, hints=False))

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

    def kern_body(acc):
        win, a = jax.lax.optimization_barrier((ra[1], acc))
        emis, counts, steps, eo = orig_run.__wrapped__(
            ra[0], win, *ra[2:], **rk)
        return a + s(counts) + s(steps) + s(emis[:, :64])

    t_kernel = loop_time(kern_body, iters=5, reps=3)
    pa, pkw = holder["place"]
    out["dec_s_eff"] = int(pa[7]) if len(pa) > 7 else pkw.get("s_eff")

    def place_body(acc):
        e, a = jax.lax.optimization_barrier((pa[0], acc))
        words = orig_place.__wrapped__(e, *pa[1:], **pkw)
        return a + s(words)

    t_place = loop_time(place_body, iters=5, reps=3)

    # aligned-decode hints: skip the speculative fixpoint sweeps. The
    # hints come from the ENCODER's sidecar (hzr/sidecar.py) — the
    # first-decode serving configuration, where the sidecar ships with
    # the stream — falling back to decoder-captured hints (re-decode of
    # a known stream) when the sidecar is unavailable.
    t_kernel_h = None
    if extras:
        hints = None
        try:
            pk_h = tpack.new_xdelta_hzr(bps, ch, n, planes)
            _comp_h, hints = pk_h.compress_with_hints(
                np.frombuffer(native, np.uint8))
            out["dec_hints_source"] = "encoder_sidecar"
        except Exception:
            hints = None
        if hints is None:
            _, hints = pd.decode_many(streams, return_hints=True)
            out["dec_hints_source"] = "decoder_capture"
        holder2 = {}

        def run_spy2(*a, **k):
            holder2["run"] = (a, k)
            return orig_run(*a, **k)

        pd._run_kernel = run_spy2
        outs_h = pd.decode_many(streams, hints=hints)
        pd._run_kernel = orig_run
        assert outs_h == outs, "hinted decode diverged"
        ha, hk = holder2["run"]
        assert int(np.asarray(ha[0])[0, 4]) == 1, \
            "hints were not trusted — measuring the unhinted kernel"

        def kern_hint_body(acc):
            win, a = jax.lax.optimization_barrier((ha[1], acc))
            emis, counts, steps, eo = orig_run.__wrapped__(
                ha[0], win, *ha[2:], **hk)
            return a + s(counts) + s(steps) + s(emis[:, :64])

        t_kernel_h = loop_time(kern_hint_body, iters=5, reps=3)
        out["t_dec_kernel_hinted_s"] = t_kernel_h
    dev_dec = t_kernel + t_place
    out.update(t_dec_kernel_s=t_kernel, t_dec_place_s=t_place,
               device_dec_s=dev_dec,
               device_dec_gbps=nbytes / dev_dec / 1e9,
               device_dec_plane_MBps=plane_bytes / dev_dec / 1e6)
    if t_kernel_h is not None:
        # the hinted sweep is a strict SUBSET of the unhinted work
        # (fixpoint skipped), so a slower reading is chip-window drift
        # between the two measurement sections — clamp to the unhinted
        # kernel measured in this same process
        t_kernel_h = min(t_kernel_h, t_kernel)
        dev_dec_h = t_kernel_h + t_place
        out.update(device_dec_hinted_s=dev_dec_h,
                   device_dec_hinted_gbps=nbytes / dev_dec_h / 1e9)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
