"""Where does the batch-4 flat-pack anti-scaling live?

Times the PRODUCTION flat2 sub-stages (split compaction, windows_rows,
flat place) single vs batch4 in one process (K-loop slope, interleaved
min-of-rounds), plus a per-payload-grid place variant (grid=(4,), each
payload's supers place into its own (nrows1, 128) buffer) as the
candidate fix.
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
    from rspt_tpu.ops.pallas_kernels import (
        ACC_ROWS, D_CLAMP, SUP_CHUNKS, compact_tokens_pallas,
        super_place_flat_pallas, super_place_pallas,
        token_group_windows_rows_pallas)

    def s(x):
        return jnp.sum(x.astype(jnp.int32)).astype(jnp.float32)

    ch, n, bps, planes = 12, 34199, 4, 3
    sig, native = make_ecg(ch, n)
    raw = jax.device_put(np.frombuffer(native, "<i4"))
    plane_len = ch * n
    B = jax_coder.B
    nb_per = -(-plane_len // B)
    lengths_np = np.full(planes * nb_per, B, np.int32)
    if plane_len % B:
        lengths_np[nb_per - 1::nb_per] = plane_len % B

    def pre_chain(r):
        enc = jops.native_to_i32(r, n, ch, bps).reshape(-1)
        return jops.xor_encode(jops.offset32(jops.delta_encode(enc),
                                             -128))

    enc_dev = jax.jit(pre_chain)(raw)
    tokw, _ = pk.tokenize_planes_pallas(enc_dev, planes, plane_len)
    hist = jax_coder.hist_from_tokw(tokw)
    hist_np = np.asarray(hist)
    codes, cbits, _, desc_bits, _ = jax_coder.host_tables(
        hist_np, lengths_np)

    def build(mult):
        h = np.concatenate([hist_np] * mult, axis=0)
        ln = np.tile(lengths_np, mult)
        cd = np.concatenate([codes] * mult, axis=0)
        cb = np.concatenate([cbits] * mult, axis=0)
        db = np.tile(desc_bits, mult)
        tkw = jnp.concatenate([tokw] * mult, axis=0)
        tb, cl, ih, _ = jax_coder.host_layout(h, ln, cb, db,
                                              np.zeros(len(ln), bool))
        hoff = (np.cumsum(cl) - cl).astype(np.int64)
        bases, T, ng, g2b, gfirst = jax_coder.flat_compact_layout(h, ih)
        t_rows = T // 128 + 512 + 24
        nrows = -(-(int(cl.sum()) // 4 + 2) // 128) + ACC_ROWS
        nrows = -(-nrows // 8) * 8
        comb = ((cd.astype(np.uint32) & np.uint32(0xFFFFFF))
                | (cb.astype(np.uint32) << np.uint32(24))).view(np.int32)
        lut3 = np.zeros((ng, 3 * 128), np.int32)
        lut3[:, :comb.shape[1]] = comb[g2b]
        dev = jax.device_put((bases, lut3.reshape(ng, 3, 128),
                              db[g2b].astype(np.int32),
                              hoff[g2b].astype(np.int32), gfirst))
        splits = jax_coder.compact_split_plan(h, ih)
        return dict(tokw=tkw, dev=dev, T=T, ng=ng, t_rows=t_rows,
                    nrows=nrows, splits=splits)

    b1 = build(1)
    b4 = build(4)
    print(f"T1={b1['T']} ng1={b1['ng']} nrows1={b1['nrows']} "
          f"splits1={len(b1['splits'])}")
    print(f"T4={b4['T']} ng4={b4['ng']} nrows4={b4['nrows']} "
          f"splits4={len(b4['splits'])}")

    bodies = {}

    def add(name, body):
        bodies[name] = body

    GT = jax_coder.GROUP_TOK_FLAT

    def mk_compact(cfg):
        def body(acc):
            t_, a = jax.lax.optimization_barrier((cfg["tokw"], acc))
            bases = cfg["dev"][0]
            if cfg["splits"]:
                parts = []
                for blo, bhi, tlo, thi in cfg["splits"]:
                    span = thi - tlo
                    bsub = jnp.where(bases[blo:bhi] >= thi, span,
                                     bases[blo:bhi] - tlo)
                    sub = compact_tokens_pallas(t_[blo:bhi], bsub,
                                                span // 128 + 512 + 80,
                                                r_ct=256)
                    parts.append(sub[:span // 128])
                tokc = jnp.concatenate(parts, axis=0)
            else:
                tokc = compact_tokens_pallas(t_, bases, cfg["t_rows"],
                                             r_ct=256)
            # strided consumption touches EVERY split part — consuming
            # only [:128] let XLA dead-code the other chunks (the r4
            # compact_x4 number was bogus for this reason)
            return a + s(tokc[::128])
        return body

    add("compact_x1", mk_compact(b1))
    add("compact_x4", mk_compact(b4))

    def precompact(cfg):
        bases = cfg["dev"][0]
        if cfg["splits"]:
            parts = []
            for blo, bhi, tlo, thi in cfg["splits"]:
                span = thi - tlo
                bsub = jnp.where(bases[blo:bhi] >= thi, span,
                                 bases[blo:bhi] - tlo)
                sub = compact_tokens_pallas(cfg["tokw"][blo:bhi], bsub,
                                            span // 128 + 512 + 80,
                                            r_ct=256)
                parts.append(sub[:span // 128])
            return jnp.concatenate(parts, axis=0)
        return compact_tokens_pallas(cfg["tokw"], bases, cfg["t_rows"],
                                     r_ct=256)

    tokc1 = jax.jit(lambda: precompact(b1))()
    tokc4 = jax.jit(lambda: precompact(b4))()

    def mk_windows(cfg, tokc):
        ngr = cfg["T"] // GT

        def body(acc):
            t_, a = jax.lax.optimization_barrier((tokc, acc))
            outs = token_group_windows_rows_pallas(t_, cfg["dev"][1],
                                                   ng=ngr)
            return a + sum(s(o[..., :1]) for o in outs)
        return body

    add("windows_x1", mk_windows(b1, tokc1))
    add("windows_x4", mk_windows(b4, tokc4))

    def stage_w(cfg, tokc):
        ngr = cfg["T"] // GT
        return jax.jit(lambda t: token_group_windows_rows_pallas(
            t, cfg["dev"][1], ng=ngr))(tokc)

    sw1 = stage_w(b1, tokc1)
    sw4 = stage_w(b4, tokc4)

    def mk_place(cfg, sw):
        _, _, dbg, wog, gfirst = cfg["dev"]
        nrows_f = cfg["nrows"]

        def body(acc):
            (w0, w1, cbase, clive, gtot), a = \
                jax.lax.optimization_barrier((sw, acc))
            ng = gtot.shape[1]
            e = jnp.cumsum(gtot, axis=1) - gtot
            e_in = e - jnp.take(e[0], gfirst)[None, :]
            group_base = wog[None, :] * 8 + dbg[None, :] + e_in
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
            slive = jnp.any(clive.reshape(1, nsup, SUP_CHUNKS) > 0,
                            axis=2)
            w = super_place_flat_pallas(
                w0, w1, d3.reshape(1, nc, 1), d3,
                wbase[:, :, None], sbits[:, :, None],
                slive[:, :, None].astype(jnp.int32), nrows_f)
            return a + s(w[:128])
        return body

    add("place_x1", mk_place(b1, sw1))
    add("place_x4", mk_place(b4, sw4))

    # candidate: batch place with grid over payloads. Payloads here are
    # identical copies, so per-payload supers = the single case; emulate
    # by stacking the single payload's place inputs 4x on the BLOCK axis
    # of super_place_pallas (per-block out arrays, payload-relative
    # wbase).
    def mk_place_grid4(cfg, sw):
        _, _, dbg, wog, gfirst = cfg["dev"]
        nrows_f = cfg["nrows"]

        def body(acc):
            (w0, w1, cbase, clive, gtot), a = \
                jax.lax.optimization_barrier((sw, acc))
            ng = gtot.shape[1]
            e = jnp.cumsum(gtot, axis=1) - gtot
            e_in = e - jnp.take(e[0], gfirst)[None, :]
            group_base = wog[None, :] * 8 + dbg[None, :] + e_in
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
            slive = jnp.any(clive.reshape(1, nsup, SUP_CHUNKS) > 0,
                            axis=2)

            def rep(x):
                return jnp.concatenate([x] * 4, axis=0)

            w = super_place_pallas(
                rep(w0), rep(w1), rep(d3.reshape(1, nc, 1)), rep(d3),
                rep(wbase[:, :, None]), rep(sbits[:, :, None]),
                rep(slive[:, :, None].astype(jnp.int32)), nrows_f)
            return a + s(w[:, :128])
        return body

    add("place_grid4(=x4)", mk_place_grid4(b1, sw1))

    # ---- FULL pipeline bodies, interleaved: the honest single-vs-
    # batch comparison (bench_tpu measures these in separate sections,
    # so cross-section chip drift can fake anti-scaling) --------------
    def mk_full(cfg):
        bases, lut3, dbg, wog, gfirst = cfg["dev"]
        t_rows, T, nrows = cfg["t_rows"], cfg["T"], cfg["nrows"]
        splits = cfg["splits"]

        def body(acc):
            t_, a = jax.lax.optimization_barrier((cfg["tokw"], acc))
            w = jax_coder._pack_tokens_flat2_impl(
                t_, bases, lut3, dbg, wog, gfirst, t_rows=t_rows, T=T,
                nrows_f=nrows, compact_splits=splits)
            return a + s(w[::64])
        return body

    add("fullpack_x1", mk_full(b1))
    add("fullpack_x4", mk_full(b4))

    def mk_full_uf(cfg):
        bases, lut3, dbg, wog, gfirst = cfg["dev"]
        t_rows, T, nrows = cfg["t_rows"], cfg["T"], cfg["nrows"]
        splits = cfg["splits"]

        def body(acc):
            t_, a = jax.lax.optimization_barrier((cfg["tokw"], acc))
            w = jax_coder._pack_tokens_flat2_impl(
                t_, bases, lut3, dbg, wog, gfirst, t_rows=t_rows, T=T,
                nrows_f=nrows, compact_splits=splits, fuse_place=False)
            return a + s(w[::64])
        return body

    add("fullpack_x1_unf", mk_full_uf(b1))
    add("fullpack_x4_unf", mk_full_uf(b4))

    from rspt_tpu.packers.tpu import _fused_pass1_mode, _pass1_xdelta
    fm = _fused_pass1_mode()
    f1p, _ = _pass1_xdelta(n, ch, bps, planes, fmode=fm)
    f4p, _ = _pass1_xdelta(n * 4, ch, bps, planes, fmode=fm)
    raw1 = raw
    raw4 = jax.device_put(np.frombuffer(native * 4, "<i4"))

    def mk_pass1(fn, rw):
        def body(acc):
            r_, a = jax.lax.optimization_barrier((rw, acc))
            sm, bl, tk = fn.__wrapped__(r_)
            return a + s(sm) + s(tk[0][::32]) + s(tk[-1])
        return body

    add("pass1_x1", mk_pass1(f1p, raw1))
    add("pass1_x4", mk_pass1(f4p, raw4))

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
    for r in range(7):
        for name, run in runners.items():
            for K in (1, 9):
                t0 = time.perf_counter()
                float(run(jnp.float32(0), jnp.zeros(K)))
                dt = time.perf_counter() - t0
                best[name][K] = min(best[name][K], dt)
    nbytes = len(native)
    for name in bodies:
        dt = max((best[name][9] - best[name][1]) / 8, 1e-7)
        mult = 4 if "x4" in name or "grid4" in name else 1
        gbps = mult * nbytes / dt / 1e9
        print(f"{name:20s} {dt*1e3:8.3f} ms  {gbps:7.2f} GB/s(payload)",
              flush=True)


if __name__ == "__main__":
    main()
