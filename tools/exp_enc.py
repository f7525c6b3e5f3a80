"""One-process encode-stage budget at high K (noise-robust slopes).

The K=(1,9) slopes drift with the shared chip's clock; K=65 makes each
stage's contribution ~10-30x the dispatch noise. Measures the CURRENT
production stages plus the full fused body, all interleaved.
RSPT_EXP_ONLY=a,b filters stages.
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
    from rspt_tpu.ops import pallas_kernels as pk
    from rspt_tpu.ops.pallas_kernels import (
        ACC_ROWS, D_CLAMP, SUP_CHUNKS, compact_tokens_pallas,
        super_place_flat_pallas, token_group_windows_grouped_pallas)
    from rspt_tpu.packers.tpu import _fused_pass1_mode, _pass1_xdelta

    def s(x):
        return jnp.sum(x.astype(jnp.int32)).astype(jnp.float32)

    ch, n, bps, planes = 12, 34199, 4, 3
    sig, native = make_ecg(ch, n)
    nbytes = len(native)
    raw = jax.device_put(np.frombuffer(native, "<i4"))
    f1, lengths_np = _pass1_xdelta(n, ch, bps, planes,
                                   fmode=_fused_pass1_mode())
    small, blocks, toks = f1(raw)
    tokw = toks[0]
    hist_np = np.asarray(toks[-1])
    codes, cbits, _db, desc_bits, is_fill = jax_coder.host_tables(
        hist_np, lengths_np)
    tb_h, comp_len, is_huff, _ac = jax_coder.host_layout(
        hist_np, lengths_np, cbits, desc_bits, is_fill)
    hoff = (np.cumsum(comp_len) - comp_len).astype(np.int64)
    bases, T, ngf, g2b, gfirst = jax_coder.flat_compact_layout(
        hist_np, is_huff)
    t_rows = T // 128 + 512 + 24
    total_payload = int(comp_len.sum())
    nrows_f = -(-(total_payload // 4 + 2) // 128) + ACC_ROWS
    nrows_f = -(-nrows_f // 8) * 8
    comb_np = ((codes.astype(np.uint32) & np.uint32(0xFFFFFF))
               | (cbits.astype(np.uint32) << np.uint32(24))).view(np.int32)
    lut3_np = np.zeros((ngf, 3 * 128), np.int32)
    lut3_np[:, :comb_np.shape[1]] = comb_np[g2b]
    bases_d, lut3_d, dbg_d, wog_d, gfirst_d = jax.device_put(
        (bases, lut3_np.reshape(ngf, 3, 128),
         desc_bits[g2b].astype(np.int32), hoff[g2b].astype(np.int32),
         gfirst))

    tokc_dev = jax.jit(lambda t: compact_tokens_pallas(
        t, bases_d, t_rows))(tokw)
    flat_dev = jax.jit(lambda t: t.reshape(1, -1)[:, :T])(tokc_dev)
    stageW = jax.jit(lambda f: token_group_windows_grouped_pallas(
        f, lut3_d))(flat_dev)

    bodies = {}
    only = [p for p in os.environ.get("RSPT_EXP_ONLY", "").split(",") if p]

    def add(name, body):
        if only and not any(p in name for p in only):
            return
        bodies[name] = body

    def full_body(acc):
        r_, a = jax.lax.optimization_barrier((raw, acc))
        sm, bl, tk = f1.__wrapped__(r_)
        w = jax_coder._pack_tokens_flat2_impl(
            tk[0], bases_d, lut3_d, dbg_d, wog_d, gfirst_d,
            t_rows=t_rows, T=T, nrows_f=nrows_f)
        return a + s(sm) + s(tk[1]) + s(w)

    add("full_enc", full_body)

    def full_unfused_body(acc):
        r_, a = jax.lax.optimization_barrier((raw, acc))
        sm, bl, tk = f1.__wrapped__(r_)
        w = jax_coder._pack_tokens_flat2_impl(
            tk[0], bases_d, lut3_d, dbg_d, wog_d, gfirst_d,
            t_rows=t_rows, T=T, nrows_f=nrows_f, fuse_place=False)
        return a + s(sm) + s(tk[1]) + s(w)

    add("full_enc_unfused", full_unfused_body)

    from rspt_tpu.ops.pallas_kernels import (
        token_windows_place_flat_pallas)
    ngr_f = T // jax_coder.GROUP_TOK_FLAT

    def winplace_body(acc):
        t_, a = jax.lax.optimization_barrier((tokc_dev, acc))
        w = token_windows_place_flat_pallas(
            t_, lut3_d, dbg_d, wog_d, gfirst_d, ng=ngr_f,
            nrows=nrows_f)
        return a + s(w[::64])

    add("winplace_fused", winplace_body)

    def tok_body(acc):
        r_, a = jax.lax.optimization_barrier((raw, acc))
        sm, bl, tk = f1.__wrapped__(r_)
        return a + s(sm) + sum(s(t) for t in tk)

    add("pass1(tok+hist)", tok_body)

    from rspt_tpu.ops import jax_ops as jops

    def _pre(r):
        enc = jops.native_to_i32.__wrapped__(r, n, ch, bps).reshape(-1)
        return jops.xor_encode.__wrapped__(
            jops.offset32.__wrapped__(
                jops.delta_encode.__wrapped__(enc), -128))

    enc_dev = jax.jit(_pre)(raw)

    def tokk_body(acc):
        e_, a = jax.lax.optimization_barrier((enc_dev, acc))
        tw, bw = pk.tokenize_planes_pallas.__wrapped__(e_, planes, ch * n)
        return a + s(tw) + s(bw)

    add("tokenize_kernel", tokk_body)

    def pre_xla_body(acc):
        r_, a = jax.lax.optimization_barrier((raw, acc))
        return a + s(_pre(r_)[::512])

    add("pre_xla", pre_xla_body)

    def pre_pallas_body(acc):
        r_, a = jax.lax.optimization_barrier((raw, acc))
        e = pk.xdelta_preprocess_pallas.__wrapped__(
            jops.native_to_i32.__wrapped__(r_, n, ch, bps).reshape(-1))
        return a + s(e[::512])

    add("pre_pallas", pre_pallas_body)

    def verify_body(acc):
        e_, a = jax.lax.optimization_barrier((enc_dev, acc))
        sh = jnp.int32(32 - 8 * planes)
        ok = jnp.all(jnp.right_shift(jnp.left_shift(e_, sh), sh) == e_)
        return a + ok.astype(jnp.float32)

    add("verify", verify_body)

    def hist_body(acc):
        t_, a = jax.lax.optimization_barrier((tokw, acc))
        return a + s(jax_coder.hist_from_tokw(t_))

    add("hist", hist_body)

    def compact_body(acc):
        t_, a = jax.lax.optimization_barrier((tokw, acc))
        return a + s(compact_tokens_pallas(t_, bases_d, t_rows))

    add("compact", compact_body)

    def windows_body(acc):
        f_, a = jax.lax.optimization_barrier((flat_dev, acc))
        outs = token_group_windows_grouped_pallas(f_, lut3_d)
        return a + sum(s(o) for o in outs)

    add("windows", windows_body)

    def glue(stageW):
        w0, w1, cbase, clive, gtot = stageW
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
        return (w0, w1, d[:, :, None], d.reshape(1, nsup, SUP_CHUNKS),
                wbase[:, :, None], sbits[:, :, None],
                slive[:, :, None].astype(jnp.int32))

    def place_body(acc):
        st, a = jax.lax.optimization_barrier((stageW, acc))
        w = super_place_flat_pallas(*glue(st), nrows_f)
        return a + s(w)

    add("place(+glue)", place_body)

    def glue_body(acc):
        st, a = jax.lax.optimization_barrier((stageW, acc))
        return a + sum(s(x) for x in glue(st))

    add("glue_only", glue_body)

    def glue2(stageW):
        # cumsum + broadcast instead of pad-doubling scans/repeats
        w0, w1, cbase, clive, gtot = stageW
        ng2 = gtot.shape[1]
        e = jnp.cumsum(gtot, axis=1) - gtot
        e_in = e - jnp.take(e[0], gfirst_d)[None, :]
        group_base = wog_d[None, :] * 8 + dbg_d[None, :] + e_in
        nc2 = cbase.shape[1]
        nsup = nc2 // SUP_CHUNKS
        sup_per_g = nsup // ng2
        c3 = cbase.reshape(1, nsup, SUP_CHUNKS)
        superbase = c3[:, :, 0]
        d3 = jnp.clip(c3 - superbase[:, :, None], 0, D_CLAMP)
        gb_s = jnp.broadcast_to(
            group_base.reshape(1, ng2, 1), (1, ng2, sup_per_g)
        ).reshape(1, nsup)
        wbase = jnp.clip(jnp.right_shift(gb_s, 5) + superbase,
                         0, (nrows_f - ACC_ROWS) * 128)
        sbits = gb_s & 31
        slive = jnp.any(clive.reshape(1, nsup, SUP_CHUNKS) > 0, axis=2)
        return (w0, w1, d3.reshape(1, nc2, 1), d3,
                wbase[:, :, None], sbits[:, :, None],
                slive[:, :, None].astype(jnp.int32))

    def place2_body(acc):
        st, a = jax.lax.optimization_barrier((stageW, acc))
        w = super_place_flat_pallas(*glue2(st), nrows_f)
        return a + s(w)

    add("place(+glue2)", place2_body)

    def glue2_body(acc):
        st, a = jax.lax.optimization_barrier((stageW, acc))
        return a + sum(s(x) for x in glue2(st))

    add("glue2_only", glue2_body)

    def noop_body(acc):
        t_, a = jax.lax.optimization_barrier((tokw, acc))
        return a + s(t_[:, :128])

    add("noop(read128)", noop_body)

    runners = {}
    KHI = int(os.environ.get("RSPT_EXP_K", "33"))
    for name, body in bodies.items():
        @jax.jit
        def run(x0, k_arr, body=body):
            return jax.lax.fori_loop(
                0, k_arr.shape[0], lambda i, acc: body(acc), x0)
        for K in (1, KHI):
            float(run(jnp.float32(0), jnp.zeros(K)))
        runners[name] = run

    best = {name: {1: float("inf"), KHI: float("inf")} for name in bodies}
    for r in range(7):
        for name, run in runners.items():
            for K in (1, KHI):
                t0 = time.perf_counter()
                float(run(jnp.float32(0), jnp.zeros(K)))
                dt = time.perf_counter() - t0
                best[name][K] = min(best[name][K], dt)
    for name in bodies:
        dt = max((best[name][KHI] - best[name][1]) / (KHI - 1), 1e-7)
        print(f"{name:18s} {dt*1e3:8.3f} ms  (K1 {best[name][1]*1e3:7.2f}"
              f"  K{KHI} {best[name][KHI]*1e3:8.2f})", flush=True)
    full = max((best["full_enc"][KHI] - best["full_enc"][1]) / (KHI - 1),
               1e-7) if "full_enc" in bodies else 0
    if full:
        print(f"device encode GB/s: {nbytes/full/1e9:.3f}", flush=True)


if __name__ == "__main__":
    main()
