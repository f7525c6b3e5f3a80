"""Batch scaling curve for windows/place with PRE-STAGED inputs.

exp_batch4.py round 2: the grid4 place variant was invalid (it timed
4x jnp.concatenate input copies inside the body) and compact_x4 was
dead-code-eliminated by partial consumption. Here every variant's
inputs are committed device arrays and outputs are consumed via a
cheap full-coverage reduce (strided rows), so the slope isolates the
kernel itself. Adds x2 points to see the scaling curve shape.
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
    GT = jax_coder.GROUP_TOK_FLAT

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

    cfgs = {1: build(1), 2: build(2), 4: build(4)}
    for m, c in cfgs.items():
        print(f"x{m}: T={c['T']} ng={c['ng']} nrows={c['nrows']} "
              f"splits={len(c['splits'])}")

    bodies = {}

    def add(name, body):
        bodies[name] = body

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

    # compact with full consumption (strided rows touch every part)
    def mk_compact(cfg):
        def body(acc):
            t_, a = jax.lax.optimization_barrier((cfg["tokw"], acc))
            cfg2 = dict(cfg, tokw=t_)
            tokc = precompact(cfg2)
            return a + s(tokc[::37, ::31])
        return body

    for m in (1, 4):
        add(f"compact_x{m}", mk_compact(cfgs[m]))

    tokcs = {m: jax.jit(lambda c=c: precompact(c))()
             for m, c in cfgs.items()}

    def mk_windows(cfg, tokc):
        ngr = cfg["T"] // GT

        def body(acc):
            t_, a = jax.lax.optimization_barrier((tokc, acc))
            outs = token_group_windows_rows_pallas(t_, cfg["dev"][1],
                                                   ng=ngr)
            return a + sum(s(o[..., ::31]) for o in outs)
        return body

    for m in (1, 2, 4):
        add(f"windows_x{m}", mk_windows(cfgs[m], tokcs[m]))

    def stage_w(cfg, tokc):
        ngr = cfg["T"] // GT
        return jax.jit(lambda t: token_group_windows_rows_pallas(
            t, cfg["dev"][1], ng=ngr))(tokc)

    sws = {m: stage_w(cfgs[m], tokcs[m]) for m in cfgs}

    def place_inputs(cfg, sw):
        _, _, dbg, wog, gfirst = cfg["dev"]
        nrows_f = cfg["nrows"]
        w0, w1, cbase, clive, gtot = sw
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
        slive = jnp.any(clive.reshape(1, nsup, SUP_CHUNKS) > 0, axis=2)
        return (w0, w1, d3.reshape(1, nc, 1), d3, wbase[:, :, None],
                sbits[:, :, None], slive[:, :, None].astype(jnp.int32))

    pins = {m: jax.jit(lambda c=cfgs[m], w=sws[m]: place_inputs(c, w))()
            for m in cfgs}
    pins = {m: jax.block_until_ready(v) for m, v in pins.items()}

    def mk_place(cfg, pin):
        nrows_f = cfg["nrows"]

        def body(acc):
            args, a = jax.lax.optimization_barrier((pin, acc))
            w = super_place_flat_pallas(*args, nrows_f)
            return a + s(w[::37, ::31])
        return body

    for m in (1, 2, 4):
        add(f"place_x{m}", mk_place(cfgs[m], pins[m]))

    # grid-over-payloads place, inputs PRE-STAGED: payload-relative
    # wbase (copies of the single payload), out (4, nrows1, 128)
    pin1 = pins[1]
    pin_g4 = jax.jit(lambda: tuple(
        jnp.concatenate([x] * 4, axis=0) for x in pin1))()
    pin_g4 = jax.block_until_ready(pin_g4)
    nrows1 = cfgs[1]["nrows"]

    def place_grid4(acc):
        args, a = jax.lax.optimization_barrier((pin_g4, acc))
        w = super_place_pallas(*args, nrows1)
        return a + s(w[:, ::37, ::31])

    add("place_grid4(=x4)", place_grid4)

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
    for name in bodies:
        dt = max((best[name][9] - best[name][1]) / 8, 1e-7)
        print(f"{name:20s} {dt*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
