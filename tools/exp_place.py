"""Chip A/B: super_place_flat with 8-aligned dynamic row slices.

Hypothesis: the per-super read-modify-write
``out_ref[0, pl.ds(row0, ACC_ROWS)] += span`` uses an arbitrary
(unaligned) sublane start, which Mosaic lowers through a slow path;
aligning row0 to 8 and compensating with one extra dynamic row roll
should cut the place stage. Also measures a SUP_CHUNKS=64 variant.
"""

import functools
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

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
    nrows_f = -(-(total_payload // 4 + 2) // 128) + ACC_ROWS + 8
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

    # ---- aligned-slice variant of the flat super place ---------------
    AR2 = 56  # 41-row real span + his row + <=7 align rows

    def _flat_kernel_aligned(w0_ref, w1_ref, drow_ref, dlane_ref,
                             wbase_ref, sbits_ref, slive_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[...] = jnp.zeros(out_ref.shape, jnp.int32)

        nsup = wbase_ref.shape[1]
        u32 = jnp.uint32
        lane32 = jax.lax.broadcasted_iota(jnp.int32, (SUP_CHUNKS, 128), 1)
        laneA = jax.lax.broadcasted_iota(jnp.int32, (AR2, 128), 1)
        rowiota = jax.lax.broadcasted_iota(jnp.int32, (AR2, SUP_CHUNKS), 0)

        def body(sx, _):
            lv = slive_ref[0, pl.ds(sx, 1), 0:1][0, 0]

            @pl.when(lv != 0)
            def _():
                dcol = drow_ref[0, pl.ds(sx * SUP_CHUNKS, SUP_CHUNKS), 0:1]
                t = dcol & 127
                r0 = w0_ref[0, pl.ds(sx * SUP_CHUNKS, SUP_CHUNKS), :]
                r1 = w1_ref[0, pl.ds(sx * SUP_CHUNKS, SUP_CHUNKS), :]
                for k in (1, 2, 4, 8, 16, 32, 64):
                    m = (t & k) != 0
                    r0 = jnp.where(m, pltpu.roll(r0, k, 1), r0)
                    r1 = jnp.where(m, pltpu.roll(r1, k, 1), r1)
                ge = lane32 >= t
                s0 = jnp.where(ge, r0, 0)
                s1 = jnp.where(ge, r1, r0)
                s2 = jnp.where(ge, 0, r1)

                dl = dlane_ref[0, pl.ds(sx, 1), :]
                rc = jnp.right_shift(dl, 7)
                x0 = (rowiota == rc).astype(jnp.float32)

                def quarters(sp):
                    up = pltpu.bitcast(sp, u32)
                    return [pltpu.bitcast((up >> u32(8 * q)) & u32(0xFF),
                                          jnp.int32).astype(jnp.float32)
                            for q in range(4)]

                q0 = quarters(s0)
                q1 = quarters(s1)
                q2 = quarters(s2)
                dot = functools.partial(
                    jnp.dot, preferred_element_type=jnp.float32)
                acc = jnp.zeros((AR2, 128), jnp.int32)
                for q in range(4):
                    acc_q = (dot(x0, q0[q])
                             + pltpu.roll(dot(x0, q1[q]), 1, 0)
                             + pltpu.roll(dot(x0, q2[q]), 2, 0))
                    acc = acc | (acc_q.astype(jnp.int32) << (8 * q))

                sb = sbits_ref[0, pl.ds(sx, 1), 0:1][0, 0]
                au = pltpu.bitcast(acc, u32)
                prev = pltpu.roll(acc, 1, 1)
                prev = jnp.where(laneA == 0, pltpu.roll(prev, 1, 0), prev)
                pu = pltpu.bitcast(prev, u32)
                sbu = sb.astype(u32)
                inv = ((32 - sb) & 31).astype(u32)
                acc2 = pltpu.bitcast(
                    jnp.where(sb > 0, (au << sbu) | (pu >> inv), au),
                    jnp.int32)

                b = wbase_ref[0, pl.ds(sx, 1), 0:1][0, 0]
                row0 = jnp.right_shift(b, 7)
                row0a = row0 & ~7
                extra = row0 - row0a
                r = b & 127
                rot = pltpu.roll(acc2, r, 1)
                los = jnp.where(laneA >= r, rot, 0)
                his = jnp.where(laneA < r, rot, 0)
                span = los + pltpu.roll(his, 1, 0)
                span = pltpu.roll(span, extra, 0)
                out_ref[0, pl.ds(row0a, AR2), :] += span

            return 0

        jax.lax.fori_loop(0, nsup, body, 0)

    @functools.partial(jax.jit, static_argnames=("nrows",))
    def place_aligned(w0, w1, drow, dlane, wbase, sbits, slive,
                      nrows: int):
        nb, nc, _ = w0.shape
        nsup = nc // SUP_CHUNKS
        wspec = pl.BlockSpec((1, nc, 128), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)
        sspec = pl.BlockSpec((1, nsup, 1), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            _flat_kernel_aligned,
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
        )(w0, w1, drow, dlane, wbase, sbits, slive)
        return out[0]

    def glue(stageW, ar):
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
                         0, (nrows_f - ar) * 128)
        sbits = gb_s & 31
        slive = jnp.any(clive.reshape(1, nsup, SUP_CHUNKS) > 0, axis=2)
        return (w0, w1, d[:, :, None], d.reshape(1, nsup, SUP_CHUNKS),
                wbase[:, :, None], sbits[:, :, None],
                slive[:, :, None].astype(jnp.int32))

    # parity check
    args_c = glue(stageW, ACC_ROWS)
    args_a = glue(stageW, AR2)
    w_cur = np.asarray(super_place_flat_pallas(*args_c, nrows_f))
    w_al = np.asarray(place_aligned(*args_a, nrows=nrows_f))
    nwords_real = total_payload // 4
    same = bool((w_cur.reshape(-1)[:nwords_real]
                 == w_al.reshape(-1)[:nwords_real]).all())
    print("aligned == current:", same, flush=True)

    def body_cur(acc):
        st, a = jax.lax.optimization_barrier((stageW, acc))
        w = super_place_flat_pallas(*glue(st, ACC_ROWS), nrows_f)
        return a + s(w)

    def body_al(acc):
        st, a = jax.lax.optimization_barrier((stageW, acc))
        w = place_aligned(*glue(st, AR2), nrows=nrows_f)
        return a + s(w)

    bodies = {"place_cur": body_cur, "place_aligned": body_al}
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
        print(f"{name:16s} {dt*1e3:8.3f} ms   (K1 {best[name][1]*1e3:7.3f}"
              f"  K9 {best[name][9]*1e3:7.3f})", flush=True)


if __name__ == "__main__":
    main()
