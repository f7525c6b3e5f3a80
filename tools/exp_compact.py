"""Chip A/B: token compaction via butterfly routing (gather-free).

The production compact kernel finds each output slot's source lane
with a 7-step binary search (7 take_along_axis gathers per tile) plus
one gather per value plane. Monotone compaction admits a collision-
free LSB-first butterfly route instead: every element moves LEFT by
delta = lane - (rank-1), one power-of-2 stage per bit — 7 stages of
roll+select, no gathers. (Collision-free: for valid a<b,
delta_b - delta_a = #invalid in [a,b) < b - a, so partial-delta
positions never coincide.)
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
    from rspt_tpu.ops.pallas_kernels import (
        R_CT, _tri128, compact_tokens_pallas)
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
    _tb, comp_len, is_huff, _ac = jax_coder.host_layout(
        hist_np, lengths_np, cbits, desc_bits, is_fill)
    bases, T, ngf, g2b, gfirst = jax_coder.flat_compact_layout(
        hist_np, is_huff)
    t_rows = T // 128 + 512 + 24
    bases_d = jax.device_put(bases)

    # ---- butterfly variant ------------------------------------------
    def _bf_kernel(base_ref, tokw_ref, out_ref, carry_ref):
        b = pl.program_id(0)
        t = pl.program_id(1)

        @pl.when((b == 0) & (t == 0))
        def _():
            out_ref[...] = jnp.zeros(out_ref.shape, jnp.int32)

        @pl.when(t == 0)
        def _():
            carry_ref[0] = base_ref[b]

        w = tokw_ref[0, 0]
        valid = jnp.right_shift(w, 27) & 1
        lane = jax.lax.broadcasted_iota(jnp.int32, w.shape, 1)
        tri = _tri128()
        vr = jax.lax.dot_general(valid.astype(jnp.bfloat16), tri,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32
                                 ).astype(jnp.int32)
        cnt = vr[:, 127:128]
        # butterfly route LEFT by delta = lane - (vr-1); invalid = 0
        x = jnp.where(valid != 0, w, 0)
        delta = jnp.where(valid != 0, lane - vr + 1, 0)
        for k in (1, 2, 4, 8, 16, 32, 64):
            candx = pltpu.roll(x, 128 - k, 1)
            candd = pltpu.roll(delta, 128 - k, 1)
            arrives = ((candd & k) != 0) & (lane < 128 - k)
            stays = (delta & k) == 0
            x = jnp.where(arrives, candx, jnp.where(stays, x, 0))
            delta = jnp.where(arrives, candd, jnp.where(stays, delta, 0))
        packed = x  # lane o holds the (o+1)-th valid token (0 past cnt)

        # cross-row placement (same as production: tri rowbase + rolls
        # + one-hot byte-quarter MXU placement, one RMW)
        R = w.shape[0]
        jr = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
        qr = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
        tris = (qr < jr).astype(jnp.bfloat16)
        rowbase = jax.lax.dot_general(
            tris, jnp.broadcast_to(cnt, (R, 128)).astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)[:, 0:1]
        carry = carry_ref[0]
        lane8 = lane
        rowiota = jax.lax.broadcasted_iota(jnp.int32, (R + 8, R), 0)
        u32 = jnp.uint32
        off = carry + rowbase
        row0 = off[0, 0] >> 7
        d = off - (row0 << 7)
        sh = d & 127
        rc = (d >> 7).reshape(1, R)
        x_lo = (rowiota == rc).astype(jnp.float32)
        x_hi = (rowiota == rc + 1).astype(jnp.float32)

        def quarters(sp):
            up = pltpu.bitcast(sp, u32)
            return [pltpu.bitcast((up >> u32(8 * q)) & u32(0xFF),
                                  jnp.int32).astype(jnp.float32)
                    for q in range(4)]

        dot = functools.partial(jnp.dot,
                                preferred_element_type=jnp.float32)
        rot = packed
        for k in (1, 2, 4, 8, 16, 32, 64):
            rot = jnp.where((sh & k) != 0, pltpu.roll(rot, k, 1), rot)
        lo = jnp.where(lane8 >= sh, rot, 0)
        hi = jnp.where(lane8 < sh, rot, 0)
        qlo = quarters(lo)
        qhi = quarters(hi)
        acc = jnp.zeros((R + 8, 128), jnp.int32)
        for q in range(4):
            a_q = dot(x_lo, qlo[q]) + dot(x_hi, qhi[q])
            acc = acc | (a_q.astype(jnp.int32) << (8 * q))
        out_ref[0, pl.ds(row0, R + 8), :] += acc
        carry_ref[0] = carry + rowbase[R - 1, 0] + cnt[R - 1, 0]

    @functools.partial(jax.jit, static_argnames=("t_rows",))
    def compact_bf(tokw, bases, t_rows: int):
        nb, ntok = tokw.shape
        ntiles = -(-ntok // (R_CT * 128))
        t4 = jnp.pad(tokw.astype(jnp.int32),
                     ((0, 0), (0, ntiles * R_CT * 128 - ntok))
                     ).reshape(nb, ntiles, R_CT, 128)
        out = pl.pallas_call(
            _bf_kernel,
            out_shape=jax.ShapeDtypeStruct((1, t_rows, 128), jnp.int32),
            grid=(nb, ntiles),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, R_CT, 128), lambda b, t: (b, t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, t_rows, 128),
                                   lambda b, t: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        )(bases, t4)
        return out[0]

    cur = np.asarray(compact_tokens_pallas(tokw, bases_d, t_rows))
    bf = np.asarray(compact_bf(tokw, bases_d, t_rows))
    print("butterfly == current:", bool((cur == bf).all()), flush=True)

    bodies = {
        "compact_cur": lambda acc: (lambda t_, a: a + s(
            compact_tokens_pallas(t_, bases_d, t_rows)))(
            *jax.lax.optimization_barrier((tokw, acc))),
        "compact_bf": lambda acc: (lambda t_, a: a + s(
            compact_bf(t_, bases_d, t_rows)))(
            *jax.lax.optimization_barrier((tokw, acc))),
    }
    runners = {}
    KHI = 33
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
                best[name][K] = min(best[name][K],
                                    time.perf_counter() - t0)
    for name in bodies:
        dt = max((best[name][KHI] - best[name][1]) / (KHI - 1), 1e-7)
        print(f"{name:14s} {dt*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
