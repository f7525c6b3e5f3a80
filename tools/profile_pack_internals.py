"""Windows-kernel internals: time scratch variants on the chip to see
where the pack stage budget goes (I/O floor, prefix scans, searches,
second window row). Informs whether a compaction stage or a kernel
restructure is the right next move."""

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
    from rspt_tpu.ops import jax_ops as jops
    from rspt_tpu.ops import pallas_kernels as pk
    from rspt_tpu.ops.pallas_kernels import R_TV, GROUP_TOK

    def s(x):
        return jnp.sum(x.astype(jnp.int32)).astype(jnp.float32)

    ch, n, bps, planes = 12, 34199, 4, 3
    sig, native = make_ecg(ch, n)
    raw = jax.device_put(np.frombuffer(native, "<i4"))

    def pre_chain(r):
        enc = jops.native_to_i32(r, n, ch, bps).reshape(-1)
        return jops.xor_encode(jops.offset32(jops.delta_encode(enc),
                                             -128))

    enc_dev = jax.jit(pre_chain)(raw)
    plane_len = ch * n
    tokw, _ = pk.tokenize_planes_pallas(enc_dev, planes, plane_len)
    nb, ntok = tokw.shape
    ng = -(-ntok // GROUP_TOK)
    t4 = jnp.pad(tokw, ((0, 0), (0, ng * GROUP_TOK - ntok))
                 ).reshape(nb, ng, R_TV, 128)

    spec = pl.BlockSpec((1, 1, R_TV, 128), lambda b, g: (b, g, 0, 0),
                        memory_space=pltpu.VMEM)

    def variant(body):
        def kern(t_ref, o_ref):
            o_ref[0, 0] = body(t_ref[0, 0])

        @jax.jit
        def run(t):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((nb, ng, R_TV, 128),
                                               jnp.int32),
                grid=(nb, ng),
                in_specs=[spec], out_specs=spec)(t)
        return run

    lane = None

    def mk_lane(shape):
        return jax.lax.broadcasted_iota(jnp.int32, shape, 1)

    def v_copy(w):
        return w + 1

    def v_prefix(w):
        lane = mk_lane(w.shape)
        v = w & 63
        p = 1
        while p < 128:
            v = v + jnp.where(lane >= p, pltpu.roll(v, p, 1), 0)
            p *= 2
        row = jax.lax.broadcasted_iota(jnp.int32, w.shape, 0)
        tot = jnp.broadcast_to(v[:, 127:128], w.shape)
        c = jnp.where(row >= 1, pltpu.roll(tot, 1, 0), 0)
        q = 1
        while q < w.shape[0]:
            c = c + jnp.where(row >= q + 1, pltpu.roll(c, q, 0), 0)
            q *= 2
        return v + c

    def v_search(w):
        lane = mk_lane(w.shape)
        loc = jnp.clip((w & 0xFFFF) >> 6, 0, 254)  # pseudo-sorted-ish
        cnt = jnp.zeros(w.shape, jnp.int32)
        for b in (64, 32, 16, 8, 4, 2, 1):
            t = cnt + b
            vb = jnp.take_along_axis(loc, t - 1, axis=1)
            cnt = jnp.where(vb <= lane, t, cnt)
        g = jnp.take_along_axis(w, jnp.clip(cnt - 1, 0, 127), axis=1)
        return jnp.where(cnt == 0, 0, g)

    def v_gather1(w):
        return jnp.take_along_axis(w, w & 127, axis=1)

    variants = {
        "floor_copy": v_copy,
        "prefix_scan": v_prefix,
        "search7+g": v_search,
        "gather_x1": v_gather1,
    }

    runners = {}
    for name, body in variants.items():
        run = variant(body)
        run(t4).block_until_ready()
        runners[name] = run

    # also the real windows + place for scale, same-process
    comb_np = np.zeros((nb, 261), np.int32)
    comb = jnp.asarray(comb_np)

    @jax.jit
    def real_windows(t):
        return pk.token_group_windows_tokw_pallas(
            t.reshape(nb, -1)[:, :ntok], comb)

    jax.block_until_ready(real_windows(tokw))

    def loop(run, arg, iters=9, reps=5):
        @jax.jit
        def r(k_arr, a):
            def body(i, acc):
                # tie acc into the barrier or XLA hoists the
                # loop-invariant kernel call out of the fori_loop
                x, acc = jax.lax.optimization_barrier((a, acc))
                o = run(x)
                if isinstance(o, tuple):
                    return acc + sum(s(t) for t in o)
                return acc + s(o)
            return jax.lax.fori_loop(0, k_arr.shape[0], body,
                                     jnp.float32(0))
        best = {}
        for K in (1, iters):
            karr = jnp.zeros(K)
            float(r(karr, arg))
            b = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                float(r(karr, arg))
                b = min(b, time.perf_counter() - t0)
            best[K] = b
        return max((best[iters] - best[1]) / (iters - 1), 1e-7)

    for name, run in runners.items():
        print(f"{name:14s} {loop(run, t4)*1e3:7.3f} ms", flush=True)
    print(f"{'real_windows':14s} {loop(real_windows, tokw)*1e3:7.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
