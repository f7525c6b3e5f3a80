"""Chip A/B: histogram formulations for hzr pass-1.

hist_from_tokw (the current MXU nibble einsum with f32 one-hots) is
~148 us of the 190 us pass-1 budget. Candidates measured interleaved
in one process (the only trustworthy comparison on the shared chip):

  f32   — current: oh/ol cast to f32, einsum bhl
  bf16  — oh/ol cast to bf16 (0/1 exact; f32 accumulation exact <2^24)
  i8    — int8 one-hots, int32 accumulation (v5e 2x int8 MXU rate)
  bigdot— single (S,128)x(S,128) contraction: row = block*3 + sym>>7,
          col = sym&127 (all 21*3<=63 rows live; one MXU output tile)
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
    nb = tokw.shape[0]
    ref_hist = np.asarray(jax_coder.hist_from_tokw(tokw))

    def prep(t):
        sym = t & 511
        valid = (jnp.right_shift(t, 27) & 1) != 0
        return sym, valid

    def hist_nib(t, dt):
        sym, valid = prep(t)
        lit_syms = jnp.where(valid & (sym < 256), sym, jnp.int32(-1))
        io16 = jnp.arange(16, dtype=jnp.int32)
        oh = (lit_syms[:, :, None] >> 4 == io16).astype(dt)
        ol = ((lit_syms[:, :, None] & 15) == io16).astype(dt)
        if dt == jnp.int8:
            hist16 = jnp.einsum("bsh,bsl->bhl", oh, ol,
                                preferred_element_type=jnp.int32)
            hist_lit = hist16.reshape(nb, 256)
        else:
            hist16 = jnp.einsum("bsh,bsl->bhl", oh, ol,
                                preferred_element_type=jnp.float32)
            hist_lit = hist16.reshape(nb, 256).astype(jnp.int32)
        run_hist = [jnp.sum(valid & (sym == v), axis=1, dtype=jnp.int32)
                    for v in (256, 257, 258, 259, 260)]
        return jnp.concatenate(
            [hist_lit, jnp.stack(run_hist, axis=1)], axis=1)

    def hist_bigdot(t):
        # single contraction over ALL positions: row = b*3 + sym>>7,
        # col = sym&127; dead slots get row -1 (match nothing)
        sym, valid = prep(t)
        S = nb * t.shape[1]
        symf = sym.reshape(S)
        validf = valid.reshape(S)
        blk = (jnp.arange(S, dtype=jnp.int32) // t.shape[1])
        row = jnp.where(validf, blk * 3 + (symf >> 7), -1)
        col = symf & 127
        io = jnp.arange(128, dtype=jnp.int32)
        L = (row[:, None] == io).astype(jnp.bfloat16)
        R = (col[:, None] == io).astype(jnp.bfloat16)
        C = jax.lax.dot_general(L, R, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return C.astype(jnp.int32)  # (128,128): [b*3+h, l]

    bodies = {
        "f32": lambda acc: (lambda t_, a: a + s(hist_nib(t_, jnp.float32)))(
            *jax.lax.optimization_barrier((tokw, acc))),
        "bf16": lambda acc: (lambda t_, a: a + s(hist_nib(t_, jnp.bfloat16)))(
            *jax.lax.optimization_barrier((tokw, acc))),
        "i8": lambda acc: (lambda t_, a: a + s(hist_nib(t_, jnp.int8)))(
            *jax.lax.optimization_barrier((tokw, acc))),
        "bigdot": lambda acc: (lambda t_, a: a + s(hist_bigdot(t_)))(
            *jax.lax.optimization_barrier((tokw, acc))),
    }

    # correctness first (vs the production hist)
    h_bf = np.asarray(hist_nib(tokw, jnp.bfloat16))
    h_i8 = np.asarray(hist_nib(tokw, jnp.int8))
    C = np.asarray(hist_bigdot(tokw))
    h_big = np.zeros((nb, 261), np.int64)
    for b in range(nb):
        for h in range(3):
            seg = C[b * 3 + h]
            lo = h * 128
            hi = min(lo + 128, 261)
            h_big[b, lo:hi] = seg[: hi - lo]
    print("bf16 exact:", bool((h_bf == ref_hist).all()),
          "i8 exact:", bool((h_i8 == ref_hist).all()),
          "bigdot exact:", bool((h_big == ref_hist).all()), flush=True)

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
        print(f"{name:8s} {dt*1e3:8.3f} ms   "
              f"(K1 {best[name][1]*1e3:7.3f}  K9 {best[name][9]*1e3:7.3f})",
              flush=True)


if __name__ == "__main__":
    main()
