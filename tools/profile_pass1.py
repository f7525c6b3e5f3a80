"""Slope-timed breakdown of the encode pass-1 stages on the real chip.

Times each device sub-stage with the K-iteration in-jit loop + slope
method (the only trustworthy device timing through the tunneled
runtime — see tools/bench_tpu.py): preprocess chain, blockify,
tokenizer scans, and the MXU nibble histogram, so the pass-1 cost
(~0.9 ms of the ~1.8 ms device encode) can be attributed.
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

    def loop_time(make_body, iters=9, reps=5):
        @jax.jit
        def run(x0, k_arr):
            return jax.lax.fori_loop(
                0, k_arr.shape[0], lambda i, acc: make_body(acc), x0)

        out = {}
        for K in (1, iters):
            karr = jnp.zeros(K)
            float(run(jnp.float32(0), karr))
            b = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                float(run(jnp.float32(0), karr))
                b = min(b, time.perf_counter() - t0)
            out[K] = b
        return max((out[iters] - out[1]) / (iters - 1), 1e-7)

    def s(x):
        return jnp.sum(x.astype(jnp.int32)).astype(jnp.float32)

    ch, n, bps, planes = 12, 34199, 4, 3
    sig, native = make_ecg(ch, n)
    raw = jax.device_put(np.frombuffer(native, np.uint8))
    plane_len = ch * n
    B = jax_coder.B
    nb_per = -(-plane_len // B)
    lengths_np = np.full(planes * nb_per, B, np.int32)
    if plane_len % B:
        lengths_np[nb_per - 1::nb_per] = plane_len % B
    lengths = jax.device_put(lengths_np)

    def pre_chain(r):
        enc = jops.native_to_i32(r, n, ch, bps).reshape(-1)
        enc = jops.xor_encode(jops.offset32(jops.delta_encode(enc), -128))
        return jops.plane_split(enc, planes)

    def blockify(p):
        padded = jnp.zeros((planes, nb_per * B), jnp.uint8)
        padded = padded.at[:, :plane_len].set(p)
        return padded.reshape(planes * nb_per, B)

    planes_dev = jax.jit(pre_chain)(raw)
    blocks = jax.jit(blockify)(planes_dev)

    def t(label, body):
        dt = loop_time(body)
        print(f"{label:32s} {dt*1e3:8.3f} ms", flush=True)
        return dt

    def pre_body(acc):
        r, a = jax.lax.optimization_barrier((raw, acc))
        return a + s(pre_chain(r)[:, :128])

    t("preprocess chain", pre_body)

    def blockify_body(acc):
        pdev, a = jax.lax.optimization_barrier((planes_dev, acc))
        return a + s(blockify(pdev)[:, :128])

    t("blockify", blockify_body)

    def tok_full(acc):
        b, a = jax.lax.optimization_barrier((blocks, acc))
        sy, ex, eb, tv, hi = jax_coder.tokenize_blocks.__wrapped__(
            b, lengths)
        return a + s(sy) + s(ex) + s(eb) + s(tv) + s(hi)

    t("tokenize_blocks (full)", tok_full)

    # isolate the MXU nibble histogram: same shapes as inside the
    # tokenizer ((nb, B) literal symbols -> (nb, 256) counts)
    nb = planes * nb_per
    lit = jax.device_put(
        np.random.default_rng(0).integers(-1, 256, (nb, B)).astype(np.int32))

    def hist_body(acc):
        x, acc = jax.lax.optimization_barrier((lit, acc))
        io16 = jnp.arange(16, dtype=jnp.int32)
        oh = (x[:, :, None] >> 4 == io16).astype(jnp.float32)
        ol = ((x[:, :, None] & 15) == io16).astype(jnp.float32)
        h16 = jnp.einsum("bsh,bsl->bhl", oh, ol,
                         preferred_element_type=jnp.float32)
        return acc + s(h16.reshape(nb, 256).astype(jnp.int32))

    t("nibble histogram (isolated)", hist_body)

    # full pass1 as the packer dispatches it
    from rspt_tpu.packers.tpu import _pass1_xdelta
    f1, _ = _pass1_xdelta(n, ch, bps, planes)

    def f1_body(acc):
        r, acc = jax.lax.optimization_barrier((raw, acc))
        small, bl, toks = f1.__wrapped__(r)
        return (acc + s(small) + s(bl[:, :64])
                + sum(s(t if t.ndim < 2 else t[:, :64]) for t in toks))

    t("pass1 full (as dispatched)", f1_body)


if __name__ == "__main__":
    main()
