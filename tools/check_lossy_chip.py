"""Real-chip lossy-path check: DCT df32 parity envelope + transform
stage timings (VERDICT r2 item 6).

Two questions only the real chip can answer (CPU/interpret compute
full f32 and hide MXU/VPU rounding):
  1. Do the device df32 DCT kernels (ops/jax_ops.dct_*_exact)
     reproduce the native serial-f64 kernel bit-for-bit on chip?
     Reports exact-match fraction + max |delta| forward and inverse,
     plus whether the PACKER-level roundtrip (reconstruction) matches.
  2. Transform stage timings, same-process interleaved (K-loop slope):
     FWHT XLA reshape-butterflies vs the VMEM Pallas kernel, and the
     df32 DCT kernels — the numbers behind the lossy packers' device
     defaults.

Prints one JSON line. Usage: python tools/check_lossy_chip.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _enable_compile_cache  # noqa: E402

_enable_compile_cache()

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from rspt_tpu.ops import jax_ops as jops
    from rspt_tpu.ops import numpy_ops as nops
    from rspt_tpu.ops.pallas_kernels import fwht_pallas

    out = {"backend": jax.default_backend()}

    # --- DCT parity: device df32 vs native serial-f64 ----------------
    ch, n, quality = 12, 4096, 128.0
    rng = np.random.default_rng(5)
    # ECG-like: smooth baseline + beats + noise, 24-bit range
    t = np.arange(n) / 1000.0
    base = (2_000_000 * np.sin(2 * np.pi * 1.2 * t)[None, :]).astype(
        np.float64)
    src = (base + rng.normal(0, 30_000, (ch, n))).astype(np.int32)

    cos_t = nops.dct_cos_table(n)
    cs = nops.dct_cs(n)
    try:
        from rspt_tpu.native import bindings as nat
        fwd_ref = np.stack([nat.dct_forward(src[j], cos_t, cs, quality)
                            for j in range(ch)])
    except Exception:
        fwd_ref = np.stack([nops.dct_forward(src[j], cos_t, cs, quality)
                            for j in range(ch)])
    fwd_dev = np.asarray(jops.dct_forward_exact(jnp.asarray(src), quality))
    d_f = np.abs(fwd_dev.astype(np.int64) - fwd_ref.astype(np.int64))
    out["dct_fwd_exact_frac"] = float((d_f == 0).mean())
    out["dct_fwd_max_delta"] = int(d_f.max())

    try:
        from rspt_tpu.native import bindings as nat
        inv_ref = np.stack([nat.dct_inverse(fwd_ref[j], cos_t, cs, quality)
                            for j in range(ch)])
    except Exception:
        inv_ref = np.stack([nops.dct_inverse(fwd_ref[j], cos_t, cs, quality)
                            for j in range(ch)])
    inv_dev = np.asarray(jops.dct_inverse_exact(jnp.asarray(fwd_ref),
                                                quality))
    d_i = np.abs(inv_dev.astype(np.int64) - inv_ref.astype(np.int64))
    out["dct_inv_exact_frac"] = float((d_i == 0).mean())
    out["dct_inv_max_delta"] = int(d_i.max())

    # --- serial-order compensated df32 (VERDICT r4 task 6): does a
    # TwoSum chain in the REFERENCE's exact accumulation order close
    # the ±1 LSB gap vs the serial-f64 kernel? (df32 carries ~49
    # mantissa bits vs f64's 53 and rounds differently per step, so
    # this measures whether those last bits ever cross a truncation
    # boundary on real data.) 4 channels bound the O(n) scan cost.
    ch_s = 4

    def serial_fwd(xrow):
        prods = xrow[:, None] * jnp.asarray(cos_t)   # (n terms, n out)

        def step(carry, p):
            s_, e_ = carry
            t_ = s_ + p
            bp = t_ - s_
            err = (s_ - (t_ - bp)) + (p - bp)
            return (t_, e_ + err), None

        (s_, e_), _ = jax.lax.scan(
            step, (jnp.zeros(n, jnp.float32), jnp.zeros(n, jnp.float32)),
            prods)
        kf_hi, kf_lo = jops._dct_exact_consts(n, quality)[2:4]
        s2, e2 = jops._df32_mul(s_, e_, kf_hi, kf_lo)
        return jops._df32_trunc(s2, e2)

    t0s = time.perf_counter()
    fwd_ser = np.asarray(jax.jit(
        lambda x: jax.lax.map(serial_fwd, x))(
        jnp.asarray(src[:ch_s]).astype(jnp.float32)))
    t_serial = time.perf_counter() - t0s
    d_s = np.abs(fwd_ser.astype(np.int64)
                 - fwd_ref[:ch_s].astype(np.int64))
    out["dct_fwd_serial2sum_exact_frac"] = float((d_s == 0).mean())
    out["dct_fwd_serial2sum_max_delta"] = int(d_s.max())
    out["dct_fwd_serial2sum_s_for_4ch"] = round(t_serial, 4)

    # packer-level: does device_transform=True reproduce the host
    # packer's reconstruction (and stream) on this data?
    from rspt_tpu.packers import tpu as tpack
    native = np.ascontiguousarray(src.T).astype("<i4").tobytes()
    p_host = tpack.new_dct(4, ch, n)
    p_dev = tpack.new_dct(4, ch, n, device_transform=True)
    c_h = p_host.compress(native)
    c_d = p_dev.compress(native)
    out["dct_packer_stream_equal"] = bool(bytes(c_h) == bytes(c_d))
    r_h, _ = p_host.decompress(c_h)
    r_d, _ = p_dev.decompress(c_h)
    out["dct_packer_recon_equal"] = bool(r_h == r_d)

    # --- FWHT: int32 exactness + XLA vs Pallas timing -----------------
    nh = 16384
    had = rng.integers(-(1 << 22), 1 << 22, (ch, nh), dtype=np.int64
                       ).astype(np.int32)
    ref_h = np.stack([nops.fwht(had[j]) for j in range(ch)])
    dev_x = np.asarray(jops.fwht(jnp.asarray(had)))
    dev_p = np.asarray(fwht_pallas(jnp.asarray(had)))
    out["fwht_xla_exact"] = bool(np.array_equal(dev_x, ref_h))
    out["fwht_pallas_exact"] = bool(np.array_equal(dev_p, ref_h))

    # --- interleaved stage timings ------------------------------------
    def s(x):
        return jnp.sum(x.astype(jnp.int32)).astype(jnp.float32)

    had_d = jnp.asarray(had)
    src_d = jnp.asarray(src)
    fwd_d = jnp.asarray(fwd_ref)
    bodies = {
        "fwht_xla_ms": lambda acc: (lambda h, a: a + s(
            jops.fwht.__wrapped__(h) if hasattr(jops.fwht, "__wrapped__")
            else jops.fwht(h)))(
            *jax.lax.optimization_barrier((had_d, acc))),
        "fwht_pallas_ms": lambda acc: (lambda h, a: a + s(
            fwht_pallas.__wrapped__(h)))(
            *jax.lax.optimization_barrier((had_d, acc))),
        "dct_fwd_df32_ms": lambda acc: (lambda x, a: a + s(
            jops.dct_forward_exact(x, quality)))(
            *jax.lax.optimization_barrier((src_d, acc))),
        "dct_inv_df32_ms": lambda acc: (lambda x, a: a + s(
            jops.dct_inverse_exact(x, quality)))(
            *jax.lax.optimization_barrier((fwd_d, acc))),
    }
    runners = {}
    for name, body in bodies.items():
        @jax.jit
        def run(x0, k_arr, body=body):
            return jax.lax.fori_loop(0, k_arr.shape[0],
                                     lambda i, acc: body(acc), x0)
        for K in (1, 5):
            float(run(jnp.float32(0), jnp.zeros(K)))
        runners[name] = run
    best = {nm: {1: 9e9, 5: 9e9} for nm in bodies}
    for _ in range(7):
        for nm, run in runners.items():
            for K in (1, 5):
                t0 = time.perf_counter()
                float(run(jnp.float32(0), jnp.zeros(K)))
                best[nm][K] = min(best[nm][K], time.perf_counter() - t0)
    for nm in bodies:
        out[nm] = round(max((best[nm][5] - best[nm][1]) / 4, 0) * 1e3, 4)

    # host-native DCT (the strict-parity default) for comparison
    t_best = 9e9
    for _ in range(3):
        t0 = time.perf_counter()
        for j in range(ch):
            nops_out = None
            try:
                from rspt_tpu.native import bindings as nat
                nops_out = nat.dct_forward(src[j], cos_t, cs, quality)
            except Exception:
                nops_out = nops.dct_forward(src[j], cos_t, cs, quality)
        t_best = min(t_best, time.perf_counter() - t0)
    out["dct_fwd_native_host_ms"] = round(t_best * 1e3, 4)

    # blocked+MT native DCT (bit-exact, the production parity path)
    try:
        from rspt_tpu.native import bindings as nat
        nat.dct_forward_mt(src, cos_t, cs, quality)  # warm the pool
        for nm, fn in (
            ("dct_fwd_native_mt_ms",
             lambda: nat.dct_forward_mt(src, cos_t, cs, quality)),
            ("dct_inv_native_mt_ms",
             lambda: nat.dct_inverse_mt(
                 fwd_ref, np.ascontiguousarray(cos_t.T), cs, quality)),
        ):
            t_best = 9e9
            for _ in range(5):
                t0 = time.perf_counter()
                fn()
                t_best = min(t_best, time.perf_counter() - t0)
            out[nm] = round(t_best * 1e3, 4)
    except Exception:
        pass

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
