"""Chip A/B: decode-stage budget at sub-stage granularity.

Splits the decode pipeline (pallas_decoder.decode_many) into
interleaved K-loop slope stages on the real chip:

  dec_kernel          alignment fixpoint + emit sweeps (unhinted)
  dec_kernel_hinted   single trusted sweep (encoder sidecar)
  dec_place           full _place_emissions (production fused path)
  dec_place_A         place_compact_pallas kernel alone
  dec_place_B         post-compaction glue + _place_words
  dec_packf           _pack_fields alone (windows + super place)

Run on the chip; interleaved min-of-R is the trustworthy comparison
(CLAUDE.md measurement rules).
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

    from rspt_tpu.hzr import pallas_decoder as pd
    from rspt_tpu.ops import pallas_kernels as pk
    from rspt_tpu.packers import tpu as tpack

    ch, n, bps, planes = 12, 34199, 4, 3
    sig, native = make_ecg(ch, n)
    packer = tpack.new_xdelta_hzr(bps, ch, n, planes)
    comp, enc_hints = packer.compress_with_hints(
        np.frombuffer(native, np.uint8))
    src = memoryview(comp)
    pos = 1
    streams = []
    for _ in range(planes):
        clen = int.from_bytes(src[pos:pos + 4], "little")
        pos += 4
        streams.append(bytes(src[pos:pos + clen]))
        pos += clen

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
    pa, pkw = holder["place"]
    (emis0, steps0, counts0, block_first, out_off, out_limit,
     lane_live, s_eff, nrows_out) = pa
    sc_rows = pkw.get("sc_rows", 0)
    fused = pkw.get("fused", False)
    print(f"s_eff={s_eff} sc_rows={sc_rows} fused={fused} "
          f"nrows_out={nrows_out} emis={emis0.shape}", flush=True)

    def s(x):
        return jnp.sum(x.astype(jnp.int32)).astype(jnp.float32)

    names, bodies = [], []

    def add(name, body):
        names.append(name)
        bodies.append(body)

    def dec_kernel(acc):
        win, a = jax.lax.optimization_barrier((ra[1], acc))
        emis, counts, steps, eo = orig_run.__wrapped__(
            ra[0], win, *ra[2:], **rk)
        return a + s(counts) + s(steps) + s(emis[:, :64])

    add("dec_kernel", dec_kernel)

    if enc_hints is not None:
        pd._run_kernel, pd._place_emissions = run_spy, place_spy
        pd.decode_many(streams, hints=enc_hints)
        pd._run_kernel, pd._place_emissions = orig_run, orig_place
        rah, rkh = holder["run"]

        def dec_kernel_hinted(acc):
            win, a = jax.lax.optimization_barrier((rah[1], acc))
            emis, counts, steps, eo = orig_run.__wrapped__(
                rah[0], win, *rah[2:], **rkh)
            return a + s(counts) + s(steps) + s(emis[:, :64])

        add("dec_kernel_hinted", dec_kernel_hinted)

    def dec_place(acc):
        e, a = jax.lax.optimization_barrier((pa[0], acc))
        words = orig_place.__wrapped__(e, *pa[1:], **pkw)
        return a + s(words)

    add("dec_place", dec_place)

    ntiles = emis0.shape[0]
    nl = ntiles * 8 * 128

    def stage_a(e, cnts):
        flat_counts = jnp.where(lane_live, cnts.reshape(nl), 0)
        total = jnp.cumsum(flat_counts)
        excl = total - flat_counts
        out_base = out_off + excl - jnp.take(excl, block_first)
        meta = jnp.concatenate([
            out_base.reshape(ntiles, 8, 1, 128),
            out_limit.reshape(ntiles, 8, 1, 128),
            lane_live.astype(jnp.int32).reshape(ntiles, 8, 1, 128),
        ], axis=2)
        return pk.place_compact_pallas(e, steps0[:, 0], meta, sc_rows)

    if fused and sc_rows:
        def place_a_body(acc):
            (e, cnts), a = jax.lax.optimization_barrier(
                ((emis0, counts0), acc))
            vc = stage_a(e, cnts)
            return a + s(vc[:, :64])

        add("dec_place_A", place_a_body)

        vc0 = jax.jit(stage_a)(emis0, counts0)
        vc0.block_until_ready()

        def stage_b(vc):
            flatm = vc[:sc_rows].reshape(1, -1)
            flatv = vc[sc_rows:].reshape(1, -1)
            live_f = flatv != 0
            pos_f = jnp.right_shift(flatm, 2)
            pos_f = jnp.where(live_f, pos_f, jnp.max(pos_f))
            nbits = jnp.where(live_f, ((flatm & 3) + 1) * 8, 0)
            vals = jnp.where(live_f, flatv, 0).astype(jnp.uint32)
            return pd._place_words(live_f, pos_f, nbits, vals,
                                   flatv.shape[1], nrows_out, False,
                                   128, allow_fb=False)

        def place_b_body(acc):
            vc, a = jax.lax.optimization_barrier((vc0, acc))
            return a + s(stage_b(vc))

        add("dec_place_B", place_b_body)

        def stage_bw(vc):
            # _pack_fields alone (fits-gated main pack, no tier2/fb)
            flatm = vc[:sc_rows].reshape(1, -1)
            flatv = vc[sc_rows:].reshape(1, -1)
            live_f = flatv != 0
            pos_f = jnp.right_shift(flatm, 2)
            pos_f = jnp.where(live_f, pos_f, jnp.max(pos_f))
            nbits = jnp.where(live_f, ((flatm & 3) + 1) * 8, 0)
            vals = jnp.where(live_f, flatv, 0).astype(jnp.uint32)
            S = flatv.shape[1]
            K = 128
            Sp = -(-S // K) * K
            pad = ((0, 0), (0, Sp - S))
            offs = jnp.pad(pos_f * 8, pad, mode="edge")
            nbits = jnp.pad(nbits, pad)
            vals = jnp.pad(vals, pad)
            return pd._pack_fields(vals, nbits, offs, nrows_out, False,
                                   K)

        def packf_body(acc):
            vc, a = jax.lax.optimization_barrier((vc0, acc))
            return a + s(stage_bw(vc))

        add("dec_packf", packf_body)

    # ---- interleaved K-loop slope (min per K, then diff of minima —
    # float() forces a real d2h fetch; block_until_ready does NOT wait
    # through the tunnel) ----------------------------------------------
    runners = {}
    for nm, body in zip(names, bodies):
        @jax.jit
        def run(x0, k_arr, body=body):
            return jax.lax.fori_loop(
                0, k_arr.shape[0], lambda i, acc: body(acc), x0)
        for K in (1, 9):
            float(run(jnp.float32(0), jnp.zeros(K)))
        runners[nm] = run

    best = {nm: {1: float("inf"), 9: float("inf")} for nm in names}
    for _ in range(7):
        for nm in names:
            run = runners[nm]
            for K in (1, 9):
                t0 = time.perf_counter()
                float(run(jnp.float32(0), jnp.zeros(K)))
                dt = time.perf_counter() - t0
                best[nm][K] = min(best[nm][K], dt)
    nbytes = len(native)
    for nm in names:
        dt = max((best[nm][9] - best[nm][1]) / 8, 1e-7)
        gbps = nbytes / dt / 1e9
        print(f"{nm:22s} {dt*1e6:9.1f} us   {gbps:6.2f} GB/s",
              flush=True)


if __name__ == "__main__":
    main()
