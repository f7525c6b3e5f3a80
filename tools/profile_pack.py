"""Slope-timed breakdown of the pack_blocks stages on the real chip.

Stages: token_values_pallas (LUT + group-local bit prefix kernel), the
XLA glue (group prefix + shifted contributions + chunk prep),
chunk_windows_pallas (prefix-sum/binary-search window build),
merge_place_pallas (grouped super-window placement). Run on the chip
only (wall timings through the axon tunnel are untrustworthy —
CLAUDE.md; this uses the K-iteration in-jit slope method).
"""

import json
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
    from rspt_tpu.packers.tpu import _pass1_xdelta

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
    f1, lengths_np = _pass1_xdelta(n, ch, bps, planes)
    small, blocks, toks = f1(raw)
    syms, extras, ebits, tvalid, hist = toks
    codes, cbits, desc_bytes, desc_bits, is_fill = jax_coder.host_tables(
        np.asarray(hist), lengths_np)
    cd, cb, db = jax.device_put((codes, cbits, desc_bits))
    nb, ntok = syms.shape
    res = {"nb": nb, "ntok": ntok}

    comb_fn = jax.jit(lambda c, b: (
        (jax.lax.bitcast_convert_type(c, jnp.int32) & jnp.int32(0xFFFFFF))
        | (b.astype(jnp.int32) << 24)))
    comb = comb_fn(cd, cb)

    def tv_body(acc):
        s_, a = jax.lax.optimization_barrier((syms, acc))
        nbits, lo, hi, excl, tot = pk.token_values_pallas.__wrapped__(
            s_, extras, ebits, tvalid, comb)
        return (a + s(nbits) + s(lo) + s(hi) + s(excl) + s(tot))

    res["t_token_values_s"] = loop_time(tv_body)

    nbits, lo, hi, excl, tot = pk.token_values_pallas(
        syms, extras, ebits, tvalid, comb)

    # glue: group prefix + shifted contributions + chunk prep (mirrors
    # _pack_tokens_pallas_from_toks between the three kernels)
    from rspt_tpu.ops.pallas_kernels import GROUP_TOK, GSIZE, K_PACK, R_CW

    max_out = ntok + 512
    nwords = max_out // 4 + 1
    nrows = -(-(nwords + 2048) // 128)
    nrows = -(-nrows // 8) * 8

    def glue(nbits, lo, hi, excl, tot, desc_bits):
        ng = tot.shape[1]
        gb = tot
        p = 1
        while p < ng:
            gb = gb + jnp.pad(gb, ((0, 0), (p, 0)))[:, :ng]
            p *= 2
        group_base = desc_bits[:, None] + gb - tot
        total_bits = group_base[:, -1] + tot[:, -1]
        offs = (group_base[:, :, None]
                + excl.reshape(nb, ng, GROUP_TOK)).reshape(nb, -1)
        n_tok = offs.shape[1]
        sh = (offs & 31).astype(jnp.uint32)
        inv = jnp.uint32(32) - sh
        c0 = (lo << sh).astype(jnp.int32)
        c1 = (jnp.where(sh > 0, lo >> inv, jnp.uint32(0))
              | (hi << sh)).astype(jnp.int32)
        c2 = jnp.where(sh > 0, hi >> inv, jnp.uint32(0)).astype(jnp.int32)
        n_pad = -(-n_tok // K_PACK) * K_PACK
        nchunks = n_pad // K_PACK
        nchunks_p = -(-nchunks // R_CW) * R_CW

        def prep(a, fill=0):
            a = jnp.pad(a, ((0, 0), (0, n_pad - n_tok)),
                        constant_values=fill)
            a = a.reshape(nb, nchunks, K_PACK)
            a = jnp.pad(a, ((0, 0), (0, nchunks_p - nchunks), (0, 0)),
                        constant_values=fill)
            return jnp.pad(a, ((0, 0), (0, 0), (0, 128 - K_PACK)),
                           constant_values=fill)

        word = jnp.right_shift(offs, 5)
        bases = jnp.right_shift(offs[:, ::K_PACK], 5)
        bases = jnp.pad(bases, ((0, 0), (0, nchunks_p - nchunks)),
                        mode="edge")
        local = jnp.clip(prep(word, fill=1 << 22) - bases[:, :, None],
                         0, 126)
        gbase = jnp.clip(bases[:, ::GSIZE], 0, nrows * 128 - 2048)
        d = jnp.clip(bases - jnp.repeat(gbase, GSIZE, axis=1), 0, 1023)
        live = jnp.any(prep(nbits) > 0, axis=2)
        glive = jnp.any(live.reshape(nb, -1, GSIZE), axis=2)
        return (local, prep(c0), prep(c1), prep(c2), d[:, :, None],
                gbase[:, :, None], glive[:, :, None].astype(jnp.int32),
                total_bits)

    glue_j = jax.jit(glue)

    def glue_body(acc):
        nb_, a = jax.lax.optimization_barrier((nbits, acc))
        outs = glue(nb_, lo, hi, excl, tot, db)
        return a + sum(s(o) for o in outs)

    res["t_glue_s"] = loop_time(glue_body)

    (localr, c0p, c1p, c2p, dw, gbase, glive, total_bits) = \
        jax.block_until_ready(glue_j(nbits, lo, hi, excl, tot, db))

    def build_body(acc):
        l_, a = jax.lax.optimization_barrier((localr, acc))
        dense = pk.chunk_windows_pallas.__wrapped__(l_, c0p, c1p, c2p)
        return a + s(dense)

    res["t_chunk_windows_s"] = loop_time(build_body)

    dense = pk.chunk_windows_pallas(localr, c0p, c1p, c2p)

    def place_body(acc):
        d_, a = jax.lax.optimization_barrier((dense, acc))
        out = pk.merge_place_pallas.__wrapped__(d_, dw, gbase, glive,
                                                nrows)
        return a + s(out)

    res["t_merge_place_s"] = loop_time(place_body)

    def full_body(acc):
        s_, a = jax.lax.optimization_barrier((syms, acc))
        packed, tb = jax_coder.pack_blocks.__wrapped__(
            s_, extras, ebits, tvalid, cd, cb, db)
        return a + s(packed) + s(tb)

    res["t_pack_full_s"] = loop_time(full_body)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
