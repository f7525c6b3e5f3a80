"""Stage-by-stage timing of the TPU encode pipeline (run on real chip)."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def t(label, fn, reps=3):
    fn()  # warmup/compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:38s} {best*1e3:9.2f} ms")
    return best


def main():
    import jax
    import jax.numpy as jnp
    from bench import make_ecg
    from rspt_tpu.hzr import jax_coder
    from rspt_tpu.ops import jax_ops as jops

    ch, n, bps = 12, 34199, 4
    sig, native = make_ecg(ch, n)
    raw_np = np.frombuffer(native, np.uint8)
    print(f"payload {len(native)/1e6:.2f} MB on {jax.default_backend()}")

    raw = jax.device_put(raw_np)
    t("h2d raw", lambda: jax.device_put(raw_np).block_until_ready())

    pre = jax.jit(lambda r: jops.plane_split(jops.xor_encode(jops.offset32(
        jops.delta_encode(jops.native_to_i32(r, n, ch, bps).reshape(-1)),
        -128)), 3))
    planes = pre(raw)
    t("preprocess+planes (device)", lambda: pre(raw).block_until_ready())

    # block build on device
    plane_len = ch * n
    B = jax_coder.B
    nb_per = -(-plane_len // B)

    def blockify(p):
        padded = jnp.zeros((3, nb_per * B), jnp.uint8).at[:, :plane_len].set(p)
        return padded.reshape(3 * nb_per, B)
    blockify_j = jax.jit(blockify)
    blocks = blockify_j(planes)
    t("blockify (device)", lambda: blockify_j(planes).block_until_ready())

    lengths_np = np.full(3 * nb_per, B, np.int32)
    if plane_len % B:
        lengths_np[nb_per - 1::nb_per] = plane_len % B
    lengths = jax.device_put(lengths_np)

    tok = jax_coder.tokenize_blocks
    out = tok(blocks, lengths)
    t("tokenize+hist (device)",
      lambda: jax.block_until_ready(tok(blocks, lengths)))
    syms, extras, ebits, tvalid, hist = out

    hist_np = np.asarray(hist)
    t("hist d2h", lambda: np.asarray(tok(blocks, lengths)[4]))
    tables = jax_coder.host_tables(hist_np, lengths_np)
    t("host_tables (native C++)",
      lambda: jax_coder.host_tables(hist_np, lengths_np))
    codes, cbits, desc_bytes, desc_bits, is_fill = tables

    codes_d = jax.device_put(codes)
    cbits_d = jax.device_put(cbits)
    dbits_d = jax.device_put(desc_bits)
    pk = jax_coder.pack_blocks
    packed, total_bits = pk(syms, extras, ebits, tvalid, codes_d, cbits_d,
                            dbits_d)
    t("pack (device)",
      lambda: jax.block_until_ready(pk(syms, extras, ebits, tvalid,
                                       codes_d, cbits_d, dbits_d)))
    t("packed d2h", lambda: np.array(packed))

    blocks_np = np.asarray(blocks)
    packed_np = np.array(packed)
    packed_np[:, :desc_bytes.shape[1]] |= desc_bytes
    tb_np = np.asarray(total_bits)
    t("assemble (host)",
      lambda: jax_coder.assemble(blocks_np, lengths_np, packed_np, tb_np,
                                 is_fill))


if __name__ == "__main__":
    main()
