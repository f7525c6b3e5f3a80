"""Fresh-process chip parity check for the fused pass-1 path.

Runs the TPU engine (fused pass-1 + pallas pack, the real-chip
defaults) FIRST in this process, then compares byte-for-byte against
the host engine — the verification protocol for any new device kernel
(trace-time-global jit aliasing makes in-process mode flips unsound).
Exercises plane counts 1-4, odd tails, multi-block planes, and a
decompress round-trip.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _enable_compile_cache, make_ecg  # noqa: E402

_enable_compile_cache()

import numpy as np  # noqa: E402


def main():
    import jax

    from rspt_tpu.packers import host as hpack
    from rspt_tpu.packers import tpu as tpack

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(7)

    cases = [("ecg12", 12, 34199, 4, 3), ("small", 3, 23456, 4, 3),
             ("p1", 2, 40000, 2, 1), ("p4", 4, 70001, 4, 4),
             ("p2", 1, 65536, 4, 2)]
    for name, ch, n, bps, planes in cases:
        if name == "ecg12":
            _, native = make_ecg(ch, n)
        else:
            sig = np.cumsum(rng.normal(0, 300, (ch, n)), axis=1)
            sig = sig.astype(np.int32) >> (0 if bps == 4 else 8)
            native = np.ascontiguousarray(
                sig.T).astype(f"<i{bps}").tobytes()
        pt = tpack.new_xdelta_hzr(bps, ch, n, planes)
        comp_t = pt.compress(native)          # device path traced FIRST
        ph = hpack.new_xdelta_hzr(bps, ch, n, planes)
        comp_h = ph.compress(native)
        ok = comp_t == comp_h
        out, _ = pt.decompress(comp_t)
        rt = out == native
        print(f"{name}: bytes_equal={ok} roundtrip={rt} "
              f"len={len(comp_t)}", flush=True)
        if not (ok and rt):
            print("FAIL", flush=True)
            sys.exit(1)

    # plain hzr packer (4 planes, fused tokenizer + flat pack)
    _, native = make_ecg(6, 20000)
    ph_t = tpack.new_hzr(4, 6, 20000)
    ch_t = ph_t.compress(native)
    ch_h = hpack.new_hzr(4, 6, 20000).compress(native)
    okz = ch_t == ch_h and ph_t.decompress(ch_t)[0] == native
    print(f"hzr4: bytes_equal={ch_t == ch_h} roundtrip={okz}", flush=True)
    if not okz:
        print("FAIL", flush=True)
        sys.exit(1)

    # lossy transform packers through the fused tail + flat pack
    _, native = make_ecg(2, 4096)
    for mk_name in ("new_dct", "new_hadamard"):
        pt2 = getattr(tpack, mk_name)(4, 2, 4096)
        ph2 = getattr(hpack, mk_name)(4, 2, 4096)
        c_t, c_h = pt2.compress(native), ph2.compress(native)
        okl = c_t == c_h
        rtl = pt2.decompress(c_t)[0] == ph2.decompress(c_h)[0]
        print(f"{mk_name}: bytes_equal={okl} recon_equal={rtl}",
              flush=True)
        if not (okl and rtl):
            print("FAIL", flush=True)
            sys.exit(1)

    # batched serving path: compress_many streams equal sequential
    # compress() output payload-for-payload (vmap pass-1 + flat pack)
    _, native = make_ecg(12, 34199)
    pb = tpack.new_xdelta_hzr(4, 12, 34199, 3)
    batch = pb.compress_many([native, native, native])
    seq = tpack.new_xdelta_hzr(4, 12, 34199, 3).compress(native)
    okb = all(b == seq for b in batch)
    rtb = all(pb.decompress(b)[0] == native for b in batch)
    print(f"batch3: bytes_equal={okb} roundtrip={rtb}", flush=True)
    if not (okb and rtb):
        print("FAIL", flush=True)
        sys.exit(1)
    print("ALL OK", flush=True)


if __name__ == "__main__":
    main()
