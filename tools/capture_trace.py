"""Capture a jax.profiler trace of the TPU codec hot path.

Writes a perfetto/tensorboard-compatible trace under build/trace/
(open with `tensorboard --logdir build/trace` or ui.perfetto.dev).
The trace covers one warm compress + decompress on the 12-ch ECG
payload — per-op device timelines complement the slope-timed stage
numbers in PROFILE_r02.json.

Usage: python tools/capture_trace.py [outdir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _enable_compile_cache, make_ecg  # noqa: E402

_enable_compile_cache()

import numpy as np  # noqa: E402


def main():
    import jax

    from rspt_tpu.packers import tpu as tpack

    outdir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "build", "trace")
    _, native = make_ecg(12, 34199)
    p = tpack.new_xdelta_hzr(4, 12, 34199, 3)
    comp = p.compress(native)           # warm (compile outside trace)
    out, _ = p.decompress(comp)
    assert out == native

    with jax.profiler.trace(outdir):
        comp = p.compress(native)
        p.decompress(comp)
    files = []
    for root, _, names in os.walk(outdir):
        files += [os.path.join(root, n) for n in names]
    total = sum(os.path.getsize(f) for f in files)
    print(f"trace: {len(files)} files, {total/1e6:.1f} MB in {outdir}")


if __name__ == "__main__":
    main()
