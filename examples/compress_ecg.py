"""Compress / decompress a multi-channel ECG buffer.

Mirrors the reference README example (README.md:43-80) on the TPU-native
framework. Run: python examples/compress_ecg.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import rspt_tpu.packers as packers
from rspt_tpu.utils.metrics import compression_ratio


def main():
    # 1 channel, 32-bit, 8192 samples of a sine (the README example)
    nr_samples, nr_channels, bps = 8192, 1, 4
    sig = (np.sin(np.arange(nr_samples) / 100.0) * 1000.0).astype(np.int32)
    native = sig.astype("<i4").tobytes()

    # engine="auto" picks the native C++ runtime when built, else TPU/host
    packer = packers.new_xdelta_hzr(bps, nr_channels, nr_samples,
                                    nr_bytes_to_encode=3, engine="auto")
    comp = packer.compress(native)
    print(f"compressed {len(native)} -> {len(comp)} bytes "
          f"(CR {compression_ratio(len(native), len(comp)):.2f})")

    out, consumed = packer.decompress(comp)
    assert bytes(out) == native, "lossless roundtrip failed"
    print("lossless roundtrip OK")


if __name__ == "__main__":
    main()
