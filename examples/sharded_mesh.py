"""Data-parallel hzr encode over a device mesh.

Single host: runs on all local devices (set
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu
for a virtual mesh). Multi-host: launch one copy per host with the
usual coordinator env and uncomment jax.distributed.initialize() —
jax.devices() then spans the pod slice and the same code shards the
block axis over ICI+DCN.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    # multi-host: jax.distributed.initialize()  # coordinator from env
    from rspt_tpu.hzr import pyref
    from rspt_tpu.parallel.mesh import ShardedHzrEncoder, make_mesh
    from rspt_tpu.parallel.scans import make_sharded_scans

    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    data = rng.integers(0, 50, 4 << 20, dtype=np.int64).astype(np.uint8)

    enc = ShardedHzrEncoder(make_mesh())
    stream = enc.encode(data)  # warm/compile
    t0 = time.perf_counter()
    stream = enc.encode(data)
    dt = time.perf_counter() - t0
    print(f"sharded encode: {len(data) >> 20} MiB -> {len(stream)} B "
          f"in {dt*1e3:.1f} ms")
    assert pyref.decode(stream) == data.tobytes()
    print("bit-exact vs format spec")

    # the cross-shard carry exchange used by the xdelta preprocessing
    scans = make_sharded_scans(enc.mesh)
    x = rng.integers(-1000, 1000, 8 * 8192, dtype=np.int64).astype(np.int32)
    enc_x = scans["xor_encode"](scans["delta_encode"](x))
    dec_x = scans["delta_decode"](scans["xor_decode"](enc_x))
    assert np.array_equal(np.asarray(dec_x), x)
    print("ppermute carry-exchange scans roundtrip OK")


if __name__ == "__main__":
    main()
