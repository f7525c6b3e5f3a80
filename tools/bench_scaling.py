"""Mesh scaling-efficiency benchmark.

Runs the sharded hzr encode over 1..N devices (virtual CPU mesh by
default, real chips when available) and reports throughput + scaling
efficiency — the BASELINE "≥80% scaling efficiency" metric. The
workload is block-parallel, so efficiency measures collective/dispatch
overhead, not algorithmic scaling.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       JAX_PLATFORMS=cpu python tools/bench_scaling.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    # Default to the virtual CPU mesh (the tunneled TPU plugin ignores
    # JAX_PLATFORMS=cpu, so force it via jax.config before any device
    # use); set RSPT_SCALING_TPU=1 on a real multi-chip slice.
    if "host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8").strip()
    import jax
    if not os.environ.get("RSPT_SCALING_TPU"):
        jax.config.update("jax_platforms", "cpu")
    from rspt_tpu.parallel.mesh import ShardedHzrEncoder, make_mesh

    rng = np.random.default_rng(7)
    data = rng.integers(0, 40, 8 * 1024 * 1024, dtype=np.int64).astype(
        np.uint8)

    devs = jax.devices()
    results = {}
    base = None
    for nd in [1, 2, 4, 8]:
        if nd > len(devs):
            break
        enc = ShardedHzrEncoder(make_mesh(devs[:nd]))
        enc.encode(data)  # warm
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            enc.encode(data)
        dt = (time.perf_counter() - t0) / reps
        gbps = data.size / dt / 1e9
        if base is None:
            base = gbps
        eff = gbps / (base * nd)
        results[nd] = {"gbps": round(gbps, 4),
                       "scaling_efficiency": round(eff, 3)}
        print(f"{nd} devices: {gbps:.3f} GB/s, efficiency {eff:.1%}",
              file=sys.stderr)
    print("note: on a virtual CPU mesh, devices beyond the physical core "
          "count share cores — efficiency there measures oversubscription, "
          "not the sharding design; the ≤#cores datapoints are the "
          "meaningful ones", file=sys.stderr)
    print(json.dumps({"metric": "sharded_hzr_encode_scaling",
                      "results": results}))


if __name__ == "__main__":
    main()
