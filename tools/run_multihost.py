"""Multi-host (multi-process) validation of the sharded codec.

Launches N jax.distributed processes on this machine (CPU backend,
4 virtual devices each → an 8-device, 2-process mesh) and runs the
sharded hzr encoder + carry-exchange scans across process boundaries —
the same code path a real multi-host TPU pod slice uses over DCN.

Usage:
  python tools/run_multihost.py            # parent: spawns 2 workers
  (workers are re-invocations with RSPT_MH_RANK set)
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

NPROC = 2
DEV_PER_PROC = 4
PORT = int(os.environ.get("RSPT_MH_PORT", "12655"))


def worker(rank: int):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"localhost:{PORT}", num_processes=NPROC,
                               process_id=rank)
    import numpy as np
    from rspt_tpu.hzr import pyref
    from rspt_tpu.parallel.mesh import ShardedHzrEncoder, make_mesh
    from rspt_tpu.parallel.scans import make_sharded_scans

    assert jax.process_count() == NPROC
    assert len(jax.devices()) == NPROC * DEV_PER_PROC

    rng = np.random.default_rng(42)  # same payload on every host
    data = rng.integers(0, 60, 2 * 1024 * 1024, dtype=np.int64).astype(
        np.uint8)

    enc = ShardedHzrEncoder(make_mesh())
    stream = enc.encode(data)  # warm/compile
    import time
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        stream = enc.encode(data)
    dt = (time.perf_counter() - t0) / reps
    if rank == 0:
        assert pyref.decode(stream) == data.tobytes(), "multihost mismatch"
        print("MULTIHOST_ENCODE_OK", len(stream), flush=True)
        print(f"MULTIHOST_THROUGHPUT {data.size/dt/1e6:.1f} MB/s "
              f"({NPROC} processes x {DEV_PER_PROC} devices)", flush=True)

    # cross-process ppermute carry exchange
    scans = make_sharded_scans(enc.mesh)
    x = rng.integers(-(2**31), 2**31, NPROC * DEV_PER_PROC * 4096,
                     dtype=np.int64).astype(np.int32)
    from jax.experimental import multihost_utils as mhu
    from jax.sharding import NamedSharding, PartitionSpec as P
    sh = NamedSharding(enc.mesh, P("blocks"))
    xg = jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])
    enc_x = scans["xor_encode"](scans["delta_encode"](xg))
    dec_x = scans["delta_decode"](scans["xor_decode"](enc_x))
    got = np.asarray(mhu.process_allgather(dec_x, tiled=True))
    if rank == 0:
        assert np.array_equal(got, x), "scan carry exchange mismatch"
        print("MULTIHOST_SCANS_OK", flush=True)


def parent():
    procs = []
    for r in range(NPROC):
        env = dict(os.environ, RSPT_MH_RANK=str(r), JAX_PLATFORMS="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count="
                             f"{DEV_PER_PROC}")
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    ok = True
    out0 = b""
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        if i == 0:
            out0 = out
        if p.returncode != 0:
            ok = False
            sys.stderr.write(out.decode(errors="replace"))
    text = out0.decode(errors="replace")
    if ok and "MULTIHOST_ENCODE_OK" in text and "MULTIHOST_SCANS_OK" in text:
        for line in text.splitlines():
            if line.startswith("MULTIHOST_THROUGHPUT"):
                print(line)
        print("multihost validation passed (2 processes x "
              f"{DEV_PER_PROC} devices)")
        return 0
    print("multihost validation FAILED")
    sys.stderr.write(text)
    return 1


if __name__ == "__main__":
    rank = os.environ.get("RSPT_MH_RANK")
    if rank is None:
        sys.exit(parent())
    worker(int(rank))
