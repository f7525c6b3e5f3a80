"""Mesh scaling-efficiency benchmark (BASELINE "≥80% scaling").

Measures the sharded hzr encode+decode over 1..8 mesh devices. On the
virtual CPU mesh a plain in-process sweep is meaningless — XLA CPU
parallelizes intra-op across every core even with one device — so each
mesh size runs in a subprocess pinned (taskset) to min(nd, ncores)
physical cores: the measurement is "does sharding over nd devices use
the available cores as well as one device uses one core". Efficiency
is therefore speedup / min(nd, ncores): with 4 host cores the 8-device
point checks that an oversubscribed mesh holds 4-core throughput (pure
sharding overhead), not that it doubles it.

Two timings per point:
- full:   ShardedHzrEncoder.encode() / ShardedHzrDecoder.decode_many()
          including the serial host glue (Huffman tables, assemble).
- device: the jitted sharded token+pack step only (what actually
          scales with chips; the host glue is constant ~ms work that
          overlaps device compute in a pipelined deployment).

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
import jax.numpy as jnp
from rspt_tpu.hzr import jax_coder
from rspt_tpu.parallel.mesh import (ShardedHzrDecoder, ShardedHzrEncoder,
                                    make_mesh, pad_blocks)
nd = {nd}
rng = np.random.default_rng(7)
data = rng.integers(0, 40, 8 * 1024 * 1024, dtype=np.int64).astype(np.uint8)
mesh = make_mesh(jax.devices()[:nd])
enc = ShardedHzrEncoder(mesh)
stream = enc.encode(data)
reps = 5

def best(fn):
    fn()
    t = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        t = min(t, time.perf_counter() - t0)
    return t

te = best(lambda: enc.encode(data))

# device-step only: the sharded tokenize+pack jits, synced
blocks_np, lengths_np = jax_coder._split_blocks(data)
nb = blocks_np.shape[0]
nb_pad = pad_blocks(nb, nd)
if nb_pad != nb:
    blocks_np = np.concatenate(
        [blocks_np, np.zeros((nb_pad - nb, jax_coder.B), np.uint8)])
    lengths_np = np.concatenate(
        [lengths_np, np.zeros(nb_pad - nb, np.int32)])
put = lambda a: jax.device_put(a, enc.block_sharding)
blocks = put(blocks_np)
lengths = put(lengths_np.astype(np.int32))
toks = enc.tok(blocks, lengths)
syms, extras, ebits, tvalid, hist = toks
codes, cbits, desc_bytes, desc_bits, is_fill = jax_coder.host_tables(
    np.asarray(hist), lengths_np)
cd, cb, db = put(codes), put(cbits), put(desc_bits)

def dev_step():
    t = enc.tok(blocks, lengths)
    p, tb = enc.pack(t[0], t[1], t[2], t[3], cd, cb, db)
    jax.block_until_ready((p, tb))

tdev = best(dev_step)

dec = ShardedHzrDecoder(mesh)
# spy on the two device stages so the device-step decode can be
# replayed (and timed) without the serial host glue around it
holder = {{}}
fns = dec._fns()
orig_fix, orig_make = fns["fixpoint"], fns["make_emit"]

def fix_spy(*a):
    holder["fix"] = a
    return orig_fix(*a)

def make_spy(out_size):
    emit = orig_make(out_size)
    def emit_spy(*a):
        holder["emit"] = (emit, a)
        return emit(*a)
    return emit_spy

fns["fixpoint"], fns["make_emit"] = fix_spy, make_spy
out = dec.decode_many([stream])[0]
assert out == data.tobytes()
td = best(lambda: dec.decode_many([stream]))

def dec_step():
    entry, counts = orig_fix(*holder["fix"])
    emit, a = holder["emit"]
    jax.block_until_ready((entry, counts, emit(*a)))

tddev = best(dec_step)

# hinted decode device step (the fixed-stream serving path): the
# alignment fixpoint is skipped entirely — only the emission sweep
# plus its reduce-scatter run on device
def dec_step_hint():
    emit, a = holder["emit"]
    jax.block_until_ready(emit(*a))

tdhint = best(dec_step_hint)
print(json.dumps({{"enc_gbps": data.size / te / 1e9,
                   "enc_dev_gbps": data.size / tdev / 1e9,
                   "dec_gbps": data.size / td / 1e9,
                   "dec_dev_gbps": data.size / tddev / 1e9,
                   "dec_hint_dev_gbps": data.size / tdhint / 1e9}}))
"""


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ncores = os.cpu_count() or 4
    results = {}
    # INTERLEAVED rounds: the shared host's speed drifts between
    # subprocess sweeps (a single sequential sweep showed 1.7x swings
    # on one point across repeats), so each mesh size runs ROUNDS
    # times interleaved and every throughput keeps its per-point best
    # — min-of-N batched across the sweep, same methodology as the
    # chip-side K-loop benches.
    rounds = int(os.environ.get("RSPT_SCALING_ROUNDS", "3"))
    for rnd in range(rounds):
        for nd in [1, 2, 4, 8]:
            cores = min(nd, ncores)
            env = dict(os.environ)
            env["XLA_FLAGS"] = (
                env.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count={nd}"
            ).strip()
            code = WORKER.format(root=root, nd=nd)
            cmd = ["taskset", "-c", f"0-{cores - 1}", sys.executable,
                   "-c", code]
            r = subprocess.run(cmd, env=env, capture_output=True,
                               text=True, timeout=1800)
            if r.returncode != 0:
                print(f"{nd} devices failed: {r.stderr[-300:]}",
                      file=sys.stderr)
                continue
            got = json.loads(r.stdout.strip().splitlines()[-1])
            got["cores"] = cores
            prev = results.get(nd)
            if prev is None:
                results[nd] = got
            else:
                for k, v in got.items():
                    if isinstance(v, float):
                        prev[k] = max(prev[k], v)

    KEYS = (("enc_gbps", "encode"),
            ("enc_dev_gbps", "encode_device_step"),
            ("dec_gbps", "decode"),
            ("dec_dev_gbps", "decode_device_step"),
            ("dec_hint_dev_gbps", "decode_hinted_device_step"))
    # Efficiency basis: per-core throughput normalized to the BEST
    # per-core rate observed across the sweep — ≤ 1.0 for every point
    # by construction (the old speedup/min(nd,cores) basis could exceed
    # 1.0 whenever the 1-device baseline ran below the machine's
    # per-core rate, which proves nothing).
    out = {}
    for key, label in KEYS:
        best_pc = max((g[key] / g["cores"] for g in results.values()
                       if key in g), default=1.0)
        for nd, g in results.items():
            if key not in g:
                continue
            e = out.setdefault(nd, {"cores": g["cores"]})
            e[f"{label}_gbps"] = round(g[key], 4)
            e[f"{label}_scaling_efficiency"] = round(
                g[key] / (best_pc * g["cores"]), 3)
    for nd, entry in out.items():
        print(f"{nd} devices ({entry['cores']} cores): "
              f"encode {entry['encode_gbps']} GB/s "
              f"(eff {entry['encode_scaling_efficiency']:.1%}), "
              f"device-step {entry['encode_device_step_gbps']} GB/s "
              f"(eff {entry['encode_device_step_scaling_efficiency']:.1%}), "
              f"decode dev-step {entry['decode_device_step_gbps']} GB/s "
              f"(eff {entry['decode_device_step_scaling_efficiency']:.1%}), "
              f"hinted {entry.get('decode_hinted_device_step_gbps')} GB/s "
              f"(eff {entry.get('decode_hinted_device_step_scaling_efficiency')})",
              file=sys.stderr)
    print(json.dumps({
        "metric": "sharded_hzr_scaling_1core_per_device",
        "host_cores": ncores,
        "efficiency_basis": ("per-core throughput / best observed "
                             "per-core rate (<=1.0 by construction); "
                             "cores = min(nd, host_cores) pinned via "
                             "taskset"),
        "results": out}))


if __name__ == "__main__":
    main()
