"""TPU two-pass hzr encoder vs the Python spec (itself bit-exact vs the
C++ reference, see test_hzr.py)."""

import numpy as np
import pytest

pytest.importorskip("jax")

from rspt_tpu.hzr import jax_coder, pyref  # noqa: E402


def roundtrip_exact(data: np.ndarray):
    got = jax_coder.encode(data)
    want = pyref.encode(data)
    assert got == want, (
        f"stream mismatch: len {len(got)} vs {len(want)}, "
        f"first diff at {next((i for i in range(min(len(got), len(want))) if got[i] != want[i]), -1)}")
    assert pyref.decode(got) == data.tobytes()


def test_empty():
    roundtrip_exact(np.zeros(0, np.uint8))


def test_all_zeros_fill():
    roundtrip_exact(np.zeros(5000, np.uint8))


def test_single_value_fill():
    roundtrip_exact(np.full(300, 77, np.uint8))


def test_random_incompressible_copy(rng):
    roundtrip_exact(rng.integers(0, 256, 70000, np.int64).astype(np.uint8))


def test_text_like(rng):
    data = rng.choice(
        np.frombuffer(b"the quick brown fox 0123", np.uint8), 50000)
    roundtrip_exact(data.astype(np.uint8))


def test_zero_runs_all_classes(rng):
    # exercise every RLE symbol class incl. the 16662 cap and run splits
    parts = []
    for run in (1, 2, 3, 6, 7, 22, 23, 278, 279, 16662, 16663, 40000):
        parts.append(np.full(run, 0, np.uint8))
        parts.append(rng.integers(1, 256, 17, np.int64).astype(np.uint8))
    roundtrip_exact(np.concatenate(parts))


def test_trailing_zeros():
    data = np.concatenate([np.arange(256, dtype=np.uint8),
                           np.zeros(1000, np.uint8)])
    roundtrip_exact(data)


def test_multi_block_boundary_runs(rng):
    # zero runs straddling the 64 KiB block boundary must split
    data = np.zeros(200000, np.uint8)
    data[::97] = rng.integers(1, 256, len(data[::97]), np.int64)
    roundtrip_exact(data)


def test_ecg_plane_payload(ecg12):
    # realistic payload: plane 0 of the xdelta chain on 12-ch ECG
    from rspt_tpu.ops import numpy_ops as nops
    sig, _ = ecg12
    enc = nops.xor_encode(nops.offset32(
        nops.delta_encode(sig.reshape(-1)), -128))
    for k in range(3):
        roundtrip_exact(nops.plane_split(enc, 3)[k])


def test_skewed_histogram(rng):
    # near-degenerate: two symbols, one rare → deep-ish codes
    data = np.where(rng.random(65536) < 0.001, 200, 7).astype(np.uint8)
    roundtrip_exact(data)


def test_batched_blocks_match_sequential(rng):
    data = rng.integers(0, 40, 300000, np.int64).astype(np.uint8)
    roundtrip_exact(data)
