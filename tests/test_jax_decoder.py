"""TPU segment-parallel hzr decoder vs the spec encoder."""

import numpy as np
import pytest

pytest.importorskip("jax")

from rspt_tpu.hzr import jax_decoder, pyref  # noqa: E402


def roundtrip(data: np.ndarray):
    stream = pyref.encode(data)
    assert jax_decoder.decode(stream) == data.tobytes()


def test_empty_and_fill(rng):
    roundtrip(np.zeros(0, np.uint8))
    roundtrip(np.zeros(70000, np.uint8))
    roundtrip(np.full(500, 42, np.uint8))


def test_copy_blocks(rng):
    roundtrip(rng.integers(0, 256, 130000, np.int64).astype(np.uint8))


def test_rle_classes(rng):
    parts = []
    for run in (1, 2, 3, 6, 7, 22, 23, 278, 279, 16662, 16663, 40000):
        parts.append(np.zeros(run, np.uint8))
        parts.append(rng.integers(1, 256, 13, np.int64).astype(np.uint8))
    roundtrip(np.concatenate(parts))


def test_multiblock_mixed(rng):
    data = np.zeros(300000, np.uint8)
    data[::53] = rng.integers(1, 200, len(data[::53]), np.int64)
    roundtrip(data)


def test_skewed_deep_codes(rng):
    # skewed histogram drives long codes (exercises the L2 tables)
    vals = np.concatenate([
        np.full(60000, 7, np.uint8),
        rng.integers(0, 256, 600, np.int64).astype(np.uint8),
        np.full(4000, 9, np.uint8)])
    roundtrip(vals)


def test_real_ecg_planes(real_ecg12):
    from rspt_tpu.ops import numpy_ops as nops
    sig = np.frombuffer(real_ecg12, "<i4").reshape(34199, 12).T
    enc = nops.xor_encode(nops.offset32(
        nops.delta_encode(np.ascontiguousarray(sig).reshape(-1)), -128))
    for k in range(3):
        roundtrip(nops.plane_split(enc, 3)[k])
