"""Pallas kernels vs the numpy oracles (interpret mode on CPU)."""

import numpy as np
import pytest

pytest.importorskip("jax")
import jax  # noqa: E402

from rspt_tpu.ops import numpy_ops as nops  # noqa: E402
from rspt_tpu.ops import pallas_kernels as pk  # noqa: E402

INTERP = jax.default_backend() != "tpu"


def test_fwht_pallas_matches(rng):
    x = rng.integers(-(2**23), 2**23, (6, 4096),
                     dtype=np.int64).astype(np.int32)
    got = np.asarray(pk.fwht_pallas(x, interpret=INTERP))
    want = np.stack([nops.fwht(r) for r in x])
    np.testing.assert_array_equal(got, want)


def test_fwht_pallas_wraparound():
    x = np.array([[2**31 - 1, -(2**31), 7, -9]], np.int32)
    got = np.asarray(pk.fwht_pallas(x, interpret=INTERP))
    np.testing.assert_array_equal(got, nops.fwht(x[0])[None])


def test_xdelta_fused_matches(rng):
    for n in (100, 65536, 200000):
        x = rng.integers(-(2**31), 2**31, n, dtype=np.int64).astype(np.int32)
        got = np.asarray(pk.xdelta_preprocess_pallas(x, interpret=INTERP))
        want = nops.xor_encode(nops.offset32(nops.delta_encode(x), -128))
        np.testing.assert_array_equal(got, want)


def test_interp_pack_path_bit_exact(rng, monkeypatch):
    """The fused Pallas pack path (token_values_pallas LUT/prefix kernel
    + pack_bits_pallas placement) is byte-identical to the Python spec
    in interpreter mode (hzr_encode.c:411-457 semantics)."""
    from rspt_tpu.hzr import jax_coder, pyref
    monkeypatch.setattr(jax_coder, "_PACK_MODE", "interp")
    cases = [
        rng.choice(np.frombuffer(b"the quick brown fox 0123", np.uint8),
                   50000).astype(np.uint8),
        np.concatenate([np.concatenate([
            np.full(r, 0, np.uint8),
            rng.integers(1, 256, 17, np.int64).astype(np.uint8)])
            for r in (1, 2, 3, 6, 7, 22, 23, 278, 279, 16662, 40000)]),
        rng.integers(0, 256, 70000, np.int64).astype(np.uint8),
        rng.integers(0, 5, 100, np.int64).astype(np.uint8),
        np.zeros(5000, np.uint8),
    ]
    for data in cases:
        assert jax_coder.encode(data) == pyref.encode(data)
