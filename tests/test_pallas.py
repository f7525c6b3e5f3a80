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
