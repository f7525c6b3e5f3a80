"""JAX device ops vs the numpy host oracles (which are themselves tested
bit-exact against the C++ reference in test_packers.py)."""

import numpy as np
import pytest

from rspt_tpu.ops import numpy_ops as nops

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from rspt_tpu.ops import jax_ops as jops  # noqa: E402


@pytest.fixture(scope="module")
def ints():
    rng = np.random.default_rng(1234)
    # Full-range int32 values incl. wraparound-provoking extremes.
    base = rng.integers(-(2**31), 2**31, size=8192, dtype=np.int64)
    base[:8] = [0, -1, 1, 2**31 - 1, -(2**31), 123456789, -987654321, 255]
    return base.astype(np.int32)


def test_swizzle_roundtrip_all_bps(rng):
    for bps in (1, 2, 3, 4):
        for rev in (False, True):
            raw = rng.integers(0, 256, size=500 * 3 * bps,
                               dtype=np.int64).astype(np.uint8)
            want = nops.native_to_i32(raw, 500, 3, bps, rev)
            got = np.asarray(jops.native_to_i32(jnp.asarray(raw), 500, 3,
                                                bps, rev))
            np.testing.assert_array_equal(got, want)
            back = np.asarray(jops.i32_to_native(jnp.asarray(want), bps, rev))
            assert back.tobytes() == nops.i32_to_native(want, bps, rev)


def test_scans_match_numpy(ints):
    a = jnp.asarray(ints)
    np.testing.assert_array_equal(np.asarray(jops.delta_encode(a)),
                                  nops.delta_encode(ints))
    np.testing.assert_array_equal(np.asarray(jops.xor_encode(a)),
                                  nops.xor_encode(ints))
    np.testing.assert_array_equal(np.asarray(jops.offset32(a, -128)),
                                  nops.offset32(ints, -128))
    d = nops.delta_encode(ints)
    np.testing.assert_array_equal(np.asarray(jops.delta_decode(jnp.asarray(d))),
                                  nops.delta_decode(d))
    x = nops.xor_encode(ints)
    np.testing.assert_array_equal(np.asarray(jops.xor_decode(jnp.asarray(x))),
                                  nops.xor_decode(x))


def test_full_xdelta_chain_roundtrip(ints):
    a = jnp.asarray(ints)
    enc = jops.xor_encode(jops.offset32(jops.delta_encode(a), -128))
    dec = jops.delta_decode(jops.offset32(jops.xor_decode(enc), 128))
    np.testing.assert_array_equal(np.asarray(dec), ints)


def test_planes_match_numpy(ints):
    a = jnp.asarray(ints)
    for p in (1, 2, 3, 4):
        want = nops.plane_split(ints, p)
        got = np.asarray(jops.plane_split(a, p))
        np.testing.assert_array_equal(got, want)
        np.testing.assert_array_equal(
            np.asarray(jops.plane_merge(jnp.asarray(want))),
            nops.plane_merge(want))


def test_average_parts(rng):
    x = rng.integers(-(2**31), 2**31, size=(3, 4097),
                     dtype=np.int64).astype(np.int32)
    hi, lo = jops.sum64_parts(jnp.asarray(x))
    got = jops.average32_host(hi, lo, x.shape[1])
    want = np.array([nops.average32(x[i]) for i in range(3)], np.int32)
    np.testing.assert_array_equal(got, want)


def test_fwht_matches_numpy(rng):
    x = rng.integers(-(2**23), 2**23, size=(3, 4096),
                     dtype=np.int64).astype(np.int32)
    got = np.asarray(jops.fwht(jnp.asarray(x)))
    want = np.stack([nops.fwht(x[i]) for i in range(3)])
    np.testing.assert_array_equal(got, want)
    # quantize path (quality=1, the reference's only config)
    q = np.asarray(jops.fwht_normalize_pow2(jnp.asarray(want), 4096, 1.0))
    wantq = np.stack([nops.fwht_normalize(want[i], 4096, 1.0)
                      for i in range(3)])
    np.testing.assert_array_equal(q, wantq)
    dq = np.asarray(jops.fwht_normalize2_int(jnp.asarray(wantq), 1.0))
    np.testing.assert_array_equal(
        dq, np.stack([nops.fwht_normalize2(wantq[i], 1.0) for i in range(3)]))


def test_fwht_wraparound_extremes():
    x = np.array([[2**31 - 1, -(2**31), 2**31 - 1, -(2**31)]], np.int32)
    got = np.asarray(jops.fwht(jnp.asarray(x)))
    want = nops.fwht(x[0])[None]
    np.testing.assert_array_equal(got, want)


class TestDct:
    @pytest.fixture(scope="class")
    def sig(self):
        rng = np.random.default_rng(1234)
        n = 1024
        t = np.arange(n)
        x = (20000 * np.sin(t / 23.0) + 3000 * np.sin(t / 3.1)
             + rng.normal(0, 200, (4, n))).astype(np.int32)
        return x - np.array([nops.average32(r) for r in x],
                            np.int32)[:, None]

    def _np_exact(self, x, quality=128.0):
        n = x.shape[-1]
        ct = np.asarray(nops.dct_cos_table(n))
        cs = np.asarray(nops.dct_cs(n))
        return np.stack([nops.dct_forward(r, ct, cs, quality) for r in x])

    def test_exact_forward_matches(self, sig):
        got = np.asarray(jops.dct_forward_exact(jnp.asarray(sig)))
        want = self._np_exact(sig)
        np.testing.assert_array_equal(got, want)

    def test_exact_inverse_near_parity(self, sig):
        # The inverse's ×quality scale amplifies the reference's serial
        # f64 rounding walk (~n·eps64) above the truncation granularity
        # ~0.3‰ of the time — unreproducible without binary64 hardware,
        # so the device path is near-parity and the packers use the
        # native serial kernel for strict parity (packers/tpu.py).
        fwd = self._np_exact(sig)
        n = sig.shape[-1]
        ct = np.asarray(nops.dct_cos_table(n))
        cs = np.asarray(nops.dct_cs(n))
        want = np.stack([nops.dct_inverse(r, ct, cs, 128.0) for r in fwd])
        got = np.asarray(jops.dct_inverse_exact(jnp.asarray(fwd)))
        diff = np.abs(got.astype(np.int64) - want.astype(np.int64))
        assert diff.max() <= 1
        assert (diff != 0).mean() < 0.005

    def test_fast_forward_close(self, sig):
        ct, cs = jops.dct_tables(sig.shape[-1])
        got = np.asarray(jops.dct_forward(jnp.asarray(sig), ct, cs))
        want = self._np_exact(sig)
        # fast path may differ by ±1 on a tiny fraction of coefficients
        diff = np.abs(got.astype(np.int64) - want.astype(np.int64))
        assert diff.max() <= 1
        assert (diff != 0).mean() < 0.01
